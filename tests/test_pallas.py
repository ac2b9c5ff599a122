"""Pallas kernel oracle tests (interpret mode on the CPU mesh).

Strategy per SURVEY.md §4.1: the hand-tiled TPU kernels must agree with the
jnp/XLA reference implementations — same pattern as the reference's
numpy-vs-casadi-vs-torch equivalence suites. Interpret mode executes the exact
kernel program (grids, blocking, masking) without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.models.gp import _masked_gram
from safe_exploration_tpu.models.kernels import init_kernel_params
from safe_exploration_tpu.ops.pallas import (
    cholesky_blocked,
    rbf_gram_masked,
    solve_psd_blocked,
    trsm_lower_blocked,
)


def _spd(rng, n, dtype=jnp.float64):
    m = rng.standard_normal((n, n))
    a = m @ m.T + n * np.eye(n)
    return jnp.asarray(a, dtype)


# ---------------------------------------------------------------- cholesky ---


@pytest.mark.parametrize("n", [64, 128, 200, 384])
def test_cholesky_blocked_matches_jnp(rng, n):
    a = _spd(rng, n)
    l_pallas = cholesky_blocked(a, interpret=True)
    l_ref = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(l_pallas, l_ref, rtol=1e-9, atol=1e-9)


def test_cholesky_blocked_batched(rng):
    a = jnp.stack([_spd(rng, 128) for _ in range(3)])
    l_pallas = cholesky_blocked(a, interpret=True)
    l_ref = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(l_pallas, l_ref, rtol=1e-9, atol=1e-9)


def test_cholesky_blocked_f32_accuracy(rng):
    """f32 path stays within the f32 conditioning-driven error of the oracle."""
    a64 = _spd(rng, 256)
    l64 = np.asarray(jnp.linalg.cholesky(a64))
    l32 = cholesky_blocked(a64.astype(jnp.float32), interpret=True)
    np.testing.assert_allclose(np.asarray(l32), l64, rtol=2e-4, atol=2e-4)


# -------------------------------------------------------------------- trsm ---


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("shape", [(128, 1), (128, 64), (300, 140)])
def test_trsm_lower_matches_scipy(rng, shape, transpose):
    n, m = shape
    l = jnp.linalg.cholesky(_spd(rng, n))
    b = jnp.asarray(rng.standard_normal((n, m)))
    x_pallas = trsm_lower_blocked(l, b, transpose=transpose, interpret=True)
    x_ref = jax.scipy.linalg.solve_triangular(
        l.T if transpose else l, b, lower=not transpose
    )
    np.testing.assert_allclose(x_pallas, x_ref, rtol=1e-8, atol=1e-8)


def test_trsm_vector_rhs(rng):
    l = jnp.linalg.cholesky(_spd(rng, 200))
    b = jnp.asarray(rng.standard_normal(200))
    x = trsm_lower_blocked(l, b, interpret=True)
    assert x.shape == (200,)
    np.testing.assert_allclose(
        x, jax.scipy.linalg.solve_triangular(l, b, lower=True),
        rtol=1e-8, atol=1e-8,
    )


def test_solve_psd_blocked_roundtrip(rng):
    a = _spd(rng, 256)
    l = jnp.linalg.cholesky(a)
    b = jnp.asarray(rng.standard_normal((256, 32)))
    x = solve_psd_blocked(l, b, interpret=True)
    np.testing.assert_allclose(a @ x, b, rtol=1e-7, atol=1e-7)


# -------------------------------------------------------------------- gram ---


@pytest.mark.parametrize("n,n_active", [(64, 64), (300, 220), (512, 40)])
def test_rbf_gram_masked_matches_oracle(rng, n, n_active):
    d = 3
    x = jnp.asarray(rng.standard_normal((n, d)))
    mask = jnp.zeros((n,), x.dtype).at[:n_active].set(1.0)
    params = init_kernel_params("rbf", d, x.dtype)
    params = {
        "log_lengthscales": params["log_lengthscales"] + 0.3,
        "log_sf": params["log_sf"] - 0.2,
    }
    noise_var = 1e-3
    k_pallas = rbf_gram_masked(params, x, mask, noise_var, interpret=True)
    k_ref = _masked_gram("rbf", params, x, mask, jnp.asarray(noise_var, x.dtype))
    np.testing.assert_allclose(k_pallas, k_ref, rtol=1e-9, atol=1e-9)


def test_rbf_gram_masked_padding_is_identity(rng):
    """Masked rows/cols reduce to identity so chol works for any mask."""
    x = jnp.asarray(rng.standard_normal((130, 4)))
    mask = jnp.zeros((130,), x.dtype).at[:7].set(1.0)
    params = init_kernel_params("rbf", 4, x.dtype)
    k = rbf_gram_masked(params, x, mask, 1e-2, interpret=True)
    l = jnp.linalg.cholesky(k)
    assert bool(jnp.all(jnp.isfinite(l)))
    sub = k[7:, 7:]
    np.testing.assert_allclose(sub, jnp.eye(123, dtype=x.dtype), atol=1e-12)


# -------------------------------------------------------------- hbm tier ---


@pytest.mark.parametrize("n", [256, 640])
def test_cholesky_hbm_matches_jnp(rng, n):
    from safe_exploration_tpu.ops.pallas.cholesky_hbm import cholesky_hbm

    a = _spd(rng, n, dtype=jnp.float32)
    l_pallas = cholesky_hbm(a, interpret=True)
    l_ref = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(l_pallas, l_ref, rtol=3e-4, atol=3e-4)


def test_cholesky_hbm_f64_oracle(rng):
    from safe_exploration_tpu.ops.pallas.cholesky_hbm import cholesky_hbm

    a = _spd(rng, 384)  # f64 in interpret mode
    l_pallas = cholesky_hbm(a, interpret=True)
    np.testing.assert_allclose(
        l_pallas, jnp.linalg.cholesky(a), rtol=1e-9, atol=1e-9
    )
