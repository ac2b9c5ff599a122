"""Tests for Lipschitz remainder over-approximations (SURVEY.md §2.2, §4.2:
remainder bounds must dominate sampled true quantities)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.ops import (
    compute_remainder_overapproximations,
    max_eig_psd_product,
    sample_inside_ellipsoid,
)


def random_psd(rng, n, scale=1.0):
    a = rng.standard_normal((n, n))
    return scale * (a @ a.T + 0.1 * np.eye(n))


@pytest.mark.parametrize("n", [2, 4, 6])
def test_power_iteration_matches_eigvalsh(rng, n):
    q = jnp.asarray(random_psd(rng, n))
    b = jnp.asarray(random_psd(rng, n))
    lam = float(max_eig_psd_product(q @ b))
    # exact: eigvals of Q^{1/2} B Q^{1/2}
    w, v = np.linalg.eigh(np.asarray(q))
    qsqrt = v @ np.diag(np.sqrt(w)) @ v.T
    exact = float(np.linalg.eigvalsh(qsqrt @ np.asarray(b) @ qsqrt)[-1])
    np.testing.assert_allclose(lam, exact, rtol=1e-8)


def test_remainder_dominates_sampled_radius(rng, key):
    """u_sigma = l_sigma * r must dominate l_sigma * ||S x|| for every sampled x."""
    n_s, n_u = 3, 2
    q = jnp.asarray(random_psd(rng, n_s))
    k_fb = jnp.asarray(rng.standard_normal((n_u, n_s)))
    l_mu = jnp.asarray(np.abs(rng.standard_normal(n_s)) + 0.1)
    l_sigma = jnp.asarray(np.abs(rng.standard_normal(n_s)) + 0.1)

    u_mu, u_sigma = compute_remainder_overapproximations(q, k_fb, l_mu, l_sigma)

    xs = sample_inside_ellipsoid(key, 3000, jnp.zeros(n_s), q)
    s = jnp.concatenate([jnp.eye(n_s), k_fb], axis=0)
    norms = jnp.linalg.norm(xs @ s.T, axis=-1)
    r_max = float(jnp.max(norms))
    # sampled radius never exceeds the bound
    assert np.all(np.asarray(u_sigma) >= np.asarray(l_sigma) * r_max - 1e-9)
    assert np.all(np.asarray(u_mu) >= 0.5 * np.asarray(l_mu) * r_max**2 - 1e-9)
    # ... and the bound is tight-ish (within 25% of the sampled sup)
    np.testing.assert_allclose(
        float(u_sigma[0] / l_sigma[0]), r_max, rtol=0.25
    )


def test_remainder_zero_ellipsoid_gives_zero(rng):
    n_s, n_u = 2, 1
    q = jnp.zeros((n_s, n_s))
    k_fb = jnp.asarray(rng.standard_normal((n_u, n_s)))
    u_mu, u_sigma = compute_remainder_overapproximations(
        q, k_fb, jnp.ones(n_s), jnp.ones(n_s)
    )
    np.testing.assert_allclose(np.asarray(u_mu), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(u_sigma), 0.0, atol=1e-12)


def test_grad_through_remainder(rng):
    """The SQP differentiates through the remainder bound — grads must be finite."""
    n_s, n_u = 2, 1
    q = jnp.asarray(random_psd(rng, n_s))
    k_fb = jnp.asarray(rng.standard_normal((n_u, n_s)))

    def f(qm):
        u_mu, u_sigma = compute_remainder_overapproximations(
            qm, k_fb, jnp.ones(n_s), jnp.ones(n_s)
        )
        return jnp.sum(u_mu) + jnp.sum(u_sigma)

    g = jax.grad(f)(q)
    assert np.all(np.isfinite(np.asarray(g)))
