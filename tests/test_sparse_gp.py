"""Sparse (inducing-point) GP tests: exactness when Z = X, VFE bound dominance,
data-update consistency, hyperopt progress (BASELINE config 4 groundwork)."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_exploration_tpu.models import gp_init, gp_nll, gp_predict
from safe_exploration_tpu.models.sparse_gp import (
    sparse_gp_elbo,
    sparse_gp_fit,
    sparse_gp_init,
    sparse_gp_predict,
    sparse_gp_update_data,
)


def make_data(rng, n=40, d=3, e=2):
    x = rng.standard_normal((n, d))
    y = np.stack([np.sin(x @ rng.standard_normal(d)) for _ in range(e)], -1)
    y += 0.01 * rng.standard_normal((n, e))
    return jnp.asarray(x), jnp.asarray(y)


def test_collapses_to_exact_gp_when_z_is_x(rng):
    x, y = make_data(rng)
    dense = gp_init(("rbf", "rbf"), x, y, n_max=40, log_noise=-2.0)
    sparse = sparse_gp_init(
        ("rbf", "rbf"), x, y, n_max=40, n_inducing=40, log_noise=-2.0, z=x
    )
    for _ in range(5):
        zq = jnp.asarray(rng.standard_normal(3))
        md, vd = gp_predict(dense, zq)
        ms, vs = sparse_gp_predict(sparse, zq)
        # tolerance reflects the differing jitter placement (dense: on the noise
        # diagonal; sparse: on Kuu) — not a formulation error
        np.testing.assert_allclose(np.asarray(ms), np.asarray(md), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vd), rtol=1e-3, atol=1e-6)


def test_vfe_bound_dominated_by_exact_nll(rng):
    """-ELBO >= exact NLL (Titsias bound), approaching equality as m -> n."""
    x, y = make_data(rng, n=30)
    dense = gp_init(("rbf", "rbf"), x, y, n_max=30, log_noise=-2.0)
    exact = float(gp_nll(dense.params, dense.log_noise, dense))
    prev_gap = None
    for m in (5, 15, 30):
        sparse = sparse_gp_init(
            ("rbf", "rbf"), x, y, n_max=30, n_inducing=m, log_noise=-2.0,
            z=x[:m],
        )
        bound = float(sparse_gp_elbo(sparse.params, sparse.log_noise, sparse))
        assert bound >= exact - 1e-6, (m, bound, exact)
        gap = bound - exact
        if prev_gap is not None:
            assert gap <= prev_gap + 1e-6  # monotone improvement with more inducing
        prev_gap = gap
    assert abs(prev_gap) < 5e-3  # m = n: tight up to Kuu jitter


def test_update_data_matches_from_scratch(rng):
    x, y = make_data(rng, n=20)
    x2, y2 = make_data(rng, n=8)
    z = x[:10]
    s1 = sparse_gp_init(("rbf", "rbf"), x, y, n_max=40, n_inducing=10, z=z)
    s1 = sparse_gp_update_data(s1, x2, y2)
    s2 = sparse_gp_init(
        ("rbf", "rbf"), jnp.concatenate([x, x2]), jnp.concatenate([y, y2]),
        n_max=40, n_inducing=10, z=z,
    )
    zq = jnp.asarray(rng.standard_normal(3))
    m1, v1 = sparse_gp_predict(s1, zq)
    m2, v2 = sparse_gp_predict(s2, zq)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-7)


def test_fit_decreases_negative_elbo(rng):
    x, y = make_data(rng, n=50)
    sgp = sparse_gp_init(("rbf", "rbf"), x, y, n_max=64, n_inducing=16, log_noise=-1.0)
    before = float(sparse_gp_elbo(sgp.params, sgp.log_noise, sgp))
    sgp2 = jax.jit(lambda s: sparse_gp_fit(s, iters=100))(sgp)
    after = float(sparse_gp_elbo(sgp2.params, sgp2.log_noise, sgp2))
    assert after < before - 1.0


def test_predict_jacobian_through_sparse(rng):
    """jacfwd must flow through the sparse posterior (reachability needs it)."""
    x, y = make_data(rng, n=25)
    sgp = sparse_gp_init(("rbf", "rbf"), x, y, n_max=32, n_inducing=12)
    zq = jnp.asarray(rng.standard_normal(3) * 0.3)
    jac = jax.jacfwd(lambda z: sparse_gp_predict(sgp, z)[0])(zq)
    eps = 1e-6
    for i in range(3):
        dz = jnp.zeros(3).at[i].set(eps)
        fd = (sparse_gp_predict(sgp, zq + dz)[0] - sparse_gp_predict(sgp, zq - dz)[0]) / (2 * eps)
        np.testing.assert_allclose(np.asarray(jac[:, i]), np.asarray(fd), rtol=1e-4, atol=1e-8)
