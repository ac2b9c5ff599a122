"""Sparse-GP models on the lane-major batched solver backend.

The inducing-point tier (models/sparse_gp.SparseGPSSM — BASELINE cfg 4,
reference ``SimpleGPModel`` with a ``Z`` set / GPy ``SparseGPRegression``,
SURVEY.md §2.3) rides the SAME lane-major solve as the exact GP: its
solve-free posterior (mean = alpha @ k(Z, z), var = kzz - k' vmat k) maps
onto the lane contractions with the m inducing rows as the support set.
These tests pin:
  * lane predict == sparse_gp_predict_mean_jac (f64 exact, z_scale chain);
  * lanes_supported/cem_lanes_supported accept the sparse family;
  * the batched lane solve reaches the same feasibility decisions as the
    vmapped portable solver on a sparse model;
  * the lane EPISODE runner guard still excludes sparse models (per-lane
    online-append buffers are exact-GP only — runtime/config note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.envs import env_step, linearize_discretize, make_pendulum
from safe_exploration_tpu.models.sparse_gp import (
    make_sparse_gp_ssm,
    sparse_gp_predict_mean_jac,
    sparse_gp_refit,
)
from safe_exploration_tpu.ops.linalg import dlqr
from safe_exploration_tpu.solvers.costs import tracking_cost
from safe_exploration_tpu.solvers.sqp import (
    SqpConfig,
    make_sqp_planner,
    sqp_warm_len,
)
from safe_exploration_tpu.solvers.sqp_lanes import (
    _gp_predict_lanes,
    lanes_supported,
    make_sqp_lane_solver,
)


def _make_setup(dtype, n_inducing=24):
    env = make_pendulum(dtype=dtype)
    spec = env.spec
    a, b = linearize_discretize(env)
    k_lqr, _ = dlqr(a, b, jnp.eye(spec.n_s, dtype=dtype),
                    jnp.eye(spec.n_u, dtype=dtype))
    k_fb = -k_lqr

    key = jax.random.PRNGKey(0)
    n_data = 32
    xs = (jax.random.uniform(key, (n_data, 2), dtype, -1.0, 1.0)
          * jnp.asarray([0.3, 1.0], dtype))
    us = jax.random.uniform(jax.random.fold_in(key, 1), (n_data, 1), dtype,
                            -1.0, 1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_sparse_gp_ssm(
        ("rbf", "rbf"), xs, us, resid, n_max=48, n_inducing=n_inducing,
        l_mu=jnp.full((2,), 0.05, dtype), l_sigma=jnp.full((2,), 0.02, dtype),
        log_noise=-4.0,
        z_scale=jnp.asarray([0.5, 2.0, 1.0], dtype),
    )
    # calibrate signal variance to the ~1e-3-scale residuals (same recipe as
    # tests/test_sqp_lanes._make_setup) so random x0s are mostly feasible
    params = tuple(
        {**p, "log_sf": jnp.asarray(-3.0, dtype)} for p in ssm.sgp.params
    )
    ssm = ssm.replace(sgp=sparse_gp_refit(ssm.sgp.replace(params=params)))
    return env, ssm, k_fb, a, b


@pytest.fixture(scope="module")
def setup():
    return _make_setup(jnp.float64)


@pytest.fixture(scope="module")
def setup32():
    return _make_setup(jnp.float32)


def test_sparse_lane_predict_parity(setup):
    """Lane predict on a SparseGPSSM == sparse_gp_predict_mean_jac (f64)."""
    _, ssm, _, _, _ = setup
    key = jax.random.PRNGKey(7)
    z = jax.random.uniform(key, (16, 3), jnp.float64, -0.5, 0.5)
    zz = z / ssm.z_scale
    mu, var, jac = _gp_predict_lanes(ssm, z.T, want_jac=True)
    for i in range(z.shape[0]):
        mu_ref, var_ref, jac_ref = sparse_gp_predict_mean_jac(ssm.sgp, zz[i])
        np.testing.assert_allclose(np.asarray(mu[:, i]), np.asarray(mu_ref),
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.asarray(var[:, i]), np.asarray(var_ref),
                                   rtol=1e-9, atol=1e-13)
        np.testing.assert_allclose(
            np.asarray(jac[:, :, i]), np.asarray(jac_ref / ssm.z_scale),
            rtol=1e-9, atol=1e-12,
        )


def test_sparse_supported_predicates(setup):
    """The support predicates accept the sparse family for the solve tiers
    but the lane EPISODE runner stays exact-GP only."""
    from safe_exploration_tpu.solvers.cem_lanes import cem_lanes_supported

    _, ssm, _, _, _ = setup
    cfg = SqpConfig(n_safe=5)
    assert lanes_supported(ssm, cfg, "tracking")
    assert lanes_supported(ssm, cfg, "exploration")
    assert not lanes_supported(ssm, SqpConfig(n_safe=5, opt_k_fb=True),
                               "tracking")
    assert cem_lanes_supported(ssm, "tracking")

    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    exp = build_experiment(
        ExperimentConfig(name="t", solver="sqp", n_safe=3, n_max=16),
        dtype=jnp.float64,
    )
    # sparse rides the batch PLANNER but not the per-lane episode runner
    assert exp["lane_batch_supported"] is not None
    assert not exp["lane_batch_supported"](ssm)


def test_sparse_lane_solver_matches_portable(setup32):
    """Batched lane solve on a SparseGPSSM: same feasibility decisions and
    comparable solutions as vmapping the portable planner (the pre-existing
    sparse path) — mirrors test_sqp_lanes.test_lane_solver_matches_portable."""
    env, ssm, k_fb, a, b = setup32
    spec = env.spec
    # c_safety=1.8, not the exact-GP test's 2.0: the VFE posterior variance
    # has an x0-INDEPENDENT floor (kzz - qzz stays ~5e-5 even on data with
    # m=24 < n=32 inducing points), so at 2.0 the 5-step tube exceeds the
    # safe polytope for EVERY x0 (viol ~0.01-0.03, measured both f32 and
    # f64, portable and lane alike) and the parity assertions would compare
    # empty feasible sets. At 1.8 the same distribution is fully feasible —
    # the cliff between them is the floor, not solver quality.
    cfg = SqpConfig(n_safe=5, c_safety=1.8, n_outer=8, n_inner=3, n_polish=3,
                    n_rescue_outer=2)
    cost_fn = tracking_cost(spec.target)
    planner = make_sqp_planner(env, k_fb, a, b, cost_fn, cfg)
    lane_solver = make_sqp_lane_solver(
        env, k_fb, a, b, "tracking", {"target": spec.target}, cfg
    )

    bsz = 8
    key = jax.random.PRNGKey(11)
    x0s = (jax.random.uniform(key, (bsz, 2), jnp.float32, -1.0, 1.0)
           * jnp.asarray([0.15, 0.4], jnp.float32))
    warm = jnp.zeros((bsz, sqp_warm_len(cfg), 1), jnp.float32)

    k_ref, feas_ref, viol_ref, info_ref = jax.jit(jax.vmap(
        lambda x, w: planner(jax.random.PRNGKey(0), ssm, x, w)
    ))(x0s, warm)
    k_lane, feas_lane, viol_lane, info_lane = jax.jit(lane_solver)(
        ssm, x0s, warm
    )

    assert k_lane.shape == k_ref.shape
    feas_ref = np.asarray(feas_ref)
    feas_lane = np.asarray(feas_lane)
    agree = (feas_ref == feas_lane).mean()
    assert agree >= 0.85, (feas_ref, feas_lane)
    assert feas_lane.mean() >= feas_ref.mean() - 1e-6
    both = feas_ref & feas_lane
    assert both.any()
    c_ref = np.asarray(info_ref["cost"])[both]
    c_lane = np.asarray(info_lane["cost"])[both]
    assert (c_lane <= c_ref + 0.1 * np.abs(c_ref) + 1e-3).mean() >= 0.75
