"""Lane-major constrained CEM (solvers/cem_lanes.py) vs the portable
vmapped planner (solvers/cem.py).

The two backends draw different noise streams (the sample tensors have
different shapes), so the pins are:
  * EXACT f64 scoring parity: with n_iterations=0 both planners return the
    clipped warm mean and score it — k_ff/feasible/violation/cost must match
    to roundoff, with and without a joint performance trajectory;
  * decision/quality-level parity on full solves;
  * the config seam exposes the batched CEM entry and routes the supported
    model menu to the lane backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_exploration_tpu.envs import env_step, linearize_discretize, make_pendulum
from safe_exploration_tpu.models import make_gp_ssm
from safe_exploration_tpu.ops.linalg import dlqr
from safe_exploration_tpu.solvers.cem import CemConfig, cem_plan, cem_warm_len
from safe_exploration_tpu.solvers.cem_lanes import (
    cem_lanes_supported,
    cem_plan_lanes,
)
from safe_exploration_tpu.solvers.costs import (
    exploration_cost,
    risk_tracking_cost,
    tracking_cost,
)


def _make_setup(dtype, kern=("rbf", "rbf")):
    env = make_pendulum(dtype=dtype)
    spec = env.spec
    a, b = linearize_discretize(env)
    k_lqr, _ = dlqr(a, b, jnp.eye(spec.n_s, dtype=dtype),
                    jnp.eye(spec.n_u, dtype=dtype))
    k_fb = -k_lqr
    key = jax.random.PRNGKey(0)
    xs = (jax.random.uniform(key, (30, 2), dtype, -1.0, 1.0)
          * jnp.asarray([0.3, 1.0], dtype))
    us = jax.random.uniform(jax.random.fold_in(key, 1), (30, 1), dtype,
                            -1.0, 1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(
        kern, xs, us, resid, n_max=40,
        l_mu=jnp.full((2,), 0.05, dtype), l_sigma=jnp.full((2,), 0.02, dtype),
        log_noise=-4.0, z_scale=jnp.asarray([0.5, 2.0, 1.0], dtype),
    )
    return env, ssm, k_fb, a, b


def _plan_args(env, k_fb, a, b):
    spec = env.spec
    return (k_fb, a, b, spec.u_min, spec.u_max, spec.h_mat_obs, spec.h_obs,
            spec.h_mat_safe, spec.h_safe)


def test_cem_lane_scoring_parity_exact():
    """n_iterations=0: both planners score the clipped warm mean — exact f64
    parity of violation/cost/feasibility per instance, for tube-objective
    AND joint-perf-trajectory configurations, both stock costs."""
    dtype = jnp.float64
    env, ssm, k_fb, a, b = _make_setup(dtype)
    spec = env.spec
    args = _plan_args(env, k_fb, a, b)
    bsz = 5
    key = jax.random.PRNGKey(7)
    x0s = (jax.random.uniform(key, (bsz, 2), dtype, -1.0, 1.0)
           * jnp.asarray([0.15, 0.4], dtype))

    for n_perf in (0, 4):
        cfg = CemConfig(n_safe=3, n_iterations=0, n_samples=4, n_elites=2,
                        n_perf=n_perf, r_shared=2)
        t_total = cem_warm_len(cfg)
        warm = jax.random.uniform(
            jax.random.fold_in(key, n_perf), (bsz, t_total, 1), dtype,
            -0.8, 0.8,
        )
        for kind, cost_fn, cargs in (
            ("tracking", tracking_cost(spec.target), {"target": spec.target}),
            ("exploration", exploration_cost(), {}),
            # Σ-consuming: the lane scorer must run the perf covariance
            # recursion (want_sigma) and price it identically to the
            # portable cost (with n_perf=0 both read the safety tube q_traj)
            ("risk_tracking", risk_tracking_cost(spec.target, w_sigma=3.0),
             {"target": spec.target, "w_sigma": 3.0}),
        ):
            k_ref, feas_ref, viol_ref, info_ref = jax.vmap(
                lambda x, w: cem_plan(
                    jax.random.PRNGKey(0), ssm, x, *args, 2.0, cost_fn, cfg,
                    warm_mean=w,
                )
            )(x0s, warm)
            k_l, feas_l, viol_l, info_l = cem_plan_lanes(
                jax.random.PRNGKey(0), ssm, x0s, *args, 2.0, kind, cargs,
                cfg, warm=warm,
            )
            np.testing.assert_allclose(np.asarray(k_l), np.asarray(k_ref),
                                       atol=1e-14, err_msg=f"{n_perf}/{kind}")
            np.testing.assert_array_equal(np.asarray(feas_l),
                                          np.asarray(feas_ref))
            np.testing.assert_allclose(np.asarray(viol_l),
                                       np.asarray(viol_ref),
                                       rtol=1e-8, atol=1e-11)
            np.testing.assert_allclose(np.asarray(info_l["cost"]),
                                       np.asarray(info_ref["cost"]),
                                       rtol=1e-8, atol=1e-11)
            assert info_l["warm_next"].shape == (bsz, t_total, 1)
            assert info_l["p_traj"].shape == (bsz, 3, 2)


def test_cem_lane_full_solve_quality():
    """Full lane-CEM solves reach the same feasibility decisions as the
    vmapped portable planner and comparable objective values (different
    noise streams -> equally-good, not identical, solutions)."""
    dtype = jnp.float32
    env, ssm, k_fb, a, b = _make_setup(dtype)
    spec = env.spec
    args = _plan_args(env, k_fb, a, b)
    cfg = CemConfig(n_safe=4, n_samples=64, n_elites=8, n_iterations=5)
    bsz = 12
    key = jax.random.PRNGKey(11)
    x0s = (jax.random.uniform(key, (bsz, 2), dtype, -1.0, 1.0)
           * jnp.asarray([0.15, 0.4], dtype))
    warm = jnp.zeros((bsz, 4, 1), dtype)
    cost_fn = tracking_cost(spec.target)

    k_ref, feas_ref, _, info_ref = jax.jit(jax.vmap(
        lambda x, w, kk: cem_plan(kk, ssm, x, *args, 2.0, cost_fn, cfg,
                                  warm_mean=w)
    ))(x0s, warm, jax.random.split(jax.random.PRNGKey(3), bsz))
    k_l, feas_l, _, info_l = jax.jit(
        lambda x, w: cem_plan_lanes(
            jax.random.PRNGKey(3), ssm, x, *args, 2.0, "tracking",
            {"target": spec.target}, cfg, warm=w,
        )
    )(x0s, warm)

    feas_ref = np.asarray(feas_ref)
    feas_l = np.asarray(feas_l)
    assert (feas_ref == feas_l).mean() >= 0.9, (feas_ref, feas_l)
    both = feas_ref & feas_l
    assert both.any()
    c_ref = np.asarray(info_ref["cost"])[both]
    c_l = np.asarray(info_l["cost"])[both]
    assert c_l.mean() <= 1.2 * c_ref.mean() + 1e-3, (c_l, c_ref)


def test_cem_batch_planner_dispatch():
    """build_experiment exposes the batched CEM entry; the supported kernel
    menu (incl. composites) rides the lane backend, and the batched SafeMPC
    state machine entries exist for solver='cem'."""
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    dtype = jnp.float32
    cfg = ExperimentConfig(
        name="cem_lane_dispatch", solver="cem", n_safe=3, n_max=40,
        cem_samples=16, cem_elites=4, cem_iterations=2,
    )
    exp = build_experiment(cfg, dtype=dtype)
    assert exp["batch_planner"] is not None
    assert exp["get_action_batch"] is not None
    ssm = _make_setup(dtype, kern=("lin_rbf", "rbf"))[1]
    assert cem_lanes_supported(ssm, "tracking")
    x0s = jnp.asarray([[0.05, 0.1], [-0.04, -0.1]], dtype)
    warm = jnp.zeros((2, 3, 1), dtype)
    k_ff, feas, viol, info = exp["batch_planner"](ssm, x0s, warm)
    assert k_ff.shape == (2, 3, 1)
    assert feas.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(viol)))
    # the batched state machine runs over it
    state = exp["init_state_batch"](2)
    u, state, binfo = exp["get_action_batch"](state, ssm, x0s)
    assert u.shape == (2, 1)
    assert binfo["feasible"].shape == (2,)


def test_cem_backend_lanes_single_instance():
    """cem_backend="lanes" routes the SINGLE-instance planner through the
    lane backend (B=1, the M samples fill the lanes) with the portable
    planner's exact return contract; unsupported models fall back."""
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    dtype = jnp.float32
    cfg = ExperimentConfig(
        name="cem_lane_single", solver="cem", n_safe=3, n_max=40,
        cem_samples=32, cem_elites=8, cem_iterations=3,
        cem_backend="lanes",
    )
    exp = build_experiment(cfg, dtype=dtype)
    env, ssm = _make_setup(dtype)[:2]
    x0 = jnp.asarray([0.05, 0.1], dtype)
    warm = jnp.zeros((3, 1), dtype)
    k_ff, feas, viol, info = jax.jit(exp["planner"])(
        jax.random.PRNGKey(0), ssm, x0, warm
    )
    assert k_ff.shape == (3, 1)
    assert feas.shape == () and viol.shape == ()
    assert info["warm_next"].shape == (3, 1)
    assert bool(jnp.isfinite(viol))
    # the episodic state machine consumes it (make_safempc contract)
    state = exp["init_state"]()
    u, state, ainfo = exp["get_action"](jax.random.PRNGKey(1), state, ssm, x0)
    assert u.shape == (1,)

    # unsupported model (ff factors) -> portable fallback, same contract
    ssm_ff = ssm.replace(gp=ssm.gp.replace(precision="ff"))
    k2, f2, v2, _ = exp["planner"](jax.random.PRNGKey(0), ssm_ff, x0, warm)
    assert k2.shape == (3, 1) and f2.shape == () and v2.shape == ()
