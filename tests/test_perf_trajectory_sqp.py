"""Joint safety+performance trajectory in the SQP planner.

Parity: reference ``safempc_simple.py`` carries a length-n_perf performance
trajectory (cheap Gaussian propagation, carries the objective) sharing the
first r controls with the hard-constrained safety tube (SURVEY.md §2.5);
``uncertainty_propagation_casadi.py`` provides the propagation (§2.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.envs import env_step, make_pendulum
from safe_exploration_tpu.models import make_gp_ssm
from safe_exploration_tpu.models.gp import gp_refit
from safe_exploration_tpu.reachability.propagation import multi_step_propagation
from safe_exploration_tpu.runtime.config import ExperimentConfig, build_experiment
from safe_exploration_tpu.solvers.sqp import SqpConfig, sqp_warm_len


def _calibrated_ssm(exp, n_data=12, n_max=32, dtype=jnp.float64):
    env, a, b = exp["env"], exp["a"], exp["b"]
    key = jax.random.PRNGKey(0)
    xs = (
        jax.random.uniform(key, (n_data, 2), dtype, -1.0, 1.0)
        * jnp.asarray([0.3, 1.0], dtype)
    )
    us = jax.random.uniform(jax.random.fold_in(key, 1), (n_data, 1), dtype, -1.0, 1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(
        exp["kern_types"], xs, us, resid, n_max=n_max,
        l_mu=jnp.full((2,), 0.05, dtype), l_sigma=jnp.full((2,), 0.02, dtype),
        log_noise=-4.0,
    )
    params = tuple({**p, "log_sf": jnp.asarray(-3.0, dtype)} for p in ssm.gp.params)
    return ssm.replace(gp=gp_refit(ssm.gp.replace(params=params)))


@pytest.fixture(scope="module")
def perf_exp():
    cfg = ExperimentConfig(
        name="t", solver="sqp", n_safe=3, n_perf=6, r_shared=2, n_max=32,
        sqp_outer=5, sqp_inner=3,
    )
    exp = build_experiment(cfg, dtype=jnp.float64)
    ssm = _calibrated_ssm(exp)
    return cfg, exp, ssm


def test_warm_len_accounting():
    assert sqp_warm_len(SqpConfig(n_safe=5, n_perf=0)) == 5
    assert sqp_warm_len(SqpConfig(n_safe=5, n_perf=10, r_shared=2)) == 13
    assert sqp_warm_len(SqpConfig(n_safe=5, n_perf=3, r_shared=5)) == 5
    assert sqp_warm_len(SqpConfig(n_safe=5, n_perf=1, r_shared=1)) == 5


def test_perf_solve_feasible_and_shapes(perf_exp):
    cfg, exp, ssm = perf_exp
    x0 = jnp.asarray([0.05, 0.1], jnp.float64)
    warm = jnp.zeros((sqp_warm_len(SqpConfig(
        n_safe=cfg.n_safe, n_perf=cfg.n_perf, r_shared=cfg.r_shared
    )), 1), jnp.float64)
    k_ff, feasible, violation, info = jax.jit(exp["planner"])(
        jax.random.PRNGKey(0), ssm, x0, warm
    )
    assert k_ff.shape == (cfg.n_safe, 1)
    assert info["warm_next"].shape == (cfg.n_safe + cfg.n_perf - cfg.r_shared, 1)
    assert bool(feasible), float(violation)
    assert bool(jnp.isfinite(info["cost"]))


def test_perf_objective_is_the_perf_trajectory_cost(perf_exp):
    """info['cost'] must equal the tracking cost evaluated on the propagated
    performance trajectory of the returned controls."""
    cfg, exp, ssm = perf_exp
    x0 = jnp.asarray([0.05, 0.1], jnp.float64)
    warm = jnp.zeros((cfg.n_safe + cfg.n_perf - cfg.r_shared, 1), jnp.float64)
    k_ff, _, _, info = exp["planner"](jax.random.PRNGKey(0), ssm, x0, warm)
    u_full = info["warm_next"]
    u_perf = jnp.concatenate([k_ff[: cfg.r_shared], u_full[cfg.n_safe:]], axis=0)
    p_traj, sig_traj, var_traj = multi_step_propagation(
        ssm, x0, u_perf, exp["a"], exp["b"], method=cfg.perf_trajectory
    )
    expected = exp["cost_fn"](p_traj, sig_traj, var_traj, u_perf)
    np.testing.assert_allclose(float(info["cost"]), float(expected), rtol=1e-10)


def test_perf_get_action_runs_with_extended_warm(perf_exp):
    cfg, exp, ssm = perf_exp
    x0 = jnp.asarray([0.03, 0.05], jnp.float64)
    state = exp["init_state"]()
    assert state.warm_mean.shape == (cfg.n_safe + cfg.n_perf - cfg.r_shared, 1)
    u, state2, info = jax.jit(exp["get_action"])(
        jax.random.PRNGKey(1), state, ssm, x0
    )
    assert u.shape == (1,)
    assert state2.warm_mean.shape == state.warm_mean.shape
    assert bool(jnp.all(jnp.isfinite(u)))


def test_mean_equivalent_method_also_solves(perf_exp):
    cfg, exp, ssm = perf_exp
    cfg2 = ExperimentConfig(
        name="t2", solver="sqp", n_safe=3, n_perf=6, r_shared=2, n_max=32,
        sqp_outer=5, sqp_inner=3, perf_trajectory="mean_equivalent",
    )
    exp2 = build_experiment(cfg2, dtype=jnp.float64)
    x0 = jnp.asarray([0.05, 0.1], jnp.float64)
    warm = jnp.zeros((cfg2.n_safe + cfg2.n_perf - cfg2.r_shared, 1), jnp.float64)
    k_ff, feasible, violation, info = exp2["planner"](
        jax.random.PRNGKey(0), ssm, x0, warm
    )
    assert bool(feasible), float(violation)
    assert bool(jnp.isfinite(info["cost"]))


def test_risk_cost_consumes_propagated_covariance(perf_exp):
    """solvers/costs.risk_tracking_cost must read the propagated Sigma: at a
    FIXED control sequence the taylor and mean_equivalent recursions give
    different covariances, hence different risk costs (VERDICT r4 missing #3:
    previously NO registered objective consumed sigma_traj, so the
    perf_trajectory knob was cosmetic)."""
    from safe_exploration_tpu.solvers.costs import risk_tracking_cost

    _, exp, ssm = perf_exp
    x0 = jnp.asarray([0.05, 0.1], jnp.float64)
    u_perf = 0.3 * jnp.sin(jnp.arange(6.0, dtype=jnp.float64))[:, None]
    cost_fn = risk_tracking_cost(exp["env"].spec.target, w_sigma=1.0)
    vals = {}
    for method in ("taylor", "mean_equivalent"):
        p, s, v = multi_step_propagation(
            ssm, x0, u_perf, exp["a"], exp["b"], method=method
        )
        vals[method] = float(cost_fn(p, s, v, u_perf))
        # w_sigma actually prices Sigma: zeroing it changes the value
        base = risk_tracking_cost(exp["env"].spec.target, w_sigma=0.0)
        assert abs(vals[method] - float(base(p, s, v, u_perf))) > 1e-10
    assert abs(vals["taylor"] - vals["mean_equivalent"]) > 1e-10


def test_risk_cost_taylor_vs_mean_equivalent_solve_differently(perf_exp):
    """End-to-end observability of the propagation method: under the
    risk_tracking objective the SQP's optimal plans and objective values
    DIFFER between perf_trajectory="taylor" and "mean_equivalent" (they are
    pinned identical for the Σ-free stock costs)."""
    _, _, ssm = perf_exp

    def solve(method):
        cfg = ExperimentConfig(
            name=f"risk_{method}", solver="sqp", objective="risk_tracking",
            w_sigma=25.0, n_safe=3, n_perf=6, r_shared=2, n_max=32,
            sqp_outer=6, sqp_inner=4, perf_trajectory=method,
        )
        exp = build_experiment(cfg, dtype=jnp.float64)
        x0 = jnp.asarray([0.05, 0.1], jnp.float64)
        warm = jnp.zeros((3 + 6 - 2, 1), jnp.float64)
        k_ff, feas, viol, info = exp["planner"](
            jax.random.PRNGKey(0), ssm, x0, warm
        )
        assert bool(feas), float(viol)
        return np.asarray(info["warm_next"]), float(info["cost"])

    u_taylor, c_taylor = solve("taylor")
    u_meaneq, c_meaneq = solve("mean_equivalent")
    assert abs(c_taylor - c_meaneq) > 1e-9
    assert float(np.max(np.abs(u_taylor - u_meaneq))) > 1e-9


def test_risk_cost_rides_the_lane_backend_exact_parity(perf_exp):
    """risk_tracking is lane-SUPPORTED: ``_rollout_perf_lanes(want_sigma=
    True)`` runs the lane-major form of the portable Σ recursion, so (a) the
    lane predicates accept it, (b) the packed lane objective equals the
    portable objective EXACTLY (f64) at random decision vectors for BOTH
    propagation methods, and (c) the two methods genuinely differ on lanes —
    the same observability the portable path pins."""
    from safe_exploration_tpu.solvers.cem_lanes import cem_lanes_supported
    from safe_exploration_tpu.solvers.costs import risk_tracking_cost
    from safe_exploration_tpu.solvers.sqp import _build_constraint_fn
    from safe_exploration_tpu.solvers.sqp_lanes import (
        _cost_lanes,
        _pack_y,
        _rollout_lanes,
        _rollout_perf_lanes,
        lanes_supported,
    )

    _, exp, ssm = perf_exp
    scfg = SqpConfig(n_safe=3)
    assert lanes_supported(ssm, scfg, "risk_tracking")
    assert cem_lanes_supported(ssm, "risk_tracking")

    env, a, b, k_fb = exp["env"], exp["a"], exp["b"], exp["k_fb"]
    spec = env.spec
    t_len, n_perf, r = 3, 6, 2
    bsz = 5
    key = jax.random.PRNGKey(23)
    x0s = (jax.random.uniform(key, (bsz, 2), jnp.float64, -1.0, 1.0)
           * jnp.asarray([0.15, 0.4], jnp.float64))
    n_var = t_len + n_perf - r
    u = jax.random.uniform(jax.random.fold_in(key, 1), (bsz, n_var),
                           jnp.float64, -0.5, 0.5)
    u_flat = jnp.moveaxis(u, 0, -1)
    x0_rows = [x0s.T[i] for i in range(2)]
    s_lift = jnp.concatenate([jnp.eye(2, dtype=jnp.float64), k_fb], axis=0)
    bmat = s_lift.T @ s_lift
    k_fb_all = jnp.tile(k_fb[None], (t_len, 1, 1))
    w_sigma = 7.0
    cost_fn = risk_tracking_cost(spec.target, w_sigma=w_sigma)
    args = {"target": spec.target, "w_sigma": w_sigma}

    vals = {}
    for method in ("taylor", "mean_equivalent"):
        cfg2 = SqpConfig(n_safe=t_len, n_perf=n_perf, r_shared=r,
                         perf_method=method)
        perf = _rollout_perf_lanes(ssm, u_flat, x0_rows, a, b, cfg2, r, 1,
                                   t_len, want_sigma=True)
        y = _pack_y(*_rollout_lanes(ssm, u_flat, x0_rows, k_fb, a, b, cfg2,
                                    bmat), perf=perf)
        c_lane = _cost_lanes("risk_tracking", args, y, u_flat, t_len, 2, 1,
                             n_perf=n_perf, r=r)
        for i in range(bsz):
            objective = _build_constraint_fn(
                ssm, x0s[i], k_fb_all, a, b, cfg2,
                spec.h_mat_obs, spec.h_obs, spec.h_mat_safe, spec.h_safe,
                cost_fn,
            )[0]
            np.testing.assert_allclose(
                float(c_lane[i]), float(objective(u[i])),
                rtol=1e-9, atol=1e-12, err_msg=f"{method}/lane {i}",
            )
        vals[method] = np.asarray(c_lane)
    assert float(np.max(np.abs(
        vals["taylor"] - vals["mean_equivalent"]
    ))) > 1e-10


def test_risk_cost_batched_solve_through_lane_backend():
    """End-to-end: build_experiment's batched planner with objective=
    "risk_tracking" now routes through the lane solver (no portable
    fallback) and its solves match the vmapped portable planner at the
    decision level — plus the n_perf == 0 form, where risk prices the
    SAFETY tube shapes q_traj on both paths."""
    cfg = ExperimentConfig(
        name="risk_batch_lanes", solver="sqp", objective="risk_tracking",
        w_sigma=5.0, n_safe=3, n_perf=6, r_shared=2, n_max=32,
        sqp_outer=4, sqp_inner=2,
    )
    exp = build_experiment(cfg, dtype=jnp.float64)
    ssm = _calibrated_ssm(exp)
    x0s = jnp.asarray([[0.05, 0.1], [0.02, -0.05], [-0.04, 0.2]],
                      jnp.float64)
    warm = jnp.zeros((3, 3 + 6 - 2, 1), jnp.float64)
    k_lane, feas, viol, info = exp["batch_planner"](ssm, x0s, warm)
    assert k_lane.shape == (3, 3, 1)
    assert bool(jnp.all(jnp.isfinite(k_lane)))
    # portable reference: the vmapped single-instance planner
    k_ref, feas_ref, _, info_ref = jax.vmap(
        lambda x, w: exp["planner"](jax.random.PRNGKey(0), ssm, x, w)
    )(x0s, warm)
    assert np.asarray(feas).tolist() == np.asarray(feas_ref).tolist()
    both = np.asarray(feas) & np.asarray(feas_ref)
    if both.any():
        c_l = np.asarray(info["cost"])[both]
        c_r = np.asarray(info_ref["cost"])[both]
        assert (c_l <= c_r + 0.1 * np.abs(c_r) + 1e-6).mean() >= 0.6

    # n_perf == 0: risk reads the safety tube's q_traj on both backends
    cfg0 = ExperimentConfig(
        name="risk_batch_lanes0", solver="sqp", objective="risk_tracking",
        w_sigma=5.0, n_safe=3, n_max=32, sqp_outer=3, sqp_inner=2,
    )
    exp0 = build_experiment(cfg0, dtype=jnp.float64)
    warm0 = jnp.zeros((3, 3, 1), jnp.float64)
    k0, feas0, _, _ = exp0["batch_planner"](ssm, x0s, warm0)
    assert k0.shape == (3, 3, 1)
    assert bool(jnp.all(jnp.isfinite(k0)))


def test_opt_k_fb_joint_gain_optimization(perf_exp):
    """SURVEY.md §2.5 [M]: optional joint optimization of per-stage feedback
    gains. More decision freedom must not hurt the achieved violation, and the
    gain deltas must stay inside their box."""
    from safe_exploration_tpu.envs import make_pendulum
    from safe_exploration_tpu.runtime.config import build_experiment
    from safe_exploration_tpu.solvers.sqp import make_sqp_planner

    cfg, exp, ssm = perf_exp
    x0 = jnp.asarray([0.12, 0.3], jnp.float64)   # nontrivial start

    base_cfg = SqpConfig(n_safe=3, c_safety=2.0, n_outer=6, n_inner=4)
    fb_cfg = base_cfg._replace(opt_k_fb=True, k_fb_bound=1.0)
    mk = lambda scfg: make_sqp_planner(
        exp["env"], exp["k_fb"], exp["a"], exp["b"], exp["cost_fn"], scfg
    )
    warm = jnp.zeros((3, 1), jnp.float64)
    k_base, feas_b, viol_b, info_b = mk(base_cfg)(None, ssm, x0, warm)
    k_fb_opt, feas_f, viol_f, info_f = mk(fb_cfg)(None, ssm, x0, warm)
    assert "k_fb_delta" in info_f and info_f["k_fb_delta"].shape == (3, 1, 2)
    assert bool(jnp.all(jnp.abs(info_f["k_fb_delta"]) <= 1.0 + 1e-9))
    assert float(viol_f) <= float(viol_b) + 1e-8
    assert bool(jnp.all(jnp.isfinite(k_fb_opt)))


def test_shift_duals_layout():
    from safe_exploration_tpu.solvers.sqp import shift_duals

    n_safe, n_obs, n_term = 3, 4, 2
    lam = jnp.arange(n_safe * n_obs + n_term, dtype=jnp.float64)
    out = shift_duals(lam, n_safe, n_obs)
    # stage 0 <- old stage 1, stage 1 <- old stage 2, stage 2 duplicated
    np.testing.assert_array_equal(out[:4], lam[4:8])
    np.testing.assert_array_equal(out[4:8], lam[8:12])
    np.testing.assert_array_equal(out[8:12], lam[8:12])
    np.testing.assert_array_equal(out[12:], lam[12:])


def test_dual_warm_start_carried_by_safempc(perf_exp):
    """With an SQP planner the SafeMPC state carries multipliers; a feasible
    solve must store (shifted) nonnegative duals of the right size."""
    cfg, exp, ssm = perf_exp
    state = exp["init_state"]()
    n_duals = 3 * exp["env"].spec.h_obs.shape[0] + exp["env"].spec.h_safe.shape[0]
    assert state.lam.shape == (n_duals,)
    _, state2, info = exp["get_action"](
        jax.random.PRNGKey(0), state, ssm, jnp.asarray([0.03, 0.05], jnp.float64)
    )
    assert bool(info["feasible"])
    assert state2.lam.shape == (n_duals,)
    assert bool(jnp.all(state2.lam >= 0.0))
