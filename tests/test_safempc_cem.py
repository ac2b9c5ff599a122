"""Integration tests for the CEM SafeMPC slice (SURVEY.md §4.4: build env + tiny
GP, run get_action steps, assert solver returns, feasibility semantics, fallback
path triggers when constraints are impossible)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.runtime.config import ExperimentConfig, build_experiment
from safe_exploration_tpu.runtime.episode import (
    collect_initial_data,
    rollout_episode,
    run_episodic,
)
from safe_exploration_tpu.models import make_gp_ssm


def small_cfg(**kw):
    base = dict(
        n_safe=4, cem_samples=48, cem_elites=8, cem_iterations=4,
        n_max=96, n_ep=2, n_steps=12, n_init_samples=25, hyp_iters=120,
    )
    base.update(kw)
    return ExperimentConfig(**base)


def build_ssm(exp, key, n_samples=25):
    from safe_exploration_tpu.models import ssm_fit
    from safe_exploration_tpu.models.ssm import estimate_lipschitz

    xs, us, resid = collect_initial_data(
        exp["env"], key, n_samples, exp["a"], exp["b"], exp["k_fb"]
    )
    ssm = make_gp_ssm(
        exp["kern_types"], xs, us, resid,
        n_max=exp["cfg"].n_max, l_mu=exp["l_mu"], l_sigma=exp["l_sigma"],
        log_noise=-4.0,
    )
    ssm = ssm_fit(ssm, iters=120)
    return estimate_lipschitz(ssm, ssm.gp.x)


def test_get_action_feasible_from_safe_state(key):
    exp = build_experiment(small_cfg(), dtype=jnp.float64)
    ssm = build_ssm(exp, key)
    x0 = jnp.asarray([0.05, 0.0], jnp.float64)
    u, state, info = jax.jit(exp["get_action"])(key, exp["init_state"](), ssm, x0)
    assert bool(info["feasible"])
    assert not bool(info["used_fallback"])
    assert np.all(np.abs(np.asarray(u)) <= np.asarray(exp["env"].spec.u_max) + 1e-9)
    assert int(state.plan_idx) == 1 and int(state.n_fail) == 0


def test_fallback_chain_on_impossible_constraints(key):
    """Shrink the state polytope to a sliver so no tube fits -> the controller
    must walk the fallback chain (stored plan, then terminal LQR) and count
    failures (SURVEY.md §5.3)."""
    exp = build_experiment(small_cfg(), dtype=jnp.float64)
    ssm = build_ssm(exp, key)
    x0 = jnp.asarray([0.05, 0.0], jnp.float64)

    # first a feasible solve to store a plan
    u, state, info = exp["get_action"](key, exp["init_state"](), ssm, x0)
    assert bool(info["feasible"])

    # now make constraints impossible by shrinking h_obs to ~zero box
    env2 = exp["env"]._replace(
        spec=exp["env"].spec.replace(h_obs=1e-6 * jnp.ones_like(exp["env"].spec.h_obs))
    )
    cfg2 = build_experiment(small_cfg(), dtype=jnp.float64)  # same planner shapes
    # rebuild planner against impossible polytope
    from safe_exploration_tpu.solvers import CemConfig, cem_plan, SafeMPCConfig, make_safempc, tracking_cost
    spec2 = env2.spec
    cem_cfg = CemConfig(n_safe=4, n_samples=48, n_elites=8, n_iterations=4)
    cost_fn = tracking_cost(spec2.target)

    def planner(k, s, x, w):
        return cem_plan(k, s, x, exp["k_fb"], exp["a"], exp["b"],
                        spec2.u_min, spec2.u_max, spec2.h_mat_obs, spec2.h_obs,
                        spec2.h_mat_safe, spec2.h_safe, 2.0, cost_fn, cem_cfg, w)

    init2, get2, _, _ = make_safempc(env2, SafeMPCConfig(n_safe=4), planner)

    state = state.replace(warm_mean=state.warm_mean)  # keep stored plan
    n_fail_seq = []
    x = x0
    for i in range(6):
        k_i = jax.random.fold_in(key, i)
        u, state, info = get2(k_i, state, ssm, x)
        assert not bool(info["feasible"])
        assert bool(info["used_fallback"])
        n_fail_seq.append(int(state.n_fail))
        assert np.all(np.isfinite(np.asarray(u)))
    # consecutive failures accumulate; stored plan exhausted -> terminal LQR
    assert n_fail_seq == [1, 2, 3, 4, 5, 6]
    assert int(state.plan_idx) == 4  # saturated at horizon


@pytest.mark.parametrize("env_name", ["pendulum", "cartpole"])
def test_episodic_loop_zero_violations(env_name, key):
    cfg = small_cfg(env=env_name, kern_types=("rbf",) if env_name == "cartpole" else ("rbf", "rbf"))
    exp = build_experiment(cfg, dtype=jnp.float64)
    out = run_episodic(
        exp["env"], exp["init_state"], exp["get_action"],
        exp["a"], exp["b"], exp["k_fb"],
        key=key, kern_types=exp["kern_types"], n_max=cfg.n_max,
        l_mu=exp["l_mu"], l_sigma=exp["l_sigma"],
        n_ep=cfg.n_ep, n_steps=cfg.n_steps,
        n_init_samples=cfg.n_init_samples, hyp_iters=cfg.hyp_iters,
    )
    s = out["series"]
    assert sum(s["violations"]) == 0, f"safety violated: {s['violations']}"
    assert all(f > 0.4 for f in s["feasibility_rate"]), s["feasibility_rate"]
    assert s["n_data"][-1] > s["n_data"][0]


def test_rollout_episode_is_jittable_and_deterministic(key):
    exp = build_experiment(small_cfg(), dtype=jnp.float64)
    ssm = build_ssm(exp, key)
    x0 = jnp.asarray([0.03, 0.0], jnp.float64)
    from functools import partial
    ro = jax.jit(partial(rollout_episode, exp["env"], exp["get_action"],
                         n_steps=8, a=exp["a"], b=exp["b"]))
    t1, _, _ = ro(key, exp["init_state"](), ssm, x0)
    t2, _, _ = ro(key, exp["init_state"](), ssm, x0)
    np.testing.assert_array_equal(np.asarray(t1["x"]), np.asarray(t2["x"]))


def test_feasibility_tolerance_unified_across_planners():
    """VERDICT r2 weak #5: CEM and SQP must apply the SAME feasibility
    standard (IPOPT constr_viol_tol semantics). Defaults are equal, the
    experiment config carries one knob for both, and the CEM gate actually
    uses it (a tube infeasible at the old hard-coded 1e-6 but within feas_tol
    classifies as feasible)."""
    from safe_exploration_tpu.solvers import CemConfig
    from safe_exploration_tpu.solvers.sqp import SqpConfig

    assert CemConfig().feas_tol == SqpConfig().feas_tol == 1e-4
    cfg = ExperimentConfig(name="tol_t", feas_tol=3e-3)
    assert cfg.feas_tol == 3e-3

    # functional: with an absurdly loose gate, even an impossible polytope
    # classifies feasible -> the flag is derived from cfg.feas_tol, not a
    # hard-coded constant
    exp = build_experiment(small_cfg(), dtype=jnp.float64)
    ssm = build_ssm(exp, jax.random.PRNGKey(11))
    from safe_exploration_tpu.solvers import CemConfig as CC, cem_plan, tracking_cost

    spec = exp["env"].spec
    h_obs_tiny = 1e-6 * jnp.ones_like(spec.h_obs)
    loose = CC(n_safe=4, n_samples=32, n_elites=8, n_iterations=2,
               feas_tol=1e9)
    strict = loose._replace(feas_tol=0.0)
    x0 = jnp.asarray([0.05, 0.0], jnp.float64)
    cost_fn = tracking_cost(spec.target)
    args = (jax.random.PRNGKey(0), ssm, x0, exp["k_fb"], exp["a"], exp["b"],
            spec.u_min, spec.u_max, spec.h_mat_obs, h_obs_tiny,
            spec.h_mat_safe, spec.h_safe, 2.0, cost_fn)
    _, feas_loose, viol, _ = cem_plan(*args, loose)
    _, feas_strict, _, _ = cem_plan(*args, strict)
    assert float(viol) > 1e-4          # genuinely violated tube
    assert bool(feas_loose)            # loose gate accepts it
    assert not bool(feas_strict)       # strict gate rejects it


def test_model_error_metric_is_prediction_error(key):
    """VERDICT r2 weak #4: the episodic 'model_error' metric must be the GP
    PREDICTION error |resid - mu(z)| (capable of decreasing as the model
    learns), not the raw residual magnitude (which never can).

    (a) formula pin: the rollout's per-step model_err equals the recomputed
        ||resid - mu(x, u_applied)|| under the episode's frozen model;
    (b) learnability pin: on transitions with real residual signal (the wide
        initial-data region, where the linearization error is well above the
        noise floor), the metric shrinks as the model's dataset grows — the
        raw-residual version cannot.
    """
    from safe_exploration_tpu.models import ssm_predict

    exp = build_experiment(small_cfg(), dtype=jnp.float64)
    ssm = build_ssm(exp, key)
    traj, _, _ = rollout_episode(
        exp["env"], exp["get_action"], key, exp["init_state"](), ssm,
        jnp.asarray([0.05, 0.0], jnp.float64), 6, exp["a"], exp["b"],
    )
    for t in range(6):
        mu, _ = ssm_predict(ssm, traj["x"][t], traj["u"][t])
        ref = float(jnp.linalg.norm(traj["resid"][t] - mu))
        np.testing.assert_allclose(float(traj["model_err"][t]), ref, rtol=1e-9)

    # (b): evaluate prediction error on held-out wide-region transitions with
    # a 6-point model vs a 60-point fitted model — more data must help
    from safe_exploration_tpu.models import ssm_fit

    k1, k2 = jax.random.split(jax.random.fold_in(key, 9))
    xs, us, resid = collect_initial_data(
        exp["env"], k1, 80, exp["a"], exp["b"], exp["k_fb"]
    )
    x_tr, u_tr, y_tr = xs[:60], us[:60], resid[:60]
    x_te, u_te, y_te = xs[60:], us[60:], resid[60:]

    def pred_err(ssm_):
        mu = jax.vmap(lambda x, u: ssm_predict(ssm_, x, u)[0])(x_te, u_te)
        return float(jnp.mean(jnp.linalg.norm(y_te - mu, axis=-1)))

    ssm_poor = make_gp_ssm(
        exp["kern_types"], x_tr[:6], u_tr[:6], y_tr[:6], n_max=96,
        l_mu=exp["l_mu"], l_sigma=exp["l_sigma"], log_noise=-4.0,
    )
    ssm_rich = ssm_fit(
        make_gp_ssm(
            exp["kern_types"], x_tr, u_tr, y_tr, n_max=96,
            l_mu=exp["l_mu"], l_sigma=exp["l_sigma"], log_noise=-4.0,
        ),
        iters=120,
    )
    # more data and a fit must reduce the PREDICTION error — the raw
    # |resid| magnitude (the old metric) is invariant to the model entirely
    assert pred_err(ssm_rich) < pred_err(ssm_poor), (
        pred_err(ssm_rich), pred_err(ssm_poor)
    )


def test_ssm_full_cov_consistent_with_pointwise(key):
    from safe_exploration_tpu.models import ssm_predict, ssm_predict_full_cov

    exp = build_experiment(small_cfg(), dtype=jnp.float64)
    ssm = build_ssm(exp, key)
    xq = jnp.asarray([[0.05, 0.0], [0.0, 0.1], [-0.05, 0.05]], jnp.float64)
    uq = jnp.asarray([[0.1], [0.0], [-0.1]], jnp.float64)
    mean_f, cov_f = ssm_predict_full_cov(ssm, xq, uq)
    for i in range(3):
        m, v = ssm_predict(ssm, xq[i], uq[i])
        np.testing.assert_allclose(np.asarray(mean_f[i]), np.asarray(m), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(cov_f[:, i, i]), np.asarray(v), rtol=1e-7,
        )


def test_append_point_rejects_non_gp_families():
    from safe_exploration_tpu.models import ssm_append_point
    from safe_exploration_tpu.models.nn_ssm import make_mc_dropout_ssm

    key = jax.random.PRNGKey(0)
    xs = jnp.zeros((4, 2))
    us = jnp.zeros((4, 1))
    ys = jnp.zeros((4, 2))
    mc = make_mc_dropout_ssm(
        key, xs, us, ys, n_max=8,
        l_mu=jnp.full((2,), 0.1), l_sigma=jnp.full((2,), 0.1),
        hidden=(8,), n_samples=2,
    )
    with pytest.raises(TypeError, match="exact-GP"):
        ssm_append_point(mc, xs[0], us[0], ys[0])
