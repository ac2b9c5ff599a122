"""Serving-controller tests: AOT-compiled step executable, donation-safe state
carry, online-append feedback with bucket-crossing recompiles.

Parity model: the reference's production surface is get_action + update_model
in a Python loop (``safempc_simple.py``, SURVEY.md §2.5/§3.3);
runtime/serve.ServeController is the fixed-shape pre-compiled counterpart and
must produce EXACTLY the research-path results for the same keys/state.
"""

import jax
import jax.numpy as jnp
import numpy as np

from safe_exploration_tpu.envs import env_step
from safe_exploration_tpu.models import make_gp_ssm
from safe_exploration_tpu.runtime.config import ExperimentConfig, build_experiment
from safe_exploration_tpu.runtime.serve import ServeController


def _tiny_exp(**kw):
    n_data = kw.pop("_n_data", 12)
    base = dict(
        name="serve", solver="sqp", n_safe=3, n_max=128,
        sqp_outer=3, sqp_inner=2, sqp_polish=2,
    )
    base.update(kw)
    cfg = ExperimentConfig(**base)
    dt = jnp.float64
    exp = build_experiment(cfg, dtype=dt)
    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (n_data, 2), dt, -1.0, 1.0) * \
        jnp.asarray([0.3, 1.0], dt)
    us = jax.random.uniform(
        jax.random.fold_in(key, 1), (n_data, 1), dt, -1.0, 1.0
    )
    _, x_next = jax.vmap(lambda x, u: env_step(exp["env"], key, x, u))(xs, us)
    resid = x_next - (xs @ exp["a"].T + us @ exp["b"].T)
    ssm = make_gp_ssm(
        exp["kern_types"], xs, us, resid, n_max=cfg.n_max,
        l_mu=jnp.full((2,), 0.05, dt), l_sigma=jnp.full((2,), 0.02, dt),
        log_noise=-4.0,
    )
    return exp, ssm


def test_serve_step_matches_research_path():
    """The compiled step must reproduce the lazily-jitted get_action exactly
    (same state machine, same key schedule)."""
    from safe_exploration_tpu.models.ssm import ssm_bucketed

    exp, ssm = _tiny_exp()
    key = jax.random.PRNGKey(7)
    ctrl = ServeController(exp, ssm, key=key)

    # reference: drive get_action by hand with the SAME key splits
    state = exp["init_state"]()
    ssm_plan = ssm_bucketed(ssm)
    k = key
    x = jnp.asarray([0.05, 0.1], jnp.float64)
    for _ in range(3):
        u_served = ctrl.step(x)
        k_step, k = jax.random.split(k)
        u_ref, state, info = exp["get_action"](k_step, state, ssm_plan, x)
        np.testing.assert_allclose(u_served, np.asarray(u_ref), rtol=1e-6,
                                   atol=1e-7)
        assert ctrl.last_feasible == bool(info["feasible"])
    assert ctrl.recompiles == 1          # one AOT compile, zero retraces
    stats = ctrl.latency_stats()
    assert stats["n"] >= 1 and stats["p99_ms"] > 0.0


def test_serve_observe_saturation_guard_is_loud():
    """A full GP buffer must not silently stop learning (VERDICT r4 #4a):
    the default raises; on_full='drop' keeps serving on the frozen model and
    counts the dropped transitions."""
    import pytest

    from safe_exploration_tpu.models.ssm import ssm_n_points

    exp, ssm = _tiny_exp(_n_data=14, n_max=16)     # 2 free slots
    ctrl = ServeController(exp, ssm, key=jax.random.PRNGKey(1))
    env = exp["env"]
    key = jax.random.PRNGKey(9)
    x = np.asarray([0.05, 0.1], np.float64)
    for i in range(2):                              # fills the buffer
        u = ctrl.step(x)
        _, x_next = env_step(env, jax.random.fold_in(key, i), jnp.asarray(x),
                             jnp.asarray(u))
        ctrl.observe(x, u, np.asarray(x_next))
        x = np.asarray(x_next)
    assert int(ssm_n_points(ctrl._ssm_full)) == 16
    u = ctrl.step(x)
    with pytest.raises(RuntimeError, match="full"):
        ctrl.observe(x, u, x)

    # drop mode: same saturated model, loud counter instead of an exception
    ctrl2 = ServeController(exp, ctrl._ssm_full, key=jax.random.PRNGKey(2),
                            on_full="drop")
    u2 = ctrl2.step(x)
    ctrl2.observe(x, u2, x)
    ctrl2.observe(x, u2, x)
    assert ctrl2.dropped_points == 2
    assert int(ssm_n_points(ctrl2._ssm_full)) == 16   # model frozen, serving on
    assert np.all(np.isfinite(ctrl2.step(x)))


def test_serve_latency_window_and_per_executable_exclusion():
    """latency_stats must exclude the first step of EACH executable (one-time
    host linking — ADVICE r4: the old code only dropped the global first
    sample) and the sample buffer must stay bounded."""
    exp, ssm = _tiny_exp()
    ctrl = ServeController(exp, ssm, latency_window=4)
    x = np.asarray([0.05, 0.1], np.float64)
    ctrl.step(x)
    assert ctrl.latency_stats()["n"] == 0      # first step of the executable
    ctrl.step(x)
    ctrl.step(x)
    assert ctrl.latency_stats()["n"] == 2
    for _ in range(6):                          # window caps at 4
        ctrl.step(x)
    assert ctrl.latency_stats()["n"] == 4
    # a recompile marks the NEXT step as excluded again
    ctrl._compile_step()
    ctrl.step(x)
    assert ctrl.latency_stats()["n"] == 4      # unchanged: sample excluded
    ctrl.step(x)
    stats = ctrl.latency_stats()
    assert stats["n"] == 4 and stats["p99_ms"] > 0.0


def test_serve_observe_appends_and_recompiles_on_bucket_cross():
    """observe() feeds transitions through the incremental append; crossing
    the power-of-2 bucket boundary re-AOT-compiles exactly once and the
    controller keeps planning on the grown model."""
    exp, ssm = _tiny_exp(_n_data=30)
    ctrl = ServeController(exp, ssm, key=jax.random.PRNGKey(3))
    n0 = ctrl._bucket_n
    assert n0 == 32                      # 30 active points -> bucket 32

    x = np.asarray([0.05, 0.1], np.float64)
    env = exp["env"]
    key = jax.random.PRNGKey(11)
    recompiles0 = ctrl.recompiles
    crossed = False
    for i in range(6):                   # 30 + 6 = 36 > 32: crosses once
        u = ctrl.step(x)
        _, x_next = env_step(env, jax.random.fold_in(key, i), jnp.asarray(x),
                             jnp.asarray(u))
        ctrl.observe(x, u, np.asarray(x_next))
        if ctrl._bucket_n != n0:
            crossed = True
        x = np.asarray(x_next)
    assert crossed and ctrl._bucket_n == 64
    assert ctrl.recompiles == recompiles0 + 1
    # still serving after the recompile, and the model actually grew
    u = ctrl.step(x)
    assert u.shape == (1,) and np.all(np.isfinite(u))
    from safe_exploration_tpu.models.ssm import ssm_n_points

    assert int(ssm_n_points(ctrl._ssm_full)) == 36
