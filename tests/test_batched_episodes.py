"""Batched parallel episodes (BASELINE config 3) on the 8-device CPU mesh.

Checks: lane independence (vmap lane == solo run), incremental-append factor
correctness inside the scan, mesh sharding executes, and the safety telemetry
shape contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.envs import env_step
from safe_exploration_tpu.models import make_gp_ssm
from safe_exploration_tpu.models.gp import gp_refit
from safe_exploration_tpu.parallel import make_mesh
from safe_exploration_tpu.runtime.batch import run_batched_episodes, stack_ssm
from safe_exploration_tpu.runtime.config import ExperimentConfig, build_experiment


@pytest.fixture(scope="module")
def setup():
    cfg = ExperimentConfig(
        name="batch_t", solver="cem", n_safe=3, n_max=64,
        cem_samples=32, cem_elites=8, cem_iterations=3,
    )
    exp = build_experiment(cfg, dtype=jnp.float64)
    env, a, b = exp["env"], exp["a"], exp["b"]
    key = jax.random.PRNGKey(0)
    xs = (
        jax.random.uniform(key, (16, 2), jnp.float64, -1.0, 1.0)
        * jnp.asarray([0.2, 0.5], jnp.float64)
    )
    us = jax.random.uniform(jax.random.fold_in(key, 1), (16, 1), jnp.float64, -1, 1)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(
        exp["kern_types"], xs, us, resid, n_max=64,
        l_mu=jnp.full((2,), 0.05), l_sigma=jnp.full((2,), 0.02), log_noise=-4.0,
    )
    params = tuple({**p, "log_sf": jnp.asarray(-3.0)} for p in ssm.gp.params)
    ssm = ssm.replace(gp=gp_refit(ssm.gp.replace(params=params)))
    return exp, ssm


def test_batched_episodes_run_and_shapes(setup):
    exp, ssm = setup
    batch, n_steps = 8, 4
    mesh = make_mesh(8)
    x0s = jnp.tile(jnp.asarray([0.05, 0.0], jnp.float64), (batch, 1))
    x0s = x0s + 0.01 * jnp.arange(batch, dtype=jnp.float64)[:, None]
    keys = jax.random.split(jax.random.PRNGKey(7), batch)
    traj, ssm_fin = run_batched_episodes(
        exp["env"], exp["get_action"], exp["init_state"],
        stack_ssm(ssm, batch), x0s, keys, n_steps, exp["a"], exp["b"],
        mesh=mesh,
    )
    assert traj["x"].shape == (batch, n_steps, 2)
    assert traj["feasible"].shape == (batch, n_steps)
    # every lane learned n_steps new points into its own buffer
    np.testing.assert_array_equal(
        np.asarray(jnp.sum(ssm_fin.gp.mask, axis=-1)), np.full(batch, 16 + n_steps)
    )
    assert bool(jnp.all(traj["constraint_ok"]))


def test_lane_matches_solo_run(setup):
    """vmap semantics: lane i of the batch equals running that episode alone."""
    exp, ssm = setup
    batch, n_steps = 4, 3
    x0s = jnp.asarray(
        [[0.05, 0.0], [0.02, 0.1], [-0.04, 0.05], [0.0, -0.1]], jnp.float64
    )
    keys = jax.random.split(jax.random.PRNGKey(3), batch)
    traj_b, ssm_b = run_batched_episodes(
        exp["env"], exp["get_action"], exp["init_state"],
        stack_ssm(ssm, batch), x0s, keys, n_steps, exp["a"], exp["b"],
    )
    lane = 2
    traj_s, ssm_s = run_batched_episodes(
        exp["env"], exp["get_action"], exp["init_state"],
        stack_ssm(ssm, 1), x0s[lane:lane + 1], keys[lane:lane + 1],
        n_steps, exp["a"], exp["b"],
    )
    np.testing.assert_allclose(traj_s["x"][0], traj_b["x"][lane], atol=1e-12)
    np.testing.assert_allclose(
        ssm_s.gp.beta[0], ssm_b.gp.beta[lane], atol=1e-10
    )


def test_incremental_factors_match_full_refit(setup):
    """After a batched episode, each lane's incrementally-updated Cholesky/beta
    must equal a from-scratch refit of its final dataset (SURVEY.md §7
    hard-part 4)."""
    exp, ssm = setup
    batch, n_steps = 2, 3
    x0s = jnp.asarray([[0.05, 0.0], [0.0, 0.05]], jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(5), batch)
    _, ssm_fin = run_batched_episodes(
        exp["env"], exp["get_action"], exp["init_state"],
        stack_ssm(ssm, batch), x0s, keys, n_steps, exp["a"], exp["b"],
    )
    for lane in range(batch):
        gp_lane = jax.tree.map(lambda x: x[lane], ssm_fin.gp)
        gp_full = gp_refit(gp_lane)
        np.testing.assert_allclose(gp_lane.chol, gp_full.chol, atol=1e-9)
        np.testing.assert_allclose(gp_lane.beta, gp_full.beta, atol=1e-8)


def test_overflow_schedule_rejected(setup):
    """VERDICT r2 weak #3: a schedule whose appends would overflow the GP
    buffer must be rejected host-side, not silently saturate mid-episode."""
    exp, ssm = setup
    batch = 2
    x0s = jnp.asarray([[0.05, 0.0], [0.0, 0.05]], jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(5), batch)
    n_free = 64 - 16
    with pytest.raises(ValueError, match="overflow"):
        run_batched_episodes(
            exp["env"], exp["get_action"], exp["init_state"],
            stack_ssm(ssm, batch), x0s, keys, n_free + 1, exp["a"], exp["b"],
        )


def test_online_appends_respect_input_normalization():
    """ADVICE r2 high: with normalize_inputs=True (the config default) the GP
    buffer stores NORMALIZED inputs; per-step online appends must store
    z / z_scale — raw-coordinate appends corrupt the posterior."""
    cfg = ExperimentConfig(
        name="batch_norm_t", solver="cem", n_safe=3, n_max=64,
        cem_samples=32, cem_elites=8, cem_iterations=3,
        normalize_inputs=True,
    )
    exp = build_experiment(cfg, dtype=jnp.float64)
    env, a, b = exp["env"], exp["a"], exp["b"]
    key = jax.random.PRNGKey(0)
    xs = (
        jax.random.uniform(key, (12, 2), jnp.float64, -1.0, 1.0)
        * jnp.asarray([0.2, 0.5], jnp.float64)
    )
    us = jax.random.uniform(jax.random.fold_in(key, 1), (12, 1), jnp.float64, -1, 1)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = exp["make_ssm"](key, xs, us, resid)
    assert ssm.z_scale is not None
    batch, n_steps = 2, 3
    x0s = jnp.asarray([[0.05, 0.0], [0.0, 0.05]], jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(5), batch)
    traj, ssm_fin = run_batched_episodes(
        env, exp["get_action"], exp["init_state"],
        stack_ssm(ssm, batch), x0s, keys, n_steps, a, b,
    )
    # the appended rows must be the NORMALIZED (x, u) of the executed steps
    for lane in range(batch):
        z_raw = jnp.concatenate(
            [traj["x"][lane], traj["u"][lane]], axis=-1
        )
        stored = ssm_fin.gp.x[lane, 12:12 + n_steps]
        np.testing.assert_allclose(
            np.asarray(stored), np.asarray(z_raw / ssm.z_scale), atol=1e-12
        )
    # and the lane factors remain consistent with a from-scratch refit
    gp_lane = jax.tree.map(lambda x: x[0], ssm_fin.gp)
    gp_full = gp_refit(gp_lane)
    np.testing.assert_allclose(gp_lane.beta, gp_full.beta, atol=1e-8)
