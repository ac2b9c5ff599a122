"""Lane-major per-lane GP state (models/gp_lanes.py) + the lane-major batched
online-learning episode runner (runtime/batch.run_batched_episodes_lanes).

Pins that the batch-LAST per-lane model computes the SAME math as the
stacked/vmapped path it accelerates:
  * lane_predict == vmapped per-lane gp predict (each lane queries its own
    buffers);
  * lane_append_point == vmapped gp_append_point over sequential appends
    (the block-inverse beta vs triangular-solve beta agree to roundoff);
  * the lane episode runner reproduces run_batched_episodes' closed loop
    (same PRNG streams -> same plant noise; same feasibility decisions);
  * sharding the lane axis over the 8-device mesh changes nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.envs import env_step, linearize_discretize, make_pendulum
from safe_exploration_tpu.models import make_gp_ssm
from safe_exploration_tpu.models.gp_lanes import (
    LaneGPSSM,
    lane_append_point,
    lane_predict,
    lane_stack_ssm,
    lane_unstack_ssm,
)
from safe_exploration_tpu.models.ssm import ssm_append_point, ssm_predict
from safe_exploration_tpu.ops.linalg import dlqr
from safe_exploration_tpu.runtime.batch import (
    run_batched_episodes,
    run_batched_episodes_lanes,
    stack_ssm,
)


def _make_ssm(dtype, n_data=20, n_max=32, z_scale=True,
              kern_types=("rbf", "rbf")):
    env = make_pendulum(dtype=dtype)
    a, b = linearize_discretize(env)
    key = jax.random.PRNGKey(0)
    xs = (jax.random.uniform(key, (n_data, 2), dtype, -1.0, 1.0)
          * jnp.asarray([0.3, 1.0], dtype))
    us = jax.random.uniform(jax.random.fold_in(key, 1), (n_data, 1), dtype,
                            -1.0, 1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(
        kern_types, xs, us, resid, n_max=n_max,
        l_mu=jnp.full((2,), 0.05, dtype), l_sigma=jnp.full((2,), 0.02, dtype),
        log_noise=-4.0,
        z_scale=jnp.asarray([0.5, 2.0, 1.0], dtype) if z_scale else None,
    )
    return env, ssm, a, b


def _rand_transitions(key, bsz, k_steps, dtype):
    kx, ku, ky = jax.random.split(key, 3)
    xs = jax.random.uniform(kx, (k_steps, bsz, 2), dtype, -0.4, 0.4)
    us = jax.random.uniform(ku, (k_steps, bsz, 1), dtype, -0.8, 0.8)
    ys = 1e-2 * jax.random.normal(ky, (k_steps, bsz, 2), dtype)
    return xs, us, ys


def test_lane_stack_predict_parity():
    """Freshly stacked lanes (identical models) reproduce the base predict."""
    _, ssm, _, _ = _make_ssm(jnp.float64)
    bsz = 7
    lssm = lane_stack_ssm(ssm, bsz)
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (bsz, 2), jnp.float64, -0.3, 0.3)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (bsz, 1),
                           jnp.float64, -0.5, 0.5)
    mu, var, jac = lane_predict(
        lssm, jnp.concatenate([x, u], axis=-1).T, want_jac=True
    )
    for i in range(bsz):
        mu_ref, var_ref = ssm_predict(ssm, x[i], u[i])
        np.testing.assert_allclose(np.asarray(mu[:, i]), np.asarray(mu_ref),
                                   rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(np.asarray(var[:, i]), np.asarray(var_ref),
                                   rtol=1e-8, atol=1e-13)
    assert jac.shape == (2, 3, bsz)


def test_lane_append_matches_vmapped_sequential():
    """k sequential per-lane appends == vmapped gp_append_point: buffers,
    factors and posterior all agree (f64; block-inverse beta vs
    triangular-solve beta are the same algebra)."""
    _, ssm, _, _ = _make_ssm(jnp.float64)
    bsz, k_steps = 5, 6
    lssm = lane_stack_ssm(ssm, bsz)
    stacked = stack_ssm(ssm, bsz)
    xs, us, ys = _rand_transitions(jax.random.PRNGKey(9), bsz, k_steps,
                                   jnp.float64)
    for t in range(k_steps):
        lssm = lane_append_point(lssm, xs[t], us[t], ys[t])
        stacked = jax.vmap(ssm_append_point)(stacked, xs[t], us[t], ys[t])

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(lssm.gp.x), -1, 0), np.asarray(stacked.gp.x),
        rtol=1e-12, atol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(lssm.gp.mask), np.asarray(stacked.gp.mask[0]),
        atol=0,
    )
    # beta/kinv: the lane path computes kernel distances as unrolled
    # (x - z)^2 while gram() uses the expanded-matmul form — O(eps) kv
    # differences amplified by the Gram conditioning show up at ~1e-8 rel
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(lssm.gp.beta), -1, 0),
        np.asarray(stacked.gp.beta), rtol=3e-7, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(lssm.gp.kinv), -1, 0),
        np.asarray(stacked.gp.kinv), rtol=1e-5, atol=1e-6,
    )
    # posterior parity at fresh queries
    key = jax.random.PRNGKey(21)
    xq = jax.random.uniform(key, (bsz, 2), jnp.float64, -0.3, 0.3)
    uq = jax.random.uniform(jax.random.fold_in(key, 1), (bsz, 1),
                            jnp.float64, -0.5, 0.5)
    mu, var = lane_predict(lssm, jnp.concatenate([xq, uq], axis=-1).T)
    mu_ref, var_ref = jax.vmap(ssm_predict)(stacked, xq, uq)
    np.testing.assert_allclose(np.asarray(mu.T), np.asarray(mu_ref),
                               rtol=1e-7, atol=1e-11)
    np.testing.assert_allclose(np.asarray(var.T), np.asarray(var_ref),
                               rtol=1e-6, atol=1e-11)


def test_lane_composite_kernels_predict_and_append_parity():
    """The lane-major model covers the reference kernel MENU (SURVEY.md §2.3
    kern_types — composites included): per-lane predicts + the incremental
    block-inverse append match the vmapped kernel-generic gp path on a
    mixed lin_rbf/lin_mat52 menu."""
    _, ssm, _, _ = _make_ssm(jnp.float64,
                             kern_types=("lin_rbf", "lin_mat52"))
    bsz, k_steps = 4, 5
    lssm = lane_stack_ssm(ssm, bsz)
    stacked = stack_ssm(ssm, bsz)
    xs, us, ys = _rand_transitions(jax.random.PRNGKey(31), bsz, k_steps,
                                   jnp.float64)
    for t in range(k_steps):
        lssm = lane_append_point(lssm, xs[t], us[t], ys[t])
        stacked = jax.vmap(ssm_append_point)(stacked, xs[t], us[t], ys[t])
    key = jax.random.PRNGKey(33)
    xq = jax.random.uniform(key, (bsz, 2), jnp.float64, -0.3, 0.3)
    uq = jax.random.uniform(jax.random.fold_in(key, 1), (bsz, 1),
                            jnp.float64, -0.5, 0.5)
    mu, var, jac = lane_predict(
        lssm, jnp.concatenate([xq, uq], axis=-1).T, want_jac=True
    )
    mu_ref, var_ref = jax.vmap(ssm_predict)(stacked, xq, uq)
    np.testing.assert_allclose(np.asarray(mu.T), np.asarray(mu_ref),
                               rtol=1e-7, atol=1e-11)
    np.testing.assert_allclose(np.asarray(var.T), np.asarray(var_ref),
                               rtol=1e-6, atol=1e-11)
    # closed-form mean Jacobian vs autodiff of the per-lane posterior
    for i in range(bsz):
        one = jax.tree.map(lambda t: t[i], stacked)
        jac_ad = jax.jacfwd(
            lambda zz: ssm_predict(one, zz[:2], zz[2:])[0]
        )(jnp.concatenate([xq[i], uq[i]]))
        np.testing.assert_allclose(np.asarray(jac[:, :, i]),
                                   np.asarray(jac_ad), rtol=1e-7, atol=1e-10)


def test_lane_append_saturates_on_full_buffer():
    """Appends beyond n_max are gated no-ops for every lane — the
    gp_append_point saturation contract, lane-major."""
    _, ssm, _, _ = _make_ssm(jnp.float64, n_data=20, n_max=22)
    bsz = 3
    lssm = lane_stack_ssm(ssm, bsz)
    xs, us, ys = _rand_transitions(jax.random.PRNGKey(2), bsz, 4, jnp.float64)
    for t in range(2):  # fills 20 -> 22
        lssm = lane_append_point(lssm, xs[t], us[t], ys[t])
    full = jax.tree.map(lambda x: np.asarray(x),
                        (lssm.gp.beta, lssm.gp.kinv, lssm.gp.mask,
                         lssm.gp.head))
    lssm2 = lane_append_point(lssm, xs[2], us[2], ys[2])
    after = jax.tree.map(lambda x: np.asarray(x),
                         (lssm2.gp.beta, lssm2.gp.kinv, lssm2.gp.mask,
                          lssm2.gp.head))
    for f, a_ in zip(jax.tree.leaves(full), jax.tree.leaves(after)):
        np.testing.assert_array_equal(f, a_)


def test_lane_append_lockstep_guard():
    """VERDICT r4 next #9: the lane tier's shared mask/head REQUIRE lockstep
    appends — feeding transitions for a subset of lanes (the variable-length-
    episode hazard) must be rejected loudly at trace time, not silently
    desynchronize the shared-slot buffers."""
    import pytest

    _, ssm, _, _ = _make_ssm(jnp.float64)
    lssm = lane_stack_ssm(ssm, 4)
    xs, us, ys = _rand_transitions(jax.random.PRNGKey(3), 3, 1, jnp.float64)
    with pytest.raises(ValueError, match="lockstep"):
        lane_append_point(lssm, xs[0], us[0], ys[0])   # 3 rows for 4 lanes
    with pytest.raises(ValueError, match="lockstep"):
        lane_append_point(
            lssm, xs[0, 0], us[0, 0], ys[0, 0]         # unbatched
        )


def test_lane_unstack_roundtrip():
    """lane_unstack_ssm rebuilds exact stacked factors from the lane state:
    the re-factorized per-lane GPs reproduce the lane posteriors."""
    _, ssm, _, _ = _make_ssm(jnp.float64)
    bsz = 4
    lssm = lane_stack_ssm(ssm, bsz)
    xs, us, ys = _rand_transitions(jax.random.PRNGKey(5), bsz, 5, jnp.float64)
    for t in range(5):
        lssm = lane_append_point(lssm, xs[t], us[t], ys[t])
    stacked = lane_unstack_ssm(lssm)
    key = jax.random.PRNGKey(13)
    xq = jax.random.uniform(key, (bsz, 2), jnp.float64, -0.3, 0.3)
    uq = jax.random.uniform(jax.random.fold_in(key, 1), (bsz, 1),
                            jnp.float64, -0.5, 0.5)
    mu, var = lane_predict(lssm, jnp.concatenate([xq, uq], axis=-1).T)
    mu_ref, var_ref = jax.vmap(ssm_predict)(stacked, xq, uq)
    np.testing.assert_allclose(np.asarray(mu.T), np.asarray(mu_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var.T), np.asarray(var_ref),
                               rtol=1e-7, atol=1e-12)


def _build_batch_exp(dtype, n_max=40):
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    cfg = ExperimentConfig(
        name="lane_batch", solver="sqp", n_safe=3, n_max=n_max,
        sqp_outer=3, sqp_inner=2, sqp_polish=2,
    )
    exp = build_experiment(cfg, dtype=dtype)
    env, a, b = exp["env"], exp["a"], exp["b"]
    key = jax.random.PRNGKey(0)
    xs = (jax.random.uniform(key, (24, 2), dtype, -1.0, 1.0)
          * jnp.asarray([0.3, 1.0], dtype))
    us = jax.random.uniform(jax.random.fold_in(key, 1), (24, 1), dtype,
                            -1.0, 1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(
        ("rbf", "rbf"), xs, us, resid, n_max=n_max,
        l_mu=jnp.full((2,), 0.05, dtype),
        l_sigma=jnp.full((2,), 0.02, dtype), log_noise=-4.0,
    )
    return exp, ssm


def test_lane_episode_runner_matches_vmapped():
    """The lane-major episode runner reproduces run_batched_episodes: same
    plant-noise streams, same feasibility decisions, closely matching
    trajectories, and the per-lane models LEARN (posterior shrinks)."""
    dtype = jnp.float64
    exp, ssm = _build_batch_exp(dtype)
    assert exp["lane_batch_supported"] is not None
    assert exp["lane_batch_supported"](ssm)
    env, a, b = exp["env"], exp["a"], exp["b"]
    bsz, n_steps = 4, 5
    key = jax.random.PRNGKey(4)
    x0s = (jax.random.uniform(key, (bsz, 2), dtype, -1.0, 1.0)
           * jnp.asarray([0.1, 0.2], dtype))
    keys = jax.random.split(jax.random.PRNGKey(8), bsz)

    traj_v, ssm_v = run_batched_episodes(
        env, exp["get_action"], exp["init_state"], stack_ssm(ssm, bsz),
        x0s, keys, n_steps, a, b,
    )
    traj_l, lssm_fin = run_batched_episodes_lanes(
        env, exp["get_action_batch"], exp["init_state_batch"],
        lane_stack_ssm(ssm, bsz), x0s, keys, n_steps, a, b,
    )

    for k in traj_v:
        assert traj_l[k].shape == traj_v[k].shape, k
    feas_v = np.asarray(traj_v["feasible"])
    feas_l = np.asarray(traj_l["feasible"])
    assert (feas_v == feas_l).mean() >= 0.9, (feas_v, feas_l)
    # trajectories track closely for the bulk of lanes/steps (the lane and
    # portable solvers may settle on different equally-feasible optima on
    # knife-edge instances — same contract as the closed-loop solver test)
    diff = np.abs(np.asarray(traj_v["x"]) - np.asarray(traj_l["x"]))
    assert np.quantile(diff, 0.8) < 0.02, (np.quantile(diff, 0.8), diff.max())
    # both models learned the same number of points
    per_lane_pts = np.asarray(jnp.sum(ssm_v.gp.mask, axis=-1))
    assert int(lssm_fin.gp.n_points) == int(per_lane_pts[0])
    assert int(lssm_fin.gp.n_points) == 24 + n_steps
    assert np.all(np.isfinite(np.asarray(traj_l["model_err"])))


def test_lane_episode_runner_overflow_guard():
    dtype = jnp.float64
    exp, ssm = _build_batch_exp(dtype, n_max=26)
    env, a, b = exp["env"], exp["a"], exp["b"]
    bsz = 2
    x0s = jnp.zeros((bsz, 2), dtype)
    keys = jax.random.split(jax.random.PRNGKey(0), bsz)
    with pytest.raises(ValueError, match="overflow"):
        run_batched_episodes_lanes(
            env, exp["get_action_batch"], exp["init_state_batch"],
            lane_stack_ssm(ssm, bsz), x0s, keys, 10, a, b,
        )


def test_lane_episode_runner_sharded_matches_unsharded():
    """Sharding the lane axis over the 8-device mesh is pure data
    parallelism — results match the single-device run."""
    from safe_exploration_tpu.parallel import make_mesh

    dtype = jnp.float64
    exp, ssm = _build_batch_exp(dtype)
    env, a, b = exp["env"], exp["a"], exp["b"]
    bsz, n_steps = 8, 3
    key = jax.random.PRNGKey(6)
    x0s = (jax.random.uniform(key, (bsz, 2), dtype, -1.0, 1.0)
           * jnp.asarray([0.1, 0.2], dtype))
    keys = jax.random.split(jax.random.PRNGKey(7), bsz)

    traj_1, _ = run_batched_episodes_lanes(
        env, exp["get_action_batch"], exp["init_state_batch"],
        lane_stack_ssm(ssm, bsz), x0s, keys, n_steps, a, b,
    )
    mesh = make_mesh(8)
    traj_8, lssm_8 = run_batched_episodes_lanes(
        env, exp["get_action_batch"], exp["init_state_batch"],
        lane_stack_ssm(ssm, bsz), x0s, keys, n_steps, a, b, mesh=mesh,
    )
    # sharding changes the matmul partition widths, so per-lane reductions
    # differ at the last ulp; ~30 Newton steps per solve amplify that, and a
    # knife-edge linesearch argmin can flip — the contract is decision-level
    # plus bounded trajectory drift (same as the dryrun lane-solve gate)
    feas_1 = np.asarray(traj_1["feasible"])
    feas_8 = np.asarray(traj_8["feasible"])
    assert (feas_1 == feas_8).mean() >= 0.9, (feas_1, feas_8)
    diff = np.abs(np.asarray(traj_8["x"]) - np.asarray(traj_1["x"]))
    assert np.quantile(diff, 0.8) < 0.02, (np.quantile(diff, 0.8), diff.max())
    assert lssm_8.gp.x.shape[-1] == bsz


def test_lane_restack_per_lane_hypers_parity():
    """lane_restack_ssm imports a stacked model with DIVERGED per-lane
    hyperparameters (after a vmapped between-episode fit) back into the
    lane-major layout; predicts and appends still match the vmapped path
    with each lane's OWN hypers (batch-last hyper leaves broadcast through
    the lane arithmetic)."""
    from safe_exploration_tpu.models.gp_lanes import lane_restack_ssm

    _, ssm, _, _ = _make_ssm(jnp.float64)
    bsz = 4
    stacked = stack_ssm(ssm, bsz)
    # perturb every lane's hypers differently (as a per-lane fit would)
    key = jax.random.PRNGKey(41)

    def perturb(leaf):
        nonlocal key
        key = jax.random.fold_in(key, leaf.size)
        return leaf + 0.2 * jax.random.normal(key, leaf.shape, leaf.dtype)

    stacked = stacked.replace(
        gp=stacked.gp.replace(
            params=jax.tree.map(perturb, stacked.gp.params),
            log_noise=perturb(stacked.gp.log_noise),
        ),
        l_mu=perturb(stacked.l_mu),
    )
    from safe_exploration_tpu.models.gp import gp_refit

    stacked = stacked.replace(gp=jax.vmap(gp_refit)(stacked.gp))
    lssm = lane_restack_ssm(stacked)
    assert lssm.gp.per_lane_hypers
    np.testing.assert_allclose(np.moveaxis(np.asarray(lssm.l_mu), -1, 0),
                               np.asarray(stacked.l_mu))

    # predict parity with per-lane hypers
    key = jax.random.PRNGKey(43)
    xq = jax.random.uniform(key, (bsz, 2), jnp.float64, -0.3, 0.3)
    uq = jax.random.uniform(jax.random.fold_in(key, 1), (bsz, 1),
                            jnp.float64, -0.5, 0.5)
    mu, var = lane_predict(lssm, jnp.concatenate([xq, uq], axis=-1).T)
    mu_ref, var_ref = jax.vmap(ssm_predict)(stacked, xq, uq)
    np.testing.assert_allclose(np.asarray(mu.T), np.asarray(mu_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var.T), np.asarray(var_ref),
                               rtol=1e-7, atol=1e-12)

    # append parity with per-lane hypers (per-lane noise enters the Schur)
    xs, us, ys = _rand_transitions(jax.random.PRNGKey(44), bsz, 3,
                                   jnp.float64)
    st2 = stacked
    for t in range(3):
        lssm = lane_append_point(lssm, xs[t], us[t], ys[t])
        st2 = jax.vmap(ssm_append_point)(st2, xs[t], us[t], ys[t])
    mu2, var2 = lane_predict(lssm, jnp.concatenate([xq, uq], axis=-1).T)
    mu2_ref, var2_ref = jax.vmap(ssm_predict)(st2, xq, uq)
    np.testing.assert_allclose(np.asarray(mu2.T), np.asarray(mu2_ref),
                               rtol=1e-7, atol=1e-11)
    np.testing.assert_allclose(np.asarray(var2.T), np.asarray(var2_ref),
                               rtol=1e-6, atol=1e-11)


def test_batched_learning_loop_learns():
    """run_batched_learning: N parallel FULL learning runs (episodes +
    between-episode per-lane hyperopt) — zero violations throughout, the
    model-error series decreases as every lane's GP learns, the data count
    grows by n_steps per episode, and per-lane hypers have genuinely
    diverged by the end."""
    from safe_exploration_tpu.runtime.batch import run_batched_learning

    dtype = jnp.float64
    exp, ssm = _build_batch_exp(dtype, n_max=48)
    bsz, n_ep, n_steps = 3, 3, 6
    res = run_batched_learning(
        exp["env"], exp, ssm, bsz, jax.random.PRNGKey(3), n_ep, n_steps,
        hyp_iters=30,
    )
    s = res["series"]
    assert len(s["model_error"]) == n_ep
    assert all(v == 0 for v in s["violations"])
    assert s["model_error"][-1] < s["model_error"][0]
    assert s["n_data"] == [24 + (ep + 1) * n_steps for ep in range(n_ep)]
    model = res["model"]
    assert isinstance(model, LaneGPSSM) and model.gp.per_lane_hypers
    # per-lane fits diverged the hypers across lanes
    sf = np.asarray(model.gp.params[0]["log_sf"])
    assert sf.shape == (bsz,) and np.std(sf) > 0

    # the stacked backend runs the same loop (smoke, 1 fit round)
    res_v = run_batched_learning(
        exp["env"], exp, ssm, 2, jax.random.PRNGKey(3), 2, 4,
        hyp_iters=10, backend="stacked",
    )
    assert len(res_v["series"]["model_error"]) == 2
    assert all(v == 0 for v in res_v["series"]["violations"])


def test_lane_bucket_shrink_expand_roundtrip():
    """lane_shrink_to_bucket slices factors, not recomputes (identity
    padding => block-diagonal factors): predicts and appends on the bucketed
    view match the full-capacity model exactly, and lane_expand_to restores
    a model that keeps appending identically."""
    from safe_exploration_tpu.models.gp_lanes import (
        lane_expand_to,
        lane_shrink_to_bucket,
    )

    _, ssm, _, _ = _make_ssm(jnp.float64, n_data=20, n_max=128)
    bsz = 3
    lssm = lane_stack_ssm(ssm, bsz)
    view = lane_shrink_to_bucket(lssm, n_free=6)
    assert view.gp.n_max == 32  # smallest pow2 >= 20 + 6
    key = jax.random.PRNGKey(17)
    xq = jax.random.uniform(key, (bsz, 2), jnp.float64, -0.3, 0.3)
    uq = jax.random.uniform(jax.random.fold_in(key, 1), (bsz, 1),
                            jnp.float64, -0.5, 0.5)
    zq = jnp.concatenate([xq, uq], axis=-1).T
    mu_f, var_f = lane_predict(lssm, zq)
    mu_b, var_b = lane_predict(view, zq)
    np.testing.assert_array_equal(np.asarray(mu_b), np.asarray(mu_f))
    np.testing.assert_array_equal(np.asarray(var_b), np.asarray(var_f))

    # appends into the bucketed view == appends into the full model
    xs, us, ys = _rand_transitions(jax.random.PRNGKey(19), bsz, 6,
                                   jnp.float64)
    for t in range(6):
        view = lane_append_point(view, xs[t], us[t], ys[t])
        lssm = lane_append_point(lssm, xs[t], us[t], ys[t])
    mu_b, var_b = lane_predict(view, zq)
    mu_f, var_f = lane_predict(lssm, zq)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_f),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_f),
                               rtol=1e-10, atol=1e-15)

    # expansion restores full capacity with intact padding invariants:
    # further appends agree with the never-bucketed model
    back = lane_expand_to(view, 128)
    assert back.gp.n_max == 128
    xs2, us2, ys2 = _rand_transitions(jax.random.PRNGKey(23), bsz, 2,
                                      jnp.float64)
    for t in range(2):
        back = lane_append_point(back, xs2[t], us2[t], ys2[t])
        lssm = lane_append_point(lssm, xs2[t], us2[t], ys2[t])
    mu_b, var_b = lane_predict(back, zq)
    mu_f, var_f = lane_predict(lssm, zq)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_f),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_f),
                               rtol=1e-10, atol=1e-15)
    assert int(back.gp.n_points) == int(lssm.gp.n_points) == 28


def test_batched_learning_checkpoint_resume_bit_exact(tmp_path):
    """Fleet-scale checkpoint/resume (§5.4 at batch scale): interrupting the
    batched learning loop after episode k and resuming reproduces the
    uninterrupted run bit-exactly — series AND final per-lane model."""
    from safe_exploration_tpu.runtime.batch import run_batched_learning

    dtype = jnp.float64
    exp, ssm = _build_batch_exp(dtype, n_max=48)
    bsz, n_ep, n_steps = 2, 3, 4
    kw = dict(hyp_iters=10)

    full = run_batched_learning(
        exp["env"], exp, ssm, bsz, jax.random.PRNGKey(9), n_ep, n_steps,
        **kw,
    )
    # interrupted run: 2 episodes with checkpointing...
    ck = str(tmp_path / "ck")
    run_batched_learning(
        exp["env"], exp, ssm, bsz, jax.random.PRNGKey(9), 2, n_steps,
        ckpt_dir=ck, **kw,
    )
    # ...then resume to the full horizon
    res = run_batched_learning(
        exp["env"], exp, ssm, bsz, jax.random.PRNGKey(9), n_ep, n_steps,
        ckpt_dir=ck, resume=True, **kw,
    )
    for k in full["series"]:
        if k == "episode_time_s":  # wall clock, not state
            continue
        assert full["series"][k] == res["series"][k], k
    for lf, lr in zip(jax.tree.leaves(full["model"]),
                      jax.tree.leaves(res["model"])):
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lr))


def test_registered_batch_sqp_config_rides_lanes():
    """The registered pendulum_batch_sqp config (BASELINE cfg 3 on the NLP
    path) exposes the batched entries and routes its GP-SSM to the lane
    backend — what runtime/main's batch task dispatches on."""
    from safe_exploration_tpu.runtime.config import CONFIGS, build_experiment

    cfg = CONFIGS["pendulum_batch_sqp"]
    assert cfg.task == "batch" and cfg.solver == "sqp"
    exp = build_experiment(cfg, dtype=jnp.float64)
    assert exp["get_action_batch"] is not None
    assert exp["init_state_batch"] is not None
    _, ssm = _build_batch_exp(jnp.float64)
    assert exp["lane_batch_supported"](ssm)
    assert exp["lane_batch_supported"](lane_stack_ssm(ssm, 2))


def test_registered_cartpole_batch_sqp_rides_lanes():
    """BASELINE cfg 2's plant at fleet scale: the registered cartpole batch
    config (n_s=4 — the array-form lane rollout) runs the lane-major
    learning pipeline end to end with zero violations."""
    import dataclasses

    from safe_exploration_tpu.runtime.config import CONFIGS
    from safe_exploration_tpu.runtime.main import run_experiment

    cfg2 = CONFIGS["cartpole_batch_sqp"]
    assert cfg2.task == "batch" and cfg2.solver == "sqp"
    cfg = dataclasses.replace(
        cfg2, batch_lanes=3, n_steps=3, n_ep=2, n_init_samples=32,
        n_max=48, hyp_iters=40, n_safe=3, n_perf=6,
    )
    out = run_experiment(cfg, dtype=jnp.float64)
    s = out["series"]
    assert s["lane_backend"] == [1, 1]
    # the SAFETY contract holds from step one (fallback chain), and the
    # learned model makes the tube feasible by the second episode — with a
    # 32-point initial fit the first episode may run fully on the fallback
    assert sum(s["violations"]) == 0
    assert s["feasibility_rate"][-1] >= 0.8, s["feasibility_rate"]


def test_batch_planner_rejects_lane_ssm_on_unsupported_config():
    """The config seam raises a CLEAR error when a per-lane model falls
    outside the lane backend's coverage (here: "ff" precision factors)."""
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    dtype = jnp.float64
    cfg = ExperimentConfig(
        name="lane_reject", solver="sqp", n_safe=3, n_max=32,
    )
    exp = build_experiment(cfg, dtype=dtype)
    env, base, a, b = _make_ssm(dtype)
    # "ff" precision factors are outside the lane backend's coverage
    base = base.replace(gp=base.gp.replace(precision="ff"))
    lssm = lane_stack_ssm(base, 2)
    # the supported-check fires before the warm start is touched, so its
    # shape is irrelevant here
    with pytest.raises(TypeError, match="lane backend"):
        exp["batch_planner"](
            lssm, jnp.zeros((2, 2), dtype), jnp.zeros((2, 3, 1), dtype)
        )
