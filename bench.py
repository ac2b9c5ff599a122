"""Benchmark harness — the driver runs this on real TPU hardware.

Measures the BASELINE.json headline metric: parallel safe-MPC solves/sec
(pendulum, H=5) on one chip — a batch of full SQP safety-NLP solves (GP
posterior + Jacobians, ellipsoid tube, augmented-Lagrangian Newton) vmapped into
one XLA program. Also reports GP predict+Cholesky latency as a secondary metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N/1000, ...}

``vs_baseline`` is against the driver's north-star target of 1000 solves/sec
(BASELINE.md: the reference publishes no numbers; the CasADi/IPOPT
implementation solves ONE problem at a time on CPU).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: this host has ONE CPU core, so XLA compiles of
# the big lane-major programs take tens of seconds to minutes each and a cold
# run of every sub-benchmark cannot fit any reasonable timeout (BENCH_r03.json
# recorded rc 124 with no output at all). With the cache primed — bench.py is
# run during the build round on the same machine the driver uses — every jit
# below is a disk hit and the whole suite runs in a few minutes. The cache
# lives OUTSIDE the repo so end-of-round git operations cannot wipe it.
_CACHE_DIR = os.path.expanduser("~/.cache/safe_exploration_tpu_jax")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# Per-process memoization of the benchmark problem constructions: many rows
# share the same (batch, budget) build, and ALL rows share the same SSM/data
# for a given (n_max, n_data) — on this 1-CPU host each redundant rebuild
# costs 5-20 s of host-side tracing, which was the difference between the
# b4096/risk rows fitting the driver's 420 s budget or not. Traced programs
# are unchanged by this cache (same jaxprs), so the persistent XLA compile
# cache stays valid across this edit.
_BUILD_CACHE: dict = {}
_SSM_CACHE: dict = {}


def build(batch: int, n_max: int, n_data: int, n_safe: int, dtype,
          outer: int = 14, inner: int = 3, polish: int = 6, rescue: int = 4,
          polish_extra: int = 0, backend: str = "lanes"):
    from safe_exploration_tpu.envs import env_step
    from safe_exploration_tpu.models import make_gp_ssm
    from safe_exploration_tpu.runtime.config import ExperimentConfig, build_experiment

    bkey = (batch, n_max, n_data, n_safe, str(dtype), outer, inner, polish,
            rescue, polish_extra, backend)
    if bkey in _BUILD_CACHE:
        return _BUILD_CACHE[bkey]

    # Headline budget: GN-AL 14x3 + 6 backtracking polish steps + 4 rescue
    # outers — measured 0.902-0.904 feasibility on this cold-start
    # distribution, i.e. AT the 25x8 exact-Hessian oracle ceiling (the
    # remaining ~10% of random x0s are genuinely infeasible tube instances —
    # the fallback chain's job). The default backend is the LANE-MAJOR solve
    # (solvers/sqp_lanes, 4.6-5.7x the vmapped path on v5e — batch-last
    # layout puts lanes in the vector lanes instead of 2x128-tiled 2x2
    # blocks); backend="portable" keeps the vmapped A/B driver-visible.
    # The FAST budget (10x3+3, fast_solves_per_sec) trades ~2pp of
    # feasibility for ~1.5x throughput. All numbers require the package's
    # f32 matmul-precision policy: under TPU's bf16 MXU default the tubes
    # inflate with variance noise and the apparent ceiling drops to 0.695.
    cfg = ExperimentConfig(
        name="bench", solver="sqp", n_safe=n_safe, n_max=n_max,
        sqp_outer=outer, sqp_inner=inner, sqp_polish=polish,
        sqp_rescue=rescue, sqp_polish_extra=polish_extra,
    )
    exp = build_experiment(cfg, dtype=dtype)
    env, a, b = exp["env"], exp["a"], exp["b"]

    key = jax.random.PRNGKey(0)
    skey = (n_max, n_data, str(dtype))
    if skey in _SSM_CACHE:
        ssm = _SSM_CACHE[skey]
    else:
        xs = (
            jax.random.uniform(key, (n_data, 2), dtype, -1.0, 1.0)
            * jnp.asarray([0.3, 1.0], dtype)
        )
        us = jax.random.uniform(
            jax.random.fold_in(key, 1), (n_data, 1), dtype, -1.0, 1.0
        )
        _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
        resid = x_next - (xs @ a.T + us @ b.T)
        ssm = make_gp_ssm(
            exp["kern_types"], xs, us, resid, n_max=n_max,
            l_mu=jnp.full((2,), 0.05, dtype),
            l_sigma=jnp.full((2,), 0.02, dtype),
            log_noise=-4.0,
        )
        # calibrate signal variance to the ~1e-3-scale residuals (as
        # __graft_entry__ does) so the benchmark solves a FEASIBLE problem,
        # not a blown-up tube
        from safe_exploration_tpu.models.gp import gp_refit

        params = tuple(
            {**p, "log_sf": jnp.asarray(-3.0, dtype)} for p in ssm.gp.params
        )
        ssm = ssm.replace(gp=gp_refit(ssm.gp.replace(params=params)))
        _SSM_CACHE[skey] = ssm

    x0s = (
        jax.random.uniform(jax.random.fold_in(key, 2), (batch, 2), dtype, -1.0, 1.0)
        * jnp.asarray([0.15, 0.4], dtype)
    )
    warm = jnp.zeros((batch, n_safe, 1), dtype)

    # the planner consumes the bucketed view (exactly what run_episodic hands
    # it): posterior contractions sized to the 64 active points, not the
    # padded 128-row capacity
    from safe_exploration_tpu.models.ssm import ssm_bucketed

    ssm_plan = ssm_bucketed(ssm)
    if backend == "lanes":
        # production batched entry: the lane-major backend
        # (solvers/sqp_lanes via build_experiment's auto-dispatch)
        bp = exp["batch_planner"]
        solve = jax.jit(lambda x, w: bp(ssm_plan, x, w))
    else:
        solve = jax.jit(jax.vmap(
            lambda x, w: exp["planner"](jax.random.PRNGKey(0), ssm_plan, x, w)
        ))
    _BUILD_CACHE[bkey] = (solve, ssm, x0s, warm)
    return _BUILD_CACHE[bkey]


# first-call (compile + warmup) time of the most recent bench_solves — the
# cache probe the budget gate reads: with the persistent compile cache primed
# this is seconds (disk hit); cold it is minutes on the 1-CPU host, and every
# later sub-benchmark will be cold too (BENCH_r04: the stale cache burned the
# whole budget on the headline and all ~21 secondary rows were skipped)
_LAST_COMPILE_S: float = float("nan")


def bench_solves(batch: int, iters: int, n_max: int, n_data: int, n_safe: int,
                 backend: str = "lanes", **budget):
    global _LAST_COMPILE_S
    dtype = jnp.float32
    solve, ssm, x0s, warm = build(batch, n_max, n_data, n_safe, dtype,
                                  backend=backend, **budget)

    # compile + warmup (timed: the budget gate's warm-vs-cold cache probe)
    t0 = time.perf_counter()
    out = solve(x0s, warm)
    jax.block_until_ready(out)
    _LAST_COMPILE_S = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(iters):
        out = solve(x0s, warm)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    solves_per_sec = batch * iters / dt
    feasible_frac = float(jnp.mean(out[1].astype(jnp.float32)))
    return solves_per_sec, feasible_frac


def bench_warm_solves(batch: int, iters: int, n_max: int, n_data: int,
                      n_safe: int, n_burn: int = 10, n_meas: int = 40):
    """Steady-state receding-horizon throughput: a TRUE closed-loop rollout.

    Each lane runs the full SafeMPC state machine — short-budget warm solve,
    apply u0 to the real plant (env_step), shift the primal plan and the
    stage duals, carry the stored-plan fallback — exactly the production MPC
    regime (reference: IPOPT warm starts per control step, SURVEY.md §2.5).
    Feasibility is reported over the steps AFTER a burn-in (round 1's version
    faked the next state as x0*0.97 without propagating the plant, which made
    the 'warm' number unrepresentative — VERDICT r1 weak #2). Rides the
    BATCHED state machine (solvers/safempc.make_safempc_batch over the
    lane-major solver) — all lanes advance in one program per step.
    """
    from safe_exploration_tpu.envs import env_step
    from safe_exploration_tpu.runtime.config import ExperimentConfig, build_experiment

    del iters  # rollout length is n_burn + n_meas per lane
    dtype = jnp.float32
    _, ssm, x0s, _ = build(batch, n_max, n_data, n_safe, dtype)

    # short warm budget: the steady-state production setting (4x3 GN holds
    # 1.000 steady-state feasibility under the f32 matmul-precision policy;
    # measured ~9700 warm solves/s)
    exp = build_experiment(
        ExperimentConfig(name="warm", solver="sqp", n_safe=n_safe, n_max=n_max,
                         sqp_outer=4, sqp_inner=3),
        dtype=dtype,
    )
    env = exp["env"]
    init_b, get_b = exp["init_state_batch"], exp["get_action_batch"]

    from safe_exploration_tpu.models.ssm import ssm_bucketed

    ssm_plan = ssm_bucketed(ssm)

    def rollout(x0s_, keys):  # keys (n_total, batch, key)
        def step(carry, keys_t):
            state, x = carry
            u, state, info = get_b(state, ssm_plan, x)
            _, x1 = jax.vmap(
                lambda k, xx, uu: env_step(env, k, xx, uu)
            )(keys_t, x, u)
            return (state, x1), info["feasible"]

        (_, _), feas = jax.lax.scan(step, (init_b(batch), x0s_), keys)
        return feas                                       # (n_total, batch)

    roll = jax.jit(rollout)

    key = jax.random.PRNGKey(3)
    n_total = n_burn + n_meas
    keys_all = jax.random.split(key, n_total * batch).reshape(
        n_total, batch, -1
    )

    # compile, then measure; the first n_burn steps are excluded from the
    # feasibility reduction (steady-state receding-horizon regime)
    feas = roll(x0s, keys_all)
    jax.block_until_ready(feas)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        feas = roll(x0s, keys_all)
    jax.block_until_ready(feas)
    dt = time.perf_counter() - t0
    solves_per_sec = batch * n_total * reps / dt
    steady_feas = float(jnp.mean(feas[n_burn:].astype(jnp.float32)))
    return solves_per_sec, steady_feas


def bench_risk_solves(batch: int = 512, iters: int = 6, n_max: int = 128,
                      n_data: int = 64, n_safe: int = 5):
    """Batched cold solves under the Σ-CONSUMING risk_tracking objective.

    The joint safety+performance NLP (n_perf=6, r_shared=2) with the
    variance-priced tracking cost (solvers/costs.risk_tracking_cost,
    perf_trajectory="taylor"): the lane backend carries the full lane-major
    Σ recursion (sqp_lanes._rollout_perf_lanes want_sigma=True) inside the
    GN-AL solve — driver-visible evidence that the risk-sensitive objective
    rides the lane pipeline (round-5 feature; exact f64 objective parity
    with the portable path is pinned in tests/test_perf_trajectory_sqp.py).
    Returns (solves_per_sec, feasible_frac).
    """
    from safe_exploration_tpu.models.ssm import ssm_bucketed
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )
    from safe_exploration_tpu.solvers.sqp import SqpConfig, sqp_warm_len

    dtype = jnp.float32
    _, ssm, x0s, _ = build(batch, n_max, n_data, n_safe, dtype)
    # budget: feasibility on this joint 9-var NLP plateaus at ~0.867 (probed
    # 10x3+3: 0.803, robust 14x3+6+4: 0.865, 12x3+4+2+e3: 0.867 at 26.2k/s
    # — the violation-gated extras are the cheapest way to the plateau).
    # At the SAME budget the plain-tracking joint NLP reaches 0.855: pricing
    # variance into the objective steers plans toward low-uncertainty
    # regions and slightly HELPS tube feasibility.
    cfg = ExperimentConfig(
        name="bench_risk", solver="sqp", objective="risk_tracking",
        w_sigma=5.0, n_safe=n_safe, n_perf=6, r_shared=2, n_max=n_max,
        sqp_outer=12, sqp_inner=3, sqp_polish=4, sqp_rescue=2,
        sqp_polish_extra=3,
    )
    exp = build_experiment(cfg, dtype=dtype)
    warm_rows = sqp_warm_len(
        SqpConfig(n_safe=n_safe, n_perf=6, r_shared=2)
    )
    warm = jnp.zeros((batch, warm_rows, 1), dtype)
    ssm_plan = ssm_bucketed(ssm)
    bp = exp["batch_planner"]
    solve = jax.jit(lambda x, w: bp(ssm_plan, x, w))

    out = solve(x0s, warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = solve(x0s, warm)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt, float(jnp.mean(out[1].astype(jnp.float32)))


def bench_batched_episodes(batch: int = 256, n_steps: int = 16,
                           n_data: int = 48, n_max: int = 64,
                           backend: str = "lanes"):
    """BASELINE config 3 regime: B independent ONLINE-LEARNING episodes —
    per step every lane plans (SafeMPC state machine), steps its own plant
    and appends the observed transition to ITS OWN GP (O(n^2) incremental).

    backend="lanes" is the lane-major path (per-lane LaneGPSSM buffers +
    lane SQP, runtime/batch.run_batched_episodes_lanes); "vmapped" is the
    portable stacked-pytree runner — the layout A/B for the ONLINE-learning
    loop (the cold/warm rows above hold the model fixed). Measured verdict
    (solo, v5e): vmapped 454.6 vs lanes 241.6 steps/s at equal feasibility —
    the per-step per-lane append/predict is VPU/bandwidth-bound, so the lane
    layout does NOT pay here and ExperimentConfig.batch_backend="auto"
    routes the runner to vmapped (the SOLVE inside still rides lane-major).
    Both rows stay driver-visible.
    Returns (env_steps_per_sec, feasible_frac).
    """
    from safe_exploration_tpu.runtime.batch import (
        run_batched_episodes,
        run_batched_episodes_lanes,
        stack_ssm,
    )
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    dtype = jnp.float32
    _, ssm, x0s, _ = build(batch, n_max, n_data, 5, dtype)
    # steady-state per-step budget (the warm-solve regime: each lane re-plans
    # from its shifted warm start every step)
    exp = build_experiment(
        ExperimentConfig(name="bepi", solver="sqp", n_safe=5, n_max=n_max,
                         sqp_outer=4, sqp_inner=3),
        dtype=dtype,
    )
    keys = jax.random.split(jax.random.PRNGKey(5), batch)

    if backend == "lanes":
        from safe_exploration_tpu.models.gp_lanes import lane_stack_ssm

        def run():
            return run_batched_episodes_lanes(
                exp["env"], exp["get_action_batch"],
                exp["init_state_batch"], lane_stack_ssm(ssm, batch),
                x0s, keys, n_steps, exp["a"], exp["b"],
            )
    else:
        def run():
            return run_batched_episodes(
                exp["env"], exp["get_action"], exp["init_state"],
                stack_ssm(ssm, batch), x0s, keys, n_steps,
                exp["a"], exp["b"],
            )

    traj, _ = run()                                   # compile + warmup
    jax.block_until_ready(traj)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        traj, _ = run()
    jax.block_until_ready(traj)
    dt = time.perf_counter() - t0
    steps_per_sec = batch * n_steps * reps / dt
    feas = float(jnp.mean(traj["feasible"].astype(jnp.float32)))
    return steps_per_sec, feas


def bench_sparse_solves(batch: int = 512, iters: int = 10, n_data: int = 10240,
                        m: int = 256, n_safe: int = 5, backend: str = "lanes"):
    """Cold batched SQP solves over a BASELINE-cfg-4-SCALE sparse model:
    N=10k training points, m=256 inducing — the inducing-point tier INSIDE
    the fleet-solve hot loop (round-3 snapshot work: SparseGPSSM rides the
    lane-major backend; reference GPy ``SparseGPRegression`` inside
    ``safempc_simple``, SURVEY.md §2.3/§2.5). Per-solve posterior cost is
    O(m) mean / O(m^2) variance regardless of N. backend="vmapped" is the
    portable layout A/B, mirroring the exact-GP rows above.
    Returns (solves_per_sec, feasible_frac)."""
    from safe_exploration_tpu.envs import env_step
    from safe_exploration_tpu.models.sparse_gp import (
        make_sparse_gp_ssm,
        sparse_gp_refit,
    )
    from safe_exploration_tpu.models.ssm import ssm_bucketed
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    dtype = jnp.float32
    # c_safety=1.8, not the headline's 2.0: the VFE variance floor is
    # x0-independent (kzz - qzz > 0 even on data), so at 2.0 the tube is
    # infeasible for EVERY x0 on this distribution (measured cliff pinned in
    # tests/test_sqp_lanes_sparse.py)
    cfg = ExperimentConfig(
        name="bsparse", solver="sqp", n_safe=n_safe, n_max=n_data,
        c_safety=1.8, sqp_outer=14, sqp_inner=3, sqp_polish=6, sqp_rescue=4,
    )
    exp = build_experiment(cfg, dtype=dtype)
    env, a, b = exp["env"], exp["a"], exp["b"]
    key = jax.random.PRNGKey(0)
    xs = (
        jax.random.uniform(key, (n_data, 2), dtype, -1.0, 1.0)
        * jnp.asarray([0.3, 1.0], dtype)
    )
    us = jax.random.uniform(jax.random.fold_in(key, 1), (n_data, 1), dtype,
                            -1.0, 1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_sparse_gp_ssm(
        exp["kern_types"], xs, us, resid, n_max=n_data, n_inducing=m,
        l_mu=jnp.full((2,), 0.05, dtype), l_sigma=jnp.full((2,), 0.02, dtype),
        log_noise=-4.0,
    )
    params = tuple(
        {**p, "log_sf": jnp.asarray(-3.0, dtype)} for p in ssm.sgp.params
    )
    ssm = ssm.replace(sgp=sparse_gp_refit(ssm.sgp.replace(params=params)))
    x0s = (
        jax.random.uniform(jax.random.fold_in(key, 2), (batch, 2), dtype,
                           -1.0, 1.0)
        * jnp.asarray([0.15, 0.4], dtype)
    )
    warm = jnp.zeros((batch, n_safe, 1), dtype)
    ssm_plan = ssm_bucketed(ssm)
    if backend == "lanes":
        bp = exp["batch_planner"]
        solve = jax.jit(lambda x, w: bp(ssm_plan, x, w))
    else:
        solve = jax.jit(jax.vmap(
            lambda x, w: exp["planner"](jax.random.PRNGKey(0), ssm_plan, x, w)
        ))
    out = solve(x0s, warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = solve(x0s, warm)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt, float(jnp.mean(out[1].astype(jnp.float32)))


def bench_cem_solves(batch: int = 256, iters: int = 5, n_max: int = 64,
                     n_data: int = 48, n_safe: int = 5,
                     backend: str = "lanes", gp_impl: str = "auto"):
    """Constrained-CEM batched cold solves — the sampling-based solver family
    (BASELINE cfg 5's planner, reference safempc_cem.py).

    backend="lanes": solvers/cem_lanes — the M samples x B instances product
    is ONE lane axis, so every tube intermediate is batch-last and the GP
    contractions are (n, M*B) MXU matmuls. "vmapped": vmap the portable
    cem_plan over instances (each vmapping its own M samples) — the layout
    A/B for CEM, mirroring the SQP rows above.
    Returns (solves_per_sec, feasible_frac).
    """
    from safe_exploration_tpu.models.ssm import ssm_bucketed
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )
    from safe_exploration_tpu.solvers.cem import cem_warm_len

    dtype = jnp.float32
    _, ssm, x0s, _ = build(batch, n_max, n_data, n_safe, dtype)
    cfg = ExperimentConfig(
        name="bcem", solver="cem", n_safe=n_safe, n_max=n_max,
        cem_samples=64, cem_elites=12, cem_iterations=4,
        cem_gp_impl=gp_impl,
    )
    exp = build_experiment(cfg, dtype=dtype)
    from safe_exploration_tpu.solvers.cem import CemConfig

    t_total = cem_warm_len(CemConfig(n_safe=n_safe))
    warm = jnp.zeros((batch, t_total, 1), dtype)
    ssm_plan = ssm_bucketed(ssm)

    if backend == "lanes":
        bp = exp["batch_planner"]
        solve = jax.jit(lambda x, w: bp(ssm_plan, x, w))
    else:
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        solve = jax.jit(lambda x, w: jax.vmap(
            lambda k, xx, ww: exp["planner"](k, ssm_plan, xx, ww)
        )(keys, x, w))

    out = solve(x0s, warm)                                 # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = solve(x0s, warm)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    solves_per_sec = batch * iters / dt
    feasible_frac = float(jnp.mean(out[1].astype(jnp.float32)))
    return solves_per_sec, feasible_frac


def bench_cem_single(iters: int = 30, n_max: int = 64, n_data: int = 48,
                     n_safe: int = 5, backend: str = "lanes"):
    """SINGLE-instance CEM solve latency (ms) — the episodic-runner regime
    (BASELINE cfg 5: one quadrotor instance per control step). Even at B=1
    the lane backend has work for the vector lanes: the M samples ARE the
    lanes. backend="portable" is the vmap-over-samples planner. This A/B
    decides the cem_backend config default."""
    from safe_exploration_tpu.models.ssm import ssm_bucketed
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    dtype = jnp.float32
    _, ssm, x0s, _ = build(8, n_max, n_data, n_safe, dtype)
    cfg = ExperimentConfig(
        name="bcem1", solver="cem", n_safe=n_safe, n_max=n_max,
        cem_samples=128, cem_elites=16, cem_iterations=6,
        cem_backend="lanes" if backend == "lanes" else "portable",
    )
    exp = build_experiment(cfg, dtype=dtype)
    ssm_plan = ssm_bucketed(ssm)
    x0 = x0s[0]
    warm = jnp.zeros((n_safe, 1), dtype)
    solve = jax.jit(
        lambda k, x, w: exp["planner"](k, ssm_plan, x, w)
    )
    key = jax.random.PRNGKey(0)
    out = solve(key, x0, warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = solve(jax.random.fold_in(key, i), x0, warm)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, float(out[1])


def _best_of(f, rounds: int = 3, reps: int = 50) -> float:
    """min-of-rounds mean latency (ms): sub-ms kernels over the host tunnel
    jitter 2-3x run-to-run; the minimum round is the least-contended one."""
    best = float("inf")
    out = f()
    jax.block_until_ready(out)
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def _device_ms(make_step, n_short: int = 8, rounds: int = 6,
               target_ms: float = 80.0, max_len: int = 32768) -> float:
    """DEVICE-side per-call latency (ms) via chain-length differencing.

    Host timings over the axon tunnel cannot rank sub-ms kernels: one
    blocking dispatch costs ~25 ms and pipelined reps bottom out at a
    ~0.7 ms/call dispatch floor (BENCH_r02's kernel rows measured exactly
    that floor on both sides — VERDICT r2 weak #1). Here ``make_step`` runs
    inside ONE jitted ``lax.scan`` at two chain lengths; the slope
    (t_long - t_short)/(n_long - n_short) cancels the roundtrip constant.
    ``optimization_barrier`` forces the full output to materialize each
    iteration — without it XLA dead-code-eliminates everything but the one
    element the carry consumes, which flatters fusable candidates ~100x.

    The long chain is SIZED FROM A CALIBRATION RUN so the differenced device
    time is ~``target_ms`` — a fixed short chain under-resolves fast kernels
    (an early revision measured a 10 us "gram" at n=2048, below the 20 us
    HBM write speed-of-light for the 16.8 MB output: pure differencing
    noise at a 40-call chain gap).
    """
    def chain(length):
        def scan_fn(c):
            def body(c, _):
                out = jax.lax.optimization_barrier(make_step(c))
                return out[0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, c, None, length=length)
            return c

        f = jax.jit(scan_fn)
        c0 = jnp.zeros((), jnp.float32)
        jax.block_until_ready(f(c0))
        best = float("inf")
        n_rounds = rounds
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            jax.block_until_ready(f(c0))
            dt = (time.perf_counter() - t0) * 1e3
            best = min(best, dt)
            if dt > 400.0:  # expensive chain: 2 timed rounds is plenty
                n_rounds = 2
        return best

    t_short = chain(n_short)
    probe = 256
    t_probe = chain(probe)
    diff = t_probe - t_short
    if diff >= 20.0:  # device work already dominates tunnel jitter
        return diff / (probe - n_short)
    # fast kernel: size the long chain from a jitter-floored slope upper
    # bound so the differenced device time lands near target_ms. Round the
    # calibrated length UP to a power of two so the chain program shape is
    # stable run-to-run and hits the persistent compilation cache (a
    # data-dependent length would force a fresh multi-second compile on the
    # 1-CPU host every run).
    slope_ub = max(diff, 2.0) / (probe - n_short)
    n_long = min(max_len, n_short + int(target_ms / slope_ub))
    n_long = min(max_len, 1 << max(9, (n_long - 1).bit_length()))
    if n_long <= n_short:
        n_long = 2 * n_short
    return (chain(n_long) - t_short) / (n_long - n_short)


def bench_gp_latency(n: int = 256, d: int = 3, e: int = 2):
    """Secondary metric: GP refit (Cholesky) + predict latency."""
    from safe_exploration_tpu.models import gp_init, gp_predict_jac, gp_refit

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d), dtype)
    y = jax.random.normal(jax.random.fold_in(key, 1), (n, e), dtype)
    gp = gp_init(("rbf",) * e, x, y, n_max=n)
    z = jnp.zeros((d,), dtype)
    # device-side (sub-ms ops sit under the tunnel's dispatch floor host-side)
    chol_ms = _device_ms(lambda c: gp_refit(gp.replace(y=gp.y + c)).chol[0])
    pred_ms = _device_ms(
        lambda c: jnp.stack(gp_predict_jac(gp, z + c)[:2])
    )
    return chol_ms, pred_ms


def bench_large_gp(n: int = 10240, m: int = 256, d: int = 7, e: int = 2):
    """BASELINE config 4: N=10k inducing-point GP refit + predict latency."""
    from safe_exploration_tpu.models.sparse_gp import (
        sparse_gp_init,
        sparse_gp_predict,
        sparse_gp_refit,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d), jnp.float32)
    y = jax.random.normal(jax.random.fold_in(key, 1), (n, e), jnp.float32)
    sgp = sparse_gp_init(("rbf",) * e, x, y, n_max=n, n_inducing=m)
    refit = jax.jit(sparse_gp_refit)
    z = jnp.zeros((d,), jnp.float32)
    jax.block_until_ready(refit(sgp))
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = refit(sgp)
    jax.block_until_ready(out)
    refit_ms = (time.perf_counter() - t0) / reps * 1e3
    # predict is ~50 us — far below the tunnel's ~0.7-1 ms dispatch floor, so
    # time it device-side (a 200-rep host loop reads back the floor, not the op)
    pred_ms = _device_ms(
        lambda c: jnp.stack(sparse_gp_predict(sgp, z + c), axis=-1)
    )
    return refit_ms, pred_ms * 1e3


def bench_serve_step(n_max: int = 128, n_data: int = 64, n_safe: int = 5):
    """Single-plant PRODUCTION step latency, device-side (ms): one full
    get_action — warm-budget SQP solve + fallback state machine — the program
    runtime/serve.ServeController AOT-compiles for deployment. Host-side
    step() latency over the axon tunnel is dominated by the ~25 ms roundtrip,
    so the honest per-step number is the chained device time (the reference's
    counterpart is one CasADi/IPOPT get_action on CPU, SURVEY.md §3.3)."""
    from safe_exploration_tpu.models.ssm import ssm_bucketed
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    dtype = jnp.float32
    _, ssm, x0s, _ = build(8, n_max, n_data, n_safe, dtype)
    exp = build_experiment(
        ExperimentConfig(name="serve", solver="sqp", n_safe=n_safe,
                         n_max=n_max, sqp_outer=4, sqp_inner=3),
        dtype=dtype,
    )
    ssm_plan = ssm_bucketed(ssm)
    state = exp["init_state"]()
    key = jax.random.PRNGKey(0)
    x0 = x0s[0]

    def step(c):
        u, _, _ = exp["get_action"](key, state, ssm_plan, x0 + c)
        return u[None, :]

    return _device_ms(step)


def bench_pallas_gram_trsm(sizes=(512, 2048), d: int = 3):
    """Device-side library-kernel A/B at VMEM- and HBM-tier sizes.

    NEITHER kernel is dispatched: with calibrated chain-differenced timing
    the fused masked-RBF Gram measures 1.3-1.6x slower than XLA's fused
    composition at every size and the blocked TRSM 1.6-2x slower than XLA's
    triangular solve (see the dispatch-policy note in models/gp.py). Both
    stay benched so the A/B stays driver-visible across toolchain updates."""
    from safe_exploration_tpu.models.gp import _masked_gram
    from safe_exploration_tpu.ops.pallas import (
        on_tpu,
        rbf_gram_masked,
        trsm_lower_blocked,
    )

    out = {}
    for n in sizes:
        keys = (f"pallas_gram_us_n{n}", f"xla_gram_us_n{n}",
                f"pallas_trsm_us_n{n}", f"xla_trsm_us_n{n}")
        if not on_tpu():
            out.update({k: float("nan") for k in keys})
            continue
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, d), jnp.float32)
        mask = jnp.ones((n,), jnp.float32)
        params = {"log_lengthscales": jnp.zeros((d,), jnp.float32),
                  "log_sf": jnp.zeros((), jnp.float32)}
        noise = jnp.asarray(0.01, jnp.float32)
        k_x = _masked_gram("rbf", params, x, mask, noise)
        l = jnp.linalg.cholesky(k_x)
        eye = jnp.eye(n, dtype=jnp.float32)
        vals = (
            _device_ms(lambda c: rbf_gram_masked(params, x + c, mask, noise)),
            _device_ms(lambda c: _masked_gram("rbf", params, x + c, mask,
                                              noise)),
            _device_ms(lambda c: trsm_lower_blocked(l, eye + c)),
            _device_ms(lambda c: jax.scipy.linalg.solve_triangular(
                l, eye + c, lower=True)),
        )
        out.update({k: round(v * 1e3, 1) for k, v in zip(keys, vals)})
    return out


def bench_pallas_gp_predict(n_data: int = 64, n_lanes: int = 16384):
    """Device-side A/B: the fused Pallas posterior kernel
    (ops/pallas/gp_predict — mean/var/Jacobian in one VMEM pass) vs the lane
    XLA chain it replaces, at CEM-scorer scale (n support rows x M*B lanes).
    This is the op the lane CEM scorer dispatches on (gp_impl="auto")."""
    from safe_exploration_tpu.models.ssm import ssm_bucketed
    from safe_exploration_tpu.ops.pallas import on_tpu
    from safe_exploration_tpu.solvers.sqp_lanes import (
        _gp_predict_lanes,
        _gp_predict_lanes_pallas,
    )

    tag = f"n{n_data}_l{n_lanes // 1024}k"
    keys_out = (f"pallas_gp_predict_us_{tag}", f"xla_gp_predict_us_{tag}")
    if not on_tpu():
        return {k: float("nan") for k in keys_out}
    dtype = jnp.float32
    _, ssm, _, _ = build(8, 128, n_data, 5, dtype)
    ssm = ssm_bucketed(ssm)
    z = jax.random.uniform(
        jax.random.PRNGKey(5), (3, n_lanes), dtype, -1.0, 1.0
    )

    def step_of(fn):
        def step(c):
            mu, var, jac = fn(ssm, z + c, want_jac=True)
            return mu + var + jac[:, 0, :]   # consume all three (no DCE)
        return step

    vals = (
        _device_ms(step_of(_gp_predict_lanes_pallas)),
        _device_ms(step_of(_gp_predict_lanes)),
    )
    return {k: round(v * 1e3, 1) for k, v in zip(keys_out, vals)}


def bench_cem_score_fused(n_data: int = 48, m_samples: int = 64,
                          batch: int = 256, t_len: int = 5):
    """Device-side A/B of the WHOLE-ROLLOUT fused Pallas CEM scorer
    (ops/pallas/cem_score — tube + margins + cost in ONE launch) vs the lane
    XLA chain it fuses, at CEM-iteration scale (M*B lanes). This is the
    'structural fusion XLA cannot express' experiment (VERDICT r4 next #5):
    the per-op fused GP kernel lost its A/B; this tests fusion of the whole
    evaluation. The dispatch-level counterpart is cem_solves_per_sec_fused."""
    from safe_exploration_tpu.models.ssm import ssm_bucketed
    from safe_exploration_tpu.ops.pallas import on_tpu
    from safe_exploration_tpu.ops.pallas.cem_score import (
        tube_score_lanes_pallas,
    )
    from safe_exploration_tpu.solvers.cem_lanes import _TubeCfg
    from safe_exploration_tpu.solvers.sqp_lanes import (
        _cost_lanes,
        _dist_lanes,
        _rollout_y_lanes,
    )

    tag = f"l{m_samples * batch // 1024}k"
    keys_out = (f"cem_score_fused_us_{tag}", f"cem_score_xla_us_{tag}")
    if not on_tpu():
        return {k: float("nan") for k in keys_out}
    dtype = jnp.float32
    _, ssm, x0s, _ = build(batch, 128, n_data, t_len, dtype)
    ssm = ssm_bucketed(ssm)
    from safe_exploration_tpu.envs import linearize_discretize, make_pendulum
    from safe_exploration_tpu.ops.linalg import dlqr

    env = make_pendulum(dtype=dtype)
    spec = env.spec
    a, b = linearize_discretize(env)
    k_lqr, _ = dlqr(a, b, jnp.eye(2, dtype=dtype), jnp.eye(1, dtype=dtype))
    k_fb = -k_lqr
    s_lift = jnp.concatenate([jnp.eye(2, dtype=dtype), k_fb], axis=0)
    bmat = s_lift.T @ s_lift
    n_var = t_len
    L = m_samples * batch
    x0_wide = jnp.broadcast_to(
        x0s.T[:, None, :], (2, m_samples, batch)
    ).reshape(2, L)
    u0 = 0.3 * jax.random.normal(jax.random.PRNGKey(9), (n_var, L), dtype)
    cost_args = {"target": spec.target}
    tube_cfg = _TubeCfg(n_safe=t_len, c_safety=2.0, n_perf=0)
    x0_rows = [x0_wide[i] for i in range(2)]

    def fused(c):
        cost, viol = tube_score_lanes_pallas(
            ssm, u0 + c, x0_wide, k_fb, a, b, bmat,
            spec.h_mat_obs, spec.h_obs, spec.h_mat_safe, spec.h_safe,
            2.0, t_len, "tracking", cost_args,
        )
        return (cost + 100.0 * viol)[None, :]

    def xla(c):
        y = _rollout_y_lanes(ssm, u0 + c, x0_rows, k_fb, a, b, tube_cfg,
                             bmat, 0, 1)
        g = _dist_lanes(y, t_len, 2, spec.h_mat_obs, spec.h_obs,
                        spec.h_mat_safe, spec.h_safe)
        viol = jnp.sum(jnp.maximum(g, 0.0), axis=0)
        cost = _cost_lanes("tracking", cost_args, y, u0 + c, t_len, 2, 1)
        return (cost + 100.0 * viol)[None, :]

    vals = (_device_ms(fused), _device_ms(xla))
    return {k: round(v * 1e3, 1) for k, v in zip(keys_out, vals)}


def bench_pallas_chol(n: int = 512):
    """VMEM-tier blocked Pallas Cholesky vs XLA, device-side (NOT dispatched —
    XLA wins 3-5x at f32-accurate precision; reported for transparency)."""
    from safe_exploration_tpu.ops.pallas import cholesky_blocked, on_tpu

    if not on_tpu():
        return {"pallas": float("nan"), "xla": float("nan")}
    key = jax.random.PRNGKey(0)
    mmat = jax.random.normal(key, (n, n), jnp.float32)
    a1 = mmat @ mmat.T + n * jnp.eye(n, dtype=jnp.float32)
    eye = jnp.eye(n, dtype=jnp.float32)
    return {
        "pallas": _device_ms(lambda c: cholesky_blocked(a1 + c * eye)),
        "xla": _device_ms(lambda c: jnp.linalg.cholesky(a1 + c * eye)),
    }


def bench_pallas_chol_hbm(sizes=(2048, 4096)):
    """HBM-tier dense Cholesky: the Pallas left-looking block-column kernel
    (ops/pallas/cholesky_hbm — explicit library kernel, NOT dispatched: it
    measures ~3x slower than XLA's lowering) vs XLA at sizes beyond VMEM
    (VERDICT r2 next #1a: BENCH_r02 had no number for this tier at all)."""
    from safe_exploration_tpu.ops.pallas import cholesky_hbm, on_tpu

    out = {}
    for n in sizes:
        if not on_tpu():
            out[f"pallas_chol_hbm_ms_n{n}"] = float("nan")
            out[f"xla_chol_ms_n{n}"] = float("nan")
            continue
        key = jax.random.PRNGKey(0)
        mmat = jax.random.normal(key, (n, n), jnp.float32)
        a = mmat @ mmat.T + n * jnp.eye(n, dtype=jnp.float32)
        eye = jnp.eye(n, dtype=jnp.float32)
        p_ms = _device_ms(lambda c: cholesky_hbm(a + c * eye), rounds=3)
        x_ms = _device_ms(lambda c: jnp.linalg.cholesky(a + c * eye), rounds=3)
        out[f"pallas_chol_hbm_ms_n{n}"] = round(p_ms, 3)
        out[f"xla_chol_ms_n{n}"] = round(x_ms, 3)
    return out


def bench_ff_refit(n: int = 128, d: int = 3, e: int = 2):
    """precision="ff" GP refit latency (the fp64-equivalent mode, VERDICT r1
    item 7 — now a usable config knob, not just evidence)."""
    from safe_exploration_tpu.models import gp_init, gp_refit

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d), jnp.float32)
    y = jax.random.normal(jax.random.fold_in(key, 1), (n, e), jnp.float32)
    gp = gp_init(("rbf",) * e, x, y, n_max=n, precision="ff")
    refit = jax.jit(gp_refit)
    jax.block_until_ready(refit(gp))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        g2 = refit(gp)
    jax.block_until_ready(g2)
    return (time.perf_counter() - t0) / reps * 1e3


def bench_ff_chol(n: int = 256):
    """fp64-equivalence evidence: float-float vs plain-f32 factor error."""
    import numpy as np

    from safe_exploration_tpu.ops.ff import cholesky_ff

    rng = np.random.default_rng(0)
    m = rng.standard_normal((n, n))
    a32 = jnp.asarray(m @ m.T + n * np.eye(n), jnp.float32)
    l64 = np.linalg.cholesky(np.asarray(a32, np.float64))
    scale = np.max(np.abs(l64))
    lff = jax.jit(cholesky_ff)(a32)
    got = np.asarray(lff.hi, np.float64) + np.asarray(lff.lo, np.float64)
    err_ff = float(np.max(np.abs(got - l64)) / scale)
    l32 = np.asarray(jnp.linalg.cholesky(a32), np.float64)
    err_f32 = float(np.max(np.abs(l32 - l64)) / scale)
    return err_ff, err_f32


_RESULT: dict = {}
_EMITTED = False


def _emit():
    """Print the ONE JSON line the driver parses. Idempotent — also invoked
    from the SIGTERM/SIGALRM handlers so a timeout still yields a record.
    NaN-valued rows (skipped/failed sub-benchmarks) are dropped: json.dumps
    would render them as bare ``NaN``, which a strict JSON parser rejects —
    and one bad row must not sink the whole record."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True

    def bad(v):
        return isinstance(v, float) and (v != v or v in (float("inf"),
                                                         float("-inf")))

    # the driver-required schema keys must always be present — null, not
    # absent, when the headline itself never landed
    required = ("metric", "value", "unit", "vs_baseline")
    clean = {
        k: (None if bad(v) else v)
        for k, v in _RESULT.items()
        if k in required or not bad(v)
    }
    print(json.dumps(clean, allow_nan=False), flush=True)


def _on_deadline(signum, frame):  # pragma: no cover - timing dependent
    print(f"bench: signal {signum} — emitting partial result", file=sys.stderr)
    _emit()
    # exit 0: a partial-but-parseable record beats rc 124 with no output
    os._exit(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n-max", type=int, default=128)
    ap.add_argument("--n-data", type=int, default=64)
    ap.add_argument("--n-safe", type=int, default=5)
    ap.add_argument(
        "--budget", type=float,
        default=float(os.environ.get("BENCH_BUDGET_S", "420")),
        help="wall-clock budget (s): sub-benchmarks that would not fit are "
        "skipped (NaN rows). The driver's timeout killed round 3's bench "
        "with no output; this keeps the JSON line guaranteed.",
    )
    args = ap.parse_args()

    t_start = time.perf_counter()

    def left():
        return args.budget - (time.perf_counter() - t_start)

    nan = float("nan")
    signal.signal(signal.SIGTERM, _on_deadline)
    signal.signal(signal.SIGALRM, _on_deadline)
    # hard self-deadline a little past the soft budget: if one sub-benchmark
    # blows through its estimate (cold cache), emit what we have and stop.
    # 150 s of grace: the second-chance pass below deliberately eats into it
    # for cheap rows after an overrun (BENCH_r04 skipped ALL ~21 secondary
    # rows at -40 s left, including 30 s ones the grace easily covers).
    signal.alarm(int(args.budget + 150))

    def _safe(fn, default):
        """Secondary metrics must never sink the headline JSON line."""
        try:
            return fn()
        except Exception as e:  # pragma: no cover - defensive
            print(f"bench sub-metric failed: {e!r}", file=sys.stderr)
            return default

    # ---- headline (always runs, first) ------------------------------------
    # A parseable record must survive even a broken headline: pre-fill the
    # driver-required keys, then overwrite with the measurement.
    _RESULT.update({
        "metric": "safe_mpc_solves_per_sec_pendulum_H5",
        "value": nan,
        "unit": "solves/s",
        "vs_baseline": nan,
        "device": str(jax.devices()[0]),
    })
    solves_per_sec, feasible_frac = _safe(
        lambda: bench_solves(
            args.batch, args.iters, args.n_max, args.n_data, args.n_safe
        ),
        (nan, nan),
    )
    _RESULT.update({
        "value": round(solves_per_sec, 1),
        "vs_baseline": round(solves_per_sec / 1000.0, 3),
        "batch": args.batch,
        "feasible_frac": round(feasible_frac, 3),
        # feasible-only throughput: discounts fallback-trigger returns
        # (~10% of this random-x0 distribution is genuinely infeasible —
        # the headline budget sits AT the 25x8 exact-Hessian oracle ceiling
        # of 0.904 on this distribution)
        "feasible_solves_per_sec": round(solves_per_sec * feasible_frac, 1),
    })

    # ---- optional sub-benchmarks, priority order ---------------------------
    # Each entry: (cost estimate s on a COLD compile cache, keys, fill fn).
    # On a primed cache (bench.py ran during the round on this machine) each
    # costs seconds and everything fits; on a cold cache the budget gate
    # degrades gracefully instead of timing out with no output (round 3).
    def _two(keys, fn, scale=(1.0, 1.0), digits=(1, 3)):
        def fill():
            a_val, b_val = _safe(fn, (nan, nan))
            _RESULT[keys[0]] = round(a_val * scale[0], digits[0])
            _RESULT[keys[1]] = round(b_val * scale[1], digits[1])
        return fill

    def _fill_pallas_chol():
        tier = _safe(bench_pallas_chol, {"pallas": nan, "xla": nan})
        _RESULT["pallas_chol_ms_n512"] = round(tier["pallas"], 3)
        _RESULT["xla_chol_ms_n512"] = round(tier["xla"], 3)

    def _fill_ff():
        err_ff, err_f32 = _safe(bench_ff_chol, (nan, nan))
        _RESULT["ff_chol_rel_err_n256"] = float(f"{err_ff:.3e}")
        _RESULT["f32_chol_rel_err_n256"] = float(f"{err_f32:.3e}")

    b, it, nm, nd, ns = (args.batch, args.iters, args.n_max, args.n_data,
                         args.n_safe)
    # Each entry: (name, cold_est_s, warm_est_s, fill). cold = fresh XLA
    # compiles on the 1-CPU host; warm = persistent compile cache primed
    # (tools/prime_cache.sh runs at the END of the build round, AFTER the
    # last traced-source commit — the r4 failure mode was a cache primed
    # before late commits to traced source, making every estimate wrong).
    # The gate picks the column from a MEASURED probe: the headline's own
    # first-call time (_LAST_COMPILE_S), recorded in the JSON record as
    # headline_compile_s so the driver artifact shows which regime ran.
    # Ordered by evidential priority (VERDICT r4 next #1's done-list first).
    plan = [
        # steady-state closed loop: the production MPC regime
        ("warm", 120, 25, _two(("warm_solves_per_sec", "warm_feasible_frac"),
                   lambda: bench_warm_solves(b, it, nm, nd, ns))),
        # cold fast budget (single GN-AL pass speed ceiling) with the
        # violation-gated extra polish (SqpConfig.n_polish_extra — VERDICT
        # r4 next #8: recover feasibility on the short budget only for
        # batches that need it)
        ("fast", 60, 15, _two(("fast_solves_per_sec", "fast_feasible_frac"),
                  lambda: bench_solves(b, it, nm, nd, ns, outer=10, inner=3,
                                       polish=3, rescue=0, polish_extra=3))),
        # layout A/B: the vmapped portable path behind the lane backend's win
        ("portable", 240, 20,
         _two(("portable_solves_per_sec", "portable_feasible_frac"),
              lambda: bench_solves(b, it, nm, nd, ns, backend="portable"))),
        # sparse model (BASELINE cfg 4 scale) inside the batched cold solve
        ("sparse", 120, 50, _two(("sparse_solves_per_sec",
                                  "sparse_feasible_frac"),
                   bench_sparse_solves)),
        # constrained-CEM batched solves (sampling-based solver family)
        ("cem", 120, 30, _two(("cem_solves_per_sec", "cem_feasible_frac"),
                   bench_cem_solves)),
        # single-plant production step latency (runtime/serve regime)
        ("serve", 90, 20, lambda: _RESULT.update(
            {"serve_step_device_ms": round(_safe(bench_serve_step, nan), 3)})),
        # batch-scaling point for the headline: the roofline analysis
        # (tools/roofline.py) says the batch-512 solve is bound by the
        # serial dependency chain, not FLOPs/bandwidth — so throughput
        # should keep scaling with batch until the per-step kernels fill
        # the chip. This row measures the same robust-budget cold solve at
        # batch 4096 (fewer iters: same wall budget).
        ("headline_b4096", 240, 70,
         _two(("solves_per_sec_b4096", "feasible_frac_b4096"),
              lambda: bench_solves(4096, 3, nm, nd, ns))),
        # warm receding-horizon re-solves at the same scaling point: the
        # short-budget closed-loop step has an even shorter dependency
        # chain, so batch scaling pays MORE in the production regime
        ("warm_b4096", 240, 45,
         _two(("warm_solves_per_sec_b4096", "warm_feasible_frac_b4096"),
              lambda: bench_warm_solves(4096, 0, nm, nd, ns))),
        # the Σ-consuming risk-sensitive objective through the lane
        # backend's perf-covariance recursion (round-5 feature row)
        ("risk_lanes", 200, 30,
         _two(("risk_solves_per_sec", "risk_feasible_frac"),
              bench_risk_solves)),
        # GP latency rows (device-side)
        ("gp_latency", 90, 20,
         _two(("gp_refit_chol_ms_n256", "gp_predict_jac_ms_n256"),
              bench_gp_latency, digits=(3, 3))),
        ("sparse_gp_latency", 90, 30,
         _two(("sparse_gp_refit_ms_n10k_m256", "sparse_gp_predict_us_n10k"),
              bench_large_gp, digits=(3, 2))),
        # ONLINE-learning batched episodes (BASELINE config 3), lane backend
        ("batch_episodes", 150, 80, _two(("batch_episode_steps_per_sec",
                    "batch_episode_feasible_frac"),
                   bench_batched_episodes)),
        # remaining layout A/Bs (vmapped portable paths, driver-visible)
        ("batch_episodes_vmapped", 240, 45,
         _two(("batch_episode_steps_per_sec_vmapped",
               "batch_episode_feasible_frac_vmapped"),
              lambda: bench_batched_episodes(backend="vmapped"))),
        ("sparse_vmapped", 240, 45,
         _two(("sparse_solves_per_sec_vmapped", "sparse_feasible_frac_vmapped"),
              lambda: bench_sparse_solves(backend="vmapped"))),
        ("cem_vmapped", 180, 10,
         _two(("cem_solves_per_sec_vmapped", "cem_feasible_frac_vmapped"),
              lambda: bench_cem_solves(backend="vmapped"))),
        # the lane CEM solve with the XLA posterior chain — the
        # dispatch-level A/B for the fused Pallas posterior kernel
        ("cem_xla_gp", 120, 10, _two(("cem_solves_per_sec_xla_gp",
                    "cem_feasible_frac_xla_gp"),
                   lambda: bench_cem_solves(gp_impl="xla"))),
        # float-float fp64-equivalence evidence (cheap)
        ("ff_chol", 30, 5, _fill_ff),
        ("ff_refit", 60, 22, lambda: _RESULT.update(
            {"ff_refit_ms_n128": round(_safe(bench_ff_refit, nan), 2)})),
        # single-instance CEM latency — the cem_backend A/B
        ("cem_single_lanes", 120, 10,
         _two(("cem_single_ms_lanes", "cem_single_ms_unused"),
              bench_cem_single, digits=(3, 3))),
        ("cem_single_portable", 120, 8,
         _two(("cem_single_ms_portable", "cem_single_ms_unused2"),
              lambda: bench_cem_single(backend="portable"), digits=(3, 3))),
        # the STRUCTURAL-FUSION experiment: whole-rollout fused Pallas CEM
        # scorer vs the XLA chain — op-level and dispatch-level
        ("cem_score_fused", 120, 38,
         lambda: _RESULT.update(_safe(bench_cem_score_fused, {}))),
        ("cem_fused_dispatch", 120, 24,
         _two(("cem_solves_per_sec_fused", "cem_feasible_frac_fused"),
              lambda: bench_cem_solves(gp_impl="fused"))),
        # op-level A/B of the fused posterior kernel at scorer scale
        ("pallas_gp_predict", 90, 14,
         lambda: _RESULT.update(_safe(bench_pallas_gp_predict, {}))),
        # Pallas library-kernel A/Bs (NOT dispatched; kept driver-visible)
        ("pallas_chol", 120, 14, _fill_pallas_chol),
        ("pallas_gram_trsm", 320, 310,
         lambda: _RESULT.update(_safe(bench_pallas_gram_trsm, {}))),
        ("pallas_chol_hbm", 420, 290,
         lambda: _RESULT.update(_safe(bench_pallas_chol_hbm, {}))),
    ]

    # cache probe: the headline's first call is seconds on a primed cache,
    # minutes cold — pick the estimate column accordingly
    warm_cache = _LAST_COMPILE_S == _LAST_COMPILE_S and _LAST_COMPILE_S < 45.0
    _RESULT["headline_compile_s"] = (
        round(_LAST_COMPILE_S, 1) if _LAST_COMPILE_S == _LAST_COMPILE_S
        else None
    )
    _RESULT["cache_state"] = "warm" if warm_cache else "cold"

    def est_of(row):
        return row[2] if warm_cache else row[1]

    skipped = []
    for row in plan:
        name, fill = row[0], row[3]
        if left() < est_of(row):
            print(f"bench: deferring {name} (est {est_of(row)}s, "
                  f"{left():.0f}s left)", file=sys.stderr)
            skipped.append(row)
            continue
        t0 = time.perf_counter()
        fill()
        print(f"bench: {name} done in {time.perf_counter() - t0:.1f}s"
              f" ({left():.0f}s left)", file=sys.stderr)

    # second-chance pass (VERDICT r4 next #1c): after an overrun, still run
    # the cheapest deferred rows inside the alarm grace — left() may be
    # negative, but the alarm only fires at budget+150 and the handler still
    # emits a parseable record, so eating up to ~120 s of grace is safe.
    for row in sorted(skipped, key=est_of):
        name, fill = row[0], row[3]
        if left() - est_of(row) < -120.0:
            print(f"bench: skipping {name} (est {est_of(row)}s, "
                  f"{left():.0f}s left)", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        fill()
        print(f"bench: {name} (second chance) done in "
              f"{time.perf_counter() - t0:.1f}s ({left():.0f}s left)",
              file=sys.stderr)

    _RESULT.pop("cem_single_ms_unused", None)
    _RESULT.pop("cem_single_ms_unused2", None)
    signal.alarm(0)
    _emit()


if __name__ == "__main__":
    main()
