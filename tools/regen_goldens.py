"""Regenerate the frozen parity goldens (SURVEY.md §7 hard-part 3).

The BASELINE north star is "trajectories / GP posteriors / constraint
satisfaction match the reference to 1e-4". The reference mount
(/root/reference) has been EMPTY every round so far, so the goldens are
two-sourced:

  * ``--source self`` (default, works today): freeze OUR OWN f64 CPU
    computation — GP posteriors, reachability tubes, constraint margins and
    solver outputs for BASELINE configs 1 (pendulum H=5) and 2 (cartpole
    H=10) — as .npz artifacts under tests/goldens/. tests/test_goldens.py
    then pins the everyday f32 implementation against them to 1e-4: a
    regression gate for refactors (e.g. the kinv solve-free predict path).
  * ``--source reference``: the moment /root/reference is populated, rerun
    THIS script with the reference on PYTHONPATH; it evaluates the
    reference's numpy implementations (safe_exploration.gp_reachability,
    ssm_gpy.SimpleGPModel) on the SAME frozen inputs and overwrites the
    artifacts, turning the self-parity gate into true reference parity with
    zero new test code (the 30-minute diff VERDICT r1 asks for).

Run:  JAX_PLATFORMS=cpu python tools/regen_goldens.py [--source self]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")


def build_problem(env_name: str, n_safe: int, n_perf: int = 0,
                  n_max: int = 32, n_data: int = 16, ssm_family: str = "gp",
                  n_inducing: int = 64):
    """Deterministic f64 problem instance shared by both golden sources.

    The FROZEN INPUTS (training set, hyperparameters, probe points, x0,
    controls) are what make reference regeneration a drop-in: both sources
    evaluate their posterior/reachability on identical numbers.
    ``ssm_family="sparse_gp"`` builds the BASELINE-cfg-4 inducing-point tier
    (reference GPy ``SparseGPRegression``, SURVEY.md §2.3) on the same frozen
    data.
    """
    from safe_exploration_tpu.envs import env_step
    from safe_exploration_tpu.models import make_gp_ssm
    from safe_exploration_tpu.runtime.config import (
        ExperimentConfig,
        build_experiment,
    )

    dtype = jnp.float64
    # c_safety: the sparse VFE variance floor is x0-independent, so the
    # exact-GP 2.0 makes the sparse tube infeasible outright (see
    # bench_sparse_solves); the 6D quadrotor runs 1.5 like its registered
    # configs (recursive ellipsoid sums compound the closed loop's
    # non-normal growth)
    c_safety = {"sparse_gp": 1.8}.get(ssm_family, 2.0)
    if env_name == "quadrotor":
        c_safety = 1.5
    cfg = ExperimentConfig(
        name=f"golden_{env_name}", env=env_name, solver="sqp",
        n_safe=n_safe, n_perf=n_perf, n_max=n_max, sqp_outer=8, sqp_inner=4,
        kern_types=("rbf",),  # expands to one RBF per output dim
        ssm=ssm_family, n_inducing=n_inducing, c_safety=c_safety,
    )
    exp = build_experiment(cfg, dtype=dtype)
    env, a, b = exp["env"], exp["a"], exp["b"]
    n_s, n_u = env.spec.n_s, env.spec.n_u

    key = jax.random.PRNGKey(1234)
    scale = jnp.asarray([0.3, 1.0] if n_s == 2 else [0.1] * n_s, dtype)
    xs = jax.random.uniform(key, (n_data, n_s), dtype, -1.0, 1.0) * scale
    us = 0.4 * jax.random.uniform(
        jax.random.fold_in(key, 1), (n_data, n_u), dtype, -1.0, 1.0
    )
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    l_mu = jnp.full((n_s,), 0.05, dtype)
    l_sigma = jnp.full((n_s,), 0.02, dtype)
    if ssm_family == "sparse_gp":
        from safe_exploration_tpu.models.sparse_gp import make_sparse_gp_ssm

        ssm = make_sparse_gp_ssm(
            exp["kern_types"], xs, us, resid, n_max=n_max,
            n_inducing=n_inducing, l_mu=l_mu, l_sigma=l_sigma,
            log_noise=-4.0,
        )
    else:
        ssm = make_gp_ssm(
            exp["kern_types"], xs, us, resid, n_max=n_max,
            l_mu=l_mu, l_sigma=l_sigma, log_noise=-4.0,
        )
    # calibrate exactly as the production runners do: hyperopt + data-driven
    # Lipschitz constants. The frozen hyperparameters are part of the golden
    # instance (saved inputs), so a reference regeneration reuses them.
    from safe_exploration_tpu.models.ssm import estimate_lipschitz, ssm_fit

    ssm = ssm_fit(ssm, iters=120)
    ssm = estimate_lipschitz(ssm, jnp.concatenate([xs, us], axis=1))

    probes = jax.random.uniform(
        jax.random.fold_in(key, 2), (16, n_s + n_u), dtype, -0.5, 0.5
    )
    x0 = jnp.asarray([0.12, 0.3] if n_s == 2 else [0.05] * n_s, dtype)
    # small feed-forward perturbations on top of the LQR feedback: the golden
    # tube must stay BOUNDED over the horizon (large random controls blow the
    # ellipsoid up ~exponentially on the H=10 cartpole — overflow in f32 and
    # a meaningless parity target; caught by the finiteness assert below)
    k_ff_eval = 0.02 * jax.random.normal(
        jax.random.fold_in(key, 3), (n_safe, n_u), dtype
    )
    return exp, ssm, probes, x0, k_ff_eval


def golden_posterior(ssm, probes):
    """Family-dispatching batched posterior on the frozen probes (exact GP and
    the cfg-4 sparse VFE tier share the golden schema)."""
    from safe_exploration_tpu.models.ssm import GPSSM

    if isinstance(ssm, GPSSM):
        from safe_exploration_tpu.models.gp import gp_predict_batch

        return gp_predict_batch(ssm.gp, probes)
    from safe_exploration_tpu.models.sparse_gp import sparse_gp_predict

    mean, var = jax.vmap(lambda z: sparse_gp_predict(ssm.sgp, z))(probes)
    return mean, var


def goldens_self(env_name: str, n_safe: int, n_perf: int = 0,
                 batch_block: bool = False, **bp_kw) -> dict:
    """Freeze our own f64 values (provisional oracle until the mount appears)."""
    from safe_exploration_tpu.reachability.onestep import multistep_reachability
    from safe_exploration_tpu.reachability.safety import (
        lin_ellipsoid_safety_distance,
    )

    exp, ssm, probes, x0, _ = build_problem(env_name, n_safe, n_perf, **bp_kw)
    env, a, b, k_fb = exp["env"], exp["a"], exp["b"], exp["k_fb"]
    spec = env.spec

    mean, var = golden_posterior(ssm, probes)

    # solve the safety NLP on the frozen instance FIRST and freeze the tube at
    # the optimal controls: a feasible plan's tube is bounded by construction
    # (arbitrary controls blow the H=10 cartpole ellipsoid up exponentially —
    # not a representable f32 parity target), and "trajectory parity" then
    # means the thing that matters: the planned safe trajectory.
    from safe_exploration_tpu.solvers.sqp import SqpConfig, sqp_warm_len

    n_warm = sqp_warm_len(SqpConfig(n_safe=n_safe, n_perf=n_perf))
    warm0 = jnp.zeros((n_warm, spec.n_u), jnp.float64)
    k_ff_opt, feasible, violation, info = exp["planner"](
        jax.random.PRNGKey(0), ssm, x0, warm0
    )
    assert bool(feasible), (
        f"golden instance must be solvable (violation={float(violation):.3e})"
    )
    k_ff_eval = k_ff_opt

    k_fb_all = jnp.tile(k_fb[None], (n_safe, 1, 1))
    p_traj, q_traj, var_traj = multistep_reachability(
        ssm, x0, k_ff_eval, k_fb_all, a, b, 2.5
    )
    d_stage = jax.vmap(
        lambda p, q: lin_ellipsoid_safety_distance(
            p, q, spec.h_mat_obs, spec.h_obs
        )
    )(p_traj, q_traj)
    d_term = lin_ellipsoid_safety_distance(
        p_traj[-1], q_traj[-1], spec.h_mat_safe, spec.h_safe
    )
    q_max = float(jnp.max(jnp.abs(q_traj)))
    assert q_max < 1e3, (
        f"golden tube blew up (max |Q| = {q_max:.2e}) — pick tamer controls; "
        "an exploding tube is not a representable f32 parity target"
    )

    out_extra = {}
    if batch_block:
        # cfg 3's distinctive component: the BATCHED (lane-major) solve. Four
        # frozen x0s through build_experiment's batch_planner — in f64 the
        # lane backend IS the oracle path (parity pinned in
        # tests/test_sqp_lanes.py), so these goldens pin the lane solve
        # against frozen numbers across refactors.
        x0s = jnp.stack([
            x0,
            0.5 * x0,
            -0.6 * x0,
            jnp.asarray([0.02, -0.2] if x0.shape[0] == 2
                        else [0.02] * x0.shape[0], jnp.float64),
        ])
        warm_b = jnp.zeros((4, n_warm, spec.n_u), jnp.float64)
        kb, feas_b, viol_b, info_b = exp["batch_planner"](ssm, x0s, warm_b)
        out_extra = {
            "batch_x0s": np.asarray(x0s),
            "batch_k_ff": np.asarray(kb),
            "batch_feasible": np.asarray(feas_b),
            "batch_violation": np.asarray(viol_b),
            "batch_cost": np.asarray(info_b["cost"]),
        }

    return {
        "source": np.bytes_(b"self_f64"),
        "probes": np.asarray(probes),
        **out_extra,
        "posterior_mean": np.asarray(mean),
        "posterior_var": np.asarray(var),
        "x0": np.asarray(x0),
        "k_ff_eval": np.asarray(k_ff_eval),
        "p_traj": np.asarray(p_traj),
        "q_traj": np.asarray(q_traj),
        "var_traj": np.asarray(var_traj),
        "d_stage": np.asarray(d_stage),
        "d_term": np.asarray(d_term),
        "k_ff_opt": np.asarray(k_ff_opt),
        "opt_feasible": np.asarray(feasible),
        "opt_violation": np.asarray(violation),
        "opt_cost": np.asarray(info["cost"]),
    }


def goldens_reference(env_name: str, n_safe: int, n_perf: int = 0,
                      batch_block: bool = False, **bp_kw) -> dict:
    """Evaluate the REFERENCE implementation on the same frozen inputs.

    Requires /root/reference (or an installed ``safe_exploration``) on the
    path. Maps our frozen GP data/hyperparameters onto the reference's
    ``ssm_gpy.SimpleGPModel`` + ``gp_reachability.multistep_reachability``
    and records the same quantities. Written against the reference's public
    API (SURVEY.md §2.3/§2.4); adjust symbol names here if they drifted —
    this file is the single place reference parity is defined.
    """
    sys.path.insert(0, "/root/reference")
    try:
        import safe_exploration  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "reference not importable — mount /root/reference or pip install "
            f"safe-exploration first ({e})"
        )
    raise NotImplementedError(
        "wire up the reference evaluation once /root/reference is populated: "
        "build SimpleGPModel from build_problem()'s frozen (X, y, hypers), "
        "then call gp_reachability.multistep_reachability and "
        "lin_ellipsoid_safety_distance on the frozen (x0, k_ff_eval)."
    )


# The five BASELINE configs' golden instances — ONE table shared with
# tests/test_goldens.py (imported there), so gate coverage and regeneration
# can never drift apart. Fields: env, n_safe, n_perf, tag, then
# build_problem/goldens kwargs.
#   cfg 2: H=10 planning horizon = 5-step safety tube + 10-step performance
#     trajectory (the reference pairs a SHORT ellipsoid tube with a LONG perf
#     horizon because recursive ellipsoid over-approximations compound the
#     closed loop's non-normal transient growth — cartpole sigma_max ~ 4.4).
#   cfg 3: the batched tier — adds the lane-major batched solve over 4
#     frozen x0s at the fleet configs' H=3.
#   cfg 4: the sparse VFE tier (m=64 inducing on 256 frozen points — the
#     same construction as pendulum_large_sparse, golden-sized).
#   cfg 5: the 6D quadrotor at the registered 3-step tube + 5-step perf.
CASES = [
    ("pendulum", 5, 0, "cfg1_pendulum_h5", {}),
    ("cartpole", 5, 10, "cfg2_cartpole_h10", {}),
    ("pendulum", 3, 0, "cfg3_pendulum_batch_h3", {"batch_block": True}),
    ("pendulum", 5, 0, "cfg4_pendulum_sparse",
     {"ssm_family": "sparse_gp", "n_max": 512, "n_data": 256,
      "n_inducing": 64}),
    ("quadrotor", 3, 5, "cfg5_quadrotor_h3p5", {"n_data": 32}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", choices=["self", "reference"], default="self")
    ap.add_argument("--only", default=None,
                    help="regenerate a single tag (substring match)")
    args = ap.parse_args()

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    gen = goldens_self if args.source == "self" else goldens_reference
    for env_name, n_safe, n_perf, tag, kw in CASES:
        if args.only and args.only not in tag:
            continue
        data = gen(env_name, n_safe, n_perf, **kw)
        path = os.path.join(GOLDEN_DIR, f"{tag}.npz")
        np.savez_compressed(path, **data)
        print(f"wrote {path} (source={args.source})")


if __name__ == "__main__":
    main()
