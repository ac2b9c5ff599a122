"""Monte-Carlo uncertainty-estimation runner: empirical validation that real
closed-loop trajectories stay inside the predicted ellipsoid tubes.

Parity: reference ``uncertainty_estimation_runner.py`` (SURVEY.md §2.8 [M]):
sample many noisy rollouts under the planned feedback policy and report
per-stage containment rates — the empirical check of the safety theorem's
coverage level.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from safe_exploration_tpu.envs.base import Env
from safe_exploration_tpu.models.ssm import GPSSM
from safe_exploration_tpu.reachability.onestep import multistep_reachability
from safe_exploration_tpu.reachability.safety import verify_trajectory_safety

__all__ = ["run_uncertainty_estimation"]


def run_uncertainty_estimation(
    env: Env,
    ssm: GPSSM,
    a: jax.Array,
    b: jax.Array,
    k_fb: jax.Array,
    *,
    key: jax.Array,
    x0: jax.Array,
    k_ff_all: jax.Array,
    c_safety: float = 2.0,
    n_rollouts: int = 256,
    metrics: Any = None,
) -> dict:
    """Predict the tube for (x0, plan), then MC-roll the true noisy plant.

    Returns per-stage containment rates, overall containment, and the fraction
    of rollouts with any state-constraint violation.
    """
    t_len = k_ff_all.shape[0]
    k_fb_all = jnp.tile(k_fb[None], (t_len, 1, 1))
    p_traj, q_traj, _ = multistep_reachability(
        ssm, x0, k_ff_all, k_fb_all, a, b, c_safety
    )

    keys = jax.random.split(key, n_rollouts)
    ok, contain = jax.jit(jax.vmap(
        lambda k: verify_trajectory_safety(
            env, k, x0, k_ff_all, k_fb_all, p_traj, q_traj
        )
    ))(keys)

    per_stage = jnp.mean(contain.astype(jnp.float32), axis=0)  # (T,)
    overall = jnp.mean(jnp.all(contain, axis=1).astype(jnp.float32))
    violation_rate = 1.0 - jnp.mean(ok.astype(jnp.float32))
    result = {
        "per_stage_containment": [float(v) for v in per_stage],
        "overall_containment": float(overall),
        "violation_rate": float(violation_rate),
        "p_traj": p_traj,
        "q_traj": q_traj,
    }
    if metrics is not None:
        for t, v in enumerate(result["per_stage_containment"]):
            metrics.log_scalar("containment", v, step=t)
        metrics.log_scalar("overall_containment", result["overall_containment"], step=0)
        metrics.log_scalar("violation_rate", result["violation_rate"], step=0)
        metrics.flush()
    return result
