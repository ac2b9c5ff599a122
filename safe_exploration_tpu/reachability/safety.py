"""Ellipsoid-vs-polytope safety margins and trajectory verification.

Parity: reference ``gp_reachability.py::lin_ellipsoid_safety_distance``,
``is_ellipsoid_inside_polytope``, ``verify_trajectory_safety``,
``trajectory_inside_ellipsoid`` (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from safe_exploration_tpu.envs.base import Env, env_step

__all__ = [
    "lin_ellipsoid_safety_distance",
    "is_ellipsoid_inside_polytope",
    "trajectory_inside_ellipsoids",
    "verify_trajectory_safety",
    "sample_inside_polytope",
]


def lin_ellipsoid_safety_distance(
    p: jax.Array, q: jax.Array, h_mat: jax.Array, h_vec: jax.Array
) -> jax.Array:
    """Signed margins of E(p, Q) against the polytope {x : H x <= h}.

        d_i = h_i^T p + sqrt(h_i^T Q h_i) - h_i

    d_i <= 0 for all i  <=>  the ellipsoid is inside the polytope (the support
    function of an ellipsoid along h_i is h_i^T p + sqrt(h_i^T Q h_i)).

    These margins are the inequality constraints of the safe-MPC NLP
    (SURVEY.md §2.5) — smooth in (p, Q), so the SQP differentiates through them.
    """
    support = jnp.sqrt(jnp.maximum(jnp.sum((h_mat @ q) * h_mat, axis=-1), 0.0))
    return h_mat @ p + support - h_vec


def is_ellipsoid_inside_polytope(
    p: jax.Array, q: jax.Array, h_mat: jax.Array, h_vec: jax.Array
) -> jax.Array:
    """Boolean containment test (strict margins)."""
    return jnp.all(lin_ellipsoid_safety_distance(p, q, h_mat, h_vec) <= 0.0)


def trajectory_inside_ellipsoids(
    x_traj: jax.Array, p_traj: jax.Array, q_traj: jax.Array
) -> jax.Array:
    """Per-stage boolean: is the realized state inside the predicted ellipsoid?

    Parity: reference ``trajectory_inside_ellipsoid`` (SURVEY.md §2.4) — used by
    the MC uncertainty-validation runner (§2.8).
    """

    def inside(x, p, q):
        d = x - p
        return jnp.dot(d, jnp.linalg.solve(q, d)) <= 1.0

    return jax.vmap(inside)(x_traj, p_traj, q_traj)


def verify_trajectory_safety(
    env: Env,
    key: jax.Array,
    x0: jax.Array,
    k_ff_all: jax.Array,
    k_fb_all: jax.Array,
    p_traj: jax.Array,
    q_traj: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Roll the REAL (noisy) plant under the planned feedback policy and check
    (a) state-constraint satisfaction, (b) containment in the predicted tube.

    Parity: reference ``gp_reachability.py::verify_trajectory_safety``
    (SURVEY.md §2.4); one MC rollout per call — vmap over keys for many.

    Returns (all_state_constraints_ok, per-stage tube containment).
    """
    spec = env.spec
    t_len = k_ff_all.shape[0]
    keys = jax.random.split(key, t_len)

    def body(x, inp):
        k_ff, k_fb, p_ref, kk = inp
        u = k_ff + k_fb @ (x - p_ref)
        _, x_next = env_step(env, kk, x, u)
        return x_next, x_next

    # feedback is relative to the PREVIOUS stage center (stage 0: x0 itself)
    p_prev = jnp.concatenate([x0[None], p_traj[:-1]], axis=0)
    _, x_traj = jax.lax.scan(body, x0, (k_ff_all, k_fb_all, p_prev, keys))

    margins = jax.vmap(
        lambda x: spec.h_mat_obs @ x - spec.h_obs
    )(x_traj)
    constraints_ok = jnp.all(margins <= 0.0)
    containment = trajectory_inside_ellipsoids(x_traj, p_traj, q_traj)
    return constraints_ok, containment


def sample_inside_polytope(
    key: jax.Array, num: int, h_mat: jax.Array, h_vec: jax.Array, box: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Rejection-free batch sampler: uniform in the bounding box, with a validity
    flag for membership in {Hx <= h}. (Static shapes: callers mask instead of
    rejecting.) Parity: reference ``utils.py::sample_inside_polytope``.
    """
    n = h_mat.shape[1]
    pts = jax.random.uniform(key, (num, n), minval=-1.0, maxval=1.0) * box
    ok = jnp.all(pts @ h_mat.T - h_vec <= 0.0, axis=-1)
    return pts, ok
