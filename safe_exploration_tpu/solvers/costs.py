"""Pluggable planner objectives.

Parity: the reference's ``cost_func`` seam on ``SimpleSafeMPC.init_solver``
(SURVEY.md §2.5): a tracking cost for task episodes, a (negative) predictive-
variance objective for safe exploration (SURVEY.md §3.2).

A cost function has signature
``cost_fn(p_traj, q_traj, var_traj, k_ff_all) -> scalar`` (lower = better) over
the SAFETY trajectory, or is attached to the performance trajectory by the
solvers that carry one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tracking_cost", "exploration_cost", "risk_tracking_cost"]


def tracking_cost(
    target: jax.Array,
    w_x: float = 1.0,
    w_u: float = 0.1,
    w_terminal: float = 5.0,
):
    """Quadratic tracking toward ``env.target`` with control effort + terminal
    weight (the reference's task-episode objective, SURVEY.md §2.5)."""

    def cost_fn(p_traj, q_traj, var_traj, k_ff_all):
        dx = p_traj - target
        stage = w_x * jnp.sum(dx[:-1] * dx[:-1]) + w_u * jnp.sum(k_ff_all * k_ff_all)
        term = w_terminal * jnp.sum(dx[-1] * dx[-1])
        return stage + term

    return cost_fn


def risk_tracking_cost(
    target: jax.Array,
    w_x: float = 1.0,
    w_u: float = 0.1,
    w_terminal: float = 5.0,
    w_sigma: float = 1.0,
):
    """Risk-sensitive tracking: the quadratic tracking objective plus a
    variance price ``w_sigma * sum_t trace(Sigma_t)`` on the propagated state
    covariance.

    This is the objective that CONSUMES the performance-trajectory covariance
    recursion (reference ``uncertainty_propagation_casadi.py::one_step_taylor``,
    SURVEY.md §2.4): under ``perf_trajectory="taylor"`` Sigma_t follows
    H Sigma H^T + diag(var) through the closed-loop linearization, so plans
    that pass through high-uncertainty or strongly-amplifying regions pay for
    it and ``"taylor"`` vs ``"mean_equivalent"`` produce genuinely different
    plans (pinned in tests/test_perf_trajectory_sqp.py). With ``n_perf = 0``
    the same functional reads the SAFETY tube's ellipsoid shapes q_traj —
    trace(Q_t) prices tube growth directly.

    The lane backends carry this cost natively: ``sqp_lanes.
    _rollout_perf_lanes(want_sigma=True)`` runs the lane-major form of the
    same Σ recursion (f64 parity with the portable solve pinned in
    tests/test_perf_trajectory_sqp.py), so batched risk-sensitive solves ride
    the lane SQP/CEM like the Σ-free costs do.
    """

    def cost_fn(p_traj, q_traj, var_traj, k_ff_all):
        dx = p_traj - target
        stage = w_x * jnp.sum(dx[:-1] * dx[:-1]) + w_u * jnp.sum(k_ff_all * k_ff_all)
        term = w_terminal * jnp.sum(dx[-1] * dx[-1])
        risk = w_sigma * jnp.sum(jnp.trace(q_traj, axis1=-2, axis2=-1))
        return stage + term + risk

    return cost_fn


def exploration_cost(scale: float = 1.0):
    """Information-seeking objective: maximize summed predictive std along the
    trajectory (returned negated — costs are minimized). Parity: the
    exploration runner's variance-max objective (SURVEY.md §2.5/§3.2)."""

    def cost_fn(p_traj, q_traj, var_traj, k_ff_all):
        return -scale * jnp.sum(jnp.sqrt(var_traj))

    return cost_fn
