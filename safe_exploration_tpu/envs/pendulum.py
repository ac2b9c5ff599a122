"""Inverted pendulum — the flagship benchmark plant (BASELINE configs 1 & 3).

Parity: reference ``environments.py::InvertedPendulum`` (SURVEY.md §2.7):
n_s = 2 (angle theta from upright, angular velocity omega), n_u = 1 torque
(limited), safe set = box polytope around the upright equilibrium. Dynamics

    theta_dot = omega
    omega_dot = (g / l) sin(theta) - (b / (m l^2)) omega + u / (m l^2)

with the unstable upright fixed point at the origin.
"""

from __future__ import annotations

import jax.numpy as jnp

from safe_exploration_tpu.envs.base import Env, EnvSpec, box_polytope

__all__ = ["make_pendulum"]


def make_pendulum(
    *,
    dt: float = 0.05,
    mass: float = 0.25,
    length: float = 0.5,
    damping: float = 0.01,
    gravity: float = 9.81,
    u_lim: float = 1.0,
    theta_safe: float = 0.35,
    omega_safe: float = 1.2,
    theta_obs: float = 0.5,
    omega_obs: float = 2.0,
    plant_noise: float = 1e-3,
    init_std: float = 0.01,
    dtype=jnp.float32,
) -> Env:
    """Build the inverted-pendulum environment.

    Default geometry/limits chosen so the LQR-stabilizable region comfortably
    contains the safe box (the reference tunes the same knobs in its
    journal_experiment_configs — SURVEY.md §2.8).
    """
    inertia = mass * length * length

    def dynamics(x, u):
        theta, omega = x[0], x[1]
        theta_dot = omega
        omega_dot = (
            (gravity / length) * jnp.sin(theta)
            - (damping / inertia) * omega
            + u[0] / inertia
        )
        return jnp.stack([theta_dot, omega_dot])

    f = jnp.asarray
    h_mat_safe, h_safe = box_polytope(
        f([-theta_safe, -omega_safe], dtype), f([theta_safe, omega_safe], dtype)
    )
    h_mat_obs, h_obs = box_polytope(
        f([-theta_obs, -omega_obs], dtype), f([theta_obs, omega_obs], dtype)
    )
    spec = EnvSpec(
        dt=f(dt, dtype),
        init_m=jnp.zeros(2, dtype),
        init_std=f([init_std, init_std], dtype),
        u_min=f([-u_lim], dtype),
        u_max=f([u_lim], dtype),
        plant_noise=f([plant_noise, plant_noise], dtype),
        target=jnp.zeros(2, dtype),
        h_mat_safe=h_mat_safe,
        h_safe=h_safe,
        h_mat_obs=h_mat_obs,
        h_obs=h_obs,
        norm_x=f([theta_obs, omega_obs], dtype),
        norm_u=f([u_lim], dtype),
    )
    return Env(dynamics=dynamics, spec=spec, name="pendulum")
