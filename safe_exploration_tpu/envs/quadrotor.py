"""Planar quadrotor — the 6D extension plant (BASELINE config 5).

NOT in the reference (SURVEY.md §2.7 notes config 5 is a build-plan extension);
the driver's BASELINE.json calls for "6D quadrotor-style dynamics: joint safety +
performance MPC, uncertainty-aware exploration, long-horizon reachability".

States: (px, vx, pz, vz, phi, phi_dot) — planar position/velocity interleaved,
roll angle and rate. Controls: (u1, u2) rotor-thrust DEVIATIONS from hover (so the origin is an
equilibrium with u = 0, matching the residual-GP prior formulation x+ = a x + b u
+ GP(x, u)):

    vx_dot   = -(T1 + T2) sin(phi) / m
    vz_dot   =  (T1 + T2) cos(phi) / m - g
    phi_ddot =  (T2 - T1) * arm / inertia,      T_i = m g / 2 + u_i
"""

from __future__ import annotations

import jax.numpy as jnp

from safe_exploration_tpu.envs.base import Env, EnvSpec, box_polytope

__all__ = ["make_quadrotor"]


def make_quadrotor(
    *,
    dt: float = 0.05,
    mass: float = 0.5,
    arm: float = 0.2,
    inertia: float = 0.005,
    gravity: float = 9.81,
    u_lim: float = 1.5,
    pos_safe: float = 0.5,
    vel_safe: float = 0.8,
    phi_safe: float = 0.3,
    phidot_safe: float = 1.5,
    plant_noise: float = 5e-4,
    init_std: float = 0.005,
    dtype=jnp.float32,
) -> Env:
    hover = mass * gravity / 2.0

    def dynamics(x, u):
        vx, vz, phi, phid = x[1], x[3], x[4], x[5]
        t1 = hover + u[0]
        t2 = hover + u[1]
        thrust = t1 + t2
        ax = -thrust * jnp.sin(phi) / mass
        az = thrust * jnp.cos(phi) / mass - gravity
        aphi = (t2 - t1) * arm / inertia
        return jnp.stack([vx, ax, vz, az, phid, aphi])

    f = jnp.asarray
    lo_s = f(
        [-pos_safe, -vel_safe, -pos_safe, -vel_safe, -phi_safe, -phidot_safe], dtype
    )
    hi_s = -lo_s
    lo_o, hi_o = 1.5 * lo_s, -1.5 * lo_s
    h_mat_safe, h_safe = box_polytope(lo_s, hi_s)
    h_mat_obs, h_obs = box_polytope(lo_o, hi_o)
    spec = EnvSpec(
        dt=f(dt, dtype),
        init_m=jnp.zeros(6, dtype),
        init_std=jnp.full((6,), init_std, dtype),
        u_min=f([-u_lim, -u_lim], dtype),
        u_max=f([u_lim, u_lim], dtype),
        plant_noise=jnp.full((6,), plant_noise, dtype),
        target=jnp.zeros(6, dtype),
        h_mat_safe=h_mat_safe,
        h_safe=h_safe,
        h_mat_obs=h_mat_obs,
        h_obs=h_obs,
        norm_x=hi_o,
        norm_u=f([u_lim, u_lim], dtype),
    )
    return Env(dynamics=dynamics, spec=spec, name="quadrotor")
