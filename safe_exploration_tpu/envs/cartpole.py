"""Cart-pole — the 4D benchmark plant (BASELINE config 2).

Parity: reference ``environments.py::CartPole`` (SURVEY.md §2.7): n_s = 4
(cart position p, cart velocity v, pole angle theta from upright, angular
velocity omega), n_u = 1 horizontal force, rail-bounded safe set. Standard
frictionless cart-pole dynamics (pole as point mass):

    (M + m) p_dd + m l (theta_dd cos - theta_d^2 sin) = u - b v
    l theta_dd + p_dd cos(theta) = g sin(theta)
"""

from __future__ import annotations

import jax.numpy as jnp

from safe_exploration_tpu.envs.base import Env, EnvSpec, box_polytope

__all__ = ["make_cartpole"]


def make_cartpole(
    *,
    dt: float = 0.1,
    cart_mass: float = 0.5,
    pole_mass: float = 0.2,
    length: float = 0.5,
    damping: float = 0.1,
    gravity: float = 9.81,
    u_lim: float = 5.0,
    rail_safe: float = 0.6,
    v_safe: float = 1.0,
    theta_safe: float = 0.25,
    omega_safe: float = 1.0,
    plant_noise: float = 1e-3,
    init_std: float = 0.005,
    dtype=jnp.float32,
) -> Env:
    mt = cart_mass + pole_mass

    def dynamics(x, u):
        _, v, theta, omega = x[0], x[1], x[2], x[3]
        sin_t = jnp.sin(theta)
        cos_t = jnp.cos(theta)
        force = u[0] - damping * v
        # solve the 2x2 mass matrix analytically
        denom = mt - pole_mass * cos_t * cos_t
        p_dd = (
            force + pole_mass * sin_t * (length * omega * omega - gravity * cos_t)
        ) / denom
        theta_dd = (gravity * sin_t - cos_t * p_dd) / length
        return jnp.stack([v, p_dd, omega, theta_dd])

    f = jnp.asarray
    lo_s = f([-rail_safe, -v_safe, -theta_safe, -omega_safe], dtype)
    hi_s = -lo_s
    lo_o = 1.6 * lo_s
    hi_o = -lo_o
    h_mat_safe, h_safe = box_polytope(lo_s, hi_s)
    h_mat_obs, h_obs = box_polytope(lo_o, hi_o)
    spec = EnvSpec(
        dt=f(dt, dtype),
        init_m=jnp.zeros(4, dtype),
        init_std=jnp.full((4,), init_std, dtype),
        u_min=f([-u_lim], dtype),
        u_max=f([u_lim], dtype),
        plant_noise=jnp.full((4,), plant_noise, dtype),
        target=jnp.zeros(4, dtype),
        h_mat_safe=h_mat_safe,
        h_safe=h_safe,
        h_mat_obs=h_mat_obs,
        h_obs=h_obs,
        norm_x=hi_o,
        norm_u=f([u_lim], dtype),
    )
    return Env(dynamics=dynamics, spec=spec, name="cartpole")
