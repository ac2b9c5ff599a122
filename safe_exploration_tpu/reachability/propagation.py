"""Performance-trajectory uncertainty propagation (cheap, no guarantees).

Parity: reference ``uncertainty_propagation_casadi.py`` (SURVEY.md §2.4): the
performance trajectory of the safe-MPC carries the OBJECTIVE and uses cheap
Gaussian moment propagation instead of guaranteed ellipsoid over-approximation:

  * ``mean_equivalent``: propagate the mean through the dynamics, accumulate the
    GP variance additively, ignore input covariance entirely;
  * ``taylor``: first-order (exact-moment-matching of the linearization) update
    Sigma+ = H Sigma H^T + diag(var(z)), H = a + J_mu,x (+ (b + J_mu,u) k_fb).

Selected by config ``perf_trajectory`` exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from safe_exploration_tpu.models.ssm import (
    GPSSM,
    ssm_noise_var,
    ssm_predict,
    ssm_predict_jac,
)

__all__ = ["one_step_mean_equivalent", "one_step_taylor", "multi_step_propagation"]


def one_step_mean_equivalent(
    ssm: GPSSM,
    p: jax.Array,
    sigma: jax.Array,
    u: jax.Array,
    a: jax.Array,
    b: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mean-equivalent propagation: Sigma+ = Sigma + diag(var(z)).

    Parity: ``uncertainty_propagation_casadi.py::one_step_mean_equivalent``.
    Returns (p_next, sigma_next, var).
    """
    mu, var = ssm_predict(ssm, p, u)
    p_next = a @ p + b @ u + mu
    sigma_next = sigma + jnp.diag(var + ssm_noise_var(ssm))
    return p_next, sigma_next, var


def one_step_taylor(
    ssm: GPSSM,
    p: jax.Array,
    sigma: jax.Array,
    u: jax.Array,
    a: jax.Array,
    b: jax.Array,
    k_fb: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """First-order Taylor moment propagation: Sigma+ = H Sigma H^T + diag(var).

    Parity: ``uncertainty_propagation_casadi.py::one_step_taylor``.
    """
    mu, var, j_x, j_u = ssm_predict_jac(ssm, p, u)
    p_next = a @ p + b @ u + mu
    h = a + j_x
    if k_fb is not None:
        h = h + (b + j_u) @ k_fb
    sigma_next = h @ sigma @ h.T + jnp.diag(var + ssm_noise_var(ssm))
    return p_next, sigma_next, var


def multi_step_propagation(
    ssm: GPSSM,
    p0: jax.Array,
    u_all: jax.Array,
    a: jax.Array,
    b: jax.Array,
    *,
    method: str = "taylor",
    k_fb: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Propagate the performance trajectory over a horizon via ``lax.scan``.

    Parity: ``uncertainty_propagation_casadi.py::multi_step_taylor_symbolic``
    (SURVEY.md §2.4); ``method`` mirrors the reference's ``perf_trajectory``
    config switch.

    Returns (p_traj (T, n_s), sigma_traj (T, n_s, n_s), var_traj (T, n_s)).
    """
    n_s = p0.shape[0]
    sigma0 = jnp.zeros((n_s, n_s), p0.dtype)

    if method == "mean_equivalent":
        step = lambda pp, ss, uu: one_step_mean_equivalent(ssm, pp, ss, uu, a, b)
    elif method == "taylor":
        step = lambda pp, ss, uu: one_step_taylor(ssm, pp, ss, uu, a, b, k_fb)
    else:
        raise ValueError(f"unknown perf_trajectory method: {method}")

    def body(carry, u):
        p, s = carry
        p_n, s_n, var = step(p, s, u)
        return (p_n, s_n), (p_n, s_n, var)

    _, (ps, sigmas, vars_) = jax.lax.scan(body, (p0, sigma0), u_all)
    return ps, sigmas, vars_
