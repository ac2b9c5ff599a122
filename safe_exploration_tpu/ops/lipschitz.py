"""Lipschitz-based over-approximation of GP linearization remainders.

This is the analytic heart of the safety argument (Koller et al., CDC'18, Lemma 2 /
arXiv:1906.12189): the error of the first-order Taylor expansion of the GP mean and
the growth of the predictive standard deviation over a state-action ellipsoid are
bounded using Lipschitz constants of the mean's gradient (``l_mu``) and of the
std (``l_sigma``).

Given a state ellipsoid E(0, Q) under linear feedback ``u = k_fb x``, the
state-action lift is ``S = [I; k_fb]`` and the lifted set is ``S E(0, Q)``. Its
squared max radius is

    r^2 = max_{x in E} ||S x||^2 = lambda_max(S Q S^T) = lambda_max(Q S^T S).

Per output dimension i the remainder boxes have half-widths

    u_mu_i    = 0.5 * l_mu_i    * r^2          (quadratic Taylor remainder)
    u_sigma_i = l_sigma_i * r                  (std growth)

Parity: reference ``utils.py::compute_remainder_overapproximations`` (numpy) and
``utils_casadi.py::compute_remainder_overapproximations`` + ``matrix_norm_2``
(power iteration) — SURVEY.md §2.2. Here ONE implementation serves both the eager
and in-solver (jit/grad) paths; the dominant eigenvalue is computed by a
fixed-iteration power method, which is jit-able, vmap-able and differentiable —
exactly the role the reference's CasADi power iteration plays inside IPOPT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["max_eig_psd_product", "compute_remainder_overapproximations"]


def max_eig_psd_product(m: jax.Array, iters: int = 30) -> jax.Array:
    """Dominant eigenvalue of ``M = Q B`` where Q, B are PSD.

    M is similar to the symmetric PSD matrix ``Q^{1/2} B Q^{1/2}``, so its spectrum
    is real and nonnegative and plain power iteration converges. A fixed iteration
    count keeps the op static-shaped (SURVEY.md §7 design stance) so it can sit
    inside ``lax.scan``-unrolled reachability and be differentiated by the SQP.

    The final Rayleigh-style quotient ``v^T M v / v^T v`` is exact at convergence
    and differentiable; for the n <= ~12 matrices of this domain, 30 iterations
    give ~1e-12 relative error except under pathological eigenvalue ties, where
    any convex combination of the tied eigenvectors still yields lambda_max.
    """
    n = m.shape[-1]
    # Deterministic non-degenerate start vector (no RNG inside the solver graph).
    v0 = jnp.ones((n,), m.dtype) + 1e-3 * jnp.arange(n, dtype=m.dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def body(_, v):
        w = m @ v
        return w / (jnp.linalg.norm(w) + 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v0)
    mv = m @ v
    return jnp.maximum(jnp.dot(v, mv) / (jnp.dot(v, v) + 1e-30), 0.0)


def compute_remainder_overapproximations(
    q: jax.Array,
    k_fb: jax.Array,
    l_mu: jax.Array,
    l_sigma: jax.Array,
    *,
    iters: int = 30,
) -> tuple[jax.Array, jax.Array]:
    """Box half-widths bounding the GP linearization remainders over an ellipsoid.

    Args:
      q: (n_s, n_s) PSD shape matrix of the state ellipsoid.
      k_fb: (n_u, n_s) feedback gain (u = k_ff + k_fb (x - p)).
      l_mu: (n_out,) Lipschitz constants of the GP mean gradient per output dim.
      l_sigma: (n_out,) Lipschitz constants of the predictive std per output dim.
      iters: power-iteration count for the dominant eigenvalue.

    Returns:
      (u_mu, u_sigma): (n_out,) box half-widths.

    Parity: reference ``utils.py::compute_remainder_overapproximations``
    (SURVEY.md §2.2); constants 0.5*l_mu*r^2 and l_sigma*r follow the papers.
    """
    n_s = q.shape[-1]
    s = jnp.concatenate([jnp.eye(n_s, dtype=q.dtype), k_fb], axis=0)  # (n_s+n_u, n_s)
    b = s.T @ s  # (n_s, n_s) = S^T S
    r_sqr = max_eig_psd_product(q @ b, iters=iters)
    u_mu = 0.5 * l_mu * r_sqr
    u_sigma = l_sigma * jnp.sqrt(r_sqr)
    return u_mu, u_sigma
