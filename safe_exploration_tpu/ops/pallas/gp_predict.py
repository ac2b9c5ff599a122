"""Fused lane-major GP posterior kernel — mean/variance (+ mean Jacobian)
for B query lanes in ONE VMEM pass.

WHY. The forward tube rollout (solvers/sqp_lanes._rollout_*_lanes, and the
CEM scorer built on it) evaluates, per stage and output dim, the chain

    d2 -> kv = sf2*exp(-0.5 d2) -> { beta@kv,  kv.(kinv@kv),  X^T(kv*c) }

on (n, L) intermediates with L = lanes (up to M*B = tens of thousands for
the lane CEM, solvers/cem_lanes.py). XLA materializes ``kv`` and the solve
product ``kinv@kv`` in HBM between the matmuls and the three consumers —
~4 nL floats of round-trip traffic per dim per stage — while the arithmetic
is only ~2 n^2 L MACs: the op is BANDWIDTH-bound at exactly the scale the
CEM scorer runs it. This kernel keeps the whole chain resident in VMEM per
lane block: HBM traffic drops to the inputs/outputs ((2d+2)L floats), and
the ~10 XLA kernel launches per (stage, dim) collapse to one.

Scope: RBF kernels (the BASELINE headline configs), shared exact-GP or
inducing-point posteriors — the caller passes the support rows and the
PRE-MASKED weights, so exact (models/gp: X, beta, kinv, mask folded in) and
sparse (models/sparse_gp: Z, alpha, vmat) tiers use the same kernel. It is
FORWARD-ONLY (no AD rules): dispatched on the sampling-based CEM scoring
path, never under ``jax.linearize`` (the lane SQP keeps the XLA form).

Parity: the reference evaluates this same posterior chain inside CasADi
(``gp_models_utils_casadi.py::gp_pred``) and torch
(``ssm_cem/ssm_cem.py::GpCemSSM.predict``) — SURVEY.md §2.3/§2.6; the lane
XLA form it must match bit-for-bit-ish is sqp_lanes._gp_predict_lanes
(pinned in tests/test_pallas_gp_predict.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gp_predict_lanes_pallas"]

_HIGH = jax.lax.Precision.HIGHEST


def _kernel(x_ref, xt_ref, wm_ref, wmt_ref, wv_ref, ils_ref, ils2_ref,
            sf2_ref, flr_ref, zz_ref, mu_ref, var_ref, jac_ref=None,
            *, n_out: int, d_in: int, want_jac: bool):
    """One lane block: unrolled over the (static, small) output dims."""
    zz = zz_ref[:]                                          # (d, Lb)
    for e in range(n_out):
        # ARD squared distances via broadcast (VPU) — avoids a K=d_in
        # matmul that would waste the MXU's 128-wide contraction.
        d2 = None
        for j in range(d_in):
            il = ils_ref[e, j]
            diff = x_ref[:, j:j + 1] * il - zz[j:j + 1, :] * il
            sq = diff * diff
            d2 = sq if d2 is None else d2 + sq              # (n, Lb)
        kv = sf2_ref[e, 0] * jnp.exp(-0.5 * d2)             # (n, Lb)
        w = jax.lax.dot_general(                            # kinv_e @ kv
            wv_ref[e], kv, (((1,), (0,)), ((), ())),
            precision=_HIGH, preferred_element_type=jnp.float32,
        )                                                   # (n, Lb)
        mu_ref[e:e + 1, :] = jax.lax.dot_general(           # beta_e @ kv
            wm_ref[e:e + 1, :], kv, (((1,), (0,)), ((), ())),
            precision=_HIGH, preferred_element_type=jnp.float32,
        )
        quad = jnp.sum(kv * w, axis=0, keepdims=True)       # (1, Lb)
        var_ref[e:e + 1, :] = jnp.maximum(sf2_ref[e, 0] - quad,
                                          flr_ref[e, 0])
        if want_jac:
            wj = kv * wmt_ref[:, e:e + 1]                   # kv * beta_e
            rows = jax.lax.dot_general(                     # X^T @ wj
                xt_ref[:], wj, (((1,), (0,)), ((), ())),
                precision=_HIGH, preferred_element_type=jnp.float32,
            )                                               # (d, Lb)
            swj = jnp.sum(wj, axis=0, keepdims=True)        # (1, Lb)
            term = rows - zz * swj
            for j in range(d_in):
                jac_ref[e * d_in + j:e * d_in + j + 1, :] = (
                    term[j:j + 1, :] * ils2_ref[e, j]
                )


def gp_predict_lanes_pallas(
    x: jax.Array,           # (n, d_in) support rows (already input-scaled)
    w_mean: jax.Array,      # (e, n) posterior mean weights, PRE-MASKED
    w_var: jax.Array,       # (e, n, n) variance solve matrix, PRE-MASKED
    log_ls: jax.Array,      # (e, d_in) RBF log-lengthscales
    log_sf: jax.Array,      # (e,) RBF log-signal-stds
    zz: jax.Array,          # (d_in, L) query lanes (already input-scaled)
    *,
    want_jac: bool,
    block_l: int = 512,
    interpret: bool = False,
):
    """Fused posterior over L lanes: (mu (e,L), var (e,L)[, jac (e,d,L)]).

    Matches sqp_lanes._gp_predict_lanes for all-"rbf" kern_types with the
    mask folded into ``w_mean``/``w_var`` (zeroed inactive rows/cols) —
    including the conditioning-aware variance floor.
    """
    n, d_in = x.shape
    e = w_mean.shape[0]
    L = zz.shape[1]
    dtype = jnp.float32
    x = x.astype(dtype)
    zz = zz.astype(dtype)

    inv_ls = jnp.exp(-log_ls).astype(dtype)                 # (e, d)
    inv_ls2 = (inv_ls * inv_ls).astype(dtype)
    sf2 = jnp.exp(2.0 * log_sf).astype(dtype)[:, None]      # (e, 1)
    eps = jnp.finfo(dtype).eps
    floor = jnp.maximum(8.0 * eps * sf2, 1e-12)             # (e, 1)

    l_pad = -(-L // block_l) * block_l
    if l_pad != L:
        zz = jnp.pad(zz, ((0, 0), (0, l_pad - L)))
    grid = (l_pad // block_l,)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        const((n, d_in)),                                   # x
        const((d_in, n)),                                   # x^T
        const((e, n)),                                      # w_mean
        const((n, e)),                                      # w_mean^T
        const((e, n, n)),                                   # w_var
        const((e, d_in)),                                   # inv_ls
        const((e, d_in)),                                   # inv_ls2
        const((e, 1)),                                      # sf2
        const((e, 1)),                                      # floor
        pl.BlockSpec((d_in, block_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),              # zz
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((e, l_pad), dtype),
        jax.ShapeDtypeStruct((e, l_pad), dtype),
    ]
    out_specs = [
        pl.BlockSpec((e, block_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((e, block_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    if want_jac:
        out_shapes.append(jax.ShapeDtypeStruct((e * d_in, l_pad), dtype))
        out_specs.append(
            pl.BlockSpec((e * d_in, block_l), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        )

    # without a jac output pallas passes 12 refs and jac_ref keeps its None
    # default; with one it passes 13
    kern = functools.partial(_kernel, n_out=e, d_in=d_in, want_jac=want_jac)

    flops_mm = 2 * n * n * l_pad * e * (1 + (d_in if want_jac else 0) / n)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(flops_mm),
            bytes_accessed=int(4 * (2 * d_in + 2) * l_pad),
            transcendentals=int(n * l_pad * e),
        ),
    )(
        x, x.T, w_mean.astype(dtype),
        w_mean.T.astype(dtype), w_var.astype(dtype),
        inv_ls, inv_ls2, sf2, floor, zz,
    )
    if want_jac:
        mu, var, jac = out
        return (mu[:, :L], var[:, :L],
                jac[:, :L].reshape(e, d_in, L))
    mu, var = out
    return mu[:, :L], var[:, :L]
