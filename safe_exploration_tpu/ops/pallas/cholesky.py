"""Blocked Cholesky factorization kernel (lower triangular).

The BASELINE north star calls for a "blocked Pallas Cholesky" replacing the
reference's LAPACK ``potrf`` under GPy (SURVEY.md §2.10, §6). Algorithm:
right-looking blocked Cholesky with 128-wide panels, matrix resident in VMEM
(n <= ~1024 in f32 — the GP-buffer/inducing-point sizes of every BASELINE
config; larger n falls back to XLA's cholesky in the caller):

  for each panel k (static Python loop, n/B panels):
    1. S_kk = A_kk - L_k,: L_k,:^T             (MXU matmul; cols >= kB are 0)
    2. R_kk = upper_chol(S_kk), Y = R_kk^{-1}   (VPU fori loops, 128 row steps)
       L_kk = R_kk^T,  inv(L_kk)^T = Y
    3. S_ik = A_ik - L_i,: L_k,:^T              (MXU matmul, all i > k at once)
    4. L_ik = S_ik Y                            (MXU matmul)

The unblocked diagonal factorization works on ROWS of the (symmetric) block —
an upper-triangular R with R^T R = S — through VMEM scratch REFS, because TPU
dynamic indexing is supported on refs (sublane axis) but not on values.
Steps 1/3/4 are the n^3-scale MXU work; the whole factorization is ONE kernel
launch with zero HBM round-trips between panels.

Differentiation: this kernel is used in posterior REFITS (gp_refit), which are
not differentiated; hyperopt (gp_nll) keeps the jnp cholesky so jax.grad flows
through the XLA implementation.

Batched use (per-output-dim GP factors, vmapped episode batches): wrap with
``jax.vmap`` — Pallas lifts the batch dimension into the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cholesky_blocked", "BLOCK"]

BLOCK = 128


def _acc_dtype(dtype) -> jnp.dtype:
    """MXU accumulation dtype: >= f32, but never downcast f64 (CPU oracle runs)."""
    return jnp.promote_types(dtype, jnp.float32)


def _matmul_nt(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b.T with at-least-f32 MXU accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=_acc_dtype(a.dtype),
    ).astype(a.dtype)


def _matmul_nn(a: jax.Array, b: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_acc_dtype(a.dtype),
    ).astype(a.dtype)


def upper_chol_rows_ref(s_ref, r_ref, block: int) -> None:
    """In-place upper factor R (R^T R = S) of the (block, block) SPD scratch
    ``s_ref``, written to ``r_ref``. Row-wise right-looking sweep: each step is
    one dynamic sublane row read/write plus a rank-1 VPU downdate."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    r_ref[:] = jnp.zeros((block, block), r_ref.dtype)

    def body(j, _):
        row = s_ref[pl.ds(j, 1), :]                              # (1, B)
        sjj = jnp.sum(jnp.where(cols == j, row, 0.0))
        # Numerical breakdown (non-positive pivot) must surface as NaN — the
        # same semantics as jnp.linalg.cholesky — so downstream finiteness /
        # feasibility checks catch it. Clamping here would silently emit a
        # garbage factor that corrupts the safety tube's posterior variances.
        d = jnp.sqrt(sjj)
        row = jnp.where(cols > j, row / d, 0.0)
        row = jnp.where(cols == j, d, row)
        r_ref[pl.ds(j, 1), :] = row
        s_ref[:] = s_ref[:] - row.T @ row                        # rank-1 downdate
        return 0

    jax.lax.fori_loop(0, block, body, 0)


def upper_tri_inv_rows_ref(r_ref, y_ref, block: int) -> None:
    """Y = R^{-1} for upper-triangular R (scratch refs) via back substitution.

    Row recurrence (j = block-1 .. 0): Y[j, :] = (e_j - R[j, :] @ Y) / R[j, j];
    rows < j of Y are still zero so the full-width matvec sees only k > j.
    Note Y = R^{-1} = (L^{-1})^T for L = R^T.
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    y_ref[:] = jnp.zeros((block, block), y_ref.dtype)

    def body(i, _):
        j = block - 1 - i
        rrow = r_ref[pl.ds(j, 1), :]                             # (1, B)
        rjj = jnp.sum(jnp.where(cols == j, rrow, 0.0))
        ej = jnp.where(cols == j, 1.0, 0.0).astype(rrow.dtype)
        yrow = (ej - _matmul_nn(rrow, y_ref[:])) / rjj
        y_ref[pl.ds(j, 1), :] = yrow
        return 0

    jax.lax.fori_loop(0, block, body, 0)


def _chol_kernel(a_ref, l_ref, s_ref, r_ref, y_ref, *, n: int, block: int):
    """Factor A (n, n) -> lower L in one kernel; n a static multiple of block."""
    nb = n // block
    l_ref[:] = jnp.zeros((n, n), l_ref.dtype)

    for k in range(nb):  # static loop -> fully unrolled panel schedule
        lo = k * block
        # finished panel row-block L[k, :]; columns >= k*block still zero, so
        # the full-width contraction equals the <k-panel contraction
        row_k = l_ref[pl.ds(lo, block), :]                      # (B, n)
        s_ref[:] = a_ref[pl.ds(lo, block), pl.ds(lo, block)] - _matmul_nt(
            row_k, row_k
        )
        upper_chol_rows_ref(s_ref, r_ref, block)
        upper_tri_inv_rows_ref(r_ref, y_ref, block)             # Y = inv(L_kk)^T
        l_ref[pl.ds(lo, block), pl.ds(lo, block)] = r_ref[:].T

        if k < nb - 1:
            hi = lo + block
            rest = n - hi
            below = l_ref[pl.ds(hi, rest), :]                   # (rest, n)
            s_ik = a_ref[pl.ds(hi, rest), pl.ds(lo, block)] - _matmul_nt(
                below, row_k
            )
            # L_ik = S_ik inv(L_kk)^T = S_ik Y
            l_ref[pl.ds(hi, rest), pl.ds(lo, block)] = _matmul_nn(s_ik, y_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_call(a, *, interpret: bool):
    n = a.shape[-1]
    return pl.pallas_call(
        functools.partial(_chol_kernel, n=n, block=BLOCK),
        out_shape=jax.ShapeDtypeStruct((n, n), a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, BLOCK), a.dtype),
            pltpu.VMEM((BLOCK, BLOCK), a.dtype),
            pltpu.VMEM((BLOCK, BLOCK), a.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3,
            bytes_accessed=2 * n * n * 4,
            transcendentals=0,
        ),
    )(a)


def cholesky_blocked(a: jax.Array, *, interpret: bool | None = None) -> jax.Array:
    """Lower Cholesky factor of an SPD matrix (..., n, n).

    n is padded to a multiple of 128 with identity rows/cols inside
    (chol(blockdiag(A, I)) = blockdiag(L, I)), so any n works; leading batch
    dims are vmapped. Oracle parity with ``jnp.linalg.cholesky`` is pinned in
    tests/test_pallas.py.
    """
    if interpret is None:
        from safe_exploration_tpu.ops.pallas import interpret_mode

        interpret = interpret_mode()
    if a.ndim > 2:
        flat = a.reshape((-1,) + a.shape[-2:])
        out = jax.vmap(lambda m: cholesky_blocked(m, interpret=interpret))(flat)
        return out.reshape(a.shape)

    n = a.shape[-1]
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    ap = jnp.eye(n_pad, dtype=a.dtype).at[:n, :n].set(a) if n_pad != n else a
    l = _chol_call(ap, interpret=bool(interpret))
    return l[:n, :n]
