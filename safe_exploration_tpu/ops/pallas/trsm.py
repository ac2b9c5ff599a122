"""Blocked triangular solves (TRSM) and PSD solve kernels.

Replaces the LAPACK ``trsm``/``potrs`` calls under GPy (posterior beta, batched
predictive-variance solves — SURVEY.md §2.10). Blocked forward/backward
substitution with the same 128-panel layout as the Cholesky kernel:

  forward  (L X = B):  X_i = inv(L_ii) (B_i - L_i,:  X)      i = 0 .. nb-1
  backward (L^T X = B): X_i = inv(L_ii)^T (B_i - (L_:,i)^T X) i = nb-1 .. 0

The off-diagonal contractions are full-width MXU matmuls (rows of X not yet
computed are zero, so the full-width product equals the partial sum); only the
128x128 diagonal-block inversions are sequential VPU loops on scratch refs.
One kernel launch does the whole solve, RHS blocks stay resident in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safe_exploration_tpu.ops.pallas.cholesky import (
    BLOCK,
    _acc_dtype,
    _matmul_nn,
    upper_tri_inv_rows_ref,
)

__all__ = ["trsm_lower_blocked", "solve_psd_blocked"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _trsm_kernel(l_ref, b_ref, x_ref, r_ref, y_ref, *, n: int, m: int,
                 block: int, transpose: bool):
    """Solve L X = B (or L^T X = B when ``transpose``) for X (n, m) in VMEM."""
    nb = n // block
    x_ref[:] = jnp.zeros((n, m), x_ref.dtype)

    order = range(nb - 1, -1, -1) if transpose else range(nb)
    for i in order:  # static loop
        lo = i * block
        if transpose:
            # row block i of U = L^T is the transposed column block i of L
            panel = l_ref[:, pl.ds(lo, block)]                 # (n, B)
            contrib = jax.lax.dot_general(
                panel, x_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=_acc_dtype(x_ref.dtype),
            ).astype(x_ref.dtype)                               # (B, m)
            # inv(U_ii) = inv(L_ii^T): L_ii^T is upper -> invert directly
            r_ref[:] = l_ref[pl.ds(lo, block), pl.ds(lo, block)].T
            upper_tri_inv_rows_ref(r_ref, y_ref, block)
            inv_d = y_ref[:]
        else:
            row_i = l_ref[pl.ds(lo, block), :]                 # (B, n)
            contrib = _matmul_nn(row_i, x_ref[:])              # (B, m)
            # inv(L_ii) = upper_tri_inv(L_ii^T)^T
            r_ref[:] = l_ref[pl.ds(lo, block), pl.ds(lo, block)].T
            upper_tri_inv_rows_ref(r_ref, y_ref, block)
            inv_d = y_ref[:].T
        rhs = b_ref[pl.ds(lo, block), :] - contrib
        x_ref[pl.ds(lo, block), :] = _matmul_nn(inv_d, rhs)


@functools.partial(jax.jit, static_argnames=("transpose", "interpret"))
def _trsm_call(l, b, *, transpose: bool, interpret: bool):
    n, m = b.shape
    return pl.pallas_call(
        functools.partial(
            _trsm_kernel, n=n, m=m, block=BLOCK, transpose=transpose
        ),
        out_shape=jax.ShapeDtypeStruct((n, m), b.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, BLOCK), b.dtype),
            pltpu.VMEM((BLOCK, BLOCK), b.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * n * m, bytes_accessed=(n * n + 2 * n * m) * 4,
            transcendentals=0,
        ),
    )(l, b)


def trsm_lower_blocked(
    l: jax.Array,
    b: jax.Array,
    *,
    transpose: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Solve ``L X = B`` (lower triangular L; ``transpose=True`` solves
    ``L^T X = B``). Shapes (n, n) and (n, m); padded to 128 multiples inside.

    Oracle parity with ``jax.scipy.linalg.solve_triangular`` is pinned in
    tests/test_pallas.py.
    """
    if interpret is None:
        from safe_exploration_tpu.ops.pallas import interpret_mode

        interpret = interpret_mode()
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    n = l.shape[-1]
    m = b.shape[-1]
    n_pad = _round_up(n, BLOCK)
    m_pad = _round_up(m, BLOCK)
    lp = jnp.eye(n_pad, dtype=l.dtype).at[:n, :n].set(l) if n_pad != n else l
    bp = (
        jnp.zeros((n_pad, m_pad), b.dtype).at[:n, :m].set(b)
        if (n_pad != n or m_pad != m)
        else b
    )
    x = _trsm_call(lp, bp, transpose=transpose, interpret=bool(interpret))
    x = x[:n, :m]
    return x[:, 0] if squeeze else x


def solve_psd_blocked(
    l: jax.Array, b: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """Solve ``(L L^T) X = B`` given the lower Cholesky factor (two TRSMs)."""
    y = trsm_lower_blocked(l, b, transpose=False, interpret=interpret)
    return trsm_lower_blocked(l, y, transpose=True, interpret=interpret)
