"""HBM-resident blocked Cholesky for matrices beyond VMEM capacity.

The VMEM-resident kernel (ops/pallas/cholesky.py) holds the whole matrix on
chip and tops out around n ~= 1024 in f32. This kernel factors arbitrarily
large SPD matrices with a LEFT-LOOKING panel algorithm whose working set is
two (n, B) panels:

  grid step k (sequential on the TPU core):
    1. DMA panel A_k = A[:, kB:(k+1)B] from HBM            (pipeline input)
    2. for j < k:  DMA finished panel L_j from HBM (output read-back),
                   A_k -= L_j (L_j[kB:(k+1)B, :])^T         (MXU, (n,B)x(B,B))
    3. factor the diagonal block (VPU row sweeps, as in the VMEM kernel),
       L_k[below] = A_k[below] inv(L_kk)^T                  (MXU)
    4. DMA L_k back to HBM.

Panels live in a PANEL-MAJOR layout (nb, n, B) so the dynamic-j read-back in
step 2 is one contiguous DMA — column slices of a row-major (n, n) array
would stride HBM. The caller converts layouts outside the kernel (one XLA
transpose each way, O(n^2) traffic vs the O(n^3/B) the algorithm moves).

HBM traffic is n^3/B * 4 bytes (left-looking read-back); at B = 128 and
n = 4096 that is ~2 GB — a few ms at HBM rate, matching the O(n^3) MXU time.

Parity/oracle: jnp.linalg.cholesky (tests/test_pallas.py, interpret mode) and
the f64/C++ oracles transitively through the VMEM kernel's tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safe_exploration_tpu.ops.pallas.cholesky import (
    BLOCK,
    _matmul_nn,
    _matmul_nt,
    upper_chol_rows_ref,
    upper_tri_inv_rows_ref,
)

__all__ = ["cholesky_hbm"]


def _chol_hbm_kernel(a_panels, l_panels, panel, prev, s_blk, r_blk, y_blk,
                     sem_in, sem_prev, sem_out, *, n: int, block: int):
    """One grid step = one panel k; refs a_panels/l_panels live in HBM."""
    k = pl.program_id(0)
    lo = k * block

    # 1. bring in this step's A panel
    cp_in = pltpu.make_async_copy(a_panels.at[k], panel, sem_in)
    cp_in.start()
    cp_in.wait()

    # 2. subtract contributions of all finished panels (left-looking)
    def body(j, _):
        cp = pltpu.make_async_copy(l_panels.at[j], prev, sem_prev)
        cp.start()
        cp.wait()
        row_blk = prev[pl.ds(lo, block), :]                 # (B, B)
        panel[:, :] = panel[:, :] - _matmul_nt(prev[:, :], row_blk)
        return 0

    jax.lax.fori_loop(0, k, body, 0)

    # 3. factor the diagonal block; form the full candidate L panel
    s_blk[:, :] = panel[pl.ds(lo, block), :]
    upper_chol_rows_ref(s_blk, r_blk, block)
    upper_tri_inv_rows_ref(r_blk, y_blk, block)             # y = inv(L_kk)^T
    full = _matmul_nn(panel[:, :], y_blk[:, :])             # (n, B)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, block), 0)
    panel[:, :] = jnp.where(rows < lo + block, 0.0, full)
    panel[pl.ds(lo, block), :] = r_blk[:, :].T              # L_kk

    # 4. ship the finished panel back to HBM before the next step reads it
    cp_out = pltpu.make_async_copy(panel, l_panels.at[k], sem_out)
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_hbm_call(a_panels, *, interpret: bool):
    nb, n, block = a_panels.shape
    return pl.pallas_call(
        functools.partial(_chol_hbm_kernel, n=n, block=block),
        out_shape=jax.ShapeDtypeStruct((nb, n, block), a_panels.dtype),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((n, block), a_panels.dtype),   # current panel
            pltpu.VMEM((n, block), a_panels.dtype),   # previous-panel buffer
            pltpu.VMEM((block, block), a_panels.dtype),
            pltpu.VMEM((block, block), a_panels.dtype),
            pltpu.VMEM((block, block), a_panels.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3,
            bytes_accessed=n * n * n // block * 4,
            transcendentals=0,
        ),
    )(a_panels)


def cholesky_hbm(a: jax.Array, *, interpret: bool | None = None) -> jax.Array:
    """Lower Cholesky factor of an SPD (n, n) matrix of any size (HBM tier).

    n is padded to a multiple of 128 with identity rows/cols. Working set is
    O(n * 128) VMEM, so n is bounded by HBM, not VMEM.
    """
    if interpret is None:
        from safe_exploration_tpu.ops.pallas import interpret_mode

        interpret = interpret_mode()
    n = a.shape[-1]
    block = BLOCK
    n_pad = ((n + block - 1) // block) * block
    ap = jnp.eye(n_pad, dtype=a.dtype).at[:n, :n].set(a) if n_pad != n else a
    nb = n_pad // block
    # panel-major layout: (nb, n, B)
    panels = ap.reshape(n_pad, nb, block).transpose(1, 0, 2)
    l_panels = _chol_hbm_call(panels, interpret=bool(interpret))
    l = l_panels.transpose(1, 0, 2).reshape(n_pad, n_pad)
    return l[:n, :n]
