"""Fused masked RBF Gram kernel.

Computes, in one pass over HBM,

    K[i, j] = m_i m_j * sf^2 exp(-0.5 ||(x_i - x_j) / ls||^2)
              + delta_ij * (m_i (noise + jitter) + (1 - m_i))

i.e. the masked-identity-padded Gram matrix that ``models/gp._masked_gram``
assembles from several XLA ops (distance matmul -> exp -> mask mult -> diag
add). For the large-N tier the Gram is the dominant HBM traffic (n^2 floats);
fusing the elementwise tail into the distance matmul writes each output tile
exactly once and never materializes the intermediate distance matrix.

Parity: the Gram build inside GPy's ``GPRegression`` and the reference's
symbolic ``gp_models_utils_casadi.py::_k_rbf`` (SURVEY.md §2.3, §2.10).

Layout: inputs are pre-scaled by the lengthscales and zero-padded to a
lane-aligned feature width; the grid is 2-D over (TILE, TILE) output blocks,
with the two input row-blocks streamed HBM->VMEM by the Pallas pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rbf_gram_masked"]

TILE = 256
_JITTER = 1e-6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gram_kernel(x1_ref, x2_ref, m1_ref, m2_ref, diag_ref, out_ref, *, tile: int):
    """One (tile, tile) output block: K[i*T:(i+1)*T, j*T:(j+1)*T]."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    x1 = x1_ref[:]   # (T, dp) pre-scaled rows i-block
    x2 = x2_ref[:]   # (T, dp) pre-scaled rows j-block
    m1 = m1_ref[:]   # (T, 1)
    m2 = m2_ref[:]   # (T, 1)

    # squared distances via the matmul form — the MXU does the heavy lifting
    n1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)            # (T, 1)
    n2 = jnp.sum(x2 * x2, axis=-1, keepdims=True)            # (T, 1)
    cross = jax.lax.dot_general(
        x1, x2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.promote_types(x1.dtype, jnp.float32),
    ).astype(x1.dtype)                                        # (T, T)
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)

    sf2 = diag_ref[0, 0]      # signal variance sigma_f^2
    noise = diag_ref[0, 1]    # noise variance + jitter

    k = sf2 * jnp.exp(-0.5 * d2) * (m1 * m2.T)

    # identity padding + noise on the global diagonal (diagonal tiles only)
    @pl.when(i == j)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        diag_val = m1 * noise + (1.0 - m1)       # (T, 1) broadcasts over cols
        out_ref[:] = jnp.where(rows == cols, k + diag_val, k)

    @pl.when(i != j)
    def _():
        out_ref[:] = k


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gram_call(xs, mask2d, diag, *, interpret: bool):
    n, dp = xs.shape
    grid = (n // TILE, n // TILE)
    return pl.pallas_call(
        functools.partial(_gram_kernel, tile=TILE),
        out_shape=jax.ShapeDtypeStruct((n, n), xs.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * dp + 4 * n * n,
            bytes_accessed=2 * n * dp * 4 + n * n * 4,
            transcendentals=n * n,
        ),
    )(xs, xs, mask2d, mask2d, diag)


def rbf_gram_masked(
    params: dict,
    x: jax.Array,
    mask: jax.Array,
    noise_var: jax.Array | float,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Masked identity-padded RBF Gram matrix K (n, n); n padded to TILE inside.

    Equivalent to ``models/gp._masked_gram('rbf', ...)`` — verified against that
    oracle in tests/test_pallas.py.
    """
    if interpret is None:
        from safe_exploration_tpu.ops.pallas import interpret_mode

        interpret = interpret_mode()
    n, d = x.shape
    dtype = x.dtype

    ls = jnp.exp(params["log_lengthscales"])
    sf2 = jnp.exp(2.0 * params["log_sf"])
    xs = x / ls

    # pad features to a lane-friendly width, rows to a TILE multiple
    dp = _round_up(max(d, 8), 8)
    n_pad = _round_up(n, TILE)
    xs_p = jnp.zeros((n_pad, dp), dtype).at[:n, :d].set(xs)
    # padded rows get mask 0 -> identity rows in the padded Gram; the caller
    # slices back to (n, n) so only real identity padding (mask==0) survives
    mask_p = jnp.zeros((n_pad, 1), dtype).at[:n, 0].set(mask)
    noise_tot = jnp.asarray(noise_var, dtype) + jnp.asarray(_JITTER, dtype)
    diag = jnp.stack([sf2.astype(dtype), noise_tot]).reshape(1, 2)

    k = _gram_call(xs_p, mask_p, diag, interpret=bool(interpret))
    return k[:n, :n]
