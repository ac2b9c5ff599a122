"""Pallas TPU kernels for the hot GP linear algebra (SURVEY.md §7 "Pallas tier").

The reference leans on LAPACK/BLAS (via GPy/numpy) for exactly these ops —
Gram construction, Cholesky, triangular solves (SURVEY.md §2.10). Here they are
hand-tiled TPU kernels:

  * :mod:`gram`      — fused masked RBF Gram tiles: the pairwise-distance matmul
                       (MXU) and the exp/mask/noise-diagonal elementwise work
                       (VPU) in ONE pass over HBM, instead of XLA materializing
                       the (n, n) distance matrix between two kernels. This is
                       the bandwidth-bound op of the N=10k tier (BASELINE cfg 4).
  * :mod:`cholesky`  — blocked right-looking Cholesky, 128-wide panels: the
                       Schur-complement updates are MXU matmuls; only the
                       128x128 diagonal factorization is a VPU loop.
  * :mod:`trsm`      — blocked forward/back substitution with multiple RHS.

Every kernel runs in interpreter mode off-TPU, so the f64 CPU test suite
verifies them against jnp/scipy oracles (tests/test_pallas.py) and the same
code path is exercised everywhere.
"""

from __future__ import annotations

import jax

__all__ = [
    "on_tpu",
    "interpret_mode",
    "rbf_gram_masked",
    "cholesky_blocked",
    "cholesky_hbm",
    "trsm_lower_blocked",
    "solve_psd_blocked",
]


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Pallas interpret=... flag: compiled on TPU, interpreted elsewhere."""
    return not on_tpu()


from safe_exploration_tpu.ops.pallas.gram import rbf_gram_masked  # noqa: E402
from safe_exploration_tpu.ops.pallas.cholesky import cholesky_blocked  # noqa: E402
from safe_exploration_tpu.ops.pallas.cholesky_hbm import cholesky_hbm  # noqa: E402
from safe_exploration_tpu.ops.pallas.trsm import (  # noqa: E402
    solve_psd_blocked,
    trsm_lower_blocked,
)
