"""L1 math core: ellipsoid calculus, Lipschitz remainders, numerical linear algebra.

Replaces the reference's ``utils_ellipsoid.py`` / ``utils_ellipsoid_casadi.py`` /
``utils.py`` / ``utils_casadi.py`` quadruple (SURVEY.md §2.1-§2.2) with a single
JAX implementation.
"""

from safe_exploration_tpu.ops.ellipsoid import (
    distance_to_center,
    ellipsoid_from_rectangle,
    sample_inside_ellipsoid,
    sum_two_ellipsoids,
)
from safe_exploration_tpu.ops.lipschitz import (
    compute_remainder_overapproximations,
    max_eig_psd_product,
)
from safe_exploration_tpu.ops.linalg import (
    dare_sda,
    dlqr,
    expm_discretize,
    solve_psd_chol,
)

__all__ = [
    "sum_two_ellipsoids",
    "ellipsoid_from_rectangle",
    "sample_inside_ellipsoid",
    "distance_to_center",
    "compute_remainder_overapproximations",
    "max_eig_psd_product",
    "dare_sda",
    "dlqr",
    "expm_discretize",
    "solve_psd_chol",
]
