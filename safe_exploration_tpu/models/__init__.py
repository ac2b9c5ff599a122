"""L2 dynamics models: GP regression stack and the SSM protocol.

Single-JAX replacement for the reference's three model stacks
(``ssm_gpy/``, ``ssm_pytorch/``, ``ssm_cem/`` — SURVEY.md §2.3).
"""

from safe_exploration_tpu.models.gp import (
    GP,
    gp_append_point,
    gp_fit,
    gp_init,
    gp_nll,
    gp_predict,
    gp_predict_batch,
    gp_predict_full_cov,
    gp_predict_jac,
    gp_refit,
    gp_update_data,
)
from safe_exploration_tpu.models.kernels import (
    KERNELS,
    gram,
    init_kernel_params,
    kernel_diag,
)
from safe_exploration_tpu.models.ssm import (
    GPSSM,
    estimate_lipschitz,
    make_gp_ssm,
    ssm_append_point,
    ssm_fit,
    ssm_predict,
    ssm_predict_full_cov,
    ssm_predict_jac,
    ssm_update,
)

__all__ = [
    "GP", "gp_init", "gp_refit", "gp_update_data", "gp_append_point", "gp_nll",
    "gp_fit", "gp_predict", "gp_predict_batch", "gp_predict_full_cov",
    "gp_predict_jac",
    "KERNELS", "gram", "init_kernel_params", "kernel_diag",
    "GPSSM", "make_gp_ssm", "ssm_predict", "ssm_predict_full_cov",
    "ssm_predict_jac", "ssm_update", "ssm_append_point", "ssm_fit",
    "estimate_lipschitz",
]
