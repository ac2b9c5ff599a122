"""Parity of the fused whole-rollout CEM scorer (ops/pallas/cem_score.py,
interpret mode on CPU) against the lane XLA scorer chain it fuses
(sqp_lanes._rollout_y_lanes + _dist_lanes + _cost_lanes).

The kernel runs the GP in RAW input coordinates (z_scale folded into the
lengthscales/support rows) — these tests pin that reformulation too.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.envs import env_step, linearize_discretize, make_pendulum
from safe_exploration_tpu.models import make_gp_ssm
from safe_exploration_tpu.models.gp import gp_refit
from safe_exploration_tpu.ops.linalg import dlqr
from safe_exploration_tpu.ops.pallas.cem_score import (
    cem_score_supported,
    tube_score_lanes_pallas,
)
from safe_exploration_tpu.solvers.sqp_lanes import (
    _cost_lanes,
    _dist_lanes,
    _rollout_y_lanes,
)


class _TubeCfg(NamedTuple):
    n_safe: int
    c_safety: float
    n_perf: int


def _setup(dtype=jnp.float32, n_data=24, n_max=32, z_scale=True):
    env = make_pendulum(dtype=dtype)
    spec = env.spec
    a, b = linearize_discretize(env)
    k_lqr, _ = dlqr(a, b, jnp.eye(2, dtype=dtype), jnp.eye(1, dtype=dtype))
    k_fb = -k_lqr
    key = jax.random.PRNGKey(0)
    xs = (jax.random.uniform(key, (n_data, 2), dtype, -1.0, 1.0)
          * jnp.asarray([0.3, 1.0], dtype))
    us = jax.random.uniform(jax.random.fold_in(key, 1), (n_data, 1), dtype,
                            -1.0, 1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(
        ("rbf", "rbf"), xs, us, resid, n_max=n_max,
        l_mu=jnp.full((2,), 0.05, dtype), l_sigma=jnp.full((2,), 0.02, dtype),
        log_noise=-4.0,
        z_scale=jnp.asarray([0.5, 2.0, 1.0], dtype) if z_scale else None,
    )
    params = tuple(
        {**p, "log_sf": jnp.asarray(-3.0, dtype)} for p in ssm.gp.params
    )
    ssm = ssm.replace(gp=gp_refit(ssm.gp.replace(params=params)))
    return env, ssm, k_fb, a, b


@pytest.mark.parametrize("cost_kind", ["tracking", "exploration"])
@pytest.mark.parametrize("z_scale", [True, False])
def test_fused_score_matches_xla_chain(cost_kind, z_scale):
    env, ssm, k_fb, a, b = _setup(z_scale=z_scale)
    spec = env.spec
    dtype = jnp.float32
    t_len, n_u, n_s = 4, 1, 2
    cfg = _TubeCfg(n_safe=t_len, c_safety=2.0, n_perf=0)
    assert cem_score_supported(ssm, n_s, cost_kind, 0)

    s_lift = jnp.concatenate([jnp.eye(n_s, dtype=dtype), k_fb], axis=0)
    bmat = s_lift.T @ s_lift
    L = 37                                   # odd width exercises padding
    key = jax.random.PRNGKey(5)
    u_flat = 0.4 * jax.random.normal(key, (t_len * n_u, L), dtype)
    x0_cols = (jax.random.uniform(jax.random.fold_in(key, 1), (n_s, L),
                                  dtype, -1.0, 1.0)
               * jnp.asarray([0.15, 0.4], dtype)[:, None])

    cost_args = {"target": spec.target} if cost_kind == "tracking" else {}
    # XLA reference chain (the scorer cem_plan_lanes composes)
    x0_rows = [x0_cols[i] for i in range(n_s)]
    y = _rollout_y_lanes(ssm, u_flat, x0_rows, k_fb, a, b, cfg, bmat,
                         0, n_u)
    g = _dist_lanes(y, t_len, n_s, spec.h_mat_obs, spec.h_obs,
                    spec.h_mat_safe, spec.h_safe)
    viol_ref = jnp.sum(jnp.maximum(g, 0.0), axis=0)
    cost_ref = _cost_lanes(cost_kind, cost_args, y, u_flat, t_len, n_s, n_u)

    cost_fused, viol_fused = tube_score_lanes_pallas(
        ssm, u_flat, x0_cols, k_fb, a, b, bmat,
        spec.h_mat_obs, spec.h_obs, spec.h_mat_safe, spec.h_safe,
        2.0, t_len, cost_kind, cost_args, block_l=16, interpret=True,
    )
    assert cost_fused.shape == (L,) and viol_fused.shape == (L,)
    np.testing.assert_allclose(np.asarray(cost_fused), np.asarray(cost_ref),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(viol_fused), np.asarray(viol_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_score_supported_predicate():
    env, ssm, *_ = _setup()
    assert cem_score_supported(ssm, 2, "tracking", 0)
    assert not cem_score_supported(ssm, 2, "tracking", 3)    # perf traj
    assert not cem_score_supported(ssm, 6, "tracking", 0)    # n_s != 2
    assert not cem_score_supported(ssm, 2, "risk_tracking", 0)
    ssm_ff = ssm.replace(gp=ssm.gp.replace(precision="ff"))
    assert not cem_score_supported(ssm_ff, 2, "tracking", 0)
