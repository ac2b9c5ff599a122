"""Fused Pallas GP-posterior kernel vs the lane XLA form (interpret mode).

The kernel (ops/pallas/gp_predict.py) must reproduce
sqp_lanes._gp_predict_lanes — mean, variance (incl. the conditioning floor)
and mean Jacobian (incl. the z_scale chain rule) — for the exact masked-
buffer GP and the inducing-point sparse GP, since the lane CEM scorer
dispatches to it transparently (solvers/cem_lanes, impl="auto").
Cross-implementation parity per SURVEY.md §4.1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.envs import env_step, linearize_discretize, make_pendulum
from safe_exploration_tpu.models import make_gp_ssm
from safe_exploration_tpu.models.gp import gp_refit
from safe_exploration_tpu.models.sparse_gp import (
    make_sparse_gp_ssm,
    sparse_gp_refit,
)
from safe_exploration_tpu.solvers.sqp_lanes import (
    _gp_predict_lanes,
    _gp_predict_lanes_pallas,
    gp_pallas_supported,
)


def _exact_ssm(dtype, n_data=24, n_max=32, z_scale=None):
    env = make_pendulum(dtype=dtype)
    a, b = linearize_discretize(env)
    key = jax.random.PRNGKey(3)
    xs = (jax.random.uniform(key, (n_data, 2), dtype, -1.0, 1.0)
          * jnp.asarray([0.3, 1.0], dtype))
    us = jax.random.uniform(jax.random.fold_in(key, 1), (n_data, 1), dtype,
                            -1.0, 1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(
        ("rbf", "rbf"), xs, us, resid, n_max=n_max,
        l_mu=jnp.full((2,), 0.05, dtype),
        l_sigma=jnp.full((2,), 0.02, dtype), log_noise=-4.0,
        z_scale=z_scale,
    )
    params = tuple(
        {**p, "log_sf": jnp.asarray(-3.0, dtype)} for p in ssm.gp.params
    )
    return ssm.replace(gp=gp_refit(ssm.gp.replace(params=params)))


def _queries(dtype, n_lanes):
    key = jax.random.PRNGKey(7)
    return jax.random.uniform(key, (3, n_lanes), dtype, -1.0, 1.0)


@pytest.mark.parametrize("want_jac", [False, True])
@pytest.mark.parametrize("n_lanes", [64, 513])  # 513: pad/slice path
def test_fused_matches_xla_exact_gp(want_jac, n_lanes):
    dtype = jnp.float32
    ssm = _exact_ssm(dtype)
    assert gp_pallas_supported(ssm)
    z = _queries(dtype, n_lanes)
    ref = _gp_predict_lanes(ssm, z, want_jac=want_jac, impl="xla")
    out = _gp_predict_lanes_pallas(ssm, z, want_jac=want_jac,
                                   interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=3e-5, atol=3e-6)


def test_fused_respects_mask():
    """Padded-buffer inactive rows must contribute exactly nothing: shrink
    the active set and check the fused posterior tracks the masked XLA one
    (the kernel sees PRE-masked weights, not the mask itself)."""
    dtype = jnp.float32
    ssm = _exact_ssm(dtype, n_data=24, n_max=48)
    gp = ssm.gp
    # deactivate the last 8 points the way the buffer does it
    mask = gp.mask.at[16:].set(0.0)
    gp = gp_refit(gp.replace(mask=mask))
    ssm = ssm.replace(gp=gp)
    z = _queries(dtype, 128)
    ref = _gp_predict_lanes(ssm, z, want_jac=True, impl="xla")
    out = _gp_predict_lanes_pallas(ssm, z, want_jac=True, interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=3e-5, atol=3e-6)


@pytest.mark.parametrize("want_jac", [False, True])
def test_fused_matches_xla_sparse_gp(want_jac):
    """Inducing-point tier: same kernel, Z rows as support, alpha/vmat as
    weights, z_scale chain rule on the Jacobian."""
    dtype = jnp.float32
    env = make_pendulum(dtype=dtype)
    a, b = linearize_discretize(env)
    key = jax.random.PRNGKey(0)
    n_data = 32
    xs = (jax.random.uniform(key, (n_data, 2), dtype, -1.0, 1.0)
          * jnp.asarray([0.3, 1.0], dtype))
    us = jax.random.uniform(jax.random.fold_in(key, 1), (n_data, 1), dtype,
                            -1.0, 1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_sparse_gp_ssm(
        ("rbf", "rbf"), xs, us, resid, n_max=48, n_inducing=16,
        l_mu=jnp.full((2,), 0.05, dtype),
        l_sigma=jnp.full((2,), 0.02, dtype), log_noise=-4.0,
        z_scale=jnp.asarray([0.5, 2.0, 1.0], dtype),
    )
    params = tuple(
        {**p, "log_sf": jnp.asarray(-3.0, dtype)} for p in ssm.sgp.params
    )
    ssm = ssm.replace(sgp=sparse_gp_refit(ssm.sgp.replace(params=params)))
    assert gp_pallas_supported(ssm)
    z = _queries(dtype, 200)
    ref = _gp_predict_lanes(ssm, z, want_jac=want_jac, impl="xla")
    out = _gp_predict_lanes_pallas(ssm, z, want_jac=want_jac,
                                   interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=3e-5, atol=3e-6)


def test_supported_predicate_excludes_composites_and_lanes():
    from safe_exploration_tpu.models.gp_lanes import lane_stack_ssm

    dtype = jnp.float32
    ssm = _exact_ssm(dtype)
    assert gp_pallas_supported(ssm)
    assert not gp_pallas_supported(lane_stack_ssm(ssm, 2))
    gp = ssm.gp.replace(kern_types=("rbf", "lin_rbf"))
    assert not gp_pallas_supported(ssm.replace(gp=gp))


def test_cem_lane_scorer_dispatch_is_transparent():
    """cem_plan_lanes with gp_impl='pallas' (interpret via CPU backend is
    not wired — force impl through the config seam and check the decision
    path still produces identical plans to 'xla' in interpret mode at the
    predict level). Full-solve equivalence on hardware is a bench.py A/B;
    here we pin that the two impls agree pointwise on a tube-shaped query
    batch, which the scorer composes deterministically."""
    dtype = jnp.float32
    ssm = _exact_ssm(dtype)
    z = _queries(dtype, 96)
    ref = _gp_predict_lanes(ssm, z, want_jac=True, impl="xla")
    out = _gp_predict_lanes_pallas(ssm, z, want_jac=True, interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=3e-5, atol=3e-6)
