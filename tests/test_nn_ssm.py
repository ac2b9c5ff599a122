"""MC-dropout NN SSM: the second uncertainty-model family (SURVEY.md §2.3/§2.6).

Contract tests in the style of the reference's test_ssm_cem.py: predict shapes,
determinism given the model state, fit improvement, Jacobian agreement with
finite differences, and end-to-end pluggability into reachability + CEM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.models.nn_ssm import (
    make_mc_dropout_ssm,
    mc_fit,
    mc_resample,
    mc_update_data,
)
from safe_exploration_tpu.models.ssm import ssm_predict, ssm_predict_jac
from safe_exploration_tpu.reachability.onestep import onestep_reachability


def _make_data(n=64, dtype=jnp.float64):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), dtype)
    u = jnp.asarray(rng.uniform(-1, 1, (n, 1)), dtype)
    # smooth residual map
    y = jnp.stack(
        [0.3 * jnp.sin(x[:, 0]) + 0.1 * u[:, 0], 0.2 * x[:, 1] ** 2], axis=1
    )
    return x, u, y


@pytest.fixture(scope="module")
def fitted():
    x, u, y = _make_data()
    ssm = make_mc_dropout_ssm(
        jax.random.PRNGKey(0), x, u, y, n_max=128,
        l_mu=jnp.full((2,), 0.5), l_sigma=jnp.full((2,), 0.3),
        hidden=(32, 32), n_samples=8,
    )
    return mc_fit(ssm, jax.random.PRNGKey(1), iters=300), (x, u, y)


def test_predict_shapes_and_determinism(fitted):
    ssm, _ = fitted
    mu, var = ssm_predict(ssm, jnp.asarray([0.1, -0.2]), jnp.asarray([0.3]))
    assert mu.shape == (2,) and var.shape == (2,)
    assert bool(jnp.all(var > 0))
    mu2, var2 = ssm_predict(ssm, jnp.asarray([0.1, -0.2]), jnp.asarray([0.3]))
    np.testing.assert_array_equal(mu, mu2)
    np.testing.assert_array_equal(var, var2)


def test_fit_reduces_error(fitted):
    ssm, (x, u, y) = fitted
    mu, _ = jax.vmap(lambda xx, uu: ssm_predict(ssm, xx, uu))(x, u)
    fit_err = float(jnp.mean((mu - y) ** 2))
    fresh = make_mc_dropout_ssm(
        jax.random.PRNGKey(0), x, u, y, n_max=128,
        l_mu=jnp.full((2,), 0.5), l_sigma=jnp.full((2,), 0.3),
        hidden=(32, 32), n_samples=8,
    )
    mu0, _ = jax.vmap(lambda xx, uu: ssm_predict(fresh, xx, uu))(x, u)
    init_err = float(jnp.mean((mu0 - y) ** 2))
    assert fit_err < 0.2 * init_err
    assert fit_err < 1e-2


def test_jacobian_matches_finite_difference(fitted):
    ssm, _ = fitted
    x0, u0 = jnp.asarray([0.05, -0.1]), jnp.asarray([0.2])
    _, _, j_x, j_u = ssm_predict_jac(ssm, x0, u0)
    eps = 1e-6
    for i in range(2):
        dx = jnp.zeros(2).at[i].set(eps)
        fd = (ssm_predict(ssm, x0 + dx, u0)[0] - ssm_predict(ssm, x0 - dx, u0)[0]) / (
            2 * eps
        )
        np.testing.assert_allclose(j_x[:, i], fd, rtol=1e-4, atol=1e-6)
    du = jnp.zeros(1).at[0].set(eps)
    fd = (ssm_predict(ssm, x0, u0 + du)[0] - ssm_predict(ssm, x0, u0 - du)[0]) / (
        2 * eps
    )
    np.testing.assert_allclose(j_u[:, 0], fd, rtol=1e-4, atol=1e-6)


def test_resample_changes_epistemic_sample(fitted):
    ssm, _ = fitted
    z = (jnp.asarray([0.4, 0.4]), jnp.asarray([0.0]))
    mu1, _ = ssm_predict(ssm, *z)
    mu2, _ = ssm_predict(mc_resample(ssm, jax.random.PRNGKey(99)), *z)
    assert float(jnp.max(jnp.abs(mu1 - mu2))) > 0.0


def test_update_data_ring_buffer(fitted):
    ssm, (x, u, y) = fitted
    n0 = int(jnp.sum(ssm.mask))
    ssm2 = mc_update_data(ssm, x[:4], u[:4], y[:4])
    assert int(jnp.sum(ssm2.mask)) == min(n0 + 4, ssm.x.shape[0])


def test_pluggable_into_reachability(fitted):
    """The safety engine consumes the NN SSM through the same protocol as the
    GP (reference CemSSM seam, SURVEY.md §2.6)."""
    ssm, _ = fitted
    a = jnp.eye(2) * 1.02
    b = jnp.asarray([[0.0], [0.05]])
    k_fb = jnp.asarray([[-0.5, -0.4]])
    p = jnp.asarray([0.05, 0.0])
    q = 1e-4 * jnp.eye(2)
    p1, q1, var = onestep_reachability(
        ssm, p, q, jnp.asarray([0.1]), k_fb, a, b, 2.0
    )
    assert bool(jnp.all(jnp.isfinite(p1)))
    evals = jnp.linalg.eigvalsh(q1)
    assert bool(jnp.all(evals >= 0))


def test_pluggable_into_cem_planner(fitted):
    from safe_exploration_tpu.envs import linearize_discretize, make_pendulum
    from safe_exploration_tpu.ops.linalg import dlqr
    from safe_exploration_tpu.solvers.cem import CemConfig, cem_plan
    from safe_exploration_tpu.solvers.costs import tracking_cost

    ssm, _ = fitted
    env = make_pendulum(dtype=jnp.float64)
    spec = env.spec
    a, b = linearize_discretize(env)
    k, _ = dlqr(a, b, jnp.eye(2, dtype=jnp.float64), jnp.eye(1, dtype=jnp.float64))
    cfg = CemConfig(n_safe=3, n_samples=32, n_elites=8, n_iterations=3)
    k_ff, feasible, viol, info = jax.jit(
        lambda key, x0: cem_plan(
            key, ssm, x0, -k, a, b, spec.u_min, spec.u_max,
            spec.h_mat_obs, spec.h_obs, spec.h_mat_safe, spec.h_safe,
            2.0, tracking_cost(spec.target), cfg,
        )
    )(jax.random.PRNGKey(0), jnp.asarray([0.02, 0.0], jnp.float64))
    assert k_ff.shape == (3, 1)
    assert bool(jnp.all(jnp.isfinite(k_ff)))


def test_concrete_dropout_learns_keep_prob(key):
    """Concrete variant (VERDICT r1 item 10 / reference ssm_cem concrete
    module): per-layer keep probabilities are pytree parameters trained
    jointly with the weights — they must MOVE during mc_fit and predictions
    must remain finite/deterministic under jit."""
    import numpy as np

    from safe_exploration_tpu.models.nn_ssm import make_mc_dropout_ssm, mc_fit

    kx, ku, kf = jax.random.split(key, 3)
    x = jax.random.normal(kx, (40, 2))
    u = jax.random.normal(ku, (40, 1))
    y = jnp.stack([jnp.sin(x[:, 0] + u[:, 0]), jnp.cos(x[:, 1])], axis=-1)
    ssm = make_mc_dropout_ssm(
        jax.random.fold_in(key, 9), x, u, y, n_max=64,
        l_mu=jnp.ones(2), l_sigma=jnp.ones(2),
        hidden=(32, 32), n_samples=8, keep_prob=0.9, concrete=True,
    )
    assert ssm.keep_logit is not None and ssm.keep_logit.shape == (2,)
    p0 = np.asarray(jax.nn.sigmoid(ssm.keep_logit))

    fitted = jax.jit(lambda s: mc_fit(s, kf, iters=150))(ssm)
    p1 = np.asarray(jax.nn.sigmoid(fitted.keep_logit))
    assert np.any(np.abs(p1 - p0) > 1e-4), (p0, p1)  # the parameter trains
    assert np.all((p1 > 0.01) & (p1 < 0.999))

    z = jnp.asarray([0.1, -0.2, 0.3])
    m1, v1 = fitted.predict_latent(z)
    m2, v2 = jax.jit(lambda s, zz: s.predict_latent(zz))(fitted, z)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(v1))) and np.all(np.asarray(v1) > 0)


def test_concrete_dropout_config_family(key):
    """mc_dropout_concrete is a registered, constructible SSM family."""
    from safe_exploration_tpu.runtime.config import CONFIGS, build_experiment

    cfg = CONFIGS["pendulum_episode_concrete"]
    assert cfg.ssm == "mc_dropout_concrete"
    import dataclasses

    small = dataclasses.replace(cfg, n_max=32, mc_hidden=(16,), mc_samples=4)
    exp = build_experiment(small, dtype=jnp.float64)
    x = jax.random.normal(key, (10, 2), jnp.float64)
    u = jax.random.normal(jax.random.fold_in(key, 1), (10, 1), jnp.float64)
    y = 0.01 * jax.random.normal(jax.random.fold_in(key, 2), (10, 2), jnp.float64)
    ssm = exp["make_ssm"](key, x, u, y)
    assert ssm.keep_logit is not None
    mu, var = ssm.predict_latent(jnp.zeros((3,), jnp.float64))
    assert mu.shape == (2,) and var.shape == (2,)
