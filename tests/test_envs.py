"""Environment tests (SURVEY.md §4.4: dynamics Jacobians vs finite differences,
step determinism under fixed seed, equilibrium/energy sanity checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.envs import (
    env_reset,
    env_step,
    linearize_discretize,
    make_cartpole,
    make_pendulum,
    make_quadrotor,
)
from safe_exploration_tpu.ops import dlqr

ENVS = {
    "pendulum": make_pendulum,
    "cartpole": make_cartpole,
    "quadrotor": make_quadrotor,
}


@pytest.fixture(params=list(ENVS))
def env(request):
    return ENVS[request.param](dtype=jnp.float64)


def test_origin_is_equilibrium(env):
    x0 = jnp.zeros(env.spec.n_s, jnp.float64)
    u0 = jnp.zeros(env.spec.n_u, jnp.float64)
    xdot = env.dynamics(x0, u0)
    np.testing.assert_allclose(np.asarray(xdot), 0.0, atol=1e-12)


def test_jacobians_vs_finite_differences(env, rng):
    x = jnp.asarray(rng.standard_normal(env.spec.n_s) * 0.1)
    u = jnp.asarray(rng.standard_normal(env.spec.n_u) * 0.1)
    ja = jax.jacfwd(lambda xx: env.dynamics(xx, u))(x)
    jb = jax.jacfwd(lambda uu: env.dynamics(x, uu))(u)
    eps = 1e-7
    for i in range(env.spec.n_s):
        dx = jnp.zeros_like(x).at[i].set(eps)
        fd = (env.dynamics(x + dx, u) - env.dynamics(x - dx, u)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(ja[:, i]), np.asarray(fd), rtol=1e-5, atol=1e-7)
    for i in range(env.spec.n_u):
        du = jnp.zeros_like(u).at[i].set(eps)
        fd = (env.dynamics(x, u + du) - env.dynamics(x, u - du)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(jb[:, i]), np.asarray(fd), rtol=1e-5, atol=1e-7)


def test_step_deterministic_and_noise_scaled(env, key):
    x = jnp.zeros(env.spec.n_s, jnp.float64).at[0].set(0.01)
    u = 0.1 * jnp.ones(env.spec.n_u, jnp.float64)
    u1, x1 = env_step(env, key, x, u)
    u2, x2 = env_step(env, key, x, u)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_control_clipping(env, key):
    x = jnp.zeros(env.spec.n_s, jnp.float64)
    u_big = 100.0 * jnp.ones(env.spec.n_u, jnp.float64)
    u_app, _ = env_step(env, key, x, u_big)
    np.testing.assert_allclose(np.asarray(u_app), np.asarray(env.spec.u_max))


def test_linearization_predicts_small_steps(env):
    """Discrete prior (a, b) must match the true flow to 2nd order near the origin."""
    a, b = linearize_discretize(env)
    x = 1e-3 * jnp.ones(env.spec.n_s, jnp.float64)
    u = 1e-3 * jnp.ones(env.spec.n_u, jnp.float64)
    env_nonoise = env._replace(spec=env.spec.replace(plant_noise=jnp.zeros(env.spec.n_s, jnp.float64)))
    _, x_true = env_step(env_nonoise, jax.random.PRNGKey(0), x, u)
    x_lin = a @ x + b @ u
    np.testing.assert_allclose(np.asarray(x_lin), np.asarray(x_true), atol=5e-6)


def test_lqr_stabilizes_each_plant(env, key):
    """The terminal safe controller (SURVEY.md §2.5): LQR on the prior must
    stabilize the true nonlinear plant from inside the safe set."""
    a, b = linearize_discretize(env)
    n_s, n_u = env.spec.n_s, env.spec.n_u
    k, _ = dlqr(a, b, jnp.eye(n_s, dtype=jnp.float64), 0.1 * jnp.eye(n_u, dtype=jnp.float64))
    x = jnp.asarray(0.3 * np.asarray(env.spec.h_safe[:n_s]))  # inside safe box
    env_nonoise = env._replace(spec=env.spec.replace(plant_noise=jnp.zeros(n_s, jnp.float64)))

    def roll(x0):
        def body(x, _):
            u = -k @ x
            _, xn = env_step(env_nonoise, jax.random.PRNGKey(0), x, u)
            return xn, jnp.linalg.norm(xn)

        xT, norms = jax.lax.scan(body, x0, None, length=80)
        return xT, norms

    xT, norms = roll(x)
    assert float(jnp.linalg.norm(xT)) < 2e-2, f"LQR failed to stabilize {env.name}"


def test_reset_vmaps(env, key):
    keys = jax.random.split(key, 16)
    xs = jax.vmap(lambda k: env_reset(env, k))(keys)
    assert xs.shape == (16, env.spec.n_s)
    assert np.std(np.asarray(xs)) > 0
