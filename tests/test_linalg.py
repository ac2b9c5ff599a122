"""f64 oracle tests for the linalg substrate vs scipy (SURVEY.md §4.1 analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from safe_exploration_tpu.ops import dare_sda, dlqr, expm_discretize, solve_psd_chol


def random_system(rng, n, m):
    a = rng.standard_normal((n, n)) * 0.9
    b = rng.standard_normal((n, m))
    q = np.eye(n) * (0.5 + rng.random())
    r = np.eye(m) * (0.5 + rng.random())
    return a, b, q, r


@pytest.mark.parametrize("n,m", [(2, 1), (4, 1), (6, 2)])
def test_dare_matches_scipy(rng, n, m):
    a, b, q, r = random_system(rng, n, m)
    x = np.asarray(dare_sda(jnp.asarray(a), jnp.asarray(b), jnp.asarray(q), jnp.asarray(r)))
    x_ref = scipy.linalg.solve_discrete_are(a, b, q, r)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-8)


def test_dlqr_stabilizes(rng):
    a, b, q, r = random_system(rng, 4, 2)
    k, p = dlqr(jnp.asarray(a), jnp.asarray(b), jnp.asarray(q), jnp.asarray(r))
    closed = a - b @ np.asarray(k)
    eig = np.abs(np.linalg.eigvals(closed))
    assert np.all(eig < 1.0)
    # P must solve the DARE
    x_ref = scipy.linalg.solve_discrete_are(a, b, q, r)
    np.testing.assert_allclose(np.asarray(p), x_ref, rtol=1e-8, atol=1e-8)


def test_dare_vmaps(rng):
    """Batched LQR across problem instances — the reference can't do this at all."""
    batch = 5
    systems = [random_system(rng, 3, 1) for _ in range(batch)]
    a = jnp.stack([jnp.asarray(s[0]) for s in systems])
    b = jnp.stack([jnp.asarray(s[1]) for s in systems])
    q = jnp.stack([jnp.asarray(s[2]) for s in systems])
    r = jnp.stack([jnp.asarray(s[3]) for s in systems])
    xs = jax.jit(jax.vmap(dare_sda))(a, b, q, r)
    for i, s in enumerate(systems):
        x_ref = scipy.linalg.solve_discrete_are(*s)
        np.testing.assert_allclose(np.asarray(xs[i]), x_ref, rtol=1e-7, atol=1e-7)


def test_expm_discretize_matches_scipy(rng):
    n, m = 4, 2
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, m))
    dt = 0.07
    ad, bd = expm_discretize(jnp.asarray(a), jnp.asarray(b), dt)
    big = np.zeros((n + m, n + m))
    big[:n, :n] = a
    big[:n, n:] = b
    em = scipy.linalg.expm(big * dt)
    np.testing.assert_allclose(np.asarray(ad), em[:n, :n], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(bd), em[:n, n:], rtol=1e-10, atol=1e-12)


def test_solve_psd_chol(rng):
    n = 6
    a = rng.standard_normal((n, n))
    k = a @ a.T + n * np.eye(n)
    l = np.linalg.cholesky(k)
    rhs = rng.standard_normal((n, 3))
    x = solve_psd_chol(jnp.asarray(l), jnp.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(k, rhs), rtol=1e-9)
