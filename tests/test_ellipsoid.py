"""Property tests for ellipsoid calculus (SURVEY.md §4.2 test strategy:
math invariants — sums contain both summands, box corners covered, etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.ops import (
    distance_to_center,
    ellipsoid_from_rectangle,
    sample_inside_ellipsoid,
    sum_two_ellipsoids,
)


def random_psd(rng, n, scale=1.0):
    a = rng.standard_normal((n, n))
    return scale * (a @ a.T + 0.1 * np.eye(n))


@pytest.mark.parametrize("n", [2, 4, 6])
def test_minkowski_sum_contains_both_summand_samples(rng, key, n):
    q1 = jnp.asarray(random_psd(rng, n))
    q2 = jnp.asarray(random_psd(rng, n, scale=0.3))
    p1 = jnp.asarray(rng.standard_normal(n))
    p2 = jnp.asarray(rng.standard_normal(n))
    p, q = sum_two_ellipsoids(p1, q1, p2, q2)

    k1, k2 = jax.random.split(key)
    s1 = sample_inside_ellipsoid(k1, 500, p1, q1)
    s2 = sample_inside_ellipsoid(k2, 500, p2, q2)
    # Minkowski sum contains e.g. x1 + p2 and p1 + x2 and x1 + x2.
    for pts in (s1 + p2, s2 + p1, s1 + (s2 - p2) + p2 - p1 + p1):
        d = distance_to_center(pts, p, q)
        assert float(jnp.max(d)) <= 1.0 + 1e-9


def test_minkowski_sum_trace_is_minimal_choice(rng):
    q1 = jnp.asarray(random_psd(rng, 3))
    q2 = jnp.asarray(random_psd(rng, 3))
    _, q = sum_two_ellipsoids(jnp.zeros(3), q1, jnp.zeros(3), q2)
    expected = (jnp.sqrt(jnp.trace(q1)) + jnp.sqrt(jnp.trace(q2))) ** 2
    np.testing.assert_allclose(float(jnp.trace(q)), float(expected), rtol=1e-10)


@pytest.mark.parametrize("n", [1, 2, 5])
def test_ellipsoid_from_rectangle_covers_corners_tightly(rng, n):
    ub = jnp.asarray(np.abs(rng.standard_normal(n)) + 0.1)
    q = ellipsoid_from_rectangle(ub)
    # All 2^n corners lie exactly ON the ellipsoid boundary.
    signs = np.array(np.meshgrid(*([[-1.0, 1.0]] * n))).reshape(n, -1).T
    corners = jnp.asarray(signs) * ub
    d = distance_to_center(corners, jnp.zeros(n), q)
    np.testing.assert_allclose(np.asarray(d), 1.0, rtol=1e-9)


def test_sample_inside_ellipsoid_stays_inside(rng, key):
    n = 3
    q = jnp.asarray(random_psd(rng, n))
    p = jnp.asarray(rng.standard_normal(n))
    s = sample_inside_ellipsoid(key, 2000, p, q)
    d = distance_to_center(s, p, q)
    assert float(jnp.max(d)) <= 1.0 + 1e-7
    # and actually fills the ellipsoid (not degenerate)
    assert float(jnp.max(d)) >= 0.9


def test_jit_vmap_equivalence(rng):
    """SURVEY.md §4.1 analog: jit-vs-eager and vmap-vs-loop equivalence."""
    n, b = 4, 7
    q1 = jnp.stack([jnp.asarray(random_psd(rng, n)) for _ in range(b)])
    q2 = jnp.stack([jnp.asarray(random_psd(rng, n)) for _ in range(b)])
    p1 = jnp.asarray(rng.standard_normal((b, n)))
    p2 = jnp.asarray(rng.standard_normal((b, n)))

    eager = [sum_two_ellipsoids(p1[i], q1[i], p2[i], q2[i]) for i in range(b)]
    v_p, v_q = jax.jit(jax.vmap(sum_two_ellipsoids))(p1, q1, p2, q2)
    for i in range(b):
        np.testing.assert_allclose(np.asarray(v_p[i]), np.asarray(eager[i][0]), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(v_q[i]), np.asarray(eager[i][1]), rtol=1e-12)
