"""Float-float arithmetic and the fp64-equivalent Cholesky (BASELINE north
star: "bitwise-stable Cholesky at fp64-equivalent tolerance" on f32 hardware).

These tests intentionally run the ff ops in f32 (not the suite-wide f64) and
compare against true f64 references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.ops import ff as F


def _rand32(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_two_sum_exact(rng):
    a = _rand32(rng, (1000,))
    b = _rand32(rng, (1000,)) * 1e-6
    s, e = F.two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_two_prod_exact(rng):
    a = _rand32(rng, (1000,))
    b = _rand32(rng, (1000,))
    p, e = F.two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    # two_prod is exact: p + e == a*b in f64 (both representable)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=0, atol=0)


def test_ff_mul_add_precision(rng):
    """Chained ff ops keep ~2^-45 relative error where plain f32 is ~2^-20."""
    a64 = rng.standard_normal(4096)
    b64 = rng.standard_normal(4096)
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    # dot product via ff accumulation (sequential scan)
    def body(carry, ab):
        acc = F.ff_add(F.FF(carry[0], carry[1]),
                       F.ff_mul(F.ff(ab[0]), F.ff(ab[1])))
        return (acc.hi, acc.lo), None

    (acc_hi, acc_lo), _ = jax.lax.scan(
        body, (jnp.float32(0), jnp.float32(0)), jnp.stack([a, b], 1)
    )
    got = float(acc_hi) + float(acc_lo)
    exact = float(np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64)))
    f32 = float(jnp.dot(a, b))
    err_ff = abs(got - exact) / abs(exact)
    err_f32 = abs(f32 - exact) / abs(exact)
    assert err_ff < 1e-12
    assert err_ff < err_f32 / 100


def test_ff_div_sqrt(rng):
    x = jnp.abs(_rand32(rng, (512,))) + 0.1
    y = jnp.abs(_rand32(rng, (512,))) + 0.1
    q = F.ff_div(F.ff(x), F.ff(y))
    exact = x.astype(jnp.float64) / y.astype(jnp.float64)
    got = q.hi.astype(jnp.float64) + q.lo.astype(jnp.float64)
    np.testing.assert_allclose(got, exact, rtol=1e-13)
    r = F.ff_sqrt(F.ff(x))
    got = r.hi.astype(jnp.float64) + r.lo.astype(jnp.float64)
    np.testing.assert_allclose(got, jnp.sqrt(x.astype(jnp.float64)), rtol=1e-13)


@pytest.mark.parametrize("n", [32, 128, 256])
def test_cholesky_ff_is_fp64_equivalent(rng, n):
    """The float-float factor of an f32 SPD matrix matches the f64 factor of
    the SAME (f32-valued) matrix orders of magnitude closer than plain f32."""
    m = rng.standard_normal((n, n))
    a32 = jnp.asarray(m @ m.T + n * np.eye(n), jnp.float32)
    a64 = np.asarray(a32, np.float64)
    l64 = np.linalg.cholesky(a64)

    l_ff = jax.jit(F.cholesky_ff)(a32)
    got = np.asarray(l_ff.hi, np.float64) + np.asarray(l_ff.lo, np.float64)
    err_ff = np.max(np.abs(got - l64)) / np.max(np.abs(l64))

    l32 = np.asarray(jnp.linalg.cholesky(a32), np.float64)
    err_f32 = np.max(np.abs(l32 - l64)) / np.max(np.abs(l64))

    assert err_ff < 1e-10, err_ff
    assert err_ff < err_f32 / 1e3, (err_ff, err_f32)


def test_cholesky_ff_reconstructs(rng):
    n = 64
    m = rng.standard_normal((n, n))
    a32 = jnp.asarray(m @ m.T + n * np.eye(n), jnp.float32)
    l_ff = F.cholesky_ff(a32)
    l = np.asarray(l_ff.hi, np.float64) + np.asarray(l_ff.lo, np.float64)
    np.testing.assert_allclose(
        l @ l.T, np.asarray(a32, np.float64), rtol=0, atol=5e-12 * n
    )
