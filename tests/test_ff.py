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


def test_ff_precision_mode_refit_matches_f64_oracle():
    """precision="ff" GP refits: posterior factors from an ILL-CONDITIONED
    f32 Gram must match the f64 oracle to <= 1e-5 (storage rounding only),
    where the plain-f32 pipeline loses eps * k(K) — the usable mode of the
    north star's fp64-equivalent Cholesky (VERDICT r1 item 7)."""
    import numpy as np

    from safe_exploration_tpu.models.gp import _masked_gram, gp_init

    rng = np.random.default_rng(3)
    n, e = 40, 1
    # near-duplicate inputs + tiny noise => condition number ~ 1e6 in f32
    base = rng.standard_normal((n // 2, 3))
    x = np.concatenate([base, base + 1e-3 * rng.standard_normal(base.shape)])
    y = np.sin(x @ rng.standard_normal(3))[:, None]
    xf = jnp.asarray(x, jnp.float32)
    yf = jnp.asarray(y, jnp.float32)

    gp_ff = gp_init(("rbf",), xf, yf, n_max=n, log_noise=-4.0, precision="ff")
    gp_32 = gp_init(("rbf",), xf, yf, n_max=n, log_noise=-4.0)

    # f64 oracle on the EXACT f32 Gram the refit factored (a python-float
    # noise term would promote the diagonal to f64 and perturb K by ~5e-8,
    # which k(K) amplifies past everything being measured here)
    kf32 = _masked_gram(
        "rbf", gp_32.params[0], gp_32.x, gp_32.mask,
        jnp.exp(2.0 * gp_32.log_noise[0]).astype(jnp.float32),
    ).astype(jnp.float32)
    k64 = np.asarray(kf32, np.float64)
    beta64 = np.linalg.solve(k64, np.asarray(gp_32.mask * gp_32.y[:, 0], np.float64))
    scale = np.max(np.abs(beta64))

    err_ff = np.max(np.abs(np.asarray(gp_ff.beta[0], np.float64) - beta64)) / scale
    err_32 = np.max(np.abs(np.asarray(gp_32.beta[0], np.float64) - beta64)) / scale
    assert err_ff <= 1e-5, err_ff
    assert err_ff < err_32 / 10, (err_ff, err_32)

    kinv64 = np.linalg.inv(k64)
    s2 = np.max(np.abs(kinv64))
    err_kinv = np.max(np.abs(np.asarray(gp_ff.kinv[0], np.float64) - kinv64)) / s2
    assert err_kinv <= 1e-5, err_kinv


def test_ff_mode_predictions_track_f64(key):
    """Along a fixed trajectory of query points, ff-mode f32 predictions
    match the f64 pipeline to <= 1e-5 relative."""
    import numpy as np

    from safe_exploration_tpu.models.gp import gp_init, gp_predict_batch

    rng = np.random.default_rng(5)
    x = rng.standard_normal((30, 3))
    y = np.stack([np.sin(x @ rng.standard_normal(3)) for _ in range(2)], -1)
    gp_ff = gp_init(("rbf", "rbf"), jnp.asarray(x, jnp.float32),
                    jnp.asarray(y, jnp.float32), n_max=40, log_noise=-3.0,
                    precision="ff")
    gp_64 = gp_init(("rbf", "rbf"), jnp.asarray(x), jnp.asarray(y),
                    n_max=40, log_noise=-3.0)
    zq = jnp.asarray(rng.standard_normal((10, 3)))
    m_ff, v_ff = gp_predict_batch(gp_ff, zq.astype(jnp.float32))
    m_64, v_64 = gp_predict_batch(gp_64, zq)
    scale = float(jnp.max(jnp.abs(m_64))) + 1e-12
    assert float(jnp.max(jnp.abs(m_ff - m_64.astype(jnp.float32)))) / scale < 1e-5
