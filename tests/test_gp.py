"""GP stack oracle tests (SURVEY.md §4.1/§4.3 strategy): posterior formulas vs a
handwritten f64 numpy oracle, padding invariance, jacfwd vs finite differences,
incremental Cholesky vs full refit, hyperopt decreases NLL."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.models import (
    gp_append_point,
    gp_fit,
    gp_init,
    gp_nll,
    gp_predict,
    gp_predict_batch,
    gp_predict_jac,
    gp_update_data,
)


def numpy_rbf(x1, x2, ls, sf2):
    d2 = ((x1[:, None, :] / ls - x2[None, :, :] / ls) ** 2).sum(-1)
    return sf2 * np.exp(-0.5 * d2)


def make_data(rng, n=25, d=3, e=2):
    x = rng.standard_normal((n, d))
    y = np.stack(
        [np.sin(x @ rng.standard_normal(d)) for _ in range(e)], axis=-1
    ) + 0.01 * rng.standard_normal((n, e))
    return jnp.asarray(x), jnp.asarray(y)


def test_posterior_matches_numpy_oracle(rng):
    x, y = make_data(rng)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=40, log_noise=-2.0)
    z = jnp.asarray(rng.standard_normal(3))
    mean, var = gp_predict(gp, z)

    # handwritten f64 oracle with the same (unit) hyperparameters
    noise = np.exp(2 * -2.0)
    for d in range(2):
        k = numpy_rbf(np.asarray(x), np.asarray(x), 1.0, 1.0)
        k += (noise + 1e-6) * np.eye(25)
        kv = numpy_rbf(np.asarray(z)[None], np.asarray(x), 1.0, 1.0)[0]
        alpha = np.linalg.solve(k, np.asarray(y)[:, d])
        m_ref = kv @ alpha
        v_ref = 1.0 - kv @ np.linalg.solve(k, kv)
        np.testing.assert_allclose(float(mean[d]), m_ref, rtol=1e-8)
        np.testing.assert_allclose(float(var[d]), v_ref, rtol=1e-7, atol=1e-10)


def test_padding_invariance(rng):
    """Posterior must be independent of n_max (the masked-identity Gram trick)."""
    x, y = make_data(rng, n=15)
    z = jnp.asarray(rng.standard_normal(3))
    outs = []
    for n_max in (15, 20, 64):
        gp = gp_init(("rbf", "lin_rbf"), x, y, n_max=n_max)
        outs.append(gp_predict(gp, z))
    for m, v in outs[1:]:
        np.testing.assert_allclose(np.asarray(m), np.asarray(outs[0][0]), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(v), np.asarray(outs[0][1]), rtol=1e-8)


@pytest.mark.parametrize("kt", ["rbf", "lin", "mat52", "lin_rbf", "lin_mat52"])
def test_jacobians_match_finite_differences(rng, kt):
    x, y = make_data(rng, n=20, e=1)
    gp = gp_init((kt,), x, y, n_max=32)
    z = jnp.asarray(rng.standard_normal(3) * 0.5)
    mean, var, j_mu, j_sigma = gp_predict_jac(gp, z)
    eps = 1e-6
    for i in range(3):
        dz = jnp.zeros(3).at[i].set(eps)
        mp, vp = gp_predict(gp, z + dz)
        mm, vm = gp_predict(gp, z - dz)
        fd_mu = (mp - mm) / (2 * eps)
        fd_sigma = (jnp.sqrt(vp) - jnp.sqrt(vm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(j_mu[:, i]), np.asarray(fd_mu), rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(j_sigma[:, i]), np.asarray(fd_sigma), rtol=2e-4, atol=1e-7)


def test_update_data_then_predict_consistency(rng):
    x, y = make_data(rng, n=10)
    x2, y2 = make_data(rng, n=5)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=32)
    gp2 = gp_update_data(gp, x2, y2)
    # equals training on the concatenation from scratch
    gp_ref = gp_init(("rbf", "rbf"), jnp.concatenate([x, x2]), jnp.concatenate([y, y2]), n_max=32)
    z = jnp.asarray(rng.standard_normal(3))
    m1, v1 = gp_predict(gp2, z)
    m2, v2 = gp_predict(gp_ref, z)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-8)
    assert int(gp2.n_points) == 15


def test_ring_buffer_overwrite(rng):
    x, y = make_data(rng, n=8)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=8)
    x2, y2 = make_data(rng, n=3)
    gp2 = gp_update_data(gp, x2, y2, replace_old=True)
    assert int(gp2.n_points) == 8  # stays full
    # oldest 3 replaced
    np.testing.assert_allclose(np.asarray(gp2.x[:3]), np.asarray(x2))
    # and a second wrap continues FIFO from slot 3
    x3, y3 = make_data(rng, n=2)
    gp3 = gp_update_data(gp2, x3, y3, replace_old=True)
    np.testing.assert_allclose(np.asarray(gp3.x[3:5]), np.asarray(x3))


def test_incremental_append_matches_full_refit(rng):
    x, y = make_data(rng, n=12)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=20)
    xn = jnp.asarray(rng.standard_normal(3))
    yn = jnp.asarray(rng.standard_normal(2))
    gp_inc = gp_append_point(gp, xn, yn)
    gp_full = gp_update_data(gp, xn[None], yn[None])
    np.testing.assert_allclose(np.asarray(gp_inc.chol), np.asarray(gp_full.chol), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gp_inc.beta), np.asarray(gp_full.beta), rtol=1e-7, atol=1e-10)


def test_hyperopt_decreases_nll(rng):
    x, y = make_data(rng, n=30)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=40, log_noise=-1.0)
    before = float(gp_nll(gp.params, gp.log_noise, gp))
    gp_opt = jax.jit(lambda g: gp_fit(g, iters=150, lr=5e-2))(gp)
    after = float(gp_nll(gp_opt.params, gp_opt.log_noise, gp_opt))
    assert after < before - 1.0


def test_vmap_over_gps(rng):
    """A batch of GPs (per-episode models, BASELINE config 3) must vmap."""
    xs, ys = zip(*(make_data(rng, n=10) for _ in range(4)))
    gps = [gp_init(("rbf", "rbf"), x, y, n_max=16) for x, y in zip(xs, ys)]
    batched = jax.tree.map(lambda *a: jnp.stack(a), *gps)
    z = jnp.asarray(rng.standard_normal((4, 3)))
    means, _ = jax.jit(jax.vmap(gp_predict))(batched, z)
    for i in range(4):
        m_ref, _ = gp_predict(gps[i], z[i])
        np.testing.assert_allclose(np.asarray(means[i]), np.asarray(m_ref), rtol=1e-9)


def test_batch_predict_matches_loop(rng):
    x, y = make_data(rng, n=18)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=32)
    zs = jnp.asarray(rng.standard_normal((7, 3)))
    mb, vb = gp_predict_batch(gp, zs)
    for i in range(7):
        m, v = gp_predict(gp, zs[i])
        np.testing.assert_allclose(np.asarray(mb[i]), np.asarray(m), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(v), rtol=1e-12)


def test_vmapped_fast_path_equals_per_dim_loop(rng):
    """The uniform-kernel vmap fast paths (refit/predict/nll) must be exactly
    the per-dim loop math (SURVEY.md §2.3 batched multi-output analog)."""
    from safe_exploration_tpu.models.gp import _predict_dim

    x, y = make_data(rng, n=14)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=24)   # uniform -> fast path
    z = jnp.asarray(rng.standard_normal(3))
    m_fast, v_fast = gp_predict(gp, z)
    for d in range(2):
        m_d, v_d = _predict_dim(gp, d, z)
        np.testing.assert_allclose(np.asarray(m_fast[d]), np.asarray(m_d), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(v_fast[d]), np.asarray(v_d), rtol=1e-12)


def test_mixed_kernel_types_loop_path(rng):
    """Mixed per-dim kernels (the reference's kern_types menu) use the general
    loop path end-to-end: refit, predict, nll, fit."""
    x, y = make_data(rng, n=16)
    gp = gp_init(("rbf", "lin_rbf"), x, y, n_max=24)
    z = jnp.asarray(rng.standard_normal(3))
    mean, var = gp_predict(gp, z)
    assert mean.shape == (2,) and bool(jnp.all(var > 0))
    nll = float(gp_nll(gp.params, gp.log_noise, gp))
    assert np.isfinite(nll)
    gp2 = gp_fit(gp, iters=30)
    assert float(gp_nll(gp2.params, gp2.log_noise, gp2)) <= nll + 1e-6


def test_kinv_matches_explicit_inverse(rng):
    """The precomputed K^{-1} (solve-free predict path) equals the true inverse
    of the masked Gram, including on padded slots (identity)."""
    from safe_exploration_tpu.models.gp import _masked_gram

    x, y = make_data(rng)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=40, log_noise=-2.0)
    for d in range(2):
        noise_var = np.exp(2.0 * float(gp.log_noise[d]))
        k = np.asarray(_masked_gram("rbf", gp.params[d], gp.x, gp.mask, noise_var))
        np.testing.assert_allclose(
            np.asarray(gp.kinv[d]), np.linalg.inv(k), rtol=1e-8, atol=1e-10
        )


def test_incremental_append_updates_kinv(rng):
    """gp_append_point's O(n^2) Schur block-inverse update must agree with the
    full refit's K^{-1} (and beta must follow)."""
    x, y = make_data(rng, n=12)
    gp_inc = gp_init(("rbf", "rbf"), x[:-3], y[:-3], n_max=20, log_noise=-2.0)
    for i in range(3):
        gp_inc = gp_append_point(gp_inc, x[9 + i], y[9 + i])
    gp_full = gp_init(
        ("rbf", "rbf"), x, y, n_max=20, log_noise=-2.0, params=gp_inc.params
    )
    np.testing.assert_allclose(
        np.asarray(gp_inc.kinv), np.asarray(gp_full.kinv), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(gp_inc.beta), np.asarray(gp_full.beta), rtol=1e-7, atol=1e-9
    )


def test_predict_jac_values_match_plain_predict(rng):
    """The fused value+Jacobian path must return the same mean/var as
    gp_predict (one shared forward evaluation, not a separate code path)."""
    x, y = make_data(rng)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=40, log_noise=-2.0)
    z = jnp.asarray(rng.standard_normal(3))
    mean, var = gp_predict(gp, z)
    m2, v2, jm, js = gp_predict_jac(gp, z)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mean), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(var), rtol=1e-12)
    assert jm.shape == (2, 3) and js.shape == (2, 3)


def test_ssm_predict_grads_full_gradient_return(rng):
    """ssm_predict_grads mirrors the reference's predictive_gradients: BOTH
    the mean Jacobian and the VARIANCE gradient ∂σ²/∂z (GPy's convention,
    SURVEY.md §2.3/§3.4 — ADVICE r4: the std-gradient form diverged from the
    reference and blows up as var→0). The mean block must match the
    closed-form hot-loop path (ssm_predict_jac) and the variance block must
    match a finite difference of var, with the z_scale chain rule applied to
    both."""
    from safe_exploration_tpu.models.ssm import (
        make_gp_ssm,
        ssm_predict,
        ssm_predict_grads,
        ssm_predict_jac,
    )

    x = jnp.asarray(rng.standard_normal((16, 2)))
    u = jnp.asarray(rng.standard_normal((16, 1)))
    y = jnp.asarray(rng.standard_normal((16, 2))) * 0.05
    ssm = make_gp_ssm(
        ("rbf", "lin_rbf"), x, u, y, n_max=32,
        l_mu=jnp.full((2,), 0.1), l_sigma=jnp.full((2,), 0.1),
        z_scale=jnp.asarray([2.0, 0.5, 3.0]),
    )
    xq = jnp.asarray(rng.standard_normal(2)) * 0.3
    uq = jnp.asarray(rng.standard_normal(1)) * 0.3
    mu, var, jac_mu, jac_var = ssm_predict_grads(ssm, xq, uq)
    assert jac_mu.shape == (2, 3) and jac_var.shape == (2, 3)
    mu_h, var_h, jx_h, ju_h = ssm_predict_jac(ssm, xq, uq)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_h), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_h), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jac_mu), np.asarray(jnp.concatenate([jx_h, ju_h], axis=1)),
        rtol=1e-8, atol=1e-10,
    )
    # variance gradient vs central finite differences in RAW input coordinates
    eps = 1e-5
    z0 = np.concatenate([np.asarray(xq), np.asarray(uq)])
    fd = np.zeros((2, 3))
    for j in range(3):
        zp, zm = z0.copy(), z0.copy()
        zp[j] += eps
        zm[j] -= eps
        vp = np.asarray(
            ssm_predict(ssm, jnp.asarray(zp[:2]), jnp.asarray(zp[2:]))[1]
        )
        vm = np.asarray(
            ssm_predict(ssm, jnp.asarray(zm[:2]), jnp.asarray(zm[2:]))[1]
        )
        fd[:, j] = (vp - vm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(jac_var), fd, rtol=2e-4, atol=1e-7)


def test_z_scale_normalized_training_equivalence(rng):
    """A GPSSM trained on z/z_scale with lengthscales ell must predict
    EXACTLY like a raw-input GPSSM with lengthscales ell*z_scale (RBF is a
    function of scaled differences), and its Jacobians must chain through
    the scaling. Parity: reference normalized-input training (SURVEY.md §2.7)."""
    from safe_exploration_tpu.models.ssm import make_gp_ssm, ssm_predict_jac

    x = jnp.asarray(rng.standard_normal((20, 2)))
    u = jnp.asarray(rng.standard_normal((20, 1)))
    y = jnp.asarray(rng.standard_normal((20, 2))) * 0.01
    l_mu = jnp.full((2,), 0.1)
    l_sigma = jnp.full((2,), 0.1)
    z_scale = jnp.asarray([2.0, 0.5, 3.0])

    ssm_n = make_gp_ssm(("rbf", "rbf"), x, u, y, n_max=32,
                        l_mu=l_mu, l_sigma=l_sigma, z_scale=z_scale)
    ssm_r = make_gp_ssm(("rbf", "rbf"), x, u, y, n_max=32,
                        l_mu=l_mu, l_sigma=l_sigma)
    # match hyperparameters: raw lengthscales = normalized ell * z_scale
    from safe_exploration_tpu.models.gp import gp_refit

    params_r = tuple(
        {**p, "log_lengthscales": p["log_lengthscales"] + jnp.log(z_scale)}
        for p in ssm_n.gp.params
    )
    ssm_r = ssm_r.replace(gp=gp_refit(ssm_r.gp.replace(params=params_r)))

    xq = jnp.asarray(rng.standard_normal(2))
    uq = jnp.asarray(rng.standard_normal(1))
    mu_n, var_n, jx_n, ju_n = ssm_predict_jac(ssm_n, xq, uq)
    mu_r, var_r, jx_r, ju_r = ssm_predict_jac(ssm_r, xq, uq)
    np.testing.assert_allclose(np.asarray(mu_n), np.asarray(mu_r), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(var_n), np.asarray(var_r), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(jx_n), np.asarray(jx_r), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ju_n), np.asarray(ju_r), rtol=1e-8)

    # update path normalizes too: appending through ssm_update keeps parity
    from safe_exploration_tpu.models.ssm import ssm_update

    x2 = jnp.asarray(rng.standard_normal((3, 2)))
    u2 = jnp.asarray(rng.standard_normal((3, 1)))
    y2 = jnp.asarray(rng.standard_normal((3, 2))) * 0.01
    ssm_n2 = ssm_update(ssm_n, x2, u2, y2)
    ssm_r2 = ssm_update(ssm_r, x2, u2, y2)
    mu_n2, var_n2 = ssm_n2.predict_latent(jnp.concatenate([xq, uq]))
    mu_r2, var_r2 = ssm_r2.predict_latent(jnp.concatenate([xq, uq]))
    np.testing.assert_allclose(np.asarray(mu_n2), np.asarray(mu_r2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(var_n2), np.asarray(var_r2), rtol=1e-9)


def test_append_on_full_buffer_is_noop(rng):
    """VERDICT r2 weak #3: a full buffer must NOT be silently corrupted by the
    bordered-extension update (which assumes the slot was an identity row) —
    the append saturates, leaving data and factors exactly unchanged."""
    x, y = make_data(rng, n=8)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=8)  # full from the start
    xn = jnp.asarray(rng.standard_normal(3))
    yn = jnp.asarray(rng.standard_normal(2))
    gp2 = gp_append_point(gp, xn, yn)
    for field in ("x", "y", "mask", "chol", "beta", "kinv"):
        np.testing.assert_array_equal(
            np.asarray(getattr(gp2, field)), np.asarray(getattr(gp, field)),
            err_msg=field,
        )
    assert int(gp2.head) == 8
    # and a subsequent predict is still the uncorrupted posterior
    z = jnp.asarray(rng.standard_normal(3))
    np.testing.assert_allclose(
        np.asarray(gp_predict(gp2, z)[0]), np.asarray(gp_predict(gp, z)[0])
    )


def test_long_append_sequence_factor_drift_bounded(rng):
    """ADVICE r2 #4: over a long run of O(n^2) incremental appends, beta (now
    re-derived from the maintained Cholesky factor each step) and kinv must
    stay close to a from-scratch refit — no unbounded drift."""
    x, y = make_data(rng, n=4)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=64)
    xs = rng.standard_normal((40, 3))
    ys = 0.3 * rng.standard_normal((40, 2))
    for i in range(40):
        gp = gp_append_point(gp, jnp.asarray(xs[i]), jnp.asarray(ys[i]))
    gp_ref = gp_init(
        ("rbf", "rbf"),
        jnp.concatenate([x, jnp.asarray(xs)]),
        jnp.concatenate([y, jnp.asarray(ys)]),
        n_max=64,
    )
    np.testing.assert_allclose(
        np.asarray(gp.beta), np.asarray(gp_ref.beta), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(gp.kinv), np.asarray(gp_ref.kinv), rtol=1e-5, atol=1e-7
    )
    z = jnp.asarray(rng.standard_normal(3))
    np.testing.assert_allclose(
        np.asarray(gp_predict(gp, z)[1]),
        np.asarray(gp_predict(gp_ref, z)[1]), rtol=1e-6,
    )


def test_full_cov_diag_matches_batch_predict(rng):
    """full_cov=True parity branch (SURVEY.md §2.3): the joint covariance's
    diagonal must equal the per-point latent variance, and the full matrix
    must match the f64 oracle K(Z,Z) - K(Z,X) K^-1 K(X,Z)."""
    from safe_exploration_tpu.models import gp_predict_full_cov

    x, y = make_data(rng, n=18)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=24, log_noise=-2.0)
    zq = jnp.asarray(rng.standard_normal((5, 3)))
    mean_b, var_b = gp_predict_batch(gp, zq)
    mean_f, cov_f = gp_predict_full_cov(gp, zq)
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_b), rtol=1e-9)
    for d in range(2):
        np.testing.assert_allclose(
            np.asarray(jnp.diagonal(cov_f[d])), np.asarray(var_b[:, d]),
            rtol=1e-7, atol=1e-12,
        )
        # f64 oracle
        noise = np.exp(2 * -2.0)
        k = numpy_rbf(np.asarray(x), np.asarray(x), 1.0, 1.0)
        k += (noise + 1e-6) * np.eye(18)
        kzx = numpy_rbf(np.asarray(zq), np.asarray(x), 1.0, 1.0)
        cov_ref = numpy_rbf(np.asarray(zq), np.asarray(zq), 1.0, 1.0) - kzx @ np.linalg.solve(k, kzx.T)
        np.testing.assert_allclose(
            np.asarray(cov_f[d]), cov_ref, rtol=1e-6, atol=1e-9
        )
        # PSD (sampling from the joint posterior must be well-defined)
        assert np.linalg.eigvalsh(np.asarray(cov_f[d]))[0] > -1e-9


@pytest.mark.parametrize("kt", ["rbf", "lin", "mat52", "lin_rbf", "lin_mat52"])
def test_closed_form_mean_jacobian_matches_jacfwd(rng, kt):
    """The analytic posterior-mean Jacobian (hot-loop fusion, VERDICT r2 #2)
    must equal the autodiff Jacobian for every kernel type."""
    from safe_exploration_tpu.models.gp import gp_predict_mean_jac

    x, y = make_data(rng, n=20, e=2)
    gp = gp_init((kt, kt), x, y, n_max=32)
    for _ in range(3):
        z = jnp.asarray(rng.standard_normal(3) * 0.7)
        mean_c, var_c, jac_c = gp_predict_mean_jac(gp, z)
        mean_r, var_r = gp_predict(gp, z)
        jac_r = jax.jacfwd(lambda zz: gp_predict(gp, zz)[0])(z)
        np.testing.assert_allclose(np.asarray(mean_c), np.asarray(mean_r), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(var_c), np.asarray(var_r), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(jac_c), np.asarray(jac_r), rtol=1e-7, atol=1e-10
        )


def test_ssm_predict_jac_closed_form_with_normalization(rng):
    """ssm_predict_jac must chain the z_scale normalization through the
    closed-form Jacobian (raw-input derivatives), for dense AND sparse SSMs."""
    from safe_exploration_tpu.models.sparse_gp import make_sparse_gp_ssm
    from safe_exploration_tpu.models.ssm import make_gp_ssm, ssm_predict_jac

    xs = jnp.asarray(rng.standard_normal((15, 2)) * jnp.asarray([2.0, 5.0]))
    us = jnp.asarray(rng.standard_normal((15, 1)) * 3.0)
    ys = jnp.asarray(rng.standard_normal((15, 2)) * 0.1)
    z_scale = jnp.asarray([2.0, 5.0, 3.0])
    l = jnp.full((2,), 0.1)
    for ssm in (
        make_gp_ssm(("rbf", "rbf"), xs, us, ys, n_max=20, l_mu=l, l_sigma=l,
                    z_scale=z_scale),
        make_sparse_gp_ssm(("rbf", "rbf"), xs, us, ys, n_max=20, n_inducing=8,
                           l_mu=l, l_sigma=l, z_scale=z_scale),
    ):
        x0 = jnp.asarray(rng.standard_normal(2))
        u0 = jnp.asarray(rng.standard_normal(1))
        mu, var, jx, ju = ssm_predict_jac(ssm, x0, u0)
        # autodiff oracle THROUGH the protocol (includes normalization)
        jac_ref = jax.jacfwd(
            lambda zz: ssm.predict_latent(zz)[0]
        )(jnp.concatenate([x0, u0]))
        np.testing.assert_allclose(np.asarray(jx), np.asarray(jac_ref[:, :2]),
                                   rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(np.asarray(ju), np.asarray(jac_ref[:, 2:]),
                                   rtol=1e-7, atol=1e-10)
        mu2, var2 = ssm.predict_latent(jnp.concatenate([x0, u0]))
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var2), rtol=1e-10)


def test_bucketed_view_preserves_posterior(rng):
    """Shape bucketing (gp_shrink_to_bucket): the sliced factors must BE the
    factors of the sliced problem — identical posterior, smaller contractions
    (the planner hot-loop optimization; see models/ssm.ssm_bucketed)."""
    from safe_exploration_tpu.models.gp import gp_shrink_to_bucket

    x, y = make_data(rng, n=40)
    gp = gp_init(("rbf", "rbf"), x, y, n_max=256)
    small = gp_shrink_to_bucket(gp)
    assert small.n_max == 64  # smallest power-of-2 bucket >= 40
    for _ in range(4):
        z = jnp.asarray(rng.standard_normal(3))
        m1, v1 = gp_predict(gp, z)
        m2, v2 = gp_predict(small, z)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-9)
    # appends continue on the FULL buffer; bucket view re-derived after
    xn = jnp.asarray(rng.standard_normal(3))
    yn = jnp.asarray(rng.standard_normal(2))
    gp2 = gp_append_point(gp, xn, yn)
    small2 = gp_shrink_to_bucket(gp2)
    np.testing.assert_allclose(
        np.asarray(gp_predict(small2, xn)[0]),
        np.asarray(gp_predict(gp2, xn)[0]), rtol=1e-9,
    )
    # ring-wrapped (non-prefix) layouts refuse to bucket
    gp_wrap = gp_init(("rbf", "rbf"), x, y, n_max=40)
    gp_wrap = gp_update_data(gp_wrap, x[:8], y[:8], replace_old=True)
    assert gp_shrink_to_bucket(gp_wrap).n_max == 40
