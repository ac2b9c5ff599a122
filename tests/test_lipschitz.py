"""Tests for Lipschitz remainder over-approximations (SURVEY.md §2.2, §4.2:
remainder bounds must dominate sampled true quantities)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_exploration_tpu.ops import (
    compute_remainder_overapproximations,
    max_eig_psd_product,
    sample_inside_ellipsoid,
)


def random_psd(rng, n, scale=1.0):
    a = rng.standard_normal((n, n))
    return scale * (a @ a.T + 0.1 * np.eye(n))


@pytest.mark.parametrize("n", [2, 4, 6])
def test_power_iteration_matches_eigvalsh(rng, n):
    q = jnp.asarray(random_psd(rng, n))
    b = jnp.asarray(random_psd(rng, n))
    lam = float(max_eig_psd_product(q @ b))
    # exact: eigvals of Q^{1/2} B Q^{1/2}
    w, v = np.linalg.eigh(np.asarray(q))
    qsqrt = v @ np.diag(np.sqrt(w)) @ v.T
    exact = float(np.linalg.eigvalsh(qsqrt @ np.asarray(b) @ qsqrt)[-1])
    np.testing.assert_allclose(lam, exact, rtol=1e-8)


def test_remainder_dominates_sampled_radius(rng, key):
    """u_sigma = l_sigma * r must dominate l_sigma * ||S x|| for every sampled x."""
    n_s, n_u = 3, 2
    q = jnp.asarray(random_psd(rng, n_s))
    k_fb = jnp.asarray(rng.standard_normal((n_u, n_s)))
    l_mu = jnp.asarray(np.abs(rng.standard_normal(n_s)) + 0.1)
    l_sigma = jnp.asarray(np.abs(rng.standard_normal(n_s)) + 0.1)

    u_mu, u_sigma = compute_remainder_overapproximations(q, k_fb, l_mu, l_sigma)

    xs = sample_inside_ellipsoid(key, 3000, jnp.zeros(n_s), q)
    s = jnp.concatenate([jnp.eye(n_s), k_fb], axis=0)
    norms = jnp.linalg.norm(xs @ s.T, axis=-1)
    r_max = float(jnp.max(norms))
    # sampled radius never exceeds the bound
    assert np.all(np.asarray(u_sigma) >= np.asarray(l_sigma) * r_max - 1e-9)
    assert np.all(np.asarray(u_mu) >= 0.5 * np.asarray(l_mu) * r_max**2 - 1e-9)
    # ... and the bound is tight-ish (within 25% of the sampled sup)
    np.testing.assert_allclose(
        float(u_sigma[0] / l_sigma[0]), r_max, rtol=0.25
    )


def test_remainder_zero_ellipsoid_gives_zero(rng):
    n_s, n_u = 2, 1
    q = jnp.zeros((n_s, n_s))
    k_fb = jnp.asarray(rng.standard_normal((n_u, n_s)))
    u_mu, u_sigma = compute_remainder_overapproximations(
        q, k_fb, jnp.ones(n_s), jnp.ones(n_s)
    )
    np.testing.assert_allclose(np.asarray(u_mu), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(u_sigma), 0.0, atol=1e-12)


def test_grad_through_remainder(rng):
    """The SQP differentiates through the remainder bound — grads must be finite."""
    n_s, n_u = 2, 1
    q = jnp.asarray(random_psd(rng, n_s))
    k_fb = jnp.asarray(rng.standard_normal((n_u, n_s)))

    def f(qm):
        u_mu, u_sigma = compute_remainder_overapproximations(
            qm, k_fb, jnp.ones(n_s), jnp.ones(n_s)
        )
        return jnp.sum(u_mu) + jnp.sum(u_sigma)

    g = jax.grad(f)(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_calibrated_bounds_conservative_off_data(key):
    """VERDICT r1 item 9: constants calibrated over the OPERATING REGION must
    dominate sampled true Taylor remainders / std increments at off-data
    states — the tube's soundness between/beyond training data."""
    import numpy as np

    from safe_exploration_tpu.envs import (
        env_step, linearize_discretize, make_pendulum,
    )
    from safe_exploration_tpu.models import make_gp_ssm
    from safe_exploration_tpu.models.ssm import (
        calibrate_lipschitz,
        estimate_lipschitz,
        lipschitz_probe_set,
        ssm_probe_points,
    )

    env = make_pendulum(dtype=jnp.float64, plant_noise=0.0)
    a, b = linearize_discretize(env)
    kx, ku, kn, kp, kq = jax.random.split(key, 5)
    # training data clustered near the origin — off-data = rest of safe box
    xs = 0.15 * jax.random.normal(kx, (40, 2), jnp.float64)
    us = 0.5 * jax.random.uniform(ku, (40, 1), jnp.float64, -1, 1)
    _, x_next = jax.vmap(lambda x, u: env_step(env, kn, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(("rbf", "rbf"), xs, us, resid, n_max=64,
                      l_mu=jnp.ones(2), l_sigma=jnp.ones(2), log_noise=-4.0)

    ssm_cal = calibrate_lipschitz(ssm, env.spec, kq)
    # at MATCHED factor, region calibration must not be LESS conservative
    # than training-only probing (its probe set is a superset)
    ssm_train_only = estimate_lipschitz(ssm, ssm_probe_points(ssm), factor=1.2)

    assert np.all(np.asarray(ssm_cal.l_mu) >= np.asarray(ssm_train_only.l_mu) - 1e-12)
    assert np.all(
        np.asarray(ssm_cal.l_sigma) >= np.asarray(ssm_train_only.l_sigma) - 1e-12
    )

    # empirical dominance at off-data states: remainder of the linearization
    # between nearby region points bounded by 0.5 * l_mu * ||dz||^2, std
    # increment by l_sigma * ||dz||
    z0s = lipschitz_probe_set(env.spec, kp, 40)
    dz = 0.05 * jax.random.normal(jax.random.fold_in(kp, 1), z0s.shape, jnp.float64)

    def taylor_gap(z0, d):
        mu0, var0 = ssm_cal.predict_latent(z0)
        mu1, var1 = ssm_cal.predict_latent(z0 + d)
        jac = jax.jacfwd(lambda z: ssm_cal.predict_latent(z)[0])(z0)
        gap_mu = jnp.abs(mu1 - mu0 - jac @ d)
        gap_sig = jnp.abs(jnp.sqrt(var1) - jnp.sqrt(var0))
        return gap_mu, gap_sig

    gaps_mu, gaps_sig = jax.vmap(taylor_gap)(z0s, dz)
    nrm = jnp.linalg.norm(dz, axis=-1)
    bound_mu = 0.5 * ssm_cal.l_mu[None, :] * (nrm ** 2)[:, None]
    bound_sig = ssm_cal.l_sigma[None, :] * nrm[:, None]
    assert np.all(np.asarray(gaps_mu) <= np.asarray(bound_mu) + 1e-10), (
        np.max(np.asarray(gaps_mu) - np.asarray(bound_mu))
    )
    assert np.all(np.asarray(gaps_sig) <= np.asarray(bound_sig) + 1e-10), (
        np.max(np.asarray(gaps_sig) - np.asarray(bound_sig))
    )


def test_max_eig_closed_form_and_squaring_vs_eigvalsh(rng):
    """The hot-path lambda_max (closed form at n=2, repeated-squaring power
    method at n>=3) must match a dense symmetric eigensolve on Q^1/2 B Q^1/2
    across sizes, including near-tied spectra, and its gradient must match
    the eigenvalue derivative (finite differences)."""
    import numpy as np

    from safe_exploration_tpu.ops.lipschitz import max_eig_psd_product

    for n in (2, 3, 4, 6, 9):
        for trial in range(4):
            a = rng.standard_normal((n, n))
            b_ = rng.standard_normal((n, n))
            q = jnp.asarray(a @ a.T + 0.1 * np.eye(n))
            b = jnp.asarray(b_ @ b_.T + 0.1 * np.eye(n))
            m = q @ b
            got = float(max_eig_psd_product(m))
            sq = np.asarray(jax.scipy.linalg.sqrtm(np.asarray(q)).real)
            ref = float(np.linalg.eigvalsh(sq @ np.asarray(b) @ sq).max())
            np.testing.assert_allclose(got, ref, rtol=1e-5, err_msg=f"n={n}")
    # near-tied spectrum (power iteration's weak spot): any convex mix of the
    # tied eigenvectors still yields lambda_max
    q = jnp.asarray(np.diag([2.0, 2.0 - 1e-9, 1.0]))
    got = float(max_eig_psd_product(q @ jnp.eye(3)))
    np.testing.assert_allclose(got, 2.0, rtol=1e-8)

    # gradient vs central differences through the n=2 closed form and n=4 path
    for n in (2, 4):
        a = rng.standard_normal((n, n))
        q0 = jnp.asarray(a @ a.T + 0.5 * np.eye(n))
        f = lambda qq: max_eig_psd_product(qq @ (qq + jnp.eye(n)))
        g = jax.grad(f)(q0)
        eps = 1e-6
        for _ in range(3):
            d_ = rng.standard_normal((n, n))
            d = jnp.asarray(d_ + d_.T)
            fd = (f(q0 + eps * d) - f(q0 - eps * d)) / (2 * eps)
            np.testing.assert_allclose(
                float(jnp.sum(g * d)), float(fd), rtol=5e-4, atol=1e-8
            )
