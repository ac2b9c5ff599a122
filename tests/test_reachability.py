"""Safety-engine tests (SURVEY.md §4): hand-computed oracles for the one-step map,
multistep = folded onestep, safety-distance sign <=> containment, and the
end-to-end MC containment check that IS the safety property."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_exploration_tpu.envs import env_step, linearize_discretize, make_pendulum
from safe_exploration_tpu.models import make_gp_ssm, ssm_predict, ssm_predict_jac
from safe_exploration_tpu.ops import (
    dlqr,
    ellipsoid_from_rectangle,
    sample_inside_ellipsoid,
    sum_two_ellipsoids,
    compute_remainder_overapproximations,
    distance_to_center,
)
from safe_exploration_tpu.reachability import (
    is_ellipsoid_inside_polytope,
    lin_ellipsoid_safety_distance,
    multi_step_propagation,
    multistep_reachability,
    onestep_reachability,
    onestep_reachability_point,
    verify_trajectory_safety,
)


def _make_pendulum_ssm(key, n_data=120, n_max=160, l_mu=0.6, l_sigma=0.3):
    """Train a GP on true pendulum residuals (vs the linear prior)."""
    env = make_pendulum(dtype=jnp.float64, plant_noise=0.0)
    a, b = linearize_discretize(env)
    kx, ku, kn = jax.random.split(key, 3)
    xs = jax.random.uniform(kx, (n_data, 2), minval=-1.0, maxval=1.0) * jnp.asarray([0.4, 1.5])
    us = jax.random.uniform(ku, (n_data, 1), minval=-1.0, maxval=1.0)
    _, x_next = jax.vmap(lambda x, u: env_step(env, kn, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(
        ("rbf", "rbf"), xs, us, resid,
        n_max=n_max,
        l_mu=jnp.full(2, l_mu, jnp.float64),
        l_sigma=jnp.full(2, l_sigma, jnp.float64),
        log_noise=-4.6,
    )
    return env, a, b, ssm


def test_onestep_point_oracle(key):
    env, a, b, ssm = _make_pendulum_ssm(key)
    p = jnp.asarray([0.1, -0.2], jnp.float64)
    k_ff = jnp.asarray([0.3], jnp.float64)
    p_next, q_next, var = onestep_reachability_point(ssm, p, k_ff, a, b, 2.0)
    mu, var_ref = ssm_predict(ssm, p, k_ff)
    noise = jnp.exp(2.0 * ssm.gp.log_noise)
    np.testing.assert_allclose(np.asarray(p_next), np.asarray(a @ p + b @ k_ff + mu), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(q_next),
        np.asarray(ellipsoid_from_rectangle(2.0 * jnp.sqrt(var_ref + noise))),
        rtol=1e-12,
    )


def test_onestep_ellipsoid_oracle(key):
    """Hand-compose the one-step map from the published formula (SURVEY.md §2.4)."""
    env, a, b, ssm = _make_pendulum_ssm(key)
    p = jnp.asarray([0.05, 0.1], jnp.float64)
    q = ellipsoid_from_rectangle(jnp.asarray([0.02, 0.05], jnp.float64))
    k_ff = jnp.asarray([0.1], jnp.float64)
    k_fb = jnp.asarray([[-0.5, -0.3]], jnp.float64)
    c = 2.5

    p_next, q_next, _ = onestep_reachability(ssm, p, q, k_ff, k_fb, a, b, c)

    mu, var, j_x, j_u = ssm_predict_jac(ssm, p, k_ff)
    noise = jnp.exp(2.0 * ssm.gp.log_noise)
    h = a + j_x + (b + j_u) @ k_fb
    u_mu, u_sigma = compute_remainder_overapproximations(q, k_fb, ssm.l_mu, ssm.l_sigma)
    p1, q1 = sum_two_ellipsoids(
        a @ p + b @ k_ff + mu, h @ q @ h.T,
        jnp.zeros(2), ellipsoid_from_rectangle(c * (jnp.sqrt(var + noise) + u_sigma)),
    )
    p_ref, q_ref = sum_two_ellipsoids(p1, q1, jnp.zeros(2), ellipsoid_from_rectangle(u_mu))
    np.testing.assert_allclose(np.asarray(p_next), np.asarray(p_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(q_next), np.asarray(q_ref), rtol=1e-12)


def test_mc_containment_one_step(key):
    """THE safety property: true next states from inside E(p,Q) under the
    feedback law stay inside the predicted E(p+, Q+) (noise-free plant,
    well-fit GP, conservative beta)."""
    env, a, b, ssm = _make_pendulum_ssm(key, n_data=150, n_max=256)
    p = jnp.asarray([0.0, 0.0], jnp.float64)
    q = ellipsoid_from_rectangle(jnp.asarray([0.03, 0.08], jnp.float64))
    k_ff = jnp.asarray([0.05], jnp.float64)
    k, _ = dlqr(a, b, jnp.eye(2, dtype=jnp.float64), jnp.eye(1, dtype=jnp.float64))
    k_fb = -k
    p_next, q_next, _ = onestep_reachability(ssm, p, q, k_ff, k_fb, a, b, 3.0)

    xs = sample_inside_ellipsoid(key, 500, p, q)
    us = xs @ k_fb.T + k_ff
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    d = distance_to_center(x_next, p_next, q_next)
    assert float(jnp.max(d)) <= 1.0, f"containment violated: max d = {float(jnp.max(d))}"


def test_multistep_equals_folded_onestep(key):
    env, a, b, ssm = _make_pendulum_ssm(key)
    t_len = 4
    k_ff_all = 0.1 * jnp.ones((t_len, 1), jnp.float64)
    k_fb_all = jnp.tile(jnp.asarray([[-0.4, -0.2]], jnp.float64), (t_len, 1, 1))
    p0 = jnp.asarray([0.02, -0.02], jnp.float64)

    p_traj, q_traj, _ = multistep_reachability(ssm, p0, k_ff_all, k_fb_all, a, b, 2.0)

    p, q, _ = onestep_reachability_point(ssm, p0, k_ff_all[0], a, b, 2.0)
    for t in range(1, t_len):
        np.testing.assert_allclose(np.asarray(p_traj[t - 1]), np.asarray(p), rtol=1e-7)
        np.testing.assert_allclose(np.asarray(q_traj[t - 1]), np.asarray(q), rtol=1e-7, atol=1e-12)
        p, q, _ = onestep_reachability(ssm, p, q, k_ff_all[t], k_fb_all[t], a, b, 2.0)


def test_safety_distance_sign_iff_containment(rng, key):
    n = 2
    h_mat = jnp.asarray(np.vstack([np.eye(n), -np.eye(n)]))
    h_vec = jnp.asarray([0.5, 1.0, 0.5, 1.0])
    # small inside ellipsoid
    q_in = ellipsoid_from_rectangle(jnp.asarray([0.1, 0.2]))
    d = lin_ellipsoid_safety_distance(jnp.zeros(n), q_in, h_mat, h_vec)
    assert np.all(np.asarray(d) < 0)
    assert bool(is_ellipsoid_inside_polytope(jnp.zeros(n), q_in, h_mat, h_vec))
    # sampled support points must respect margins: max_i over samples h_i x - h_i <= d_i
    s = sample_inside_ellipsoid(key, 4000, jnp.zeros(n), q_in)
    emp = jnp.max(s @ h_mat.T - h_vec, axis=0)
    assert np.all(np.asarray(emp) <= np.asarray(d) + 1e-9)
    # violating ellipsoid flips the sign
    q_out = ellipsoid_from_rectangle(jnp.asarray([1.0, 0.2]))
    d2 = lin_ellipsoid_safety_distance(jnp.zeros(n), q_out, h_mat, h_vec)
    assert float(jnp.max(d2)) > 0
    assert not bool(is_ellipsoid_inside_polytope(jnp.zeros(n), q_out, h_mat, h_vec))


def test_verify_trajectory_safety_runs(key):
    env, a, b, ssm = _make_pendulum_ssm(key)
    t_len = 5
    k, _ = dlqr(a, b, jnp.eye(2, dtype=jnp.float64), jnp.eye(1, dtype=jnp.float64))
    k_ff_all = jnp.zeros((t_len, 1), jnp.float64)
    k_fb_all = jnp.tile(-k, (t_len, 1, 1))
    p0 = jnp.asarray([0.05, 0.0], jnp.float64)
    p_traj, q_traj, _ = multistep_reachability(ssm, p0, k_ff_all, k_fb_all, a, b, 3.0)
    ok, containment = verify_trajectory_safety(
        env, key, p0, k_ff_all, k_fb_all, p_traj, q_traj
    )
    assert bool(ok)
    assert np.all(np.asarray(containment))


def test_perf_propagation_methods(key):
    env, a, b, ssm = _make_pendulum_ssm(key)
    u_all = 0.1 * jnp.ones((6, 1), jnp.float64)
    p0 = jnp.asarray([0.02, 0.02], jnp.float64)
    for method in ("mean_equivalent", "taylor"):
        ps, sigmas, vars_ = multi_step_propagation(ssm, p0, u_all, a, b, method=method)
        assert ps.shape == (6, 2) and sigmas.shape == (6, 2, 2)
        assert np.all(np.isfinite(np.asarray(ps)))
        # variances accumulate monotonically in trace
        tr = np.trace(np.asarray(sigmas), axis1=1, axis2=2)
        assert np.all(np.diff(tr) > -1e-12)


def test_onestep_vmaps_over_samples(key):
    """The CEM path: one-step reachability batched over control samples."""
    env, a, b, ssm = _make_pendulum_ssm(key)
    m = 32
    p = jnp.zeros((2,), jnp.float64)
    q = ellipsoid_from_rectangle(jnp.asarray([0.02, 0.02], jnp.float64))
    k_ffs = jnp.linspace(-0.5, 0.5, m)[:, None]
    k_fb = jnp.asarray([[-0.4, -0.2]], jnp.float64)
    fn = jax.jit(jax.vmap(
        lambda kf: onestep_reachability(ssm, p, q, kf, k_fb, a, b, 2.0)
    ))
    ps, qs, _ = fn(k_ffs)
    assert ps.shape == (m, 2) and qs.shape == (m, 2, 2)
    p1, q1, _ = onestep_reachability(ssm, p, q, k_ffs[7], k_fb, a, b, 2.0)
    np.testing.assert_allclose(np.asarray(ps[7]), np.asarray(p1), rtol=1e-10)
