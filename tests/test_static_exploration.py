"""Static safe active learning (reference exploration_runner semantics).

Parity: ``exploration_runner.py::run_exploration`` (SURVEY.md §3.2) — the
probe input z = (x, u) is the decision variable, maximized for predictive
variance s.t. n-step returnability. VERDICT r1 missing #3.
"""

import jax
import jax.numpy as jnp
import numpy as np

from safe_exploration_tpu.envs import env_step, make_pendulum, linearize_discretize
from safe_exploration_tpu.models import make_gp_ssm
from safe_exploration_tpu.ops.linalg import dlqr
from safe_exploration_tpu.solvers.sqp import SqpConfig
from safe_exploration_tpu.solvers.static_exploration import (
    make_static_exploration_planner,
    polytope_box_bounds,
    static_warm_len,
)


def _setup(dtype=jnp.float64, n_data=20, n_max=32):
    env = make_pendulum(dtype=dtype)
    a, b = linearize_discretize(env)
    k_lqr, _ = dlqr(a, b, jnp.eye(2, dtype=dtype), jnp.eye(1, dtype=dtype))
    k_fb = -k_lqr
    key = jax.random.PRNGKey(0)
    # training data clustered NEAR THE ORIGIN: variance grows away from it
    xs = 0.2 * jax.random.normal(key, (n_data, 2), dtype)
    us = jax.random.uniform(jax.random.fold_in(key, 1), (n_data, 1), dtype, -1, 1)
    _, x_next = jax.vmap(lambda x, u: env_step(env, key, x, u))(xs, us)
    resid = x_next - (xs @ a.T + us @ b.T)
    ssm = make_gp_ssm(
        ("rbf", "rbf"), xs, us, resid, n_max=n_max,
        l_mu=jnp.full((2,), 0.05, dtype), l_sigma=jnp.full((2,), 0.02, dtype),
        log_noise=-4.0,
    )
    from safe_exploration_tpu.models.gp import gp_refit

    params = tuple(
        {**p, "log_sf": jnp.asarray(-3.0, dtype)} for p in ssm.gp.params
    )
    ssm = ssm.replace(gp=gp_refit(ssm.gp.replace(params=params)))
    return env, a, b, k_fb, ssm


def test_polytope_box_bounds_axis_aligned():
    h_mat = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 2.0], [0.0, -1.0]])
    h_vec = np.array([0.5, 0.3, 1.0, 0.7])
    lo, hi = polytope_box_bounds(h_mat, h_vec)
    np.testing.assert_allclose(hi, [0.5, 0.5])
    np.testing.assert_allclose(lo, [-0.3, -0.7])


def test_static_probe_is_safe_returnable_and_informative():
    env, a, b, k_fb, ssm = _setup()
    cfg = SqpConfig(n_safe=3, c_safety=2.0, n_outer=8, n_inner=4)
    planner = make_static_exploration_planner(env, k_fb, a, b, cfg)
    # non-degenerate warm start: the exact origin is a stationary point of the
    # (symmetric-data) variance landscape; the runner escapes it with random
    # restarts, a unit test just starts off-center
    warm = jnp.zeros((static_warm_len(env, cfg),), jnp.float64)
    warm = warm.at[0].set(0.15).at[1].set(0.4)
    res = jax.jit(planner)(ssm, warm)

    assert bool(res.feasible), float(res.violation)
    spec = env.spec
    # probe state inside the polytope
    assert np.all(
        np.asarray(spec.h_mat_obs @ res.x_probe - spec.h_obs) <= 1e-6
    )
    # informative: predictive variance at the probe strictly exceeds the
    # variance at the (data-dense) origin
    z0 = jnp.zeros((3,), jnp.float64)
    _, var0 = ssm.predict_latent(z0)
    assert float(jnp.sum(res.sigma2)) > 1.5 * float(jnp.sum(var0))
    # returnability: re-verify the tube from the probe independently
    from safe_exploration_tpu.reachability.onestep import multistep_reachability
    from safe_exploration_tpu.reachability.safety import (
        lin_ellipsoid_safety_distance,
    )

    k_fb_all = jnp.tile(k_fb[None], (cfg.n_safe, 1, 1))
    p_traj, q_traj, _ = multistep_reachability(
        ssm, res.x_probe, res.k_ff_return, k_fb_all, a, b, cfg.c_safety
    )
    d_term = lin_ellipsoid_safety_distance(
        p_traj[-1], q_traj[-1], spec.h_mat_safe, spec.h_safe
    )
    assert np.all(np.asarray(d_term) <= 1e-5)


def test_static_reaches_inputs_greedy_cannot():
    """The greedy runner's probes are plant states evolving one env-step at a
    time from the reset state; the static planner jumps straight to a
    distant high-variance safe state in iteration 1."""
    env, a, b, k_fb, ssm = _setup()
    cfg = SqpConfig(n_safe=3, c_safety=2.0, n_outer=8, n_inner=4)
    planner = make_static_exploration_planner(env, k_fb, a, b, cfg)
    warm = jnp.zeros((static_warm_len(env, cfg),), jnp.float64)
    warm = warm.at[0].set(0.15).at[1].set(0.4)
    res = jax.jit(planner)(ssm, warm)
    assert bool(res.feasible)

    # The greedy variant's probes are CONSTRAINED to the plant trajectory:
    # its next probe lies on the 1-D one-step-reachable curve {f(x0, u)}.
    # The static planner has the full 2-D safe set available — its probe
    # lies OFF that curve and strictly deeper into unexplored space.
    from safe_exploration_tpu.envs import env_reset

    key = jax.random.PRNGKey(1)
    x0 = env_reset(env, key)
    us = jnp.linspace(env.spec.u_min[0], env.spec.u_max[0], 201)[:, None]
    nexts = jax.vmap(lambda u: env_step(env, key, x0, u)[1])(us)
    dist_to_curve = float(
        jnp.min(jnp.linalg.norm(nexts - res.x_probe[None], axis=-1))
    )
    # well clear of the curve (plant noise std is 1e-3 per dim)
    assert dist_to_curve > 0.02, dist_to_curve

    # and it is farther from the training data than anything greedy can
    # probe this iteration (greedy probes AT the current state x0)
    data_x = ssm.gp.x[:, :2]
    min_dist = lambda x: float(
        jnp.min(jnp.linalg.norm(data_x - x[None], axis=-1))
    )
    assert min_dist(res.x_probe) > min_dist(x0), (
        min_dist(res.x_probe), min_dist(x0)
    )


def test_static_runner_zero_violations():
    from safe_exploration_tpu.runtime.exploration import run_exploration_static

    env, a, b, k_fb, _ = _setup()
    out = run_exploration_static(
        env, a, b, k_fb,
        key=jax.random.PRNGKey(2),
        kern_types=("rbf", "rbf"), n_max=48,
        l_mu=jnp.full((2,), 0.05), l_sigma=jnp.full((2,), 0.02),
        n_iterations=5, n_init_samples=16, n_restarts=4,
        n_safe=3, sqp_outer=6, sqp_inner=4, hyp_iters=40, log_noise=-4.0,
    )
    s = out["series"]
    assert sum(s["violations"]) == 0
    assert all(f == 1.0 for f in s["feasibility_rate"])
    # probes move around (not stuck at one optimum after variance collapse)
    probes = np.asarray(out["probes"])
    assert probes.std(axis=0).max() > 0.05
