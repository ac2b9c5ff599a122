"""Safe active-learning (exploration) runner.

Parity: reference ``exploration_runner.py::run_exploration`` (SURVEY.md §2.8,
§3.2): repeatedly solve for the control sequence maximizing predictive
uncertainty subject to (multi-step) tube safety, execute the first control on the
plant, append the observed transition to the GP, and track information gain and
model error.

The information-gain metric is the exact GP quantity
I(y; f) = 0.5 * sum_d log(1 + sigma_d^2(z) / sigma_n_d^2) evaluated at the probed
input — the greedy-MI objective of safe active learning.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from safe_exploration_tpu.envs.base import Env, env_reset, env_step
from safe_exploration_tpu.models.ssm import (
    calibrate_lipschitz,
    make_gp_ssm,
    ssm_fit,
    ssm_n_points,
    ssm_predict,
    ssm_probe_points,
    ssm_update,
)
from safe_exploration_tpu.runtime.episode import collect_initial_data

__all__ = ["run_exploration", "run_exploration_static"]


def run_exploration(
    env: Env,
    init_state: Callable,
    get_action: Callable,
    a: jax.Array,
    b: jax.Array,
    k_fb: jax.Array,
    *,
    key: jax.Array,
    kern_types: tuple,
    n_max: int,
    l_mu: jax.Array,
    l_sigma: jax.Array,
    n_iterations: int = 40,
    n_init_samples: int = 20,
    opt_hyp_every: int = 10,
    hyp_iters: int = 120,
    log_noise: float = -3.0,
    metrics: Any = None,
    make_ssm: Callable | None = None,
) -> dict:
    """Static safe exploration: the planner's objective must be the exploration
    (max-predictive-std) cost — wire with ``objective="exploration"``.

    Each iteration: plan from the current state (safety tube constrained),
    execute the first control, observe the transition, update the GP (incremental
    refit), periodically re-fit hyperparameters. Returns per-iteration series of
    information gain, predictive std at the probe, and model error.
    """
    k_init, k_ssm, k_reset, key = jax.random.split(key, 4)
    xs, us, resid = collect_initial_data(env, k_init, n_init_samples, a, b, k_fb)
    if make_ssm is not None:
        ssm = make_ssm(k_ssm, xs, us, resid)
    else:
        ssm = make_gp_ssm(
            kern_types, xs, us, resid, n_max=n_max,
            l_mu=l_mu, l_sigma=l_sigma, log_noise=log_noise,
        )

    def fit_and_calibrate(s):
        s = ssm_fit(s, iters=hyp_iters)
        # calibrate over training buffer + safe-region samples (VERDICT r1 #9)
        return calibrate_lipschitz(s, env.spec)

    fit_fn = jax.jit(fit_and_calibrate)
    ssm = fit_fn(ssm)

    @jax.jit
    def one_iter(k, mstate, s, x):
        k_plan, k_step = jax.random.split(k)
        u, mstate, info = get_action(k_plan, mstate, s, x)
        mu, var = ssm_predict(s, x, u)
        u_app, x_next = env_step(env, k_step, x, u)
        resid_t = x_next - (a @ x + b @ u_app)
        # exact greedy information gain of the probed point
        noise_var = s.noise_var()
        info_gain = 0.5 * jnp.sum(jnp.log1p(var / noise_var))
        model_err = jnp.linalg.norm(resid_t - mu)
        s = ssm_update(s, x[None], u_app[None], resid_t[None])
        constraint_ok = jnp.all(env.spec.h_mat_obs @ x_next - env.spec.h_obs <= 0.0)
        out = {
            "info_gain": info_gain,
            "pred_std_sum": jnp.sum(jnp.sqrt(var)),
            "model_error": model_err,
            "feasible": info["feasible"],
            "constraint_ok": constraint_ok,
        }
        return u_app, x_next, mstate, s, out

    x = env_reset(env, k_reset)
    mstate = init_state()
    series: dict[str, list] = {
        "info_gain": [], "pred_std_sum": [], "model_error": [],
        "feasibility_rate": [], "violations": [], "n_data": [],
    }
    for it in range(n_iterations):
        k_it, key = jax.random.split(key)
        _, x, mstate, ssm, out = one_iter(k_it, mstate, ssm, x)
        series["info_gain"].append(float(out["info_gain"]))
        series["pred_std_sum"].append(float(out["pred_std_sum"]))
        series["model_error"].append(float(out["model_error"]))
        series["feasibility_rate"].append(float(out["feasible"]))
        series["violations"].append(int(not bool(out["constraint_ok"])))
        series["n_data"].append(int(ssm_n_points(ssm)))
        if opt_hyp_every and (it + 1) % opt_hyp_every == 0:
            ssm = fit_fn(ssm)
        if metrics is not None:
            metrics.log_dict({k: v[-1] for k, v in series.items()}, step=it)
            metrics.flush()
    return {"series": series, "ssm": ssm}


def run_exploration_static(
    env: Env,
    a: jax.Array,
    b: jax.Array,
    k_fb: jax.Array,
    *,
    key: jax.Array,
    kern_types: tuple,
    n_max: int,
    l_mu: jax.Array,
    l_sigma: jax.Array,
    n_iterations: int = 40,
    n_init_samples: int = 20,
    n_restarts: int = 8,
    n_safe: int = 4,
    c_safety: float = 2.0,
    sqp_outer: int = 8,
    sqp_inner: int = 4,
    opt_hyp_every: int = 10,
    hyp_iters: int = 120,
    log_noise: float = -3.0,
    metrics: Any = None,
    make_ssm: Callable | None = None,
) -> dict:
    """STATIC safe active learning — the reference's exploration semantics
    (``exploration_runner.py::run_exploration``, SURVEY.md §3.2).

    Unlike :func:`run_exploration` (greedy: plan an information-seeking
    trajectory from the current state), each iteration OPTIMIZES THE PROBE
    INPUT z = (x, u) itself: maximize predictive variance subject to the
    n_safe-step tube from x returning to the safe set. The chosen transition
    is then sampled from the plant (static setting: the system is steered or
    reset to the probe state between queries) and appended to the model.

    Multi-restart: the probe NLP is vmapped over ``n_restarts`` random
    initializations plus the previous solution; the best FEASIBLE probe wins
    (the variance landscape is multi-modal and collapses at sampled points).
    """
    from safe_exploration_tpu.solvers.sqp import SqpConfig
    from safe_exploration_tpu.solvers.static_exploration import (
        make_static_exploration_planner,
        static_warm_len,
    )

    k_init, k_ssm, key = jax.random.split(key, 3)
    xs, us, resid = collect_initial_data(env, k_init, n_init_samples, a, b, k_fb)
    if make_ssm is not None:
        ssm = make_ssm(k_ssm, xs, us, resid)
    else:
        ssm = make_gp_ssm(
            kern_types, xs, us, resid, n_max=n_max,
            l_mu=l_mu, l_sigma=l_sigma, log_noise=log_noise,
        )

    def fit_and_calibrate(s):
        s = ssm_fit(s, iters=hyp_iters)
        # calibrate over training buffer + safe-region samples (VERDICT r1 #9)
        return calibrate_lipschitz(s, env.spec)

    fit_fn = jax.jit(fit_and_calibrate)
    ssm = fit_fn(ssm)

    scfg = SqpConfig(
        n_safe=n_safe, c_safety=c_safety, n_outer=sqp_outer, n_inner=sqp_inner
    )
    planner = make_static_exploration_planner(env, k_fb, a, b, scfg)
    n_flat = static_warm_len(env, scfg)
    dtype = a.dtype
    spec = env.spec

    @jax.jit
    def one_iter(k, s, warm_prev):
        k_restart, k_step = jax.random.split(k)
        # restart bank: previous optimum + random safe-box states
        rand = 0.5 * jax.random.uniform(
            k_restart, (n_restarts, n_flat), dtype, -1.0, 1.0
        )
        warms = jnp.concatenate([warm_prev[None], rand], axis=0)
        res = jax.vmap(lambda w: planner(s, w))(warms)
        gain = 0.5 * jnp.sum(
            jnp.log1p(res.sigma2 / s.noise_var()[None, :]), axis=-1
        )
        score = jnp.where(res.feasible, gain, -jnp.inf)
        best = jnp.argmax(score)
        x_probe = res.x_probe[best]
        u_probe = res.u_probe[best]
        feasible = res.feasible[best]

        # sample the chosen transition from the plant (static query)
        mu, var = ssm_predict(s, x_probe, u_probe)
        u_app, x_next = env_step(env, k_step, x_probe, u_probe)
        resid_t = x_next - (a @ x_probe + b @ u_app)
        info_gain = 0.5 * jnp.sum(jnp.log1p(var / s.noise_var()))
        model_err = jnp.linalg.norm(resid_t - mu)
        s = ssm_update(s, x_probe[None], u_app[None], resid_t[None])
        constraint_ok = jnp.all(spec.h_mat_obs @ x_next - spec.h_obs <= 0.0)
        out = {
            "info_gain": info_gain,
            "pred_std_sum": jnp.sum(jnp.sqrt(var)),
            "model_error": model_err,
            "feasible": feasible,
            "constraint_ok": constraint_ok,
            "x_probe": x_probe,
        }
        return s, res.warm_next[best], out

    warm = jnp.zeros((n_flat,), dtype)
    series: dict[str, list] = {
        "info_gain": [], "pred_std_sum": [], "model_error": [],
        "feasibility_rate": [], "violations": [], "n_data": [],
    }
    probes = []
    for it in range(n_iterations):
        k_it, key = jax.random.split(key)
        ssm, warm, out = one_iter(k_it, ssm, warm)
        probes.append(out["x_probe"])
        series["info_gain"].append(float(out["info_gain"]))
        series["pred_std_sum"].append(float(out["pred_std_sum"]))
        series["model_error"].append(float(out["model_error"]))
        series["feasibility_rate"].append(float(out["feasible"]))
        series["violations"].append(int(not bool(out["constraint_ok"])))
        series["n_data"].append(int(ssm_n_points(ssm)))
        if opt_hyp_every and (it + 1) % opt_hyp_every == 0:
            ssm = fit_fn(ssm)
        if metrics is not None:
            metrics.log_dict(
                {k_: v[-1] for k_, v in series.items()}, step=it
            )
            metrics.flush()
    return {
        "series": series,
        "ssm": ssm,
        "probes": jnp.stack(probes) if probes else jnp.zeros((0, spec.n_s)),
    }
