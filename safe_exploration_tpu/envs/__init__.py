"""Environments: continuous-control plants as pure JAX ODEs.

Replaces reference ``environments.py`` (SURVEY.md §2.7).
"""

from safe_exploration_tpu.envs.base import (
    Env,
    EnvSpec,
    box_polytope,
    env_reset,
    env_step,
    linearize_discretize,
    rk4_step,
)
from safe_exploration_tpu.envs.cartpole import make_cartpole
from safe_exploration_tpu.envs.pendulum import make_pendulum
from safe_exploration_tpu.envs.quadrotor import make_quadrotor

__all__ = [
    "Env", "EnvSpec", "box_polytope", "env_reset", "env_step",
    "linearize_discretize", "rk4_step",
    "make_pendulum", "make_cartpole", "make_quadrotor",
]
