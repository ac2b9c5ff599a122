"""L4 experiment runtime: episodic / exploration / uncertainty runners, config
registry, CLI, metrics, checkpointing.

Replaces reference ``main.py``, ``episode_runner.py``, ``exploration_runner.py``,
``uncertainty_estimation_runner.py``, ``utils_config.py``, ``utils_sacred.py``
(SURVEY.md §2.8).
"""

from safe_exploration_tpu.runtime.config import (
    CONFIGS,
    ExperimentConfig,
    build_experiment,
    register_config,
)
from safe_exploration_tpu.runtime.episode import (
    collect_initial_data,
    rollout_episode,
    run_episodic,
)
from safe_exploration_tpu.runtime.exploration import run_exploration
from safe_exploration_tpu.runtime.metrics import AggregatedMetrics
from safe_exploration_tpu.runtime.serve import ServeController
from safe_exploration_tpu.runtime.uncertainty import run_uncertainty_estimation

__all__ = [
    "CONFIGS", "ExperimentConfig", "build_experiment", "register_config",
    "collect_initial_data", "rollout_episode", "run_episodic",
    "run_exploration", "run_uncertainty_estimation", "AggregatedMetrics",
    "ServeController",
]
