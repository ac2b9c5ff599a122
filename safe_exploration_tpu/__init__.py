"""safe_exploration_tpu — a TPU-native safe model-based RL / safe-MPC framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference library
``befelix/safe-exploration`` (Koller, Berkenkamp, Turchetta, Krause — "Learning-based
Model Predictive Control for Safe Exploration", CDC 2018 / arXiv:1906.12189).

Where the reference triplicates its math core (numpy eager / CasADi symbolic /
PyTorch batched — see SURVEY.md §1), this framework has ONE pure-functional JAX
implementation that is simultaneously eager, jit-traceable, differentiable
(``jax.jacfwd`` / ``custom_vjp``) and batchable (``vmap`` / ``shard_map``).

Layer map (mirrors SURVEY.md §1):
  L1 math core      -> :mod:`safe_exploration_tpu.ops`
  L2 dynamics + reachability -> :mod:`safe_exploration_tpu.models`,
                                :mod:`safe_exploration_tpu.reachability`
  L3 safe-MPC solvers        -> :mod:`safe_exploration_tpu.solvers`
  L4 experiment runtime      -> :mod:`safe_exploration_tpu.runtime`
  parallel scale-out         -> :mod:`safe_exploration_tpu.parallel`
"""

__version__ = "0.1.0"
