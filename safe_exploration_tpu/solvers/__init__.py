"""L3 safe-MPC solvers: constrained CEM (sampling) and SQP (derivative-based),
orchestrated by the SafeMPC fallback state machine.

Replaces reference ``safempc_simple.py`` (CasADi/IPOPT) and ``safempc_cem.py``
(torch) — SURVEY.md §2.5-§2.6.
"""

from safe_exploration_tpu.solvers.cem import CemConfig, cem_plan, tube_violation
from safe_exploration_tpu.solvers.costs import exploration_cost, tracking_cost
from safe_exploration_tpu.solvers.safempc import (
    SafeMPCConfig,
    SafeMPCState,
    make_safempc,
)

__all__ = [
    "CemConfig", "cem_plan", "tube_violation",
    "tracking_cost", "exploration_cost",
    "SafeMPCConfig", "SafeMPCState", "make_safempc",
]
