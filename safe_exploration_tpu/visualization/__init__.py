"""Visualization helpers (matplotlib; optional dependency).

Parity: reference ``visualization/utils_visualization.py`` (SURVEY.md §2.8):
2-D ellipsoid plots, safety-bound / trajectory-tube plots.
"""

from safe_exploration_tpu.visualization.plots import (
    plot_ellipsoid_2d,
    plot_safety_bounds,
    plot_tube_2d,
)

__all__ = ["plot_ellipsoid_2d", "plot_safety_bounds", "plot_tube_2d"]
