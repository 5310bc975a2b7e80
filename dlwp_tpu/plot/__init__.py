"""Visualization utilities (reference ``DLWP/plot``)."""

from dlwp_tpu.plot.plot_functions import (
    plot_global_map,
    slp_contour,
    plot_movie,
    history_plot,
    forecast_example_plot,
    zonal_mean_plot,
)
from dlwp_tpu.plot.util import (
    radar_colormap,
    blue_red_colormap,
    rgb_colormap,
    shifted_color_map,
    remove_chars,
    rotate_vector_r,
)

__all__ = [
    "plot_global_map",
    "slp_contour",
    "plot_movie",
    "history_plot",
    "forecast_example_plot",
    "zonal_mean_plot",
    "radar_colormap",
    "blue_red_colormap",
    "rgb_colormap",
    "shifted_color_map",
    "remove_chars",
    "rotate_vector_r",
]
