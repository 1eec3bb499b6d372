"""Host-side rendering: quick matplotlib episode views (plotter) and the
reference-parity drawable pipeline (scenplot)."""

from hhmarl_2d_tpu.render.plotter import (EpisodeTrace, plot_episode,
                                          plot_frame)
from hhmarl_2d_tpu.render.scenplot import (Airplane, Arc, BackgroundMesh,
                                           Drawable, Missile, PlotConfig,
                                           PolyLine, Rect, SamBattery,
                                           ScenarioPlotter, StatusMessage,
                                           TopLeftMessage, Waypoint,
                                           plot_trace_frame, scene_from_trace)

__all__ = [
    "EpisodeTrace", "plot_episode", "plot_frame",
    "Drawable", "StatusMessage", "TopLeftMessage", "PolyLine", "Rect", "Arc",
    "Airplane", "SamBattery", "Missile", "Waypoint", "BackgroundMesh",
    "PlotConfig", "ScenarioPlotter", "scene_from_trace", "plot_trace_frame",
]
