"""Drawable-pipeline renderer tests (render/scenplot.py).

Mirrors the reference's sprite vocabulary
(/root/reference/warsim/scenplotter/scenario_plotter.py): every drawable
type renders through ScenarioPlotter.to_png, and scene_from_trace produces
the env.plot drawable list (airplanes + trails + cannon cones, waypoints
for the dead, missiles, status banners).
"""

import os

import numpy as np
import pytest

from hhmarl_2d_tpu.geo import make_map_limits
from hhmarl_2d_tpu.render.plotter import EpisodeTrace
from hhmarl_2d_tpu.render import scenplot as SP


def _toy_trace(T=5, n=4, na=2):
    rng = np.random.RandomState(0)
    lat = np.cumsum(rng.uniform(-0.005, 0.005, (T, n)), axis=0) + 0.15
    lon = np.cumsum(rng.uniform(-0.005, 0.005, (T, n)), axis=0) + 0.15
    alive = np.ones((T, n), dtype=bool)
    if T > 3:
        alive[3:, 2] = False  # opponent 3 dies at t=3
    m_alive = np.zeros((T, n), dtype=bool)
    m_alive[2:, 0] = True
    cannon = np.zeros((T, n), np.float32)
    cannon[min(4, T - 1), 1] = 3.0
    return EpisodeTrace(
        lat=lat, lon=lon, heading=rng.uniform(0, 360, (T, n)),
        alive=alive, m_lat=lat + 0.01, m_lon=lon + 0.01, m_alive=m_alive,
        cannon_burst=cannon, num_agents=na, map_size=0.3,
        ac_type=np.array([1, 2, 1, 2]), m_heading=rng.uniform(0, 360, (T, n)))


class TestDrawables:
    def test_all_drawables_render(self, tmp_path):
        """Every drawable type goes through to_png without error."""
        plotter = SP.ScenarioPlotter(make_map_limits(0.3), dpi=60)
        objects = [
            SP.StatusMessage("status"),
            SP.TopLeftMessage("clock"),
            SP.PolyLine([(0.05, 0.05), (0.1, 0.2), (0.2, 0.1)],
                        dash=(2, 2), edge_color="#ffffff"),
            SP.Rect(0.02, 0.02, 0.28, 0.28, edge_color="#888888"),
            SP.Arc(0.15, 0.15, 5.0, 30.0, 120.0, edge_color="#ffcc00"),
            SP.Arc(0.1, 0.1, 3.0, 0.0, 360.0, fill_color="#22334455"
                   if False else "#223344", edge_color=None),
            SP.Airplane(0.15, 0.15, 45.0, info_text="r_1"),
            SP.SamBattery(0.08, 0.2, 90.0, missile_range_km=8.0,
                          radar_range_km=12.0, radar_amplitude_deg=60.0),
            SP.Missile(0.2, 0.2, 200.0, info_text="m_1"),
            SP.Waypoint(0.25, 0.05, info_text="wp"),
        ]
        out = str(tmp_path / "all.png")
        plotter.to_png(out, objects)
        assert os.path.getsize(out) > 1000

    def test_background_mesh(self, tmp_path):
        xs = np.linspace(0.0, 0.3, 16)
        mesh = SP.BackgroundMesh(xs, xs, np.outer(xs, xs), cmap="viridis")
        plotter = SP.ScenarioPlotter(make_map_limits(0.3), dpi=60,
                                     background_mesh=mesh)
        out = str(tmp_path / "mesh.png")
        plotter.to_png(out, [SP.Waypoint(0.1, 0.1)])
        assert os.path.exists(out)

    def test_unknown_drawable_raises(self, tmp_path):
        plotter = SP.ScenarioPlotter(make_map_limits(0.3), dpi=60)
        class Alien(SP.Drawable):
            pass
        with pytest.raises(ValueError):
            plotter.to_png(str(tmp_path / "x.png"), [Alien()])

    def test_zorder_sorting(self, tmp_path):
        """Objects render lowest zorder first (stable even when mixed)."""
        plotter = SP.ScenarioPlotter(make_map_limits(0.3), dpi=60)
        objs = [SP.Waypoint(0.1, 0.1, zorder=5),
                SP.Waypoint(0.2, 0.2, zorder=-1)]
        plotter.to_png(str(tmp_path / "z.png"), objs)


class TestScene:
    def test_scene_contents(self):
        trace = _toy_trace()
        objs = SP.scene_from_trace(trace, t=4, status="ep 1")
        kinds = [type(o).__name__ for o in objs]
        assert kinds.count("Airplane") == 3          # one died
        assert kinds.count("Waypoint") == 1          # the dead one
        assert kinds.count("Missile") == 1
        assert "StatusMessage" in kinds and "TopLeftMessage" in kinds
        # trails for all 4 + cannon cone for the bursting unit
        assert kinds.count("PolyLine") == 5

    def test_plot_trace_frame(self, tmp_path):
        trace = _toy_trace()
        out = str(tmp_path / "frame.png")
        SP.plot_trace_frame(trace, 4, out, status="test", dpi=60)
        assert os.path.getsize(out) > 1000


class TestVideo:
    def test_render_video_gif(self, tmp_path):
        """--render_video path: frame sequence assembled into an animated
        GIF, with the live current.png rewritten per frame
        (the reference's video mode, README.md:68-69)."""
        from PIL import Image

        from hhmarl_2d_tpu.render.plotter import render_video
        trace = _toy_trace(T=6)
        out = str(tmp_path / "ep.gif")
        live = str(tmp_path / "current.png")
        render_video(trace, out, status="ep", every=2, style="fast",
                     live_file=live)
        img = Image.open(out)
        assert getattr(img, "n_frames", 1) == 3       # T=6 every=2
        assert os.path.getsize(live) > 1000           # last live frame

    def test_render_video_scene_style(self, tmp_path):
        from PIL import Image

        from hhmarl_2d_tpu.render.plotter import render_video
        trace = _toy_trace(T=3)
        out = str(tmp_path / "ep_scene.gif")
        render_video(trace, out, every=1, style="scene")
        assert getattr(Image.open(out), "n_frames", 1) == 3
