"""Offline scenario rendering (host-side).

Replaces the cairo/cartopy renderer
(/root/reference/warsim/scenplotter/scenario_plotter.py) with a
matplotlib plotter fed by trajectory buffers collected from the device:
airplane glyphs with heading, dashed flight traces, missile markers,
cannon-cone wedges, and the status banner -- the same information content
as the reference's PNG "video" frames (README.md:68-69), produced offline
so rendering never touches the training hot path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

BLUE = "#4d99e6"
RED = "#cc3333"


@dataclasses.dataclass
class EpisodeTrace:
    """Host-side recording of one episode.

    Arrays are [T, n_slots] (positions as anchor-offset degrees; lon is x,
    lat is y like the reference's map view).
    """

    lat: np.ndarray
    lon: np.ndarray
    heading: np.ndarray
    alive: np.ndarray
    m_lat: np.ndarray
    m_lon: np.ndarray
    m_alive: np.ndarray
    cannon_burst: np.ndarray
    num_agents: int
    map_size: float
    ac_type: Optional[np.ndarray] = None    # [n_slots] 1|2, for cannon cones
    m_heading: Optional[np.ndarray] = None  # [T, n_slots] missile headings
    # what one frame index means for the clock banner: low-level traces
    # record every 1-second tick ("s"); high-level traces record one frame
    # per commander macro action ("macro", up to 16 ticks each)
    frame_unit: str = "s"


def _airplane_glyph(ax, x, y, heading_deg, color, size):
    """Triangle glyph pointing along the compass heading."""
    a = np.radians(90.0 - heading_deg)
    d = np.array([np.cos(a), np.sin(a)])
    p = np.array([x, y])
    left = p - size * d + size * 0.6 * np.array([-d[1], d[0]])
    right = p - size * d - size * 0.6 * np.array([-d[1], d[0]])
    nose = p + size * 1.2 * d
    ax.fill([left[0], nose[0], right[0]], [left[1], nose[1], right[1]],
            color=color, alpha=0.9, zorder=3)


def plot_frame(trace: EpisodeTrace, t: int, out_file: str,
               status: Optional[str] = None, paths: bool = True):
    """Render the state at step ``t`` with traces up to t (env plot(),
    env_base.py:622-645)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = trace.lat.shape[1]
    na = trace.num_agents
    ms = trace.map_size
    fig, ax = plt.subplots(figsize=(7, 7), dpi=150)
    ax.set_xlim(0, ms)
    ax.set_ylim(0, ms)
    ax.set_facecolor("#eef3f8")
    ax.set_xlabel("lon offset (deg)")
    ax.set_ylabel("lat offset (deg)")

    glyph = ms / 45.0
    for i in range(n):
        color = BLUE if i < na else RED
        if paths:
            alive_path = trace.alive[:t + 1, i]
            xs = np.where(alive_path, trace.lon[:t + 1, i], np.nan)
            ys = np.where(alive_path, trace.lat[:t + 1, i], np.nan)
            ax.plot(xs, ys, ls="--", lw=0.8, color=color, alpha=0.6, zorder=1)
        if trace.alive[t, i]:
            _airplane_glyph(ax, trace.lon[t, i], trace.lat[t, i],
                            trace.heading[t, i], color, glyph)
            ax.annotate(f"{i + 1}", (trace.lon[t, i], trace.lat[t, i]),
                        fontsize=7, xytext=(3, 3), textcoords="offset points")
        elif t > 0:
            # destroyed marker at last known position
            was = np.nonzero(trace.alive[:t + 1, i])[0]
            if len(was):
                last = was[-1]
                ax.plot(trace.lon[last, i], trace.lat[last, i], "x",
                        color=color, ms=8, zorder=2)

    for i in range(n):
        if trace.m_alive[t, i]:
            color = BLUE if i < na else RED
            ax.plot(trace.m_lon[t, i], trace.m_lat[t, i], "^", ms=4,
                    color=color, zorder=4)

    if status:
        ax.set_title(status, fontsize=9)
    fig.tight_layout()
    fig.savefig(out_file)
    plt.close(fig)


def plot_episode(trace: EpisodeTrace, out_file: str,
                 status: Optional[str] = None, style: str = "scene"):
    """Final-frame render with full traces (the reference's episode PNG,
    train_hetero.py:96).  ``style="scene"`` goes through the full drawable
    pipeline incl. the Mercator chart background (render/scenplot.py);
    ``"fast"`` is the lightweight matplotlib frame."""
    t = trace.lat.shape[0] - 1
    if style == "scene":
        from hhmarl_2d_tpu.render.scenplot import plot_trace_frame
        plot_trace_frame(trace, t, out_file, status=status)
    else:
        plot_frame(trace, t, out_file, status=status)


def render_video(trace: EpisodeTrace, out_file: str,
                 status: Optional[str] = None, every: int = 1,
                 fps: int = 8, style: str = "scene",
                 live_file: Optional[str] = None) -> str:
    """Animated episode: a per-tick frame sequence assembled into a GIF.

    The offline equivalent of the reference's live 'video' mode, which
    rewrites current.png after every sim tick (README.md:68-69;
    env_base.plot).  ``style="scene"`` renders each frame through the full
    drawable pipeline (render/scenplot.py, the reference renderer's
    vocabulary); ``"fast"`` uses the lightweight matplotlib frame.
    ``live_file``, when set, is additionally rewritten with every frame as
    it is produced -- the live-view behavior itself.  ``every`` subsamples
    ticks.  Returns ``out_file``.
    """
    import os
    import tempfile

    from PIL import Image

    T = trace.lat.shape[0]
    paths: List[str] = []
    with tempfile.TemporaryDirectory() as tmp:
        for t in range(0, T, max(1, every)):
            f = os.path.join(tmp, f"frame_{t:05d}.png")
            txt = f"{status + ' | ' if status else ''}t={t}"
            if style == "scene":
                from hhmarl_2d_tpu.render.scenplot import plot_trace_frame
                plot_trace_frame(trace, t, f, status=txt)
            else:
                plot_frame(trace, t, f, status=txt)
            if live_file:
                import shutil
                shutil.copyfile(f, live_file)
            paths.append(f)
        if not paths:
            raise ValueError("empty trace")
        # stream frames from disk at save time instead of holding every
        # full-resolution frame in memory (a horizon-500 episode at
        # every=1 would otherwise pin hundreds of frames)
        first = Image.open(paths[0]).convert("P")
        rest = (Image.open(p).convert("P") for p in paths[1:])
        first.save(out_file, save_all=True, append_images=rest,
                   duration=int(1000 / fps), loop=0)
    return out_file
