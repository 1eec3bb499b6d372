"""Scenario plotter with the reference's full drawable hierarchy.

Capability-parity re-design of the cairo/cartopy renderer
(/root/reference/warsim/scenplotter/scenario_plotter.py): the same
drawable vocabulary -- ``StatusMessage`` (:48), ``TopLeftMessage`` (:56),
``PolyLine`` (:64), ``Rect`` (:75), ``Arc`` (:89), sprites ``Airplane``
(:128), ``SamBattery`` (:135), ``Missile`` (:146), ``Waypoint`` (:153),
``BackgroundMesh`` (:160) -- and a ``ScenarioPlotter.to_png`` dispatch
(:209-246), rendered with matplotlib (Agg) instead of pycairo + a cartopy
Mercator tile.  Rendering is host-side and fully off the training hot
path: scenes are built from numpy trace buffers copied from the device.

Coordinates are anchor-offset degrees (see geo.py); because the map is a
degree-square, the reference's Mercator projection reduces to a linear
axes transform at these extents.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from hhmarl_2d_tpu.geo import MapLimits


def _make_ocean_cmap():
    from matplotlib.colors import LinearSegmentedColormap
    return LinearSegmentedColormap.from_list(
        "ocean_depth", ["#122a40", "#17344e", "#1d405e"])


_OCEAN_CMAP = _make_ocean_cmap()


@dataclasses.dataclass
class PlotConfig:
    """Rendering knobs (scenario_plotter.py:24-36)."""

    show_grid: bool = True
    units_scale: float = 35.0          # sprite size, map-per-mille
    background_color: str = "#191b24"
    borders_color: str = "#ffffff"
    sprites_info_font_size: float = 7.0
    status_message_font_size: float = 9.0
    # geographic chart background (the reference renders a cartopy
    # Mercator tile, scenario_plotter.py:184-207; its default play area
    # -- lon 7..7.5E, lat 5..5.5N, env_base.py:43 -- is open ocean in the
    # Gulf of Guinea, so a Mercator-aspect ocean chart with a true-
    # coordinate graticule reproduces the tile's visible content without
    # cartopy or coastline data)
    geo_background: bool = True


class Drawable:
    """Anything that can be drawn on the map (scenario_plotter.py:39-45)."""

    def __init__(self, zorder: int = 0):
        self.zorder = zorder


class StatusMessage(Drawable):
    """Bottom-left status line (scenario_plotter.py:48-53)."""

    def __init__(self, text: str, text_color: str = "#ffffff",
                 zorder: int = 0):
        super().__init__(zorder)
        self.text = text
        self.text_color = text_color


class TopLeftMessage(Drawable):
    """Top-right clock/label line (scenario_plotter.py:56-61; the reference
    draws its "TopLeft" message at the top-right of the frame)."""

    def __init__(self, text: str, text_color: str = "#ffffff",
                 zorder: int = 0):
        super().__init__(zorder)
        self.text = text
        self.text_color = text_color


class PolyLine(Drawable):
    """Dashed/solid path through (lat, lon) points (scenario_plotter.py:64-72)."""

    def __init__(self, points: Sequence[Tuple[float, float]],
                 line_width: float = 1.0,
                 dash: Optional[Tuple[float, float]] = None,
                 edge_color: str = "#ffffff", zorder: int = 0):
        super().__init__(zorder)
        self.points = list(points)
        self.line_width = line_width
        self.dash = dash
        self.edge_color = edge_color


class Rect(Drawable):
    """Axis-aligned rectangle in map coordinates (scenario_plotter.py:75-86)."""

    def __init__(self, left_lon: float, bottom_lat: float, right_lon: float,
                 top_lat: float, line_width: float = 1.0,
                 dash: Optional[Tuple[float, float]] = None,
                 edge_color: Optional[str] = None,
                 fill_color: Optional[str] = None, zorder: int = 0):
        super().__init__(zorder)
        self.left_lon = left_lon
        self.bottom_lat = bottom_lat
        self.right_lon = right_lon
        self.top_lat = top_lat
        self.line_width = line_width
        self.dash = dash
        self.edge_color = edge_color
        self.fill_color = fill_color


class Arc(Drawable):
    """Circular arc/wedge, radius in km (scenario_plotter.py:89-104)."""

    def __init__(self, center_lat: float, center_lon: float, radius: float,
                 angle1: float, angle2: float, line_width: float = 1.0,
                 dash: Optional[Tuple[float, float]] = None,
                 edge_color: Optional[str] = None,
                 fill_color: Optional[str] = None, zorder: int = 0):
        super().__init__(zorder)
        self.center_lat = center_lat
        self.center_lon = center_lon
        self.radius = radius            # km
        self.angle1 = angle1            # compass degrees
        self.angle2 = angle2
        self.line_width = line_width
        self.dash = dash
        self.edge_color = edge_color
        self.fill_color = fill_color


class Sprite(Drawable):
    """Positioned, oriented glyph with optional info text
    (scenario_plotter.py:107-125)."""

    def __init__(self, lat: float, lon: float, heading: float,
                 edge_color: str = "#ffffff", fill_color: str = "#888888",
                 info_text: Optional[str] = None, zorder: int = 0):
        super().__init__(zorder)
        self.lat = lat
        self.lon = lon
        self.heading = heading
        self.edge_color = edge_color
        self.fill_color = fill_color
        self.info_text = info_text


class Airplane(Sprite):
    """Airplane glyph (scenario_plotter.py:128-132)."""


class SamBattery(Sprite):
    """SAM battery glyph with missile/radar range rings
    (scenario_plotter.py:135-143)."""

    def __init__(self, lat: float, lon: float, heading: float,
                 missile_range_km: float, radar_range_km: float,
                 radar_amplitude_deg: float, edge_color: str = "#ffffff",
                 fill_color: str = "#888888",
                 info_text: Optional[str] = None, zorder: int = 0):
        super().__init__(lat, lon, heading, edge_color, fill_color,
                         info_text, zorder)
        self.missile_range_km = missile_range_km
        self.radar_range_km = radar_range_km
        self.radar_amplitude_deg = radar_amplitude_deg


class Missile(Sprite):
    """Missile glyph (scenario_plotter.py:146-150)."""


class Waypoint(Sprite):
    """Static circular marker; heading ignored (scenario_plotter.py:153-157;
    the matching no-op sim unit is warsim/simulator/waypoint_unit.py:10-17 --
    in this framework a waypoint is purely a drawable, since a unit whose
    ``update`` does nothing needs no simulator state)."""

    def __init__(self, lat: float, lon: float, edge_color: str = "#ffffff",
                 fill_color: str = "#888888",
                 info_text: Optional[str] = None, zorder: int = 0):
        super().__init__(lat, lon, 0.0, edge_color, fill_color, info_text,
                         zorder)


class BackgroundMesh:
    """Pseudocolor background field (scenario_plotter.py:160-168)."""

    def __init__(self, lons, lats, vals, cmap: str,
                 vmin: Optional[float] = None, vmax: Optional[float] = None):
        self.lons = np.asarray(lons)
        self.lats = np.asarray(lats)
        self.vals = np.asarray(vals)
        self.cmap = cmap
        self.vmin = vmin
        self.vmax = vmax


_KM_PER_DEG = 111.3195  # spherical mean; display-only scaling


class ScenarioPlotter:
    """Renders a list of drawables to PNG (scenario_plotter.py:171-246).

    The reference rasterizes a cartopy Mercator background once and then
    cairo-paints onto it per frame; here the "background" is simply the
    figure/axes styling (plus an optional ``BackgroundMesh``), rebuilt per
    frame -- rendering is offline, so per-frame figure setup is fine.
    """

    def __init__(self, map_extents: MapLimits, dpi: int = 200,
                 background_mesh: Optional[BackgroundMesh] = None,
                 config: Optional[PlotConfig] = None):
        self.map_extents = map_extents
        self.dpi = dpi
        self.background_mesh = background_mesh
        self.cfg = config or PlotConfig()

    # -- helpers -------------------------------------------------------------

    def _sprite_size(self) -> float:
        return (self.map_extents.longitude_extent
                * self.cfg.units_scale / 1000.0)

    def _km_to_deg(self, km: float) -> float:
        return km / _KM_PER_DEG

    @staticmethod
    def _heading_dir(heading: float) -> np.ndarray:
        a = np.radians(90.0 - heading)  # compass -> math angle
        return np.array([np.cos(a), np.sin(a)])

    # -- public API ----------------------------------------------------------

    def to_png(self, filename: str, objects: List[Drawable]):
        """Draw all objects, lowest zorder first (scenario_plotter.py:209-246)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ext = self.map_extents
        fig, ax = plt.subplots(
            figsize=(7.0, 7.0 * ext.latitude_extent / ext.longitude_extent),
            dpi=self.dpi)
        fig.patch.set_facecolor(self.cfg.background_color)
        ax.set_facecolor(self.cfg.background_color)
        ax.set_xlim(ext.left_lon, ext.right_lon)
        ax.set_ylim(ext.bottom_lat, ext.top_lat)
        for spine in ax.spines.values():
            spine.set_color(self.cfg.borders_color)
        ax.tick_params(colors=self.cfg.borders_color, labelsize=6)
        if self.cfg.geo_background:
            self._draw_geo_background(ax, ext)
        elif self.cfg.show_grid:
            ax.grid(color=self.cfg.borders_color, alpha=0.15, lw=0.5)

        if self.background_mesh is not None:
            m = self.background_mesh
            ax.pcolormesh(m.lons, m.lats, m.vals, cmap=m.cmap,
                          vmin=m.vmin, vmax=m.vmax, zorder=0, shading="auto")

        for o in sorted(objects, key=lambda d: d.zorder):
            self._draw(ax, fig, o)

        fig.tight_layout()
        fig.savefig(filename, facecolor=fig.get_facecolor())
        plt.close(fig)

    # -- geographic background ----------------------------------------------

    def _draw_geo_background(self, ax, ext):
        """Mercator-faithful nautical-chart background.

        Replaces the reference's rasterized cartopy Mercator tile
        (scenario_plotter.py:184-207) with the same information content
        for its play area: correct Mercator aspect at the map latitude, a
        subtle open-ocean depth gradient, and a graticule labeled with
        TRUE geographic coordinates (anchor lat 5N / lon 7E,
        env_base.py:43 via constants.MAP_BOTTOM_LAT/MAP_LEFT_LON).
        """
        import matplotlib.ticker as mticker

        from hhmarl_2d_tpu import constants as C

        mid_lat = C.MAP_BOTTOM_LAT + 0.5 * (ext.bottom_lat + ext.top_lat)
        # local Mercator stretch: 1 deg of latitude spans 1/cos(phi) of
        # the plot units a degree of longitude does
        ax.set_aspect(1.0 / max(np.cos(np.radians(mid_lat)), 1e-6))

        # open-ocean depth gradient (deep at bottom, lighter at top)
        grad = np.linspace(0.0, 1.0, 64)[:, None] * np.ones((1, 2))
        ax.imshow(grad, extent=(ext.left_lon, ext.right_lon,
                                ext.bottom_lat, ext.top_lat),
                  origin="lower", aspect="auto", zorder=0,
                  cmap=_OCEAN_CMAP, interpolation="bilinear")

        # graticule with degree-minute labels at true coordinates
        def fmt(offset, anchor, suffix):
            val = anchor + offset
            deg = int(val)
            minutes = (val - deg) * 60.0
            return f"{deg}\N{DEGREE SIGN}{minutes:04.1f}'{suffix}"

        ax.xaxis.set_major_formatter(mticker.FuncFormatter(
            lambda v, _: fmt(v, C.MAP_LEFT_LON, "E")))
        ax.yaxis.set_major_formatter(mticker.FuncFormatter(
            lambda v, _: fmt(v, C.MAP_BOTTOM_LAT, "N")))
        ax.grid(color="#9db8cf", alpha=0.22, lw=0.5)

    # -- dispatch ------------------------------------------------------------

    def _draw(self, ax, fig, o: Drawable):
        if isinstance(o, StatusMessage):
            ax.text(0.01, 0.01, o.text, transform=ax.transAxes,
                    color=o.text_color, ha="left", va="bottom",
                    fontsize=self.cfg.status_message_font_size, zorder=10)
        elif isinstance(o, TopLeftMessage):
            ax.text(0.99, 0.99, o.text, transform=ax.transAxes,
                    color=o.text_color, ha="right", va="top",
                    fontsize=self.cfg.status_message_font_size, zorder=10)
        elif isinstance(o, PolyLine):
            pts = np.asarray(o.points, dtype=float)
            if len(pts):
                ax.plot(pts[:, 1], pts[:, 0], lw=o.line_width,
                        color=o.edge_color, zorder=2 + o.zorder,
                        ls="--" if o.dash else "-",
                        dashes=o.dash if o.dash else (None, None))
        elif isinstance(o, Rect):
            import matplotlib.patches as mpatches
            ax.add_patch(mpatches.Rectangle(
                (o.left_lon, o.bottom_lat), o.right_lon - o.left_lon,
                o.top_lat - o.bottom_lat, lw=o.line_width,
                ls="--" if o.dash else "-",
                edgecolor=o.edge_color or "none",
                facecolor=o.fill_color or "none", zorder=2 + o.zorder))
        elif isinstance(o, Arc):
            self._draw_arc(ax, o)
        elif isinstance(o, SamBattery):
            self._draw_sam(ax, o)
        elif isinstance(o, Airplane):
            self._draw_airplane(ax, o)
        elif isinstance(o, Missile):
            self._draw_missile(ax, o)
        elif isinstance(o, Waypoint):
            self._draw_waypoint(ax, o)
        else:
            raise ValueError(f"undrawable object {type(o).__name__}")

    # -- primitives ----------------------------------------------------------

    def _info_text(self, ax, o: Sprite, dy: float):
        if o.info_text:
            ax.annotate(o.info_text, (o.lon, o.lat - dy), color=o.edge_color,
                        ha="center", va="top",
                        fontsize=self.cfg.sprites_info_font_size,
                        zorder=5 + o.zorder)

    def _draw_arc(self, ax, o: Arc):
        import matplotlib.patches as mpatches
        r = self._km_to_deg(o.radius)
        # compass angles (cw from north) -> matplotlib (ccw from east)
        th1, th2 = 90.0 - o.angle2, 90.0 - o.angle1
        if o.fill_color:
            ax.add_patch(mpatches.Wedge(
                (o.center_lon, o.center_lat), r, th1, th2,
                facecolor=o.fill_color, edgecolor=o.edge_color or "none",
                lw=o.line_width, zorder=2 + o.zorder))
        else:
            ax.add_patch(mpatches.Arc(
                (o.center_lon, o.center_lat), 2 * r, 2 * r, theta1=th1,
                theta2=th2, edgecolor=o.edge_color,
                ls="--" if o.dash else "-", lw=o.line_width,
                zorder=2 + o.zorder))

    def _draw_airplane(self, ax, o: Airplane):
        s = self._sprite_size()
        d = self._heading_dir(o.heading)
        n = np.array([-d[1], d[0]])
        p = np.array([o.lon, o.lat])
        # fuselage triangle + swept wings, oriented by heading
        nose = p + 1.2 * s * d
        tail = p - 0.9 * s * d
        wing_l = p - 0.1 * s * d + 0.8 * s * n
        wing_r = p - 0.1 * s * d - 0.8 * s * n
        tail_l = tail + 0.35 * s * n
        tail_r = tail - 0.35 * s * n
        xs = [nose[0], wing_l[0], tail_l[0], tail_r[0], wing_r[0]]
        ys = [nose[1], wing_l[1], tail_l[1], tail_r[1], wing_r[1]]
        ax.fill(xs, ys, facecolor=o.fill_color, edgecolor=o.edge_color,
                lw=0.6, zorder=4 + o.zorder)
        self._info_text(ax, o, 1.6 * s)

    def _draw_missile(self, ax, o: Missile):
        s = 0.6 * self._sprite_size()
        d = self._heading_dir(o.heading)
        n = np.array([-d[1], d[0]])
        p = np.array([o.lon, o.lat])
        nose = p + 1.4 * s * d
        bl = p - 0.8 * s * d + 0.25 * s * n
        br = p - 0.8 * s * d - 0.25 * s * n
        ax.fill([nose[0], bl[0], br[0]], [nose[1], bl[1], br[1]],
                facecolor=o.fill_color, edgecolor=o.edge_color, lw=0.5,
                zorder=4 + o.zorder)
        self._info_text(ax, o, 1.4 * s)

    def _draw_sam(self, ax, o: SamBattery):
        import matplotlib.patches as mpatches
        s = self._sprite_size()
        ax.add_patch(mpatches.RegularPolygon(
            (o.lon, o.lat), numVertices=4, radius=s * 0.8,
            orientation=np.radians(45.0), facecolor=o.fill_color,
            edgecolor=o.edge_color, lw=0.6, zorder=4 + o.zorder))
        # missile range ring + radar wedge (scenario_plotter.py:348-392)
        self._draw_arc(ax, Arc(o.lat, o.lon, o.missile_range_km, 0.0, 360.0,
                               line_width=0.8, dash=(3, 3),
                               edge_color=o.edge_color, zorder=o.zorder))
        half = o.radar_amplitude_deg / 2.0
        self._draw_arc(ax, Arc(o.lat, o.lon, o.radar_range_km,
                               o.heading - half, o.heading + half,
                               line_width=0.6, edge_color=o.edge_color,
                               zorder=o.zorder))
        self._info_text(ax, o, 1.4 * s)

    def _draw_waypoint(self, ax, o: Waypoint):
        s = 0.5 * self._sprite_size()
        ax.plot(o.lon, o.lat, marker="o", ms=s * 400.0, mew=0.8,
                markerfacecolor="none", markeredgecolor=o.edge_color,
                zorder=4 + o.zorder)
        ax.plot(o.lon, o.lat, marker=".", ms=2.0, color=o.edge_color,
                zorder=4 + o.zorder)
        self._info_text(ax, o, 1.6 * s)


# --- scene assembly from device traces ---------------------------------------

COLORS = {
    "blue_outline": "#3775b1", "blue_fill": "#85b2d8",
    "red_outline": "#b13737", "red_fill": "#d88585",
}

_ANCHOR_COS = float(np.cos(np.radians(5.0)))  # display-only lon scaling


def _ray_end(lat, lon, heading, range_km):
    """Flat-earth endpoint for display geometry (cone edges)."""
    d = range_km / _KM_PER_DEG
    a = np.radians(heading)
    return lat + d * np.cos(a), lon + d * np.sin(a) / _ANCHOR_COS


def scene_from_trace(trace, t: int, paths: bool = True,
                     status: Optional[str] = None):
    """Drawable list for step ``t`` of an EpisodeTrace -- the equivalent of
    ``HHMARLBaseEnv.plot`` + ``_plot_airplane`` (env_base.py:587-645):
    airplanes with dashed trail PolyLines and cannon-cone triangles while
    bursting, Waypoint markers at dead units' last positions, Missile
    sprites colored by owner side, and the status/clock banners."""
    from hhmarl_2d_tpu import constants as C

    n = trace.lat.shape[1]
    na = trace.num_agents
    # one trace frame = one sim second for low-level traces but one
    # commander macro action (up to 16 ticks) for high-level ones --
    # label the clock banner accordingly (EpisodeTrace.frame_unit)
    unit = getattr(trace, "frame_unit", "s")
    clock = (f"t = {t:4d} s" if unit == "s"
             else f"macro-step {t:3d}")
    objects: List[Drawable] = [
        StatusMessage(status or ""),
        TopLeftMessage(clock),
    ]
    for i in range(n):
        side = "blue" if i < na else "red"
        edge, fill = COLORS[f"{side}_outline"], COLORS[f"{side}_fill"]
        alive_path = trace.alive[:t + 1, i]
        pts = [(trace.lat[s, i], trace.lon[s, i])
               for s in range(t + 1) if alive_path[s]]
        if trace.alive[t, i]:
            lat, lon, hdg = (trace.lat[t, i], trace.lon[t, i],
                             trace.heading[t, i])
            objects.append(Airplane(lat, lon, hdg, edge_color=edge,
                                    fill_color=fill, info_text=f"r_{i + 1}"))
            if paths and pts:
                objects.append(PolyLine(pts, line_width=1.0, dash=(2, 2),
                                        edge_color=edge))
            if trace.cannon_burst[t, i] > 0 and trace.ac_type is not None:
                ty = int(trace.ac_type[i]) - 1
                rng = float(C.CANNON_RANGE_KM[ty])
                half = float(C.CANNON_WIDTH_DEG[ty]) / 2.0
                p1 = _ray_end(lat, lon, hdg + half, rng)
                p2 = _ray_end(lat, lon, hdg - half, rng)
                objects.append(PolyLine([(lat, lon), p1, p2, (lat, lon)],
                                        line_width=1.0, dash=(1, 1),
                                        edge_color=edge))
        elif pts:
            # destroyed: trail + waypoint at last known position
            # (env_base.py:589-597 "use_backup" branch)
            if paths:
                objects.append(PolyLine(pts, line_width=1.0, dash=(2, 2),
                                        edge_color=edge))
            objects.append(Waypoint(pts[-1][0], pts[-1][1], edge_color=edge,
                                    fill_color=fill, info_text=f"r_{i + 1}"))
    for i in range(n):
        if trace.m_alive[t, i]:
            side = "blue" if i < na else "red"
            hdg = (float(trace.m_heading[t, i])
                   if trace.m_heading is not None else 0.0)
            objects.append(Missile(
                trace.m_lat[t, i], trace.m_lon[t, i], hdg,
                edge_color=COLORS[f"{side}_outline"],
                fill_color=COLORS[f"{side}_fill"], info_text=f"m_{i + 1}"))
    return objects


def plot_trace_frame(trace, t: int, out_file: str,
                     status: Optional[str] = None, paths: bool = True,
                     dpi: int = 150):
    """Render one trace frame through the drawable pipeline."""
    from hhmarl_2d_tpu.geo import make_map_limits

    plotter = ScenarioPlotter(make_map_limits(trace.map_size), dpi=dpi)
    plotter.to_png(out_file, scene_from_trace(trace, t, paths, status))
