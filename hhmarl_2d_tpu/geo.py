"""Vectorized geodesy and angle math in JAX.

Replaces the reference's geographiclib WGS84 calls
(/root/reference/warsim/utils/geodesics.py:12-24, angles.py:10-29,
map_limits.py:10-48) with closed-form local-ellipsoid approximations that
run elementwise on the TPU VPU under vmap/jit.

Precision strategy: the simulator runs in float32 on TPU, so positions are
stored as *offsets in degrees from the map anchor* (lat 5, lon 7) rather
than absolute coordinates -- float32 resolution at offset <= 0.5 deg is
~3e-8 deg (~3 mm), versus ~5 cm at absolute lat 5.  The core API therefore
works with deltas:

  * ``geodetic_delta(lat_abs, heading, dist_m) -> (dlat, dlon)``
  * ``inverse_deg(dlat, dlon, lat_mean_abs) -> (dist_km, bearing_deg)``

Absolute-coordinate wrappers (``geodetic_direct`` etc.) match the reference
signatures for tests and tooling.

Accuracy: aircraft move <= 463 m/tick (900 kt) and missiles <= 1029 m/tick;
all range checks are <= 111 km on a 30-50 km map.  The local-radii
formulation with a midpoint refinement agrees with an independent Vincenty
implementation to sub-millimeter at these scales (tests/test_geo.py).

All angles in degrees; headings are compass bearings in [0, 360).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# WGS84 ellipsoid
_A = 6378137.0              # semi-major axis (m)
_F = 1.0 / 298.257223563    # flattening
_E2 = _F * (2.0 - _F)       # first eccentricity squared

_DEG = jnp.pi / 180.0


def _local_radii(lat_deg):
    """Meridional (M) and prime-vertical (N) radii of curvature in meters."""
    s = jnp.sin(lat_deg * _DEG)
    den = 1.0 - _E2 * s * s
    n = _A / jnp.sqrt(den)
    m = n * (1.0 - _E2) / den
    return m, n


def geodetic_delta(lat_abs_deg, heading_deg, dist_m):
    """(dlat, dlon) in degrees for a step of ``dist_m`` along ``heading``.

    Mirrors geodesics.py:22-24 (geographiclib Direct) for the short steps
    the simulator takes.  Radii are evaluated at the start latitude, then
    refined at the midpoint latitude for second-order accuracy.
    """
    h = heading_deg * _DEG
    north = dist_m * jnp.cos(h)
    east = dist_m * jnp.sin(h)

    m0, _ = _local_radii(lat_abs_deg)
    dlat0 = north / m0 / _DEG
    lat_mid = lat_abs_deg + 0.5 * dlat0
    m1, n1 = _local_radii(lat_mid)
    dlat = north / m1 / _DEG
    dlon = east / (n1 * jnp.cos(lat_mid * _DEG)) / _DEG
    return dlat, dlon


def inverse_deg(dlat_deg, dlon_deg, lat_mean_abs_deg):
    """(distance_km, bearing_deg) from coordinate deltas.

    Mirrors geodesics.py:12-19 (geographiclib Inverse).  ``lat_mean_abs_deg``
    is the mean absolute latitude of the two endpoints.
    """
    m, n = _local_radii(lat_mean_abs_deg)
    dy = dlat_deg * _DEG * m
    dx = dlon_deg * _DEG * n * jnp.cos(lat_mean_abs_deg * _DEG)
    dist_km = jnp.sqrt(dx * dx + dy * dy) / 1000.0
    bearing = jnp.mod(jnp.arctan2(dx, dy) / _DEG, 360.0)
    return dist_km, bearing


# --- absolute-coordinate wrappers (reference API shape) ---------------------

def geodetic_direct(lat_deg, lon_deg, heading_deg, dist_m):
    """Destination point given start, bearing, distance (geodesics.py:22)."""
    dlat, dlon = geodetic_delta(lat_deg, heading_deg, dist_m)
    return lat_deg + dlat, lon_deg + dlon


def geodetic_distance_km(lat1, lon1, lat2, lon2):
    """geodesics.py:12-14."""
    d, _ = inverse_deg(lat2 - lat1, lon2 - lon1, 0.5 * (lat1 + lat2))
    return d


def geodetic_bearing_deg(lat1, lon1, lat2, lon2):
    """Initial bearing from point 1 to point 2 in [0, 360) (geodesics.py:17)."""
    _, b = inverse_deg(lat2 - lat1, lon2 - lon1, 0.5 * (lat1 + lat2))
    return b


# --- Angle arithmetic (utils/angles.py) -------------------------------------

def normalize_angle(a):
    """Wrap to [0, 360) (angles.py:10-15)."""
    return jnp.mod(a, 360.0)


def sum_angles(a, b):
    """(a + b) wrapped to [0, 360) (angles.py:18-19)."""
    return jnp.mod(a + b, 360.0)


def signed_heading_diff(actual, desired):
    """Shortest signed turn from `actual` to `desired`, in [-180, 180].

    Matches angles.py:22-29 exactly, including the closed endpoints: for
    inputs in [0, 360) the delta lands in (-360, 360) and is wrapped once,
    so both -180 and +180 are representable (delta == 180 stays +180).
    """
    delta = desired - actual
    delta = jnp.where(delta < -180.0, delta + 360.0, delta)
    delta = jnp.where(delta > 180.0, delta - 360.0, delta)
    return delta


# --- Map limits (utils/map_limits.py) ---------------------------------------

@struct.dataclass
class MapLimits:
    """Play-area rectangle in anchor-offset coordinates (map_limits.py:10-48).

    ``left_lon``/``bottom_lat`` etc. are degrees relative to the map anchor
    (absolute lat 5, lon 7; env_base.py:43), i.e. the standard square map is
    (0, 0) .. (map_size, map_size).
    """

    left_lon: float
    bottom_lat: float
    right_lon: float
    top_lat: float

    @property
    def latitude_extent(self):
        return self.top_lat - self.bottom_lat

    @property
    def longitude_extent(self):
        return self.right_lon - self.left_lon

    def relative_position(self, lat, lon):
        """(lat_rel, lon_rel) each clipped to [0, 1] (map_limits.py:37-40)."""
        lat_rel = (lat - self.bottom_lat) / self.latitude_extent
        lon_rel = (lon - self.left_lon) / self.longitude_extent
        return jnp.clip(lat_rel, 0.0, 1.0), jnp.clip(lon_rel, 0.0, 1.0)

    def absolute_position(self, lat_rel, lon_rel):
        return (lat_rel * self.latitude_extent + self.bottom_lat,
                lon_rel * self.longitude_extent + self.left_lon)

    def in_boundary(self, lat, lon):
        return ((self.left_lon <= lon) & (lon <= self.right_lon)
                & (self.bottom_lat <= lat) & (lat <= self.top_lat))


def make_map_limits(map_size: float) -> MapLimits:
    """The standard square map in anchor-offset coordinates (env_base.py:43)."""
    return MapLimits(0.0, 0.0, map_size, map_size)
