"""Geodesy validation against an independent WGS84 Vincenty implementation.

The reference uses geographiclib (exact Karney geodesics); our framework
uses closed-form local-ellipsoid math.  Vincenty's formulae (implemented
here in pure numpy, independent of the framework code) agree with Karney to
sub-millimeter at the <=120 km scales this simulator uses, so they serve as
the golden reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hhmarl_2d_tpu import geo

A = 6378137.0
F = 1 / 298.257223563
B = A * (1 - F)


def vincenty_direct(lat1, lon1, az_deg, s):
    """Vincenty direct problem (WGS84), returns (lat2, lon2) degrees."""
    phi1 = np.radians(lat1)
    alpha1 = np.radians(az_deg)
    U1 = np.arctan((1 - F) * np.tan(phi1))
    sigma1 = np.arctan2(np.tan(U1), np.cos(alpha1))
    sin_alpha = np.cos(U1) * np.sin(alpha1)
    cos2_alpha = 1 - sin_alpha**2
    u2 = cos2_alpha * (A**2 - B**2) / B**2
    k1 = (np.sqrt(1 + u2) - 1) / (np.sqrt(1 + u2) + 1)
    Acoef = (1 + 0.25 * k1**2) / (1 - k1)
    Bcoef = k1 * (1 - 3 / 8 * k1**2)
    sigma = s / (B * Acoef)
    for _ in range(100):
        two_sigma_m = 2 * sigma1 + sigma
        d_sigma = Bcoef * np.sin(sigma) * (
            np.cos(two_sigma_m)
            + Bcoef / 4 * (np.cos(sigma) * (-1 + 2 * np.cos(two_sigma_m)**2)
                           - Bcoef / 6 * np.cos(two_sigma_m)
                           * (-3 + 4 * np.sin(sigma)**2)
                           * (-3 + 4 * np.cos(two_sigma_m)**2)))
        sigma_new = s / (B * Acoef) + d_sigma
        if abs(sigma_new - sigma) < 1e-15:
            sigma = sigma_new
            break
        sigma = sigma_new
    two_sigma_m = 2 * sigma1 + sigma
    phi2 = np.arctan2(
        np.sin(U1) * np.cos(sigma) + np.cos(U1) * np.sin(sigma) * np.cos(alpha1),
        (1 - F) * np.hypot(sin_alpha,
                           np.sin(U1) * np.sin(sigma)
                           - np.cos(U1) * np.cos(sigma) * np.cos(alpha1)))
    lam = np.arctan2(np.sin(sigma) * np.sin(alpha1),
                     np.cos(U1) * np.cos(sigma)
                     - np.sin(U1) * np.sin(sigma) * np.cos(alpha1))
    Ccoef = F / 16 * cos2_alpha * (4 + F * (4 - 3 * cos2_alpha))
    L = lam - (1 - Ccoef) * F * sin_alpha * (
        sigma + Ccoef * np.sin(sigma) * (
            np.cos(two_sigma_m)
            + Ccoef * np.cos(sigma) * (-1 + 2 * np.cos(two_sigma_m)**2)))
    return np.degrees(phi2), lon1 + np.degrees(L)


def vincenty_inverse(lat1, lon1, lat2, lon2):
    """Vincenty inverse problem, returns (distance_m, azimuth_deg)."""
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    U1 = np.arctan((1 - F) * np.tan(phi1))
    U2 = np.arctan((1 - F) * np.tan(phi2))
    L = np.radians(lon2 - lon1)
    lam = L
    for _ in range(200):
        sin_sigma = np.hypot(np.cos(U2) * np.sin(lam),
                             np.cos(U1) * np.sin(U2)
                             - np.sin(U1) * np.cos(U2) * np.cos(lam))
        if sin_sigma == 0:
            return 0.0, 0.0
        cos_sigma = (np.sin(U1) * np.sin(U2)
                     + np.cos(U1) * np.cos(U2) * np.cos(lam))
        sigma = np.arctan2(sin_sigma, cos_sigma)
        sin_alpha = np.cos(U1) * np.cos(U2) * np.sin(lam) / sin_sigma
        cos2_alpha = 1 - sin_alpha**2
        cos_2sm = (cos_sigma - 2 * np.sin(U1) * np.sin(U2) / cos2_alpha
                   if cos2_alpha != 0 else 0.0)
        Ccoef = F / 16 * cos2_alpha * (4 + F * (4 - 3 * cos2_alpha))
        lam_new = L + (1 - Ccoef) * F * sin_alpha * (
            sigma + Ccoef * sin_sigma * (
                cos_2sm + Ccoef * cos_sigma * (-1 + 2 * cos_2sm**2)))
        if abs(lam_new - lam) < 1e-14:
            lam = lam_new
            break
        lam = lam_new
    u2 = cos2_alpha * (A**2 - B**2) / B**2
    k1 = (np.sqrt(1 + u2) - 1) / (np.sqrt(1 + u2) + 1)
    Acoef = (1 + 0.25 * k1**2) / (1 - k1)
    Bcoef = k1 * (1 - 3 / 8 * k1**2)
    d_sigma = Bcoef * sin_sigma * (
        cos_2sm + Bcoef / 4 * (cos_sigma * (-1 + 2 * cos_2sm**2)
                               - Bcoef / 6 * cos_2sm
                               * (-3 + 4 * sin_sigma**2)
                               * (-3 + 4 * cos_2sm**2)))
    s = B * Acoef * (sigma - d_sigma)
    az = np.degrees(np.arctan2(np.cos(U2) * np.sin(lam),
                               np.cos(U1) * np.sin(U2)
                               - np.sin(U1) * np.cos(U2) * np.cos(lam)))
    return s, az % 360.0


RNG = np.random.default_rng(0)


def _map_points(n):
    """Random points on the reference's play area (lat ~5, lon ~7)."""
    lat = RNG.uniform(4.8, 5.8, n)
    lon = RNG.uniform(6.8, 7.8, n)
    return lat, lon


class TestDirect:
    def test_aircraft_step_accuracy(self):
        """One tick of the fastest aircraft (463 m) -> sub-mm agreement."""
        lat, lon = _map_points(50)
        az = RNG.uniform(0, 360, 50)
        d = np.full(50, 900 * 0.514444)  # 900 kt for 1 s
        glat, glon = geo.geodetic_direct(jnp.array(lat), jnp.array(lon),
                                         jnp.array(az), jnp.array(d))
        for i in range(50):
            vlat, vlon = vincenty_direct(lat[i], lon[i], az[i], d[i])
            assert abs(float(glat[i]) - vlat) < 1e-7   # ~1 cm
            assert abs(float(glon[i]) - vlon) < 1e-7

    def test_missile_step_accuracy(self):
        """Fastest missile tick (1029 m)."""
        lat, lon = _map_points(50)
        az = RNG.uniform(0, 360, 50)
        d = np.full(50, 2000 * 0.514444)
        glat, glon = geo.geodetic_direct(jnp.array(lat), jnp.array(lon),
                                         jnp.array(az), jnp.array(d))
        for i in range(50):
            vlat, vlon = vincenty_direct(lat[i], lon[i], az[i], d[i])
            assert abs(float(glat[i]) - vlat) < 2e-7   # ~2 cm
            assert abs(float(glon[i]) - vlon) < 2e-7

    def test_cardinal_directions(self):
        lat0, lon0 = 5.0, 7.0
        nlat, nlon = geo.geodetic_direct(lat0, lon0, 0.0, 1000.0)
        assert float(nlat) > lat0 and abs(float(nlon) - lon0) < 1e-9
        elat, elon = geo.geodetic_direct(lat0, lon0, 90.0, 1000.0)
        assert float(elon) > lon0 and abs(float(elat) - lat0) < 1e-7


class TestInverse:
    @pytest.mark.parametrize("scale_deg", [0.01, 0.1, 0.5, 1.0])
    def test_distance_accuracy(self, scale_deg):
        """Relative error < 1e-5 at all in-game ranges (up to ~120 km)."""
        lat1, lon1 = _map_points(30)
        lat2 = lat1 + RNG.uniform(-scale_deg, scale_deg, 30)
        lon2 = lon1 + RNG.uniform(-scale_deg, scale_deg, 30)
        d_ours = geo.geodetic_distance_km(jnp.array(lat1), jnp.array(lon1),
                                          jnp.array(lat2), jnp.array(lon2))
        for i in range(30):
            s, _ = vincenty_inverse(lat1[i], lon1[i], lat2[i], lon2[i])
            if s > 1.0:
                assert abs(float(d_ours[i]) * 1000 - s) / s < 1e-5

    @pytest.mark.parametrize("scale_deg,tol_deg", [
        # cannon-range geometry (<= ~5 km): essentially exact vs the 3.5-5
        # degree cannon half-widths it gates (ac1.py:135-142)
        (0.03, 2e-3),
        # missile radar-cone geometry (tens of km) vs its 60 degree threshold
        (0.3, 5e-2),
    ])
    def test_bearing_accuracy(self, scale_deg, tol_deg):
        lat1, lon1 = _map_points(30)
        lat2 = lat1 + RNG.uniform(-scale_deg, scale_deg, 30)
        lon2 = lon1 + RNG.uniform(-scale_deg, scale_deg, 30)
        b_ours = geo.geodetic_bearing_deg(jnp.array(lat1), jnp.array(lon1),
                                          jnp.array(lat2), jnp.array(lon2))
        for i in range(30):
            s, az = vincenty_inverse(lat1[i], lon1[i], lat2[i], lon2[i])
            if s > 100.0:
                diff = abs(float(b_ours[i]) - az)
                diff = min(diff, 360 - diff)
                assert diff < tol_deg

    def test_roundtrip(self):
        """direct then inverse recovers distance and bearing."""
        lat0, lon0, az, d = 5.3, 7.2, 123.0, 50_000.0
        lat1, lon1 = geo.geodetic_direct(lat0, lon0, az, d)
        d_back = geo.geodetic_distance_km(lat0, lon0, lat1, lon1)
        b_back = geo.geodetic_bearing_deg(lat0, lon0, lat1, lon1)
        assert abs(float(d_back) * 1000 - d) / d < 1e-5
        assert abs(float(b_back) - az) < 0.01


class TestAngles:
    def test_signed_heading_diff_matches_reference(self):
        """Property-check against the reference algorithm (angles.py:22-29)."""
        def ref(actual, desired):
            delta = desired - actual
            if delta < -180:
                delta = 360 + delta
            if delta > 180:
                delta = -360 + delta
            return delta

        h = RNG.uniform(0, 360, 200)
        t = RNG.uniform(0, 360, 200)
        ours = geo.signed_heading_diff(jnp.array(h), jnp.array(t))
        for i in range(200):
            assert abs(float(ours[i]) - ref(h[i], t[i])) < 1e-4

    def test_endpoints(self):
        assert float(geo.signed_heading_diff(0.0, 180.0)) == 180.0
        assert float(geo.signed_heading_diff(180.0, 0.0)) == -180.0
        assert float(geo.signed_heading_diff(350.0, 10.0)) == 20.0
        assert float(geo.signed_heading_diff(10.0, 350.0)) == -20.0

    def test_sum_angles(self):
        assert float(geo.sum_angles(350.0, 20.0)) == 10.0
        assert float(geo.normalize_angle(-10.0)) == 350.0


class TestMapLimits:
    """MapLimits works in anchor-offset coordinates (absolute - (5, 7))."""

    def test_relative_position(self):
        ml = geo.make_map_limits(0.3)
        lat_rel, lon_rel = ml.relative_position(0.15, 0.15)
        assert abs(float(lat_rel) - 0.5) < 1e-6
        assert abs(float(lon_rel) - 0.5) < 1e-6
        # clipping
        lat_rel, lon_rel = ml.relative_position(-1.0, 1.0)
        assert float(lat_rel) == 0.0 and float(lon_rel) == 1.0

    def test_in_boundary(self):
        ml = geo.make_map_limits(0.3)
        assert bool(ml.in_boundary(0.1, 0.1))
        assert not bool(ml.in_boundary(0.31, 0.1))
        assert not bool(ml.in_boundary(0.1, -0.01))
        # closed boundary (map_limits.py:48 uses <=)
        assert bool(ml.in_boundary(0.0, 0.0))
        assert bool(ml.in_boundary(0.3, 0.3))
