"""Shims that make the reference at /root/reference importable here.

The reference depends on four packages missing from this image:
geographiclib (exact WGS84 geodesics), ray (only for the MultiAgentEnv
base class), pycairo and cartopy (rendering).  ``install()`` registers
stand-ins in ``sys.modules`` so the *real* reference simulator and env
math can be imported and run side-by-side with the JAX framework in the
differential parity tests (tests/test_parity_reference.py):

 * ``geographiclib.geodesic.Geodesic`` is backed by an independent pure
   numpy Vincenty implementation (also the golden reference of
   tests/test_geo.py).  Vincenty agrees with Karney's algorithm to
   sub-millimeter at the <= 120 km ranges this simulator uses.
 * ``ray.rllib.env.multi_agent_env.MultiAgentEnv`` is a plain base class.
 * ``warsim.scenplotter.scenario_plotter`` is replaced by inert stubs
   (the parity tests never render).

Nothing here is imported by the framework itself.
"""

from __future__ import annotations

import sys
import types

import numpy as np

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


REF_ROOT = "/root/reference"


class _Geodesic:
    """geographiclib.geodesic.Geodesic facade over Vincenty."""

    # outmask constants (values are irrelevant; the shim always computes
    # all fields the reference reads)
    DISTANCE = 1 << 0
    AZIMUTH = 1 << 1
    LATITUDE = 1 << 2
    LONGITUDE = 1 << 3

    def Inverse(self, lat1, lon1, lat2, lon2, outmask=None):
        s, az = vincenty_inverse(float(lat1), float(lon1),
                                 float(lat2), float(lon2))
        return {"s12": s, "azi1": az}

    def Direct(self, lat1, lon1, azi1, s12, outmask=None):
        lat2, lon2 = vincenty_direct(float(lat1), float(lon1),
                                     float(azi1), float(s12))
        return {"lat2": lat2, "lon2": lon2}


_Geodesic.WGS84 = _Geodesic()


class _StubDrawable:
    def __init__(self, *args, **kwargs):
        pass


class _StubColor:
    def __init__(self, *args, **kwargs):
        pass


def install():
    """Register the shims and put the reference on sys.path (idempotent)."""
    if "geographiclib" not in sys.modules:
        pkg = types.ModuleType("geographiclib")
        geod = types.ModuleType("geographiclib.geodesic")
        geod.Geodesic = _Geodesic
        pkg.geodesic = geod
        sys.modules["geographiclib"] = pkg
        sys.modules["geographiclib.geodesic"] = geod

    if "ray" not in sys.modules:
        class MultiAgentEnv:
            def __init__(self, *a, **kw):
                pass

        mods = {}
        for name in ("ray", "ray.rllib", "ray.rllib.env",
                     "ray.rllib.env.multi_agent_env"):
            mods[name] = types.ModuleType(name)
        mods["ray.rllib.env.multi_agent_env"].MultiAgentEnv = MultiAgentEnv
        mods["ray"].rllib = mods["ray.rllib"]
        mods["ray.rllib"].env = mods["ray.rllib.env"]
        mods["ray.rllib.env"].multi_agent_env = \
            mods["ray.rllib.env.multi_agent_env"]
        sys.modules.update(mods)

    if "warsim.scenplotter.scenario_plotter" not in sys.modules:
        sp = types.ModuleType("warsim.scenplotter.scenario_plotter")
        for cls in ("PlotConfig", "StatusMessage", "TopLeftMessage",
                    "Airplane", "PolyLine", "Drawable", "Waypoint",
                    "Missile", "ScenarioPlotter", "Rect", "Arc",
                    "SamBattery", "BackgroundMesh"):
            setattr(sp, cls, type(cls, (_StubDrawable,), {}))
        sp.ColorRGBA = _StubColor
        sys.modules["warsim.scenplotter.scenario_plotter"] = sp

    # /root/reference for `envs.*` / `warsim.*` (namespace packages);
    # /root/reference/warsim for the reference's internal `simulator.*` /
    # `utils.*` imports (its own files sys.path-hack this at runtime too)
    for p in (REF_ROOT, REF_ROOT + "/warsim"):
        if p not in sys.path:
            sys.path.append(p)
