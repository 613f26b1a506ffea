"""Solid-earth tide displacement for precise positioning.

Functional counterpart of the reference's tide model
(/root/reference/src/algorithms/libs/rtklib/rtklib_tides.cc:39-151
``tide_pl``/``tide_solid``/``tidedisp`` and the low-precision solar/lunar
ephemerides of rtklib_rtkcmn ``sunmoonpos``): degree-2 + degree-3
Love/Shida displacement of the receiver due to the Sun and Moon, the
dominant centimeter-to-decimeter term a PPP estimator must model
(IERS Conventions ch. 7, dehanttideinel step 1 in-phase terms).

Ocean loading and pole tides (tide_oload/tide_pole) are mm-level and
site-dependent (need a BLQ table / ERP series); they are intentionally
out of scope, like running the reference without those input files.
"""

from __future__ import annotations

import math

import numpy as np

from gnss_sdr_tpu.pvt import geodesy

AU_M = 149_597_870_691.0
#: degree-2 Love/Shida numbers (IERS conventional values used by the
#: reference, rtklib_tides.cc:48)
H2, L2 = 0.6078, 0.0847
H3, L3 = 0.292, 0.015
GME = 3.986004415e14       # m^3/s^2
GMS = 1.327124e20
GMM = 4.902801e12
RE = 6_378_137.0

#: GPS epoch (1980-01-06 00:00:00 UTC) as a Julian date
_JD_GPS_EPOCH = 2_444_244.5


def _gmst_rad(t_gps_s: float) -> float:
    """Greenwich mean sidereal time for a GPS-time instant (seconds
    since the GPS epoch), IAU 1982 series — precise to ~0.1 arcsec,
    far beyond tidal needs (leap seconds shift the argument by <40 s of
    solar time: micrometers of tide)."""
    jd = _JD_GPS_EPOCH + t_gps_s / 86400.0
    t_u = (jd - 2_451_545.0) / 36_525.0
    gmst_s = (67310.54841 + (876600.0 * 3600.0 + 8640184.812866) * t_u
              + 0.093104 * t_u * t_u - 6.2e-6 * t_u ** 3)
    return (gmst_s % 86400.0) / 86400.0 * 2.0 * math.pi


def sun_moon_pos(t_gps_s: float) -> tuple[np.ndarray, np.ndarray]:
    """Low-precision Sun and Moon ECEF positions [m] (Astronomical
    Almanac series, the same truncation class as rtklib's sunmoonpos)."""
    jd = _JD_GPS_EPOCH + t_gps_s / 86400.0
    t = (jd - 2_451_545.0) / 36_525.0
    d2r = math.pi / 180.0
    eps = (23.43929111 - 0.0130042 * t) * d2r

    # --- Sun (mean elements, ecliptic) -------------------------------
    ms = (357.5277233 + 35999.05034 * t) * d2r
    ls = (280.460 + 36000.770 * t
          + 1.914666471 * math.sin(ms) + 0.019994643 * math.sin(2 * ms)) * d2r
    rs = AU_M * (1.000140612 - 0.016708617 * math.cos(ms)
                 - 0.000139589 * math.cos(2 * ms))
    sun_eci = rs * np.array([
        math.cos(ls),
        math.cos(eps) * math.sin(ls),
        math.sin(eps) * math.sin(ls)])

    # --- Moon (truncated ELP series) ---------------------------------
    lm = (218.32 + 481267.883 * t
          + 6.29 * math.sin((134.9 + 477198.85 * t) * d2r)
          - 1.27 * math.sin((259.2 - 413335.38 * t) * d2r)
          + 0.66 * math.sin((235.7 + 890534.23 * t) * d2r)
          + 0.21 * math.sin((269.9 + 954397.70 * t) * d2r)
          - 0.19 * math.sin((357.5 + 35999.05 * t) * d2r)
          - 0.11 * math.sin((186.6 + 966404.05 * t) * d2r)) * d2r
    pm = (5.13 * math.sin((93.3 + 483202.03 * t) * d2r)
          + 0.28 * math.sin((228.2 + 960400.87 * t) * d2r)
          - 0.28 * math.sin((318.3 + 6003.18 * t) * d2r)
          - 0.17 * math.sin((217.6 - 407332.20 * t) * d2r)) * d2r
    rm = RE / math.sin((0.9508
                        + 0.0518 * math.cos((134.9 + 477198.85 * t) * d2r)
                        + 0.0095 * math.cos((259.2 - 413335.38 * t) * d2r)
                        + 0.0078 * math.cos((235.7 + 890534.23 * t) * d2r)
                        + 0.0028 * math.cos((269.9 + 954397.70 * t) * d2r))
                       * d2r)
    moon_eci = rm * np.array([
        math.cos(pm) * math.cos(lm),
        math.cos(eps) * math.cos(pm) * math.sin(lm)
        - math.sin(eps) * math.sin(pm),
        math.sin(eps) * math.cos(pm) * math.sin(lm)
        + math.cos(eps) * math.sin(pm)])

    # ECI (true-of-date, ignoring polar motion) -> ECEF via GMST spin
    g = _gmst_rad(t_gps_s)
    rot = np.array([[math.cos(g), math.sin(g), 0.0],
                    [-math.sin(g), math.cos(g), 0.0],
                    [0.0, 0.0, 1.0]])
    return rot @ sun_eci, rot @ moon_eci


def _tide_body(rx_unit: np.ndarray, rx_norm: float, body_pos: np.ndarray,
               gm_body: float) -> np.ndarray:
    """Degree-2 + degree-3 displacement from one perturbing body
    (rtklib tide_pl, rtklib_tides.cc:39-103)."""
    rp = float(np.linalg.norm(body_pos))
    bu = body_pos / rp
    k2 = gm_body / GME * rx_norm ** 4 / rp ** 3
    k3 = k2 * rx_norm / rp
    dot = float(np.dot(rx_unit, bu))
    # degree 2
    p2 = 1.5 * dot * dot - 0.5
    dp2 = 3.0 * dot
    # degree 3
    p3 = 2.5 * dot ** 3 - 1.5 * dot
    dp3 = 7.5 * dot * dot - 1.5
    radial = k2 * H2 * p2 + k3 * H3 * p3
    trans = k2 * 3.0 * L2 * dot + k3 * L3 * dp3
    # transverse direction: component of the body unit vector normal to up
    return radial * rx_unit + trans * (bu - dot * rx_unit)


def tide_solid(rsun: np.ndarray, rmoon: np.ndarray,
               rr: np.ndarray) -> np.ndarray:
    """Solid-tide ECEF displacement [m] at receiver ``rr``
    (rtklib tide_solid, rtklib_tides.cc:106-148, without the K1
    frequency-domain correction term: <1.3 cm vertical)."""
    rx_norm = float(np.linalg.norm(rr))
    rx_unit = np.asarray(rr, dtype=float) / rx_norm
    return (_tide_body(rx_unit, rx_norm, np.asarray(rsun, float), GMS)
            + _tide_body(rx_unit, rx_norm, np.asarray(rmoon, float), GMM))


def tidedisp(t_gps_s: float, rr: np.ndarray) -> np.ndarray:
    """Total modeled tide displacement (ECEF, m) — the tidedisp role
    (rtklib_tides.cc:298-337) with solid tides only."""
    rsun, rmoon = sun_moon_pos(t_gps_s)
    return tide_solid(rsun, rmoon, rr)


def tide_enu(t_gps_s: float, rr: np.ndarray) -> np.ndarray:
    """Displacement expressed in the local East/North/Up frame."""
    lat, lon, _ = geodesy.ecef_to_geodetic(rr)
    return geodesy.ecef_to_enu(tidedisp(t_gps_s, rr), lat, lon)
