"""PVT solver tests on synthetic geometry (rtklib_pntpos.cc scope)."""

import math

import numpy as np

from gnss_sdr_tpu.pvt import GpsEphemeris, solve_pvt
from gnss_sdr_tpu.pvt.geodesy import (
    azimuth_elevation,
    ecef_to_geodetic,
    geodetic_to_ecef,
)
from gnss_sdr_tpu.pvt.solver import Observation
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    true_range_and_rate,
    visible_sats,
)

C = 299_792_458.0


def test_geodetic_roundtrip():
    lat, lon, h = math.radians(41.27), math.radians(1.99), 120.0
    xyz = geodetic_to_ecef(lat, lon, h)
    lat2, lon2, h2 = ecef_to_geodetic(xyz)
    assert abs(lat - lat2) < 1e-11 and abs(lon - lon2) < 1e-11
    assert abs(h - h2) < 1e-4


def test_ephemeris_orbit_radius():
    eph = GpsEphemeris(sqrt_a=5153.7, ecc=0.01, m0_rad=0.5, toe_s=7200.0)
    pos = np.array(eph.sat_pos(7200.0))
    r = np.linalg.norm(pos)
    a = 5153.7**2
    assert a * (1 - 0.011) < r < a * (1 + 0.011)
    # inertial speed ~3.9 km/s; in ECEF the earth-rotation term
    # (~1.9 km/s at orbit radius) makes it geometry-dependent
    vel = np.array(eph.sat_vel(7200.0))
    assert 1900.0 < np.linalg.norm(vel) < 6000.0


def _make_obs(ephs, prns, rx, t_rx, rx_clock_bias_s=0.0, noise_sigma=0.0,
              seed=0, with_doppler=False):
    rng = np.random.default_rng(seed)
    obs = []
    for prn in prns:
        eph = ephs[prn]
        rho, rate, t_tx = true_range_and_rate(eph, rx, t_rx)
        dts = eph.clock_bias_s(t_tx) - eph.tgd_s
        pr = rho + C * (rx_clock_bias_s - dts)
        if noise_sigma > 0:
            pr += rng.normal(0.0, noise_sigma)
        doppler = None
        if with_doppler:
            # static receiver: Doppler = -range_rate/lambda (f_d>0 closing)
            doppler = -rate / (C / 1575.42e6)
        obs.append(Observation(prn=prn, pseudorange_m=pr, eph=eph,
                               doppler_hz=doppler))
    return obs


def test_pvt_exact_recovery():
    t_rx = 7200.0 + 100.0
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=7200.0)
    prns = visible_sats(ephs, rx, t_rx)[:8]
    assert len(prns) >= 5, f"need >=5 visible sats, got {len(prns)}"
    # t_tx is derived from the raw pseudorange (rtklib pntpos style), so a
    # large receiver clock bias leaks ~(bias * sat velocity) into satellite
    # positions; with a steered clock (us-level) the effect is mm.
    obs = _make_obs(ephs, prns, rx, t_rx, rx_clock_bias_s=2.0e-6,
                    with_doppler=True)
    sol = solve_pvt(obs, t_rx, apply_tropo=False)
    assert sol.valid
    err = np.linalg.norm(sol.pos_ecef - rx)
    assert err < 0.1, f"position error {err} m"
    assert abs(sol.clock_bias_s - 2.0e-6) < 1e-9
    assert sol.pdop > 0 and sol.gdop >= sol.pdop
    # static receiver: velocity ~ 0
    assert sol.vel_ecef is not None
    assert np.linalg.norm(sol.vel_ecef) < 0.1


def test_pvt_with_noise_meets_reference_bounds():
    # reference system-test bounds: 2D < 2 m, 3D < 5 m on simulated signal
    # (position_test_flags.h:31-34) -- here with 1 m UERE noise
    t_rx = 7200.0 + 300.0
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=7200.0)
    prns = visible_sats(ephs, rx, t_rx)[:8]
    errs = []
    for trial in range(5):
        obs = _make_obs(ephs, prns, rx, t_rx, rx_clock_bias_s=2e-5,
                        noise_sigma=1.0, seed=trial)
        sol = solve_pvt(obs, t_rx, apply_tropo=False)
        assert sol.valid
        errs.append(np.linalg.norm(sol.pos_ecef - rx))
    assert np.mean(errs) < 5.0


def test_pvt_insufficient_sats():
    t_rx = 7200.0
    rx = rx_position()
    ephs = make_constellation(range(1, 5), toe_s=7200.0)
    prns = visible_sats(ephs, rx, t_rx)[:3]
    obs = _make_obs(ephs, prns, rx, t_rx)
    assert not solve_pvt(obs, t_rx).valid


def test_visible_sats_elevations():
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=7200.0)
    vis = visible_sats(ephs, rx, 7200.0)
    for prn in vis:
        _, el = azimuth_elevation(rx, np.array(ephs[prn].sat_pos(7200.0)))
        assert math.degrees(el) >= 7.0
