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


def test_mixed_gps_glonass_solution():
    """GPS + GLONASS observables with an inter-system time offset
    (rtklib pntpos GLO ISB state counterpart)."""
    import numpy as np
    from gnss_sdr_tpu.pvt.solver import Observation, solve_pvt
    from gnss_sdr_tpu.pvt.glonass_ephemeris import GlonassEphemeris
    from tests.test_rtk import _constellation

    C = 299792458.0
    rx_true = np.array([4_424_000.0, 558_000.0, 4_572_000.0])
    clk_bias_m = 4500.0
    glo_isb_m = 120.0          # GPS-GLONASS time-scale offset
    t_rx = 36000.0
    sats = _constellation(seed=9, n_sats=9)
    OMEGA_E = 7.2921151467e-5
    obs = []
    for i, (prn, sp) in enumerate(sats.items()):
        sp = np.asarray(sp)
        # geometric range incl. the Sagnac term the solver models
        rho = np.linalg.norm(sp - rx_true) + OMEGA_E * (
            sp[0] * rx_true[1] - sp[1] * rx_true[0]) / C
        if i < 5:
            # GPS-like: static Kepler-free truth via a frozen ephemeris
            from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris

            class _Fixed(GpsEphemeris):
                def __init__(self, pos):
                    super().__init__(prn=prn)
                    self._pos = tuple(pos)

                def clock_bias_s(self, t):
                    return 0.0

                def sat_pos(self, t):
                    return self._pos

            obs.append(Observation(prn=prn, pseudorange_m=rho + clk_bias_m,
                                   eph=_Fixed(sp), system="G"))
        else:
            eph = GlonassEphemeris(slot=prn, tb_s=t_rx, pos_m=tuple(sp))
            obs.append(Observation(
                prn=prn, pseudorange_m=rho + clk_bias_m + glo_isb_m,
                eph=eph, system="R", carrier_hz=1602.0e6))
    sol = solve_pvt(obs, t_rx, apply_tropo=False)
    assert sol.valid
    np.testing.assert_allclose(sol.pos_ecef, rx_true, atol=0.5)
    np.testing.assert_allclose(sol.clock_bias_s * C, clk_bias_m, atol=0.5)
