"""PPP float solution + IONEX TEC maps + solid-earth tides
(rtklib_ppp.cc / rtklib_ionex.cc / rtklib_tides.cc roles).

The PPP convergence oracle is a synthetic dual-frequency observation set
with meter-scale iono, decimeter tropo wet delay, centimeter tides, a
drifting receiver clock and integer carrier ambiguities: the float EKF
must recover the receiver position to sub-3-dm horizontal with precise
products, while the broadcast single-point solution sits at meters.
"""

import math

import numpy as np
import pytest

from gnss_sdr_tpu.constants.general import SPEED_OF_LIGHT_M_S as C
from gnss_sdr_tpu.pvt import geodesy
from gnss_sdr_tpu.pvt.ionex import IonexTec, parse_ionex, write_ionex
from gnss_sdr_tpu.pvt.ppp import (F_L1, F_L2, PppConfig, PppEngine,
                                  PppObservation, iono_free)
from gnss_sdr_tpu.pvt.solver import _geodist
from gnss_sdr_tpu.pvt.tides import sun_moon_pos, tide_enu, tidedisp
from gnss_sdr_tpu.simulate.scenario import (make_constellation, rx_position,
                                            visible_sats)


# --------------------------------------------------------------------------
# tides
# --------------------------------------------------------------------------

def test_sun_moon_positions_sane():
    """Distances and ecliptic geometry at the right order of magnitude
    (rtkcmn sunmoonpos class of accuracy)."""
    t = 820_000_000.0   # ~2006, arbitrary
    rsun, rmoon = sun_moon_pos(t)
    assert 1.45e11 < np.linalg.norm(rsun) < 1.56e11
    assert 3.5e8 < np.linalg.norm(rmoon) < 4.1e8


def test_solid_tide_magnitude_and_period():
    """Solid tide displacement is decimeter-class, mostly radial, and
    varies over a half-day (the M2/S2 semi-diurnal signature)."""
    rx = rx_position()
    t0 = 820_000_000.0
    mags = []
    ups = []
    for k in range(49):
        t = t0 + k * 1800.0     # 24 h at 30 min
        d = tidedisp(t, rx)
        e = tide_enu(t, rx)
        mags.append(np.linalg.norm(d))
        ups.append(e[2])
    mags = np.asarray(mags)
    ups = np.asarray(ups)
    assert mags.max() < 0.6, "solid tide should stay sub-60 cm"
    assert mags.max() > 0.03, "solid tide should exceed 3 cm at peak"
    # vertical dominates: the up component carries most of the signal
    assert np.abs(ups).max() > 0.6 * mags.max()
    # semi-diurnal variation: the displacement changes substantially
    # within the day
    assert (mags.max() - mags.min()) > 0.02


def test_tide_toward_body_uplift():
    """With the perturbing body at local zenith the degree-2 term lifts
    the crust toward it (P2(1)=1, positive h2)."""
    from gnss_sdr_tpu.pvt.tides import GMM, tide_solid

    rx = np.array([6_378_137.0, 0.0, 0.0])
    moon = np.array([3.844e8, 0.0, 0.0])
    sun_far = np.array([0.0, 1.5e11, 0.0])   # sun at horizon: no uplift
    d = tide_solid(sun_far, moon, rx)
    assert d[0] > 0.0, "sub-lunar point must rise toward the moon"


# --------------------------------------------------------------------------
# IONEX
# --------------------------------------------------------------------------

def _synthetic_tec(lat_deg, lon_deg):
    return 20.0 + 15.0 * math.cos(math.radians(lat_deg)) \
        * math.cos(math.radians(lon_deg - 10.0))


def test_ionex_roundtrip_and_interpolation(tmp_path):
    lats = np.arange(87.5, -87.6, -2.5)
    lons = np.arange(-180.0, 180.1, 5.0)
    epochs = np.array([500_000_000.0, 500_007_200.0])
    tec = np.zeros((2, len(lats), len(lons)))
    for i, la in enumerate(lats):
        for j, lo in enumerate(lons):
            tec[0, i, j] = _synthetic_tec(la, lo)
            tec[1, i, j] = _synthetic_tec(la, lo) + 3.0
    src = IonexTec(epochs_s=epochs, lats_deg=lats, lons_deg=lons,
                   height_km=450.0, tec=tec)
    path = tmp_path / "maps.ionex"
    write_ionex(src, path)
    back = parse_ionex(path.read_text())
    assert back.height_km == 450.0
    assert len(back.epochs_s) == 2
    np.testing.assert_allclose(back.epochs_s, epochs, atol=1.0)
    np.testing.assert_allclose(back.tec, tec, atol=0.051)
    # grid-point interpolation at the first epoch reproduces the field
    v = back.vtec(float(epochs[0]), 40.0, 10.0)
    assert abs(v - _synthetic_tec(40.0, 10.0)) < 0.5
    # temporal midpoint: between the two maps (sun-fixed rotation moves
    # the sampled longitude, so allow the field's local slope)
    vm = back.vtec(float(epochs.mean()), 40.0, 10.0)
    assert _synthetic_tec(40.0, 40.0) - 1.0 < vm \
        < _synthetic_tec(40.0, -20.0) + 4.0
    # slant delay: positive, grows toward the horizon
    d_zen = back.slant_delay_m(float(epochs[0]), (0.7, 0.17, 100.0),
                               0.0, math.radians(85.0), F_L1)
    d_low = back.slant_delay_m(float(epochs[0]), (0.7, 0.17, 100.0),
                               0.0, math.radians(15.0), F_L1)
    assert 0.5 < d_zen < 15.0
    assert d_low > 1.8 * d_zen


# --------------------------------------------------------------------------
# PPP
# --------------------------------------------------------------------------

def _make_obs(ephs, prns, rx_truth, t, clk_s, zwd, rng,
              single_freq=False, tec_fn=None):
    """Synthesize one epoch of dual-frequency code+carrier."""
    from gnss_sdr_tpu.pvt import atmosphere
    from gnss_sdr_tpu.pvt.tides import tidedisp

    rx_t = rx_truth + tidedisp(t, rx_truth)
    lat, lon, hgt = geodesy.ecef_to_geodetic(rx_t)
    out = []
    for prn, (n1, n2) in prns.items():
        eph = ephs[prn]
        # light-time iteration on the truth geometry; the epoch label t
        # is RECEIVER time, so true reception is t - clk (the t - p/c
        # transmit-time convention then holds at the consumer side)
        rho = 2.0e7
        for _ in range(4):
            t_tx = t - clk_s - rho / C
            dts = eph.clock_bias_s(t_tx)
            sat = np.asarray(eph.sat_pos(t_tx - dts))
            rho, _ = _geodist(sat, rx_t)
        _az, el = geodesy.azimuth_elevation(rx_t, sat)
        if el < math.radians(8.0):
            continue
        m_w = 1.0 / max(math.sin(el), 0.05)
        trop = atmosphere.saastamoinen_delay(lat, hgt, el, humidity=0.0) \
            + zwd * m_w
        stec = tec_fn(t, el) if tec_fn else 40.0 / max(math.sin(el), 0.3)
        i1 = 40.3e16 * stec / (F_L1 * F_L1)
        i2 = 40.3e16 * stec / (F_L2 * F_L2)
        common = rho + C * clk_s - C * dts + trop
        p1 = common + i1 + rng.normal(0.0, 0.3)
        p2 = common + i2 + rng.normal(0.0, 0.3)
        l1 = (common - i1 + rng.normal(0.0, 0.002)) / (C / F_L1) + n1
        l2 = (common - i2 + rng.normal(0.0, 0.002)) / (C / F_L2) + n2
        if single_freq:
            out.append(PppObservation(prn=prn, eph=eph, p1_m=p1,
                                      l1_cycles=l1))
        else:
            out.append(PppObservation(prn=prn, eph=eph, p1_m=p1,
                                      l1_cycles=l1, p2_m=p2,
                                      l2_cycles=l2))
    return out


@pytest.fixture(scope="module")
def ppp_scenario():
    rx = rx_position()
    toe = 7200.0
    t0 = 7800.0
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t0 + 900.0)[:7]
    rng = np.random.default_rng(4)
    ambs = {p: (int(rng.integers(-5_000_000, 5_000_000)),
                int(rng.integers(-5_000_000, 5_000_000))) for p in prns}
    return dict(rx=rx, ephs=ephs, ambs=ambs, t0=t0)


def test_ppp_float_convergence_precise(ppp_scenario):
    """Static PPP with exact orbits converges to <0.3 m horizontal
    (the reference pppos float solution class), while a broadcast
    single-point snapshot with meter-level ephemeris errors cannot."""
    sc = ppp_scenario
    rx, ephs, ambs, t0 = sc["rx"], sc["ephs"], sc["ambs"], sc["t0"]
    rng = np.random.default_rng(11)
    eng = PppEngine(PppConfig())
    zwd_truth = 0.18
    clk = 2.3e-4
    sol = None
    for k in range(160):
        t = t0 + 30.0 * k
        clk_t = clk + 1e-9 * 30.0 * k
        obs = _make_obs(ephs, ambs, rx, t, clk_t, zwd_truth, rng)
        assert len(obs) >= 5
        sol = eng.process_epoch(t, obs)
    assert sol is not None and sol.valid
    # every code AND carrier row survives innovation screening: the
    # phase observables drive the filter (ambiguities seeded from
    # code-minus-carrier, udbias_ppp role)
    assert len(sol.residuals_m) == 2 * sol.n_sats
    enu = geodesy.ecef_to_enu(sol.pos_ecef - rx,
                              *geodesy.ecef_to_geodetic(rx)[:2])
    horiz = float(np.hypot(enu[0], enu[1]))
    assert horiz < 0.3, f"horizontal error {horiz:.3f} m"
    # vertical rides the classic ZTD/height correlation (5-sat geometry,
    # limited elevation spread): meter-class until the geometry turns
    assert abs(enu[2]) < 1.2, f"vertical error {enu[2]:.3f} m"
    assert abs(sol.zwd_m) < 0.5, sol.zwd_m


def test_ppp_beats_broadcast_single_point(ppp_scenario):
    """Meter-scale broadcast orbit/clock errors leave single-point at
    >0.8 m while PPP with precise products is sub-0.3 m (the value of
    the precise-products pipeline, SURVEY PPP row)."""
    import dataclasses as dc

    from gnss_sdr_tpu.pvt.solver import Observation, solve_pvt

    sc = ppp_scenario
    rx, ephs, ambs, t0 = sc["rx"], sc["ephs"], sc["ambs"], sc["t0"]
    rng = np.random.default_rng(12)
    # broadcast = truth orbits with meter-level radial/clock errors
    bad = {p: dc.replace(e, af0=e.af0 + 8e-9, sqrt_a=e.sqrt_a + 2e-4)
           for p, e in ephs.items()}
    t = t0 + 1800.0
    obs = _make_obs(ephs, ambs, rx, t, 2.3e-4, 0.18, rng)
    sp = solve_pvt([Observation(prn=o.prn,
                                pseudorange_m=iono_free(
                                    o.p1_m, o.p2_m, o.f1_hz, o.f2_hz),
                                eph=bad[o.prn]) for o in obs],
                   t, apply_tropo=True)
    assert sp.valid
    err_sp = float(np.linalg.norm(sp.pos_ecef - rx))
    assert err_sp > 0.8, f"broadcast error unexpectedly small: {err_sp}"


def test_ppp_single_frequency_with_ionex(ppp_scenario):
    """Single-frequency PPP leaning on an IONEX TEC map for the iono
    term (corr_ion :1059-1097): decimeter-class instead of diverging."""
    sc = ppp_scenario
    rx, ephs, ambs, t0 = sc["rx"], sc["ephs"], sc["ambs"], sc["t0"]
    rng = np.random.default_rng(13)
    # a TEC field constant in space, matching the generated truth form
    lats = np.arange(87.5, -87.6, -2.5)
    lons = np.arange(-180.0, 180.1, 5.0)
    vt = 40.0
    tec = np.full((2, len(lats), len(lons)), vt)
    tec_map = IonexTec(
        epochs_s=np.array([t0 - 3600.0, t0 + 86400.0]),
        lats_deg=lats, lons_deg=lons, height_km=450.0, tec=tec)

    def tec_fn(t, el):
        # truth slant TEC == the map's single-layer obliquity so the
        # model error is purely the filter's to absorb
        sinz = 6_371_000.0 / (6_371_000.0 + 450_000.0) * math.cos(el)
        return vt / math.cos(math.asin(sinz))

    eng = PppEngine(PppConfig(tec=tec_map))
    sol = None
    for k in range(160):
        t = t0 + 30.0 * k
        obs = _make_obs(ephs, ambs, rx, t, 2.3e-4, 0.18, rng,
                        single_freq=True, tec_fn=tec_fn)
        sol = eng.process_epoch(t, obs)
    assert sol is not None and sol.valid
    err = float(np.linalg.norm(sol.pos_ecef - rx))
    assert err < 0.8, f"single-frequency PPP error {err:.3f} m"


# --------------------------------------------------------------------------
# receiver-level reachability (PVT.positioning_mode=PPP_Static)
# --------------------------------------------------------------------------

def test_receiver_ppp_mode_over_scene():
    """The PPP estimator is reachable from the receiver config surface:
    ``PVT.positioning_mode=PPP_Static`` routes observable epochs through
    the float EKF (carrier-phase rows included), producing fixes of at
    least single-point quality on a short capture (convergence to
    decimeters needs minutes; this certifies the plumbing and the
    carrier-phase sign convention)."""
    from gnss_sdr_tpu.receiver.multiband import (BandConfig,
                                                 MultiBandConfig,
                                                 MultiBandReceiver)
    from gnss_sdr_tpu.simulate.rf_scene import generate_scene

    fs = 2.5e6
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 4.5
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:5]
    x = generate_scene(ephs, prns, rx, t_start, 8.4, fs,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=31)
    rec = MultiBandReceiver(
        MultiBandConfig(fs=fs, output_rate_ms=200,
                        positioning_mode="PPP_Static"),
        bands=[BandConfig(suffix="1C", satellites=list(prns), n_channels=5,
                          pull_in_time_s=0.4)],
        assisted_ephemeris={("G", p): ephs[p] for p in prns})
    sols = rec.run(x)
    assert rec._ppp is not None, "PPP engine never engaged"
    assert len(sols) >= 3, f"got {len(sols)} PPP fixes"
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols[1:]]
    assert float(np.mean(errs)) < 8.0, f"mean err {np.mean(errs)}"
    # carrier rows survive innovation screening: the phase convention
    # feeds the filter, it doesn't fight it
    last = rec._ppp.solutions[-1]
    assert len(last.residuals_m) >= int(1.5 * last.n_sats), (
        len(last.residuals_m), last.n_sats)
