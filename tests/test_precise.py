"""SP3 precise ephemeris: reader + polynomial evaluation
(rtklib_preceph.cc roles) as a drop-in solver ephemeris source."""

import numpy as np

from gnss_sdr_tpu.pvt.precise import (
    PreciseEphemeris,
    parse_sp3,
    sp3_from_ephemerides,
)
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)


def test_sp3_roundtrip_cm_level():
    """Sampling a Kepler orbit on the 15-min SP3 grid and evaluating by
    Neville interpolation reproduces the orbit at cm level between
    epochs (the broadcast-vs-precise agreement bound the reference's
    system tests rely on)."""
    ephs = make_constellation(range(1, 7), toe_s=7200.0)
    t0 = 3600.0
    text = sp3_from_ephemerides(ephs, t0, 4.0 * 3600.0)
    pre = parse_sp3(text)
    assert set(pre) == {("G", p) for p in range(1, 7)}
    rng = np.random.default_rng(3)
    worst = 0.0
    for p in range(1, 7):
        pe = pre[("G", p)]
        assert isinstance(pe, PreciseEphemeris)
        for t in t0 + 1800.0 + rng.uniform(0, 2.0 * 3600.0, 8):
            truth = np.asarray(ephs[p].sat_pos(t))
            got = np.asarray(pe.sat_pos(t))
            worst = max(worst, float(np.linalg.norm(got - truth)))
            # clock: linear between 15-min samples of an af0+af1 model is
            # exact up to quantization
            assert abs(pe.clock_bias_s(t)
                       - ephs[p].clock_bias_s(t)) < 2e-11
    assert worst < 0.05, f"worst interp error {worst} m"


def test_precise_ephemeris_drives_solver():
    """solve_pvt accepts PreciseEphemeris rows and reproduces the
    broadcast-ephemeris fix (the rtklib peph2pos -> satposs path)."""
    from gnss_sdr_tpu.constants.general import SPEED_OF_LIGHT_M_S as C
    from gnss_sdr_tpu.pvt.solver import Observation, solve_pvt
    from gnss_sdr_tpu.simulate.scenario import true_range_and_rate

    toe = 7200.0
    t = toe + 1800.0
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t)[:6]
    pre = parse_sp3(sp3_from_ephemerides(
        {p: ephs[p] for p in prns}, toe, 3600.0 + 1800.0))
    obs = []
    for p in prns:
        rho, _, _ = true_range_and_rate(ephs[p], rx, t)
        # precise clocks are defined for the ionosphere-free combination
        # (no broadcast TGD in play, rtklib satposs EPHOPT_PREC path)
        dts = ephs[p].clock_bias_s(t - rho / C)
        obs.append(Observation(prn=p, pseudorange_m=rho - C * dts,
                               eph=pre[("G", p)]))
    sol = solve_pvt(obs, t, apply_tropo=False)
    assert sol.valid
    err = np.linalg.norm(sol.pos_ecef - rx)
    assert err < 0.1, f"precise-eph fix error {err} m"
