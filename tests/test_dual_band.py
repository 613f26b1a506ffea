"""Dual-band GPS L1 C/A + L5 receiver system test (BASELINE config 5).

The L5 band runs at its own front-end rate (12 Msps vs 2.5 Msps for L1 —
the reference's per-RF-channel SignalSource.RF_channels concept,
gnss_flowgraph.cc:1007-1117). Tracking on L5 is pilot-based (L5Q code,
NH20 secondary) with a separate data-component prompt correlator feeding
the CNAV layer (dll_pll_veml_tracking.cc:211-246), and the L5 channels'
symbol TOW resolves via same-SV cross-band time transfer from L1 LNAV
(GpsL5PeriodDecoder.time_aid) long before the first full 6 s CNAV
message + Viterbi history would allow autonomous TOW.

Pass criterion: fused dual-band fixes within the reference's static
bounds (3D < 5 m, position_test_flags.h:31-34).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.multiband import (
    BandConfig,
    MultiBandConfig,
    MultiBandReceiver,
)
from gnss_sdr_tpu.simulate.rf_scene import generate_gps_l5_scene, generate_scene
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)
from gnss_sdr_tpu.telemetry.period_decoders import GpsL5PeriodDecoder

FS_L1 = 2.5e6
FS_L5 = 12.0e6


def test_gps_l5_period_decoder_nh_sync_and_time_aid():
    """NH10 sync + symbol folding + cross-band TOW snap (no RF)."""
    from gnss_sdr_tpu.codes.gps_l5 import NH10

    nh = np.array([1.0 if c == "0" else -1.0 for c in NH10])
    rng = np.random.default_rng(3)
    symbols = np.sign(rng.standard_normal(120))
    dec = GpsL5PeriodDecoder(fs=FS_L5)
    t_prn = int(FS_L5 // 1000)
    phase = 7  # transmitter NH phase at our first fed period
    # exact same-SV aid: TOW 5_000_400 ms at receiver time 1.0000 s
    dec.time_aid = (1.0, 5_000_400.0)
    for i in range(900):
        sym = symbols[(i + phase) // 10]
        val = sym * nh[(i + phase) % 10] * (1200.0 + rng.normal(0, 100))
        dec.feed(val, (i + 1) * t_prn)
    assert dec._nh.synced
    assert dec._nh.periods_into_code(123) == (123 + phase) % 10
    assert dec.tow_at_last_symbol_ms is not None
    # the aided TOW must sit on the 10 ms symbol grid and advance 1 ms per
    # period after the anchor
    anchored = dec.tow_at_last_symbol_ms
    into = dec._nh.periods_into_code(899)
    assert (anchored - (into + 1)) % 10.0 == pytest.approx(0.0, abs=1e-6)


def test_fnav_field_codec_roundtrip_and_streaming_decode():
    """F/NAV pages 1-4: field build/parse inverse + streaming decode with
    TOW anchoring (galileo_fnav_message.cc decode_page_type_* role)."""
    from gnss_sdr_tpu.simulate.scenario import make_constellation
    from gnss_sdr_tpu.telemetry.galileo_fnav import (
        GalileoFnavDecoder,
        build_fnav_fields,
        build_page,
        encode_page_symbols,
        fnav_ephemeris_fields,
        parse_fnav_fields,
    )

    eph = make_constellation([7], toe_s=7200.0)[7]
    pages = {
        1: dict(svid=7, iod_nav=42, toc_s=eph.toc_s, af0=eph.af0,
                af1=eph.af1, af2=eph.af2, bgd_e1e5a_s=3.2e-9,
                ai0=12.0, ai1=0.5, ai2=0.01,
                week_number=eph.week_number, tow_s=604000.0),
        2: dict(iod_nav=42, m0_rad=eph.m0_rad,
                omega_dot_rad_s=eph.omega_dot_rad_s, ecc=eph.ecc,
                sqrt_a=eph.sqrt_a, omega0_rad=eph.omega0_rad,
                idot_rad_s=eph.idot_rad_s,
                week_number=eph.week_number, tow_s=604010.0),
        3: dict(iod_nav=42, i0_rad=eph.i0_rad, omega_rad=eph.omega_rad,
                delta_n_rad_s=eph.delta_n_rad_s, cuc_rad=eph.cuc_rad,
                cus_rad=eph.cus_rad, crc_m=eph.crc_m, crs_m=eph.crs_m,
                toe_s=eph.toe_s, week_number=eph.week_number,
                tow_s=604020.0),
        4: dict(iod_nav=42, cic_rad=eph.cic_rad, cis_rad=eph.cis_rad,
                a0_s=1e-8, a1g_s_s=0.0, tow_s=604030.0),
    }
    # field-level roundtrip at ICD quantization (error <= scale/2)
    from gnss_sdr_tpu.telemetry.galileo_fnav import _FNAV_LAYOUTS

    for pt, fields in pages.items():
        parsed = parse_fnav_fields(pt, build_fnav_fields(pt, fields))
        assert parsed is not None
        scales = {name: (scale or 1.0)
                  for name, _, scale, _ in _FNAV_LAYOUTS[pt]}
        for k, v in fields.items():
            assert parsed[k] == pytest.approx(v, abs=0.51 * scales[k]), \
                (pt, k)

    # streaming transport decode
    dec = GalileoFnavDecoder()
    rng = np.random.default_rng(0)
    upd = []
    for i, pt in enumerate(sorted(pages)):
        syms = encode_page_symbols(build_page(pt, build_fnav_fields(
            pt, pages[pt])))
        for j, s in enumerate(syms):
            r = dec.feed(s * (900.0 + rng.normal(0, 120)), 1000 * (500*i+j))
            if r is not None:
                upd.append(r)
    assert [u.page_type for u in upd] == [1, 2, 3, 4]
    assert dec.tow_at_last_symbol_ms == pytest.approx((604030.0 + 10.0) * 1e3)
    got = fnav_ephemeris_fields(dec.pages_by_type)
    q = parse_fnav_fields(3, build_fnav_fields(3, pages[3]))
    assert got["toe_s"] == q["toe_s"]
    assert got["sqrt_a"] == pytest.approx(eph.sqrt_a, abs=2.0**-19)
    assert got["tgd_s"] == pytest.approx(3.2e-9, abs=2.0**-32)


@pytest.fixture(scope="module")
def dual_band_scene():
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0   # common LNAV-subframe/CNAV grid
    # first in-stream subframe boundary at 1.0 s: every channel is through
    # acquisition + pull-in before the first preamble, so the two-preamble
    # confirmation lands at ~7.2 s on all four satellites
    t_start = bits_start + 5.0
    duration = 8.4
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:4]
    assert len(prns) >= 4
    x1 = generate_scene(ephs, prns, rx, t_start, duration, FS_L1,
                        bits_start_tow_s=bits_start, n_subframes=4,
                        cn0_db_hz=48.0, seed=11)
    x5 = generate_gps_l5_scene(ephs, prns, rx, t_start, duration, FS_L5,
                               bits_start_tow_s=bits_start,
                               cn0_db_hz=50.0, seed=12)
    return dict(x1=x1, x5=x5, ephs=ephs, prns=prns, rx=rx)


def test_dual_band_l1_l5_fix(dual_band_scene):
    sc = dual_band_scene
    prns = list(sc["prns"])
    cfg = MultiBandConfig(fs=FS_L1, block_ms=20, output_rate_ms=100)
    bands = [
        BandConfig(suffix="1C", satellites=prns, n_channels=4,
                   doppler_max=5000.0, doppler_step=250.0, acq_pfa=0.001,
                   acq_dwells=2, pull_in_time_s=0.4),
        BandConfig(suffix="L5", fs=FS_L5, satellites=prns, n_channels=4,
                   doppler_max=4000.0, doppler_step=250.0, acq_pfa=0.001,
                   acq_dwells=2, pll_bw_hz=20.0, pull_in_time_s=0.4),
    ]
    assisted = {("G", p): sc["ephs"][p] for p in prns}
    rec = MultiBandReceiver(cfg, bands, assisted_ephemeris=assisted)
    sols = rec.run({"1C": sc["x1"], "L5": sc["x5"]})

    assert len(sols) >= 5, f"got {len(sols)} fixes"
    errs = [np.linalg.norm(s.pos_ecef - sc["rx"]) for s in sols[1:]]
    mean_err = float(np.mean(errs))
    assert mean_err < 5.0, f"mean 3D error {mean_err} m (bound 5 m)"

    # both bands actually contribute: L5 channels produced TOW (via
    # cross-band aiding) and epochs carry ~2x the single-band row count
    l5_band = rec.bands[1]
    l5_tows = [d.tow_at_last_symbol_ms for d in l5_band.decoders]
    assert sum(t is not None for t in l5_tows) >= 3, l5_tows
    last = sols[-1]
    assert last.n_sats >= 6, f"only {last.n_sats} measurements in last fix"


def test_dual_band_e1_e5a_fix():
    """Galileo E1-B + E5a dual-band: VEML/CBOC tracking on E1 provides
    I/NAV TOW; E5a pilot channels ride the same-SV time transfer and the
    fused fix meets the 5 m bound."""
    from gnss_sdr_tpu.simulate.rf_scene import (
        generate_galileo_e5a_scene,
        generate_galileo_scene,
    )

    FS_E1 = 4.0e6
    FS_E5A = 12.0e6
    toe = 7200.0
    bits_start = 7200.0 + 360 * 10.0   # common I/NAV page / F/NAV page grid
    t_start = bits_start + 0.5
    duration = 7.6
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:4]
    x1 = generate_galileo_scene(ephs, prns, rx, t_start, duration, FS_E1,
                                bits_start_tow_s=bits_start,
                                cn0_db_hz=48.0, seed=21)
    x5 = generate_galileo_e5a_scene(ephs, prns, rx, t_start, duration,
                                    FS_E5A, bits_start_tow_s=bits_start,
                                    cn0_db_hz=50.0, seed=22)
    cfg = MultiBandConfig(fs=FS_E1, block_ms=20, output_rate_ms=100)
    bands = [
        BandConfig(suffix="1B", satellites=prns, n_channels=4,
                   doppler_max=5000.0, doppler_step=125.0, acq_pfa=0.001,
                   acq_dwells=2, pull_in_time_s=0.4),
        BandConfig(suffix="5X", fs=FS_E5A, satellites=prns, n_channels=4,
                   doppler_max=4000.0, doppler_step=250.0, acq_pfa=0.001,
                   acq_dwells=2, pll_bw_hz=20.0, pull_in_time_s=0.4),
    ]
    assisted = {("E", p): ephs[p] for p in prns}
    rec = MultiBandReceiver(cfg, bands, assisted_ephemeris=assisted)
    sols = rec.run({"1B": x1, "5X": x5})
    assert len(sols) >= 5, f"got {len(sols)} fixes"
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols[1:]]
    mean_err = float(np.mean(errs))
    assert mean_err < 5.0, f"mean 3D error {mean_err} m (bound 5 m)"
    e5a_tows = [d.tow_at_last_symbol_ms for d in rec.bands[1].decoders]
    assert sum(t is not None for t in e5a_tows) >= 3, e5a_tows


def test_iono_free_combination_removes_dispersive_bias():
    """P_IF on synthetic dual-freq pseudoranges with a 1/f^2 iono layer
    recovers the meter-accurate fix a single-band solution cannot
    (rtklib IONOOPT_IFLC role, pvt/dual_freq.py)."""
    from gnss_sdr_tpu.constants.general import SPEED_OF_LIGHT_M_S as C
    from gnss_sdr_tpu.pvt.dual_freq import combine_dual_freq
    from gnss_sdr_tpu.pvt.solver import Observation, solve_pvt
    from gnss_sdr_tpu.simulate.scenario import (
        make_constellation,
        rx_position,
        true_range_and_rate,
    )

    f1, f5 = 1575.42e6, 1176.45e6
    toe = 7200.0
    t = toe + 1200.0
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t)[:6]
    rng = np.random.default_rng(9)
    obs = []
    for p in prns:
        rho, _, _ = true_range_and_rate(ephs[p], rx, t)
        dts = ephs[p].clock_bias_s(t - rho / C) - ephs[p].tgd_s
        iono_l1 = rng.uniform(2.0, 9.0)     # slant iono on L1 [m]
        for f in (f1, f5):
            pr = rho - C * dts + iono_l1 * (f1 / f) ** 2
            obs.append(Observation(prn=p, pseudorange_m=pr, eph=ephs[p],
                                   carrier_hz=f))

    sol_raw = solve_pvt(obs, t, apply_tropo=False, validate=False)
    err_raw = np.linalg.norm(sol_raw.pos_ecef - rx)

    combined = combine_dual_freq(obs)
    assert len(combined) == len(prns)
    sol_if = solve_pvt(combined, t, apply_tropo=False)
    err_if = np.linalg.norm(sol_if.pos_ecef - rx)

    assert err_raw > 2.0, err_raw       # uncorrected iono visibly hurts
    assert err_if < 0.01, err_if        # IF combination removes it exactly
