"""Receiver wiring for the five remaining signal suffixes: GPS L2C (2S),
Galileo E5b (7X), Galileo E6 (E6), GLONASS L2 (2G), BeiDou B3I (B3) —
the reference tracks + decodes all of them end-to-end
(dll_pll_veml_tracking.cc:194-210,326-372,413-434; factory registry
gnss_block_factory.cc:1076-1216)."""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.multiband import (
    BandConfig,
    MultiBandConfig,
    MultiBandReceiver,
)
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)


def test_gps_l1_l2c_dual_band_fix():
    """GPS L1 C/A + L2C: CM-code tracking at 20 ms periods, one CNAV
    symbol per period, L2 TOW via same-SV cross-band transfer from L1
    LNAV before the first autonomous 12 s CNAV message."""
    from gnss_sdr_tpu.simulate.rf_scene import (generate_gps_l2c_scene,
                                                generate_scene)

    FS = 2.5e6
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0      # LNAV subframe grid
    l2_bits_start = 7200.0 + 299 * 12.0  # CNAV-on-L2 12 s message grid
    t_start = bits_start + 5.0
    duration = 8.4
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:5]
    assert len(prns) >= 5
    x1 = generate_scene(ephs, prns, rx, t_start, duration, FS,
                        bits_start_tow_s=bits_start, n_subframes=4,
                        cn0_db_hz=48.0, seed=31)
    x2 = generate_gps_l2c_scene(ephs, prns, rx, t_start, duration, FS,
                                bits_start_tow_s=l2_bits_start,
                                cn0_db_hz=50.0, seed=32)
    # L2 CM chips are 586 m: Hatch smoothing is the standard lever that
    # brings wide-chip code noise under the 5 m bound (the reference's
    # Observables.enable_carrier_smoothing)
    cfg = MultiBandConfig(fs=FS, block_ms=20, output_rate_ms=100,
                          enable_carrier_smoothing=True,
                          smoothing_factor=50)
    bands = [
        BandConfig(suffix="1C", satellites=list(prns), n_channels=5,
                   doppler_max=5000.0, doppler_step=250.0, acq_pfa=0.001,
                   acq_dwells=2, pull_in_time_s=0.4),
        BandConfig(suffix="2S", satellites=list(prns), n_channels=5,
                   doppler_max=4000.0, acq_pfa=0.001,
                   acq_dwells=1, pull_in_time_s=0.4),
    ]
    assisted = {("G", p): ephs[p] for p in prns}
    rec = MultiBandReceiver(cfg, bands, assisted_ephemeris=assisted)
    sols = rec.run({"1C": x1, "2S": x2})
    assert len(sols) >= 5, f"got {len(sols)} fixes"
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols[1:]]
    assert float(np.mean(errs)) < 5.0
    l2_tows = [d.tow_at_last_symbol_ms for d in rec.bands[1].decoders]
    assert sum(t is not None for t in l2_tows) >= 3, l2_tows
    assert sols[-1].n_sats >= 6, f"only {sols[-1].n_sats} rows in last fix"


def test_galileo_e5b_fix():
    """Single-band Galileo E5b: pilot (Q, CS100) tracking, CS4 data
    secondary sync, I/NAV at 250 sym/s with autonomous TOW (E5b carries
    the same message family as E1), Kepler PVT."""
    from gnss_sdr_tpu.simulate.rf_scene import generate_galileo_e5b_scene

    FS = 12.0e6
    toe = 7200.0
    bits_start = 7200.0 + 360 * 10.0
    t_start = bits_start + 0.5
    duration = 7.6
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:4]
    x = generate_galileo_e5b_scene(ephs, prns, rx, t_start, duration, FS,
                                   bits_start_tow_s=bits_start,
                                   cn0_db_hz=50.0, seed=41)
    assisted = {("E", p): ephs[p] for p in prns}
    # 4 satellites = zero redundancy and the 1-chip E-L spacing costs
    # noise margin: Hatch smoothing brings the code under the 5 m bound
    # (the GLONASS single-band test precedent)
    rec = MultiBandReceiver(
        MultiBandConfig(fs=FS, output_rate_ms=200,
                        enable_carrier_smoothing=True, smoothing_factor=50),
        bands=[BandConfig(suffix="7X", satellites=list(prns), n_channels=4,
                          doppler_max=4000.0, doppler_step=250.0,
                          acq_pfa=0.001, acq_dwells=2, pll_bw_hz=20.0,
                          pull_in_time_s=0.4)],
        assisted_ephemeris=assisted,
    )
    sols = rec.run(x)
    assert len(sols) >= 3, (
        f"expected >=3 fixes, got {len(sols)}; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols[1:]]
    mean_err = float(np.mean(errs)) if errs else 99.0
    assert mean_err < 5.0, f"mean 3D error {mean_err} m"


def test_galileo_e6_pages_decode():
    """Single-band Galileo E6 B/C: pilot (C, CS100) tracking, C/NAV HAS
    page decode at 1000 sym/s from the data component. C/NAV has no TOW
    field (the reference resolves E6 time via its receiver-wide TOW map),
    so this asserts page-level decode, not a fix."""
    from gnss_sdr_tpu.simulate.rf_scene import generate_galileo_e6_scene

    FS = 8.0e6
    toe = 7200.0
    t_start = 7200.0 + 3600.0
    duration = 4.0
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:3]
    x = generate_galileo_e6_scene(ephs, prns, rx, t_start, duration, FS,
                                  page_start_tow_s=float(int(t_start)),
                                  cn0_db_hz=50.0, seed=51)
    rec = MultiBandReceiver(
        MultiBandConfig(fs=FS),
        bands=[BandConfig(suffix="E6", satellites=list(prns), n_channels=3,
                          doppler_max=4000.0, doppler_step=250.0,
                          acq_pfa=0.001, acq_dwells=2, pll_bw_hz=20.0,
                          pull_in_time_s=0.4)],
    )
    rec.run(x)
    band = rec.bands[0]
    pages = [len(d.pages) for d in band.decoders]
    assert sum(p >= 1 for p in pages) >= 2, (
        f"pages per channel {pages}; states={rec.channel_states()}")


def test_glonass_l2_fix():
    """Single-band GLONASS L2 C/A FDMA: slot carriers at 1246 MHz +
    k*437.5 kHz, same m-sequence/GNAV as L1."""
    from gnss_sdr_tpu.simulate.rf_scene import generate_glonass_scene
    from tests.test_multiband import _glonass_constellation

    FS = 5.0e6
    rx = rx_position()
    frame_start = round(10770.0 / 30) * 30.0
    t_start = frame_start - 3.0
    duration = 13.0
    ephs, slots, prns = _glonass_constellation(rx, t_start + 6.0)
    assert len(prns) >= 4
    x = generate_glonass_scene(ephs, slots, prns, rx, t_start, duration,
                               FS, frame_start_tow_s=frame_start,
                               cn0_db_hz=48.0, seed=61, band="L2")
    assisted = {("R", p): ephs[p] for p in prns}
    rec = MultiBandReceiver(
        MultiBandConfig(fs=FS, output_rate_ms=200,
                        enable_carrier_smoothing=True, smoothing_factor=50),
        bands=[BandConfig(suffix="2G", satellites=list(prns), n_channels=4,
                          freq_slots=slots)],
        assisted_ephemeris=assisted,
    )
    sols = rec.run(x)
    assert len(sols) >= 3, (
        f"expected >=3 fixes, got {len(sols)}; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols]
    mean_err = float(np.mean(errs[1:])) if len(errs) > 1 else errs[0]
    assert mean_err < 5.0, f"mean 3D error {mean_err} m"


def test_beidou_b3i_fix():
    """Single-band BeiDou B3I: 10.23 Mcps code, NH20 + D1 decode with
    SOW TOW, Kepler PVT (Beidou_B3I.h; beidou_b3i adapters)."""
    from gnss_sdr_tpu.simulate.rf_scene import generate_beidou_scene

    FS = 12.0e6
    rx = rx_position()
    toe = 7200.0
    sow_start = 7200.0 + 598 * 6.0
    t_start = sow_start - 1.0     # first full subframe early -> SOW ~7.5 s
    duration = 11.0
    ephs = make_constellation(range(1, 13), toe_s=toe, spread_seed=12)
    # 5 satellites: one spare, so a single slow pull-in cannot hold the
    # 4-distinct-satellite geometry below threshold for the whole run
    prns = visible_sats(ephs, rx, t_start)[:5]
    assert len(prns) >= 5
    x = generate_beidou_scene(ephs, prns, rx, t_start, duration, FS,
                              sow_start_s=sow_start, cn0_db_hz=48.0,
                              seed=71, band="B3")
    assisted = {("C", p): ephs[p] for p in prns}
    rec = MultiBandReceiver(
        MultiBandConfig(fs=FS, output_rate_ms=200),
        bands=[BandConfig(suffix="B3", satellites=list(prns), n_channels=5)],
        assisted_ephemeris=assisted,
    )
    sols = rec.run(x)
    assert len(sols) >= 3, (
        f"expected >=3 fixes, got {len(sols)}; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols]
    mean_err = float(np.mean(errs[1:])) if len(errs) > 1 else errs[0]
    assert mean_err < 5.0, f"mean 3D error {mean_err} m"
