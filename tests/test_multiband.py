"""Hybrid GPS L1 + Galileo E1 receiver system test (BASELINE config 4).

Both constellations share one geometry-accurate scene; the multi-band
receiver fuses their observables into joint PVT fixes meeting the
reference's 5 m static bound.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.multiband import (
    BandConfig,
    MultiBandConfig,
    MultiBandReceiver,
)
from gnss_sdr_tpu.simulate.rf_scene import generate_galileo_scene, generate_scene
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)

FS = 4.5e6  # non-commensurate with both chip rates


@pytest.fixture(scope="module")
def hybrid_scene():
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0        # GPS subframe boundary
    gal_bits_start = bits_start + 4.0      # even page boundary (2 s grid)
    t_start = bits_start + 4.5
    duration = 9.8
    rx = rx_position()
    gps_ephs = make_constellation(range(1, 13), toe_s=toe, spread_seed=1)
    gal_ephs = make_constellation(range(1, 13), toe_s=toe, spread_seed=7)
    gps_prns = visible_sats(gps_ephs, rx, t_start)[:4]
    gal_prns = visible_sats(gal_ephs, rx, t_start)[:4]
    assert len(gps_prns) >= 4 and len(gal_prns) >= 4
    x = generate_scene(gps_ephs, gps_prns, rx, t_start, duration, FS,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=21)
    x_gal = generate_galileo_scene(gal_ephs, gal_prns, rx, t_start, duration,
                                   FS, bits_start_tow_s=gal_bits_start,
                                   cn0_db_hz=48.0, seed=22, noise=False)
    return dict(x=(x + x_gal).astype(np.complex64), rx=rx,
                gps=(gps_ephs, gps_prns), gal=(gal_ephs, gal_prns))


def test_hybrid_receiver_joint_fix(hybrid_scene):
    gps_ephs, gps_prns = hybrid_scene["gps"]
    gal_ephs, gal_prns = hybrid_scene["gal"]
    assisted = {("G", p): gps_ephs[p] for p in gps_prns}
    assisted.update({("E", p): gal_ephs[p] for p in gal_prns})
    rec = MultiBandReceiver(
        MultiBandConfig(fs=FS, output_rate_ms=100,
                        enable_carrier_smoothing=True, smoothing_factor=100),
        bands=[
            BandConfig(suffix="1C", satellites=list(gps_prns), n_channels=4),
            BandConfig(suffix="1B", satellites=list(gal_prns), n_channels=4),
        ],
        assisted_ephemeris=assisted,
    )
    sols = rec.run(hybrid_scene["x"])
    assert len(sols) >= 5, (
        f"expected >=5 fixes, got {len(sols)}; states={rec.channel_states()}")
    # Galileo must contribute: some fix with more sats than GPS channels
    assert max(s.n_sats for s in sols) >= 6, [s.n_sats for s in sols]
    rx_truth = hybrid_scene["rx"]
    # score full-geometry fixes (the first few are Galileo-only with
    # 4 satellites at PDOP ~14 before GPS TOW decodes at ~7.3 s)
    good = [s for s in sols if s.n_sats >= 6]
    assert len(good) >= 4
    errs = [np.linalg.norm(s.pos_ecef - rx_truth) for s in good]
    mean_err = float(np.mean(errs))
    assert mean_err < 5.0, f"mean 3D error {mean_err} m over {len(good)} fixes"


def _glonass_constellation(rx, t_ref, slots_cycle=(-1, 0, 1, 2),
                           spread_seed=15, n=4):
    """GLONASS state-vector truth ephemerides built from a synthetic
    constellation's states at the nearest 15-min t_b."""
    from gnss_sdr_tpu.pvt.glonass_ephemeris import GlonassEphemeris

    src = make_constellation(range(1, 13), toe_s=7200.0,
                             spread_seed=spread_seed)
    vis = visible_sats(src, rx, t_ref)[:n]
    tb = round(t_ref / 900.0) * 900.0
    ephs, slots = {}, {}
    for i, p in enumerate(vis):
        pos = src[p].sat_pos(tb)
        vel = src[p].sat_vel(tb)
        k = slots_cycle[i % len(slots_cycle)]
        ephs[p] = GlonassEphemeris(
            slot=p, freq_slot=k, tb_s=tb, pos_m=tuple(pos),
            vel_m_s=tuple(vel), gamma_n=0.0, tau_n_s=2.1e-6)
        slots[p] = k
    return ephs, slots, vis


def test_glonass_receiver_fix():
    """Single-band GLONASS L1 FDMA receiver (BASELINE config 4's GLO
    leg): per-slot acquisition centers, per-channel IF tracking, GNAV
    string decode with string-1 TOW anchoring, state-vector PVT."""
    from gnss_sdr_tpu.simulate.rf_scene import generate_glonass_scene

    rx = rx_position()
    frame_start = round(10770.0 / 30) * 30.0    # GNAV 30 s frame grid
    t_start = frame_start - 3.0                  # string 1 ends at +2 s
    duration = 13.0
    ephs, slots, prns = _glonass_constellation(rx, t_start + 6.0)
    assert len(prns) >= 4
    x = generate_glonass_scene(ephs, slots, prns, rx, t_start, duration,
                               FS, frame_start_tow_s=frame_start,
                               cn0_db_hz=48.0, seed=6)
    assisted = {("R", p): ephs[p] for p in prns}
    # 4 satellites = zero redundancy, and GLONASS chips are 2x wider than
    # GPS: Hatch carrier smoothing (with per-slot FDMA wavelengths) is the
    # standard lever that brings the code noise under the 5 m bound
    rec = MultiBandReceiver(
        MultiBandConfig(fs=FS, output_rate_ms=200,
                        enable_carrier_smoothing=True, smoothing_factor=50),
        bands=[BandConfig(suffix="1G", satellites=list(prns), n_channels=4,
                          freq_slots=slots)],
        assisted_ephemeris=assisted,
    )
    sols = rec.run(x)
    assert len(sols) >= 3, (
        f"expected >=3 fixes, got {len(sols)}; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols]
    mean_err = float(np.mean(errs[1:])) if len(errs) > 1 else errs[0]
    assert mean_err < 5.0, f"mean 3D error {mean_err} m"


def test_beidou_receiver_fix():
    """Single-band BeiDou B1I receiver: NH20 sync + wipe-off, D1 decode
    with SOW TOW, Kepler PVT (BASELINE config 4's BDS leg)."""
    from gnss_sdr_tpu.simulate.rf_scene import generate_beidou_scene

    rx = rx_position()
    toe = 7200.0
    sow_start = 7200.0 + 598 * 6.0
    t_start = sow_start + 0.5
    duration = 14.0
    ephs = make_constellation(range(1, 13), toe_s=toe, spread_seed=23)
    prns = visible_sats(ephs, rx, t_start)[:4]
    assert len(prns) >= 4
    x = generate_beidou_scene(ephs, prns, rx, t_start, duration, 5.0e6,
                              sow_start_s=sow_start, cn0_db_hz=48.0, seed=8)
    assisted = {("C", p): ephs[p] for p in prns}
    rec = MultiBandReceiver(
        MultiBandConfig(fs=5.0e6, output_rate_ms=200),
        bands=[BandConfig(suffix="B1", satellites=list(prns), n_channels=4)],
        assisted_ephemeris=assisted,
    )
    sols = rec.run(x)
    assert len(sols) >= 3, (
        f"expected >=3 fixes, got {len(sols)}; states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols]
    mean_err = float(np.mean(errs[1:])) if len(errs) > 1 else errs[0]
    assert mean_err < 5.0, f"mean 3D error {mean_err} m"


def test_hybrid_gps_gal_glo_fix(hybrid_scene):
    """GPS + Galileo + GLONASS triple-constellation fix (BASELINE
    config 4): GLO rides its own RF stream (FDMA band at 1602 MHz),
    GNAV TOW anchors off GPS time via the 30 s frame grid, and the
    solver's GLO inter-system state absorbs the time-base offset."""
    from gnss_sdr_tpu.simulate.rf_scene import generate_glonass_scene

    gps_ephs, gps_prns = hybrid_scene["gps"]
    gal_ephs, gal_prns = hybrid_scene["gal"]
    rx = hybrid_scene["rx"]
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 4.5
    duration = 9.8
    frame_start = (int(t_start) // 30) * 30.0
    glo_ephs, slots, glo_prns = _glonass_constellation(
        rx, t_start + 5.0, slots_cycle=(-1, 1), spread_seed=29, n=2)
    x_glo = generate_glonass_scene(glo_ephs, slots, glo_prns, rx, t_start,
                                   duration, FS,
                                   frame_start_tow_s=frame_start,
                                   cn0_db_hz=48.0, seed=9)
    assisted = {("G", p): gps_ephs[p] for p in gps_prns}
    assisted.update({("E", p): gal_ephs[p] for p in gal_prns})
    assisted.update({("R", p): glo_ephs[p] for p in glo_prns})
    rec = MultiBandReceiver(
        MultiBandConfig(fs=FS, output_rate_ms=100,
                        enable_carrier_smoothing=True, smoothing_factor=100),
        bands=[
            BandConfig(suffix="1C", satellites=list(gps_prns), n_channels=4),
            BandConfig(suffix="1B", satellites=list(gal_prns), n_channels=4),
            BandConfig(suffix="1G", satellites=list(glo_prns), n_channels=2,
                       freq_slots=slots),
        ],
        assisted_ephemeris=assisted,
    )
    sols = rec.run({"1C": hybrid_scene["x"], "1B": hybrid_scene["x"],
                    "1G": x_glo})
    assert len(sols) >= 5, (
        f"expected >=5 fixes, got {len(sols)}; states={rec.channel_states()}")
    # GLONASS must contribute: a fix with more sats than GPS+GAL provide
    assert max(s.n_sats for s in sols) >= 9, [s.n_sats for s in sols]
    good = [s for s in sols if s.n_sats >= 9]
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in good]
    mean_err = float(np.mean(errs))
    assert mean_err < 5.0, f"mean 3D error {mean_err} m over {len(good)} fixes"
