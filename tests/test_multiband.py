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
