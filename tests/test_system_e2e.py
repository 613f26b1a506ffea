"""Full receiver system test: RF scene -> acquisition -> tracking ->
telemetry TOW -> observables -> PVT, scored against truth position.

Counterpart of the reference's position_test
(src/tests/system-tests/position_test.cc) with its static accuracy bounds
(3D < 5 m, position_test_flags.h:31-34), run in hot-start (assisted
ephemeris) mode to keep the capture short — TOW still comes from live
LNAV decoding.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.geodesy import ecef_to_geodetic
from gnss_sdr_tpu.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.rf_scene import generate_scene
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)

# Non-commensurate with the 1.023 Mcps chip rate (2.444 samples/chip): an
# integer samples-per-chip ratio locks every chip edge to the same sample
# phase and produces per-satellite code-quantization biases of tens of
# meters. (Same reason the reference recommends non-multiple sampling
# rates for its captures.)
FS = 2.5e6


@pytest.fixture(scope="module")
def scene():
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0  # subframe boundary well inside validity
    t_start = bits_start + 4.5       # mid-subframe: first preamble ~1.5 s in
    duration = 9.8
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:6]
    assert len(prns) >= 5
    x = generate_scene(ephs, prns, rx, t_start, duration, FS,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=11)
    return dict(x=x, rx=rx, ephs=ephs, prns=prns, t_start=t_start)


def test_end_to_end_position_fix(scene):
    cfg = ReceiverConfig(
        fs=FS, n_channels=6, doppler_max=5000.0, doppler_step=250.0,
        acq_pfa=0.001, acq_dwells=2, output_rate_ms=100,
        enable_carrier_smoothing=True, smoothing_factor=100,
    )
    rx_truth = scene["rx"]
    receiver = Receiver(cfg, satellites=list(scene["prns"]),
                        assisted_ephemeris={p: scene["ephs"][p]
                                            for p in scene["prns"]})
    solutions = receiver.run(scene["x"])
    assert len(solutions) >= 5, (
        f"expected >=5 PVT fixes, got {len(solutions)}; "
        f"states={receiver.channel_states()}")
    errs_3d = [np.linalg.norm(s.pos_ecef - rx_truth) for s in solutions]
    # skip the first fix (filterless LS on earliest epoch)
    mean_err = float(np.mean(errs_3d[1:]))
    assert mean_err < 5.0, f"mean 3D error {mean_err} m (bound 5 m)"
    # The common-reception-time convention fixes the RX clock ~pseudorange
    # flight-time (~70 ms) early (update_TOW rounding); the solver absorbs
    # it as clock bias, as in the reference before its clock-correction
    # loop steers tracking.
    assert abs(solutions[-1].clock_bias_s) < 100e-3
    # velocity near zero for the static receiver
    if solutions[-1].vel_ecef is not None:
        assert np.linalg.norm(solutions[-1].vel_ecef) < 2.0
    lat, lon, h = ecef_to_geodetic(rx_truth)
    assert abs(np.degrees(solutions[-1].lat_rad - lat)) < 1e-3


def test_acquisition_to_tracking_transitions(scene):
    cfg = ReceiverConfig(fs=FS, n_channels=6, acq_pfa=0.001)
    receiver = Receiver(cfg, satellites=list(scene["prns"]))
    # feed only 1 s: all channels must reach TRACKING
    n = int(FS * 1.0)
    receiver.run(scene["x"][: n + receiver.overlap + receiver.block_samples])
    from gnss_sdr_tpu.receiver import ChannelState
    states = receiver.channel_states()
    n_tracking = sum(s is ChannelState.TRACKING for s in states)
    assert n_tracking >= 5, states


def test_acquisition_resampler_decimates_and_rescales():
    """use_acquisition_resampler at 5 Msps: the grid runs at 2.5 Msps
    (decim 2, >= the SNR-optimal 2 Msps, GPS_L1_CA.h:53) and delays are
    rescaled so tracking still pulls in (gnss_flowgraph.cc:1027-1117)."""
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 4.5
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:4]
    fs = 5.0e6
    x = generate_scene(ephs, prns, rx, t_start, 1.3, fs,
                       bits_start_tow_s=bits_start, n_subframes=1,
                       cn0_db_hz=48.0, seed=5)
    cfg = ReceiverConfig(fs=fs, n_channels=4, acq_pfa=0.001,
                         use_acquisition_resampler=True)
    receiver = Receiver(cfg, satellites=list(prns))
    assert receiver._acq_decim == 2
    assert receiver.acq.cfg.fs == pytest.approx(2.5e6)
    n = int(fs * 1.0)
    receiver.run(x[: n + receiver.overlap + receiver.block_samples])
    from gnss_sdr_tpu.receiver import ChannelState
    states = receiver.channel_states()
    n_tracking = sum(s is ChannelState.TRACKING for s in states)
    assert n_tracking >= 3, states


def test_satellite_pool_rotation_on_failed_acquisition(scene):
    """A channel whose satellite is not visible rotates it back through
    the pool and acquires the next one (gnss_flowgraph.cc:1924-1940)
    instead of starving on retries."""
    # PRN 20 is not in the scene: the single channel must give up on it
    # and move on to a visible satellite.
    visible = list(scene["prns"])[:2]
    pool = [20] + visible
    cfg = ReceiverConfig(fs=FS, n_channels=1, acq_pfa=0.001)
    receiver = Receiver(cfg, satellites=pool)
    n = int(FS * 1.0)
    receiver.run(scene["x"][: n + receiver.overlap + receiver.block_samples])
    from gnss_sdr_tpu.receiver import ChannelState
    fsm = receiver.fsms[0]
    assert fsm.state is ChannelState.TRACKING
    assert fsm.prn in visible
    assert 20 in receiver.sat_pool
