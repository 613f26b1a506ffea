"""Production receiver: scan pull-in -> fast-engine steady state -> PVT."""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver import ReceiverConfig
from gnss_sdr_tpu.receiver.production import ProductionReceiver
from gnss_sdr_tpu.simulate.rf_scene import generate_scene
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)

FS = 2.5e6


def test_production_receiver_fast_phase_fix():
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 4.5
    duration = 9.8
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:5]
    assert len(prns) >= 5
    x = generate_scene(ephs, prns, rx, t_start, duration, FS,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=31)

    cfg = ReceiverConfig(
        fs=FS, n_channels=5, acq_pfa=0.001, acq_dwells=2,
        output_rate_ms=100, pull_in_time_s=0.4,
        extend_correlation_symbols=20, pll_bw_narrow_hz=5.0,
        dll_bw_narrow_hz=0.75,
        enable_carrier_smoothing=True, smoothing_factor=100,
    )
    rec = ProductionReceiver(cfg, satellites=list(prns),
                             assisted_ephemeris={p: ephs[p] for p in prns})
    sols = rec.run(x)
    assert rec.in_fast_mode, "never handed off to the fast engine"
    # handoff happened early (after pull-in + bit sync, ~1.5-2.5 s)
    assert rec.handoff_sample < FS * 4.0
    assert len(sols) >= 5, f"got {len(sols)} fixes"
    # score the steady-state half (the Hatch filter converges over its
    # 100-epoch window; the reference's position test similarly skips
    # convergence)
    tail = sols[len(sols) // 2:]
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in tail]
    mean_err = float(np.mean(errs))
    assert mean_err < 5.0, f"mean 3D error {mean_err} m over {len(tail)} fixes"
    # no channel lost in the fast phase
    from gnss_sdr_tpu.receiver import ChannelState

    states = rec.receiver.channel_states()
    assert sum(s is ChannelState.TRACKING for s in states) >= 5
