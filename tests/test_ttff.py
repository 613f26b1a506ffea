"""Time-to-first-fix system test.

Counterpart of the reference's ttff.cc (src/tests/system-tests/ttff.cc):
measure receiver time from cold/assisted start to the first valid PVT
fix over repeated runs, report mean/max/min and assert every fix
arrives within the 90 s budget (ttff.cc:52). In simulation with a
live-decode scene the fix should arrive within a few seconds of signal
(pull-in + ephemeris already assisted = hot start semantics).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver import ReceiverConfig
from gnss_sdr_tpu.receiver.production import ProductionReceiver
from gnss_sdr_tpu.simulate.rf_scene import generate_scene
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation, rx_position, visible_sats)

FS = 2.5e6
MAX_TTFF_S = 90.0  # ttff.cc:52


@pytest.mark.parametrize("seed", [101, 202])
def test_hot_start_ttff(seed):
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 4.5
    duration = 9.0
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:5]
    x = generate_scene(ephs, prns, rx, t_start, duration, FS,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=seed)
    cfg = ReceiverConfig(
        fs=FS, n_channels=5, acq_pfa=0.001, acq_dwells=2,
        output_rate_ms=100, pull_in_time_s=0.4,
        extend_correlation_symbols=20, pll_bw_narrow_hz=5.0,
        dll_bw_narrow_hz=0.75)
    rec = ProductionReceiver(cfg, satellites=list(prns),
                             assisted_ephemeris={p: ephs[p] for p in prns})
    sols = rec.run(x)
    assert sols, "no fix at all"
    # receiver time of the first fix = processed samples / fs
    first = sols[0]
    rx_time_s = getattr(first, "rx_time_s", None)
    if rx_time_s is None:
        # fall back: handoff sample (fix follows within ~1 s of handoff)
        rx_time_s = rec.handoff_sample / FS
    ttff = float(rx_time_s) % 604800  # strip week for the budget check
    # in simulated receiver time, relative to the capture start:
    ttff_rel = (rec.handoff_sample / FS
                if rx_time_s > duration else rx_time_s)
    assert ttff_rel < MAX_TTFF_S
    # hot start with assisted ephemeris: fix within 6 s of signal start
    assert ttff_rel < 6.0, f"TTFF {ttff_rel:.2f} s"
    # the first fix is already a sane position (< 100 m)
    assert np.linalg.norm(first.pos_ecef - rx) < 100.0


def test_ttff_report_statistics():
    """Mean/max/min TTFF report across runs (ttff.cc:293-390 prints the
    same statistics; here over the two parametrized seeds' semantics we
    run two short scenes in-process)."""
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 4.5
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:5]
    ttffs = []
    for seed in (11, 12):
        x = generate_scene(ephs, prns, rx, t_start, 9.0, FS,
                           bits_start_tow_s=bits_start, n_subframes=4,
                           cn0_db_hz=48.0, seed=seed)
        cfg = ReceiverConfig(fs=FS, n_channels=5, acq_pfa=0.001,
                             acq_dwells=2, output_rate_ms=100,
                             pull_in_time_s=0.4,
                             extend_correlation_symbols=20,
                             pll_bw_narrow_hz=5.0, dll_bw_narrow_hz=0.75)
        rec = ProductionReceiver(cfg, satellites=list(prns),
                                 assisted_ephemeris={p: ephs[p]
                                                     for p in prns})
        sols = rec.run(x)
        assert sols
        ttffs.append(rec.handoff_sample / FS)
    report = (f"TTFF mean={np.mean(ttffs):.2f}s max={np.max(ttffs):.2f}s "
              f"min={np.min(ttffs):.2f}s over {len(ttffs)} runs")
    print(report)
    assert np.max(ttffs) < MAX_TTFF_S
