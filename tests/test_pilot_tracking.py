"""Pilot-channel tracking with secondary-code wipe-off (L5-style).

A 1 ms code with the NH20 secondary (BeiDou/L5Q pattern) is tracked:
secondary sync finds the code phase; extended integration with sign
wipe-off then runs a pure (four-quadrant) PLL across secondary-chip
boundaries.
"""

import numpy as np

from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.constants.signals import BEIDOU_NH20
from gnss_sdr_tpu.simulate import SatelliteParams, generate_gps_l1ca
from gnss_sdr_tpu.tracking import TrackingConfig
from gnss_sdr_tpu.tracking.bit_sync import SecondaryCodeSync
from gnss_sdr_tpu.tracking.channels import TrackingChannels

FS = 4.0e6
BLOCK = 80_000


def test_secondary_sync_finds_phase():
    signs = np.array([1.0 if c == "0" else -1.0 for c in BEIDOU_NH20])
    rng = np.random.default_rng(0)
    phase = 13
    sync = SecondaryCodeSync(BEIDOU_NH20, repeats=4)
    hit = None
    for i in range(300):
        s = signs[(i + phase) % 20] * (2000.0 + rng.normal(0, 200))
        if sync.feed(s) and hit is None:
            hit = i
    assert sync.synced
    # periods_into_code must reproduce the true secondary index
    for idx in (hit + 1, hit + 7, hit + 20):
        assert sync.periods_into_code(idx) == (idx + phase) % 20


def test_pilot_tracking_with_secondary_wipeoff():
    # use the NH20 pattern as a "secondary code" on a 1 ms C/A-code pilot
    signs = np.array([1.0 if c == "0" else -1.0 for c in BEIDOU_NH20])
    # data_bits at 20 ms boundaries = repeating NH20 at 1 bit per code
    # period: build a +-1 stream at 50 bps equivalent by treating each
    # NH chip as one "bit" lasting one code period
    n_periods = 1600
    chip_stream = signs[np.arange(n_periods) % 20]
    # generator applies bits at 20-period granularity; instead synthesize
    # per-period signs via data_bits with CODES_PER_BIT=1 semantics:
    # repeat each sign into the 20-codes-per-bit grid is wrong, so use
    # doppler-only signal and impose signs by segment multiplication.
    sat = SatelliteParams(prn=21, cn0_db_hz=44.0, delay_samples=0.0,
                          doppler_hz=900.0)
    x = generate_gps_l1ca([sat], FS, 1.6, seed=8, noise=False)
    spc = 4000  # samples per code period at 4 Msps
    for k in range(len(x) // spc):
        x[k * spc:(k + 1) * spc] *= signs[k % 20]
    rng = np.random.default_rng(9)
    sigma = np.sqrt(FS / (2.0 * 10 ** 4.4))
    x = (x + sigma * (rng.standard_normal(len(x))
                      + 1j * rng.standard_normal(len(x)))).astype(np.complex64)

    cfg = TrackingConfig(fs=FS, extend_correlation_symbols=20,
                         pll_bw_narrow_hz=5.0, dll_bw_narrow_hz=0.75,
                         cn0_smoother_alpha=0.05, max_code_lock_fail=2000)
    tc = TrackingChannels(cfg, 1, BLOCK)
    tc.start_channel(0, 21, gps_l1ca_code(21), 0.0, 920.0, 0)
    sync = SecondaryCodeSync(BEIDOU_NH20, repeats=4)
    n = 0
    extended = False
    periods = []
    n_blocks = (len(x) - tc.overlap) // BLOCK
    for b in range(n_blocks):
        res = tc.process_block(x[b * BLOCK: (b + 1) * BLOCK + tc.overlap])
        for p in res[0]:
            if not extended:
                sync.feed(p.prompt.real)
            n += 1
        periods.extend(res[0])
        if not extended and sync.synced and n > 300:
            tc.state = tc.engine.set_extended(
                tc.state, 0, sync.periods_into_code(n),
                secondary_code=BEIDOU_NH20)
            extended = True
    assert extended, "secondary sync failed"
    tail = periods[-40:]
    doppler_err = np.mean([abs(p.carrier_doppler_hz - 900.0) for p in tail])
    assert doppler_err < 8.0
    assert not tail[-1].loss_of_lock
    # with the secondary wiped, accumulated prompts are sign-consistent:
    # the four-quadrant PLL keeps the phase near 0 (not pi-ambiguous)
    assert abs(tail[-1].cn0_db_hz - 44.0) < 6.0
