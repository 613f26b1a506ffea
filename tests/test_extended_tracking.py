"""Extended coherent integration (tracking states 3/4) + bit sync."""

import numpy as np

from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.simulate import SatelliteParams, generate_gps_l1ca
from gnss_sdr_tpu.tracking import TrackingConfig
from gnss_sdr_tpu.tracking.bit_sync import BitSync
from gnss_sdr_tpu.tracking.channels import TrackingChannels

FS = 4.0e6
BLOCK = 80_000


def test_bit_sync_finds_phase():
    rng = np.random.default_rng(0)
    bits = np.where(rng.integers(0, 2, 50) == 1, 1.0, -1.0)
    phase = 7
    bs = BitSync(20)
    synced_at = None
    for i in range(900):
        bit_idx = (i - phase) // 20
        sym = bits[max(bit_idx, 0)] * 4000.0 + rng.normal(0, 300)
        if bs.feed(sym) and synced_at is None:
            synced_at = i
    assert bs.synced
    assert bs.bit_phase % 20 == phase % 20
    assert bs.periods_into_bit(bs.bit_phase + 20) == 0
    assert bs.periods_into_bit(bs.bit_phase + 23) == 3


def test_extended_integration_improves_cn0_at_low_power():
    """At C/N0 38 dB-Hz, bit-sync then switch to 20 ms coherent
    integration (state 3): lock must hold with loop updates at 50 Hz and
    the C/N0 estimate must track the truth."""
    true_doppler = 700.0
    rng_bits = np.random.default_rng(1)
    bits = np.where(rng_bits.integers(0, 2, 80) == 1, 1.0, -1.0)
    sat = SatelliteParams(prn=13, cn0_db_hz=38.0, delay_samples=100.0,
                          doppler_hz=true_doppler, data_bits=bits)
    x = generate_gps_l1ca([sat], FS, 1.5, seed=2)

    cfg = TrackingConfig(
        fs=FS, extend_correlation_symbols=20, pll_bw_narrow_hz=5.0,
        dll_bw_narrow_hz=0.75, cn0_smoother_alpha=0.05,
        # weak-signal configuration: don't drop while the 1 ms C/N0
        # estimate hovers near cn0_min during convergence
        max_code_lock_fail=2000,
    )
    tc = TrackingChannels(cfg, 1, BLOCK)
    tc.start_channel(0, 13, gps_l1ca_code(13), 100.0, true_doppler + 30.0, 0)

    bs = BitSync(20)
    n_periods = 0
    extended = False
    periods_all = []
    n_blocks = (len(x) - tc.overlap) // BLOCK
    for b in range(n_blocks):
        res = tc.process_block(x[b * BLOCK: (b + 1) * BLOCK + tc.overlap])
        for p in res[0]:
            if not extended:
                bs.feed(p.prompt.real)
            n_periods += 1
        periods_all.extend(res[0])
        # switch after pull-in and bit sync
        if not extended and bs.synced and n_periods > 400:
            tc.enable_extended(0, bs.periods_into_bit(n_periods))
            extended = True
    assert extended, "bit sync never achieved"
    tail = periods_all[-60:]
    doppler_err = np.mean([abs(p.carrier_doppler_hz - true_doppler)
                           for p in tail])
    assert doppler_err < 10.0
    assert not tail[-1].loss_of_lock
    # C/N0 estimate at 20 ms integration reads near truth
    assert abs(tail[-1].cn0_db_hz - 38.0) < 5.0


def test_extended_mode_loop_update_cadence():
    """In extended mode the Doppler estimate changes only every K periods."""
    sat = SatelliteParams(prn=2, cn0_db_hz=48.0, delay_samples=0.0,
                          doppler_hz=1500.0)
    x = generate_gps_l1ca([sat], FS, 1.0, seed=5)
    cfg = TrackingConfig(fs=FS, extend_correlation_symbols=10,
                         pll_bw_narrow_hz=5.0)
    tc = TrackingChannels(cfg, 1, BLOCK)
    tc.start_channel(0, 2, gps_l1ca_code(2), 0.0, 1510.0, 0)
    periods = []
    n_blocks = (len(x) - tc.overlap) // BLOCK
    for b in range(n_blocks):
        res = tc.process_block(x[b * BLOCK: (b + 1) * BLOCK + tc.overlap])
        periods.extend(res[0])
        if b == 9:  # ~0.2 s: locked; enable extension (no bit alignment
            # needed: signal has no data bits)
            tc.enable_extended(0)
    dopplers = np.array([p.carrier_doppler_hz for p in periods[-100:]])
    # runs of constant doppler of length K=10
    changes = np.count_nonzero(np.diff(dopplers))
    assert changes <= 12  # ~100/10 updates, plus edges
    assert abs(dopplers[-1] - 1500.0) < 8.0  # 5 Hz narrow loop settling