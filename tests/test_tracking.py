"""DLL/PLL tracking engine tests on synthetic truth signals.

Analogous to the reference's tracking block tests
(src/tests/unit-tests/signal-processing-blocks/tracking/): known
delay/Doppler in, assert convergence of Doppler, phase lock, C/N0 estimate
and data-bit demodulation.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.simulate import SatelliteParams, generate_gps_l1ca
from gnss_sdr_tpu.tracking import TrackingConfig
from gnss_sdr_tpu.tracking.channels import TrackingChannels

FS = 4.0e6
BLOCK = 80_000  # 20 ms


def run_tracking(
    sats, duration_s, handoffs, cfg=None, n_channels=None,
):
    """Generate signal, start channels from (approximate) acq results,
    stream blocks, return per-channel period outputs."""
    cfg = cfg or TrackingConfig(fs=FS)
    n_channels = n_channels or len(handoffs)
    x = generate_gps_l1ca(sats, FS, duration_s, seed=3)
    tc = TrackingChannels(cfg, n_channels, BLOCK)
    for ch, (prn, delay, doppler) in enumerate(handoffs):
        tc.start_channel(ch, prn, gps_l1ca_code(prn), delay, doppler, 0)
    outputs = [[] for _ in range(n_channels)]
    n_blocks = (len(x) - tc.overlap) // BLOCK
    for b in range(n_blocks):
        chunk = x[b * BLOCK: (b + 1) * BLOCK + tc.overlap]
        res = tc.process_block(chunk)
        for ch in range(n_channels):
            outputs[ch].extend(res[ch])
    return outputs


def test_single_channel_convergence():
    true_doppler = 1000.0
    sat = SatelliteParams(prn=7, cn0_db_hz=45.0, delay_samples=777.0,
                          doppler_hz=true_doppler)
    # acquisition-grade handoff: 25 Hz Doppler error, exact delay bin
    out = run_tracking([sat], 0.4, [(7, 777.0, true_doppler + 25.0)])
    periods = out[0]
    assert len(periods) > 350  # ~1000 periods/s minus edge effects
    tail = periods[-100:]
    doppler_err = [abs(p.carrier_doppler_hz - true_doppler) for p in tail]
    assert np.mean(doppler_err) < 10.0
    # phase lock: prompt power concentrated in I
    pi = np.array([p.prompt.real for p in tail])
    pq = np.array([p.prompt.imag for p in tail])
    assert np.mean(np.abs(pi)) > 5.0 * np.mean(np.abs(pq))
    # C/N0 estimate within 5 dB of truth
    assert abs(tail[-1].cn0_db_hz - 45.0) < 5.0
    # carrier lock test rising toward 1 (alpha=0.002 smoother is slow by
    # design, carrier_lock_test_smoother_alpha in dll_pll_conf.h)
    early = periods[30].carrier_lock_test
    assert tail[-1].carrier_lock_test > max(early, 0.05)
    assert not tail[-1].loss_of_lock
    # code frequency tracks the code-Doppler-scaled chip rate
    expected_code_freq = 1.023e6 * (1.0 + true_doppler / 1575.42e6)
    code_err = abs(tail[-1].code_freq_chips - expected_code_freq)
    assert code_err < 0.5  # chips/s


def test_fll_pull_in_large_doppler_error():
    true_doppler = -2200.0
    sat = SatelliteParams(prn=3, cn0_db_hz=47.0, delay_samples=100.0,
                          doppler_hz=true_doppler)
    cfg = TrackingConfig(fs=FS, enable_fll_pull_in=True, fll_bw_hz=35.0,
                         pull_in_time_s=0.15)
    out = run_tracking([sat], 0.5, [(3, 100.0, true_doppler + 200.0)],
                       cfg=cfg)
    tail = out[0][-50:]
    doppler_err = [abs(p.carrier_doppler_hz - true_doppler) for p in tail]
    assert np.mean(doppler_err) < 15.0
    assert not tail[-1].loss_of_lock


def test_data_bit_demodulation():
    # alternating 20 ms bits; prompt real sign must follow them
    bits = np.array([1, -1, 1, 1, -1, -1, 1, -1, 1, -1, -1, 1, 1, -1, 1,
                     -1, 1, 1, -1, 1, -1, 1, -1, -1, 1], dtype=np.float64)
    sat = SatelliteParams(prn=11, cn0_db_hz=48.0, delay_samples=0.0,
                          doppler_hz=500.0, data_bits=bits)
    out = run_tracking([sat], 0.45, [(11, 0.0, 500.0)])
    periods = out[0]
    # use the second half (phase locked; polarity constant modulo sign flip)
    demod = []
    truth = []
    for p in periods:
        if p.sample_start < FS * 0.2:
            continue
        bit_idx = int((p.sample_start + p.length / 2) // (FS * 0.02))
        if bit_idx >= len(bits):
            break
        demod.append(np.sign(p.prompt.real))
        truth.append(bits[bit_idx])
    demod = np.array(demod)
    truth = np.array(truth)
    agreement = np.mean(demod == truth)
    assert agreement > 0.98 or agreement < 0.02  # allow 180-deg ambiguity


def test_two_channels_track_independently():
    sats = [
        SatelliteParams(prn=5, cn0_db_hz=45.0, delay_samples=1500.0,
                        doppler_hz=2500.0),
        SatelliteParams(prn=21, cn0_db_hz=45.0, delay_samples=3100.0,
                        doppler_hz=-3100.0),
    ]
    out = run_tracking(sats, 0.3, [(5, 1500.0, 2520.0), (21, 3100.0, -3080.0)])
    for ch, true_doppler in ((0, 2500.0), (1, -3100.0)):
        tail = out[ch][-50:]
        assert len(tail) == 50
        err = np.mean([abs(p.carrier_doppler_hz - true_doppler) for p in tail])
        assert err < 10.0, f"channel {ch}"


def test_loss_of_lock_on_signal_disappearance():
    # signal present 0.2 s, then pure noise: C/N0 watchdog must fire
    sat = SatelliteParams(prn=9, cn0_db_hz=45.0, delay_samples=50.0,
                          doppler_hz=800.0)
    x1 = generate_gps_l1ca([sat], FS, 0.2, seed=5)
    rng = np.random.default_rng(6)
    sigma = np.sqrt(FS / (2.0 * 10 ** 4.5))
    x2 = (sigma * (rng.standard_normal(int(FS * 0.5))
                   + 1j * rng.standard_normal(int(FS * 0.5)))
          ).astype(np.complex64)
    x = np.concatenate([x1, x2])
    # Faster C/N0 smoother so the watchdog fires within the short run (the
    # reference default alpha=0.002 needs many seconds to decay), and
    # cn0_min above the ~30 dB-Hz noise-only floor of the 1 ms M2M4
    # estimator (the reference's --cn0_min flag serves the same purpose).
    cfg = TrackingConfig(fs=FS, max_code_lock_fail=30, pull_in_time_s=0.1,
                         cn0_smoother_alpha=0.05, cn0_min=35.0)
    tc = TrackingChannels(cfg, 1, BLOCK)
    tc.start_channel(0, 9, gps_l1ca_code(9), 50.0, 800.0, 0)
    lost = False
    n_blocks = (len(x) - tc.overlap) // BLOCK
    for b in range(n_blocks):
        res = tc.process_block(x[b * BLOCK: (b + 1) * BLOCK + tc.overlap])
        if any(p.loss_of_lock for p in res[0]):
            lost = True
            break
    assert lost
