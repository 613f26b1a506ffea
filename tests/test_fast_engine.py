"""Fast (group-batched) tracking engine: steady-state equivalence with the
scan engine's extended mode."""

import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.simulate import SatelliteParams, generate_gps_l1ca
from gnss_sdr_tpu.tracking import TrackingConfig
from gnss_sdr_tpu.tracking.channels import TrackingChannels
from gnss_sdr_tpu.tracking.fast_engine import FastTrackingEngine

FS = 4.0e6


def test_fast_engine_tracks_steady_state():
    true_doppler = 1200.0
    sat = SatelliteParams(prn=9, cn0_db_hz=45.0, delay_samples=400.0,
                          doppler_hz=true_doppler)
    x = generate_gps_l1ca([sat], FS, 1.4, seed=11)

    # phase 1: pull in with the scan engine (wide mode)
    cfg = TrackingConfig(fs=FS, extend_correlation_symbols=20,
                         pll_bw_narrow_hz=5.0, dll_bw_narrow_hz=0.75,
                         cn0_smoother_alpha=0.05)
    block = int(FS * 0.02)
    tc = TrackingChannels(cfg, 1, block)
    tc.start_channel(0, 9, gps_l1ca_code(9), 400.0, true_doppler + 20.0, 0)
    pull_in_blocks = 20  # 0.4 s
    for b in range(pull_in_blocks):
        tc.process_block(x[b * block: (b + 1) * block + tc.overlap])

    # phase 2: hand over to the fast engine
    fast = FastTrackingEngine(cfg, 1, groups_per_block=5)
    state = fast.from_track_state(tc.state)
    codes = jnp.asarray(np.asarray(gps_l1ca_code(9), np.float32)[None, :])
    pos = pull_in_blocks * block  # absolute sample of fast-engine origin
    dopplers = []
    cn0s = []
    all_starts = []
    n_blocks = (len(x) - pos - fast.overlap) // fast.block_samples
    assert n_blocks >= 8
    for b in range(n_blocks):
        lo = pos + b * fast.block_samples
        seg = x[lo: lo + fast.block_samples + fast.overlap]
        re = jnp.asarray(np.ascontiguousarray(seg.real, np.float32))
        im = jnp.asarray(np.ascontiguousarray(seg.imag, np.float32))
        state, out = fast.process_block(state, re, im, codes)
        valid = np.asarray(out["valid"])[:, 0]
        dopplers.extend(np.asarray(out["carrier_doppler_hz"])[valid, 0])
        cn0s.extend(np.asarray(out["cn0_db_hz"])[valid, 0])
        starts = np.asarray(out["period_starts"])[valid, 0, :]
        all_starts.append(starts + lo)
        assert not np.asarray(out["loss_of_lock"]).any()

    dopplers = np.array(dopplers)
    assert len(dopplers) >= 8 * 5 - 2
    # converged doppler within a few Hz of truth
    assert abs(np.mean(dopplers[-10:]) - true_doppler) < 5.0
    # C/N0 estimate near truth at 20 ms integration
    assert abs(cn0s[-1] - 45.0) < 5.0
    # period boundaries advance by ~samples_per_code
    starts = np.concatenate([s.reshape(-1) for s in all_starts])
    spacing = np.diff(starts)
    assert np.all(np.abs(spacing - 4000) <= 2)


def test_fast_engine_prompt_power():
    """Group prompt magnitude ~ K x per-period prompt (coherent gain)."""
    sat = SatelliteParams(prn=4, cn0_db_hz=50.0, delay_samples=0.0,
                          doppler_hz=-500.0)
    x = generate_gps_l1ca([sat], FS, 0.9, seed=3)
    cfg = TrackingConfig(fs=FS, extend_correlation_symbols=20)
    block = int(FS * 0.02)
    tc = TrackingChannels(cfg, 1, block)
    tc.start_channel(0, 4, gps_l1ca_code(4), 0.0, -495.0, 0)
    for b in range(15):
        tc.process_block(x[b * block: (b + 1) * block + tc.overlap])
    fast = FastTrackingEngine(cfg, 1, groups_per_block=5)
    state = fast.from_track_state(tc.state)
    codes = jnp.asarray(np.asarray(gps_l1ca_code(4), np.float32)[None, :])
    pos = 15 * block
    lo = pos
    seg = x[lo: lo + fast.block_samples + fast.overlap]
    re = jnp.asarray(np.ascontiguousarray(seg.real, np.float32))
    im = jnp.asarray(np.ascontiguousarray(seg.imag, np.float32))
    state, out = fast.process_block(state, re, im, codes)
    group_p = np.abs(np.asarray(out["prompt_re"])[:, 0]
                     + 1j * np.asarray(out["prompt_im"])[:, 0])
    per_p = np.abs(np.asarray(out["period_prompt_re"])[:, 0, :]
                   + 1j * np.asarray(out["period_prompt_im"])[:, 0, :])
    # coherent gain: group ~ sum of periods (>= 15x mean period magnitude)
    assert np.all(group_p > 10.0 * per_p.mean(axis=-1))


import pytest


@pytest.mark.parametrize("true_doppler", [-5000.0, -800.0, 5000.0])
def test_bank_vs_segsum_consistency(true_doppler):
    """The bank correlator (production default) must track the same
    trajectory as the exact segmented-sum form: converged Doppler within
    1 Hz, C/N0 within 1 dB, prompt magnitudes within 2%, code phase
    within 0.02 samples. Parametrized through the Doppler extremes
    (+-5 kHz) where the bank's nominal-rate replicas see the largest
    code-Doppler drift (VERDICT r1 #1 regression guard)."""
    sat = SatelliteParams(prn=13, cn0_db_hz=48.0, delay_samples=1000.0,
                          doppler_hz=true_doppler)
    x = generate_gps_l1ca([sat], FS, 1.2, seed=21)
    cfg = TrackingConfig(fs=FS, extend_correlation_symbols=20,
                         pll_bw_narrow_hz=5.0, dll_bw_narrow_hz=0.75,
                         cn0_smoother_alpha=0.05)
    block = int(FS * 0.02)
    tc = TrackingChannels(cfg, 1, block)
    tc.start_channel(0, 13, gps_l1ca_code(13), 1000.0, true_doppler + 15.0, 0)
    for b in range(20):
        tc.process_block(x[b * block: (b + 1) * block + tc.overlap])
    codes = jnp.asarray(np.asarray(gps_l1ca_code(13), np.float32)[None, :])
    pos = 20 * block
    results = {}
    for mode in ("bank", "segsum"):
        import jax

        fast = FastTrackingEngine(cfg, 1, groups_per_block=5,
                                  correlator=mode)
        # deep-copy: process_block donates its state buffers, and both
        # engines derive their initial state from the same scan state
        state = jax.tree_util.tree_map(
            lambda a: jnp.array(np.asarray(a)), fast.from_track_state(tc.state))
        dop, cn0, pmag, phase = [], [], [], []
        n_blocks = (len(x) - pos - fast.overlap) // fast.block_samples
        for b in range(n_blocks):
            lo = pos + b * fast.block_samples
            seg = x[lo: lo + fast.block_samples + fast.overlap]
            re = jnp.asarray(np.ascontiguousarray(seg.real, np.float32))
            im = jnp.asarray(np.ascontiguousarray(seg.imag, np.float32))
            state, out = fast.process_block(state, re, im, codes)
            valid = np.asarray(out["valid"])[:, 0]
            dop.extend(np.asarray(out["carrier_doppler_hz"])[valid, 0])
            cn0.extend(np.asarray(out["cn0_db_hz"])[valid, 0])
            pmag.extend(np.abs(
                np.asarray(out["prompt_re"])[valid, 0]
                + 1j * np.asarray(out["prompt_im"])[valid, 0]))
            starts = np.asarray(out["period_starts"])[valid, 0, :]
            rems = np.asarray(out["period_rems"])[valid, 0, :]
            phase.extend((lo + starts + rems).reshape(-1))
        results[mode] = (np.array(dop), np.array(cn0), np.array(pmag),
                         np.array(phase))
    dop_b, cn0_b, p_b, ph_b = results["bank"]
    dop_s, cn0_s, p_s, ph_s = results["segsum"]
    n = min(len(dop_b), len(dop_s))
    assert n >= 20
    assert abs(np.mean(dop_b[-8:]) - np.mean(dop_s[-8:])) < 1.0
    assert abs(cn0_b[-1] - cn0_s[-1]) < 1.0
    ratio = p_b[:n] / p_s[:n]
    np.testing.assert_allclose(ratio, 1.0, atol=0.02)
    # converged code-phase boundaries (the pseudorange anchors) agree to
    # 0.02 samples @ 4 Msps = 1.5 m of pseudorange
    m = min(len(ph_b), len(ph_s))
    tail = slice(m - 40, m)
    np.testing.assert_allclose(ph_b[tail], ph_s[tail], atol=0.02)


def test_kf_loop_mode_tracks():
    """KF loop closure (kf_tracking counterpart wired into the fast
    engine): converges on Doppler and holds lock."""
    true_doppler = 900.0
    sat = SatelliteParams(prn=6, cn0_db_hz=47.0, delay_samples=800.0,
                          doppler_hz=true_doppler)
    x = generate_gps_l1ca([sat], FS, 1.4, seed=17)
    cfg = TrackingConfig(fs=FS, extend_correlation_symbols=20,
                         pll_bw_narrow_hz=5.0, dll_bw_narrow_hz=0.75,
                         cn0_smoother_alpha=0.05)
    block = int(FS * 0.02)
    tc = TrackingChannels(cfg, 1, block)
    tc.start_channel(0, 6, gps_l1ca_code(6), 800.0, true_doppler + 25.0, 0)
    for b in range(20):
        tc.process_block(x[b * block: (b + 1) * block + tc.overlap])
    fast = FastTrackingEngine(cfg, 1, groups_per_block=5, loop="kf")
    state = fast.from_track_state(tc.state)
    codes = jnp.asarray(np.asarray(gps_l1ca_code(6), np.float32)[None, :])
    pos = 20 * block
    dopplers, cn0s = [], []
    n_blocks = (len(x) - pos - fast.overlap) // fast.block_samples
    for b in range(n_blocks):
        lo = pos + b * fast.block_samples
        seg = x[lo: lo + fast.block_samples + fast.overlap]
        re = jnp.asarray(np.ascontiguousarray(seg.real, np.float32))
        im = jnp.asarray(np.ascontiguousarray(seg.imag, np.float32))
        state, out = fast.process_block(state, re, im, codes)
        valid = np.asarray(out["valid"])[:, 0]
        dopplers.extend(np.asarray(out["carrier_doppler_hz"])[valid, 0])
        cn0s.extend(np.asarray(out["cn0_db_hz"])[valid, 0])
        assert not np.asarray(out["loss_of_lock"]).any()
    dopplers = np.array(dopplers)
    assert abs(np.mean(dopplers[-10:]) - true_doppler) < 5.0
    assert abs(cn0s[-1] - 47.0) < 5.0
