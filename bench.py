"""Headline benchmark: 12-channel GPS L1 C/A signal plane on one chip.

Measures steady-state IF sample throughput of the receiver's device
pipeline — 12 tracking channels (DLL/PLL block program) plus one batched
12-PRN acquisition per simulated second (cold-start duty cycle) — at the
reference configuration (fs = 4 Msps, BASELINE.json config 2 analogue).

Baseline: the reference claims real-time processing on a desktop CPU
(/root/reference/README.md:1283), i.e. fs samples/s for 12 channels;
``vs_baseline`` is the real-time factor (value / fs). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

FS = 4.0e6
N_CHANNELS = 12
BLOCK_MS = 20
SIM_SECONDS_PER_REP = 1.0


def main() -> None:
    import jax

    # persistent compile cache: the tunneled TPU backend compiles remotely
    # (minutes per program); caching makes repeat runs near-instant
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from gnss_sdr_tpu.acquisition.adapters import make_gps_l1ca_acquisition
    from gnss_sdr_tpu.acquisition.pcps import _pcps_magnitude_grid
    from gnss_sdr_tpu.codes import gps_l1ca_code
    from gnss_sdr_tpu.simulate import SatelliteParams, generate_gps_l1ca
    from gnss_sdr_tpu.tracking import TrackingConfig
    from gnss_sdr_tpu.tracking.fast_engine import FastTrackingEngine

    # steady-state production path: extended coherent integration (20 ms
    # groups) on the group-batched engine; the scan engine only handles
    # pull-in transients, which are not the steady-state rate
    cfg = TrackingConfig(fs=FS, extend_correlation_symbols=20,
                         pll_bw_narrow_hz=5.0, dll_bw_narrow_hz=0.75)
    engine = FastTrackingEngine(cfg, N_CHANNELS, groups_per_block=5)
    block_samples = engine.block_samples           # 100 ms at 4 Msps
    blocks_per_rep = int(SIM_SECONDS_PER_REP * FS / block_samples)
    prns = list(range(1, N_CHANNELS + 1))
    acq = make_gps_l1ca_acquisition(prns, FS, doppler_max=5000,
                                    doppler_step=250, pfa=0.001)

    # --- representative input data ---------------------------------------
    sats = [SatelliteParams(prn=p, cn0_db_hz=45.0,
                            delay_samples=137.0 * p,
                            doppler_hz=250.0 * p - 1500.0)
            for p in prns[:4]]
    sig_s = (2 * block_samples + engine.overlap) / FS + 0.001
    sig = generate_gps_l1ca(sats, FS, sig_s, seed=0)
    n_in = block_samples + engine.overlap

    def planar(seg):
        return (jnp.asarray(np.ascontiguousarray(seg.real, np.float32)),
                jnp.asarray(np.ascontiguousarray(seg.imag, np.float32)))

    block_a = planar(sig[:n_in])
    block_b = planar(sig[block_samples:block_samples + n_in])
    codes = jnp.asarray(np.stack(
        [np.asarray(gps_l1ca_code(p), dtype=np.float32) for p in prns]))
    if engine.correlator == "bank":
        codes = engine._get_bank(codes)  # resampled-code bank [C,P+1,T,L]

    state = engine.init_state()
    for ch in range(N_CHANNELS):
        state = engine.start_channel(
            state, ch, doppler_hz=250.0 * ch - 1500.0,
            offset_samples=37 * ch)

    acq_x = planar(sig[:acq.cfg.fft_size])
    acq_dopp = acq._dopplers

    # superblock: one device call per simulated second (the steady-state
    # real-time path; per-call dispatch would otherwise dominate)
    blocks_re = jnp.stack([(block_a if b % 2 == 0 else block_b)[0]
                           for b in range(blocks_per_rep)])
    blocks_im = jnp.stack([(block_a if b % 2 == 0 else block_b)[1]
                           for b in range(blocks_per_rep)])

    def one_rep(state):
        state, outputs = engine._superblock_step(
            state, blocks_re, blocks_im, codes)
        grid = _pcps_magnitude_grid(
            acq_x[0], acq_x[1], acq._code_fft_re, acq._code_fft_im,
            acq_dopp, jnp.float32(FS), plan=acq._plan,
            offset=acq._offset, eff=acq._eff)
        return state, outputs, grid

    # --- warmup (compile) -------------------------------------------------
    state, outputs, grid = one_rep(state)
    jax.block_until_ready((state, outputs, grid))

    # --- timed reps -------------------------------------------------------
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, outputs, grid = one_rep(state)
    jax.block_until_ready((state, outputs, grid))
    elapsed = time.perf_counter() - t0

    samples_processed = reps * blocks_per_rep * block_samples
    value = samples_processed / elapsed

    # --- channel-scaling on chip (the data-parallel channel axis) --------
    # tracking 48 channels vs 12 measures how far from the chip's roof the
    # 12-channel config sits; per-channel efficiency ~1 means the chip
    # absorbs 4x the constellation at the same sample rate (SURVEY
    # section 2.10: the channel axis is the natural scale-out axis)
    n_big = 48
    big = FastTrackingEngine(cfg, n_big, groups_per_block=5)
    big_codes = jnp.asarray(np.stack(
        [np.asarray(gps_l1ca_code((p % 32) + 1), dtype=np.float32)
         for p in range(n_big)]))
    if big.correlator == "bank":
        big_codes = big._get_bank(big_codes)
    bstate = big.init_state()
    for ch in range(n_big):
        bstate = big.start_channel(
            bstate, ch, doppler_hz=150.0 * ch - 3000.0,
            offset_samples=29 * ch)
    bstate, bo = big._superblock_step(bstate, blocks_re, blocks_im,
                                      big_codes)
    jax.block_until_ready((bstate, bo))
    t0 = time.perf_counter()
    for _ in range(3):
        bstate, bo = big._superblock_step(bstate, blocks_re, blocks_im,
                                          big_codes)
    jax.block_until_ready((bstate, bo))
    big_value = 3 * blocks_per_rep * block_samples / (
        time.perf_counter() - t0)
    scaling_eff = (big_value * n_big) / (value * N_CHANNELS)

    # --- end-to-end production receiver (host loops included) ------------
    # Cold start on the scan engine, handoff, then superblock steady state
    # with vectorized decoder feeding + observables/PVT — the number a
    # deployment actually gets, not just the kernel.
    from gnss_sdr_tpu.receiver import ReceiverConfig
    from gnss_sdr_tpu.receiver.production import ProductionReceiver
    from gnss_sdr_tpu.simulate.lnav import build_lnav_bits
    from gnss_sdr_tpu.simulate.scenario import make_constellation

    e2e_seconds = 10.0
    ephs = make_constellation(range(1, N_CHANNELS + 1), toe_s=7200.0)
    e2e_sats = [SatelliteParams(prn=p, cn0_db_hz=47.0,
                                delay_samples=137.0 * p,
                                doppler_hz=250.0 * p - 1500.0,
                                data_bits=build_lnav_bits(ephs[p], 1800, 3))
                for p in prns]
    e2e_sig = generate_gps_l1ca(e2e_sats, FS, e2e_seconds, seed=3)
    rcfg = ReceiverConfig(fs=FS, n_channels=N_CHANNELS, acq_pfa=0.001,
                          acq_dwells=2, output_rate_ms=100,
                          pull_in_time_s=0.4, extend_correlation_symbols=20,
                          pll_bw_narrow_hz=5.0, dll_bw_narrow_hz=0.75)
    # warm the compile caches with a run over the FULL capture (it must
    # reach every program the timed run uses: pull-in ring superblocks,
    # the 20-block steady-state ring superblock AND the 5/1-block tail
    # shapes), then time fresh receivers; best of 2 damps the shared
    # chip's contention variance
    warm = ProductionReceiver(rcfg, satellites=list(prns), blocks_per_call=20)
    warm.run(e2e_sig)
    e2e_elapsed = float("inf")
    for _ in range(2):
        rec = ProductionReceiver(rcfg, satellites=list(prns),
                                 blocks_per_call=20)
        t0 = time.perf_counter()
        rec.run(e2e_sig)
        e2e_elapsed = min(e2e_elapsed, time.perf_counter() - t0)
    e2e_value = len(e2e_sig) / e2e_elapsed
    tm = rec.timings
    steady = tm["phase_b_samples"] / tm["phase_b_s"] \
        if tm["phase_b_s"] > 0 else 0.0

    print(json.dumps({
        "metric": "GPS L1 C/A 12-channel tracking + batched acquisition, "
                  "IF samples/s/chip",
        "value": round(value, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(value / FS, 3),
        "e2e_receiver_samples_per_s": round(e2e_value, 1),
        "e2e_vs_realtime": round(e2e_value / FS, 3),
        "e2e_steady_state_samples_per_s": round(steady, 1),
        "e2e_steady_state_vs_realtime": round(steady / FS, 3),
        "e2e_in_fast_mode": rec.in_fast_mode,
        "tracking_48ch_samples_per_s": round(big_value, 1),
        "channel_scaling_efficiency_48v12": round(scaling_eff, 3),
    }))


if __name__ == "__main__":
    main()
