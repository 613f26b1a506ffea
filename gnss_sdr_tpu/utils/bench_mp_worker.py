"""Multi-process scaling bench worker (SURVEY §7.7 harness).

Each process runs the 12-channel fast-engine superblock kernel on its
own CPU devices inside a jax.distributed (gloo) mesh spanning all
processes, with one cross-process ``psum`` per superblock so the
collective path is genuinely exercised. Process 0 writes its measured
throughput to ``outdir/bench_mp_<nproc>.json``.

Usage: python -m gnss_sdr_tpu.utils.bench_mp_worker <pid> <nproc>
       <coordinator> <outdir>
"""

import json
import os
import sys
import time


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], sys.argv[4]

    import jax

    if nproc > 1:
        from gnss_sdr_tpu.parallel.multihost import init_cpu_multiprocess

        init_cpu_multiprocess(coordinator, nproc, pid,
                              devices_per_process=1)

    import jax.numpy as jnp
    import numpy as np

    from gnss_sdr_tpu.codes import gps_l1ca_code
    from gnss_sdr_tpu.tracking import TrackingConfig
    from gnss_sdr_tpu.tracking.fast_engine import FastTrackingEngine

    FS = 4.0e6
    N = 12
    cfg = TrackingConfig(fs=FS, extend_correlation_symbols=20,
                         pll_bw_narrow_hz=5.0, dll_bw_narrow_hz=0.75)
    engine = FastTrackingEngine(cfg, N, groups_per_block=5)
    fb = engine.block_samples
    nb = 5
    n_in = fb + engine.overlap
    rng = np.random.default_rng(pid)
    cap = rng.integers(-30, 30, size=(2, nb * fb + n_in), dtype=np.int8)
    codes = jnp.asarray(np.stack(
        [np.asarray(gps_l1ca_code(p + 1), np.float32) for p in range(N)]))
    bank = engine._get_bank(codes)
    ring = jax.device_put(cap, jax.local_devices()[0])
    state = engine.init_state()
    for ch in range(N):
        state = engine.start_channel(state, ch, 250.0 * ch - 1500.0, 37 * ch)

    def sync_scalar(x: float) -> float:
        # one cross-process collective per superblock (the dwell-psum /
        # verdict-gather role in a sharded deployment)
        if nproc > 1:
            from jax.experimental import multihost_utils

            return float(multihost_utils.process_allgather(
                jnp.float32(x)).sum())
        return x

    state, out = engine._superblock_ring_i8(state, ring, jnp.int32(0),
                                            nb, bank)
    jax.block_until_ready(state)
    sync_scalar(0.0)
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        state, out = engine._superblock_ring_i8(state, ring, jnp.int32(0),
                                                nb, bank)
        jax.block_until_ready(state)
        sync_scalar(1.0)
    dt = time.perf_counter() - t0
    sps = reps * nb * fb / dt
    if pid == 0:
        with open(os.path.join(outdir, f"bench_mp_{nproc}.json"), "w") as fh:
            json.dump({"samples_per_s_per_proc": sps, "nproc": nproc}, fh)


if __name__ == "__main__":
    main()
