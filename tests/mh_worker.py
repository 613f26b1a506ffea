"""Multi-process worker for test_multiprocess.py.

Runs channel-sharded tracking + halo exchange + cross-process dwell
psum on a jax.distributed CPU mesh spanning all worker processes.
Process 0 writes the gathered results to ``outdir/mh_out.npz``.

Usage: python mh_worker.py <pid> <nproc> <coordinator> <outdir>
"""

import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], sys.argv[4]

    import jax

    from gnss_sdr_tpu.parallel.multihost import init_cpu_multiprocess

    init_cpu_multiprocess(coordinator, nproc, pid, devices_per_process=2)

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gnss_sdr_tpu.parallel.multihost import (
        allreduce_noncoherent_grid,
        halo_exchange_blocks,
    )

    devs = jax.devices()
    n_dev = len(devs)
    assert n_dev == 2 * nproc, f"expected {2 * nproc} global devices, got {n_dev}"
    mesh = Mesh(np.array(devs), ("ch",))
    shard_c = NamedSharding(mesh, P("ch"))
    rep = NamedSharding(mesh, P())

    # --- channel-sharded tracking over the global mesh -------------------
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_engine, _example_inputs

    from gnss_sdr_tpu.tracking import TrackingConfig, TrackingEngine

    fs = 1.0e5
    cfg = TrackingConfig(fs=fs)
    n_channels = 2 * n_dev
    engine = TrackingEngine(cfg, n_channels, block_samples=400)
    state, block_re, block_im, codes = _example_inputs(engine, seed=11)

    state = jax.tree.map(
        lambda a: jax.device_put(a, shard_c if a.ndim >= 1
                                 and a.shape[0] == n_channels else rep),
        state)
    block_re = jax.device_put(block_re, rep)
    block_im = jax.device_put(block_im, rep)
    codes = jax.device_put(codes, shard_c)

    prompts = []
    with mesh:
        for _ in range(3):
            state, out = engine._block_step(state, block_re, block_im, codes)
            prompts.append(out["prompt_re"])
    gathered = multihost_utils.process_allgather(
        jnp.stack(prompts), tiled=True)

    # --- halo exchange of IF time shards across processes ----------------
    rng = np.random.default_rng(3)
    shards = rng.standard_normal((n_dev, 64)).astype(np.float32)
    sh = jax.device_put(jnp.asarray(shards), shard_c)
    with mesh:
        haloed = halo_exchange_blocks(mesh, sh, halo=16)
    haloed_g = multihost_utils.process_allgather(haloed, tiled=True)

    # --- cross-process non-coherent dwell accumulation -------------------
    grids = rng.standard_normal((n_dev, 4, 32)).astype(np.float32) ** 2
    gr = jax.device_put(jnp.asarray(grids), shard_c)
    with mesh:
        summed = allreduce_noncoherent_grid(mesh, gr)
    summed_g = multihost_utils.process_allgather(summed, tiled=True)

    # --- production fast engine sharded ACROSS the process mesh ----------
    # the ring-offset i8 superblock program (the perf-critical serving
    # path) with FastState + code bank partitioned over the global
    # channel axis; must be bit-identical to the local unsharded run
    from __graft_entry__ import _fast_engine_sharded_case

    import functools

    with mesh:
        fast_1, fast_n = _fast_engine_sharded_case(
            mesh, n_dev,
            materialize=functools.partial(
                multihost_utils.process_allgather, tiled=True))
    fast_identical = bool(np.array_equal(fast_1, fast_n))

    if pid == 0:
        np.savez(f"{outdir}/mh_out.npz",
                 prompts=np.asarray(gathered),
                 haloed=np.asarray(haloed_g),
                 halo_in=shards,
                 grids=grids,
                 summed=np.asarray(summed_g),
                 fast_packed=fast_n,
                 fast_identical=fast_identical,
                 n_dev=n_dev)
    # all processes must stay alive until the gathers complete everywhere
    multihost_utils.sync_global_devices("mh_worker_done")


if __name__ == "__main__":
    main()
