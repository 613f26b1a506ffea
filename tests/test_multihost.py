"""Multi-device collective patterns on the 8-virtual-device CPU mesh."""

import jax
import numpy as np

from gnss_sdr_tpu.parallel import make_mesh
from gnss_sdr_tpu.parallel.multihost import (
    allreduce_noncoherent_grid,
    halo_exchange_blocks,
)


def test_halo_exchange():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    shards = rng.standard_normal((8, 64)).astype(np.float32)
    out = np.asarray(halo_exchange_blocks(mesh, shards, halo=16))
    assert out.shape == (8, 80)
    for d in range(7):
        np.testing.assert_allclose(out[d, 64:], shards[d + 1, :16])
    np.testing.assert_allclose(out[7, 64:], 0.0)
    np.testing.assert_allclose(out[:, :64], shards)


def test_allreduce_grids():
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    grids = rng.standard_normal((8, 4, 32)).astype(np.float32)
    out = np.asarray(allreduce_noncoherent_grid(mesh, grids))
    total = grids.sum(axis=0)
    for d in range(8):
        np.testing.assert_allclose(out[d], total, rtol=1e-5)


def test_overlap_save_tracking_equivalence():
    """Halo-exchanged time shards reproduce contiguous-stream windows:
    a PRN period starting near a shard edge is fully contained in
    shard+halo — the property the tracking engine's overlap relies on."""
    mesh = make_mesh(8)
    stream = np.arange(8 * 100, dtype=np.float32)
    shards = stream.reshape(8, 100)
    halo = 30
    out = np.asarray(halo_exchange_blocks(mesh, shards, halo=halo))
    # a window of length 30 starting at sample 95 of shard 0 spans the edge
    start = 95
    window = out[0, start:start + 30]
    np.testing.assert_allclose(window, stream[start:start + 30])