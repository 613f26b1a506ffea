"""Sample-rate conversion.

Counterpart of the reference's Direct_Resampler
(/root/reference/src/algorithms/resampler/gnuradio_blocks/
direct_resampler_conditioner_cc.cc:1-112): nearest-sample decimation via a
phase accumulator. Expressed as a static gather-index map so it fuses into
the surrounding device program.
"""

from __future__ import annotations

import numpy as np


def direct_resample_indices(
    n_in: int, fs_in: float, fs_out: float
) -> np.ndarray:
    """Input indices selecting output samples at ``fs_out``.

    Reproduces the reference's phase-accumulator selection: the k-th output
    takes the input sample where the accumulated phase crosses, i.e.
    index floor(k * fs_in / fs_out).
    """
    n_out = int(np.floor(n_in * fs_out / fs_in))
    idx = np.floor(np.arange(n_out) * (fs_in / fs_out)).astype(np.int64)
    return np.minimum(idx, n_in - 1)


def mmse_resample(x, fs_in: float, fs_out: float):
    """Fractional-delay resampler (linear-interpolating polyphase).

    Counterpart of the reference's Mmse_Resampler adapter (GNU Radio
    mmse_resampler_cc): here a 2-tap linear interpolator on planar
    complex samples — the standard quality/throughput point for
    downsampling GNSS IF streams to ``internal_fs_sps``.
    """
    import jax.numpy as jnp

    n_in = x[0].shape[-1]
    n_out = int(np.floor((n_in - 1) * fs_out / fs_in))
    pos = jnp.arange(n_out, dtype=jnp.float32) * jnp.float32(fs_in / fs_out)
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0.astype(jnp.float32)
    i1 = jnp.minimum(i0 + 1, n_in - 1)

    def lerp(arr):
        a = jnp.take(arr, i0, axis=-1)
        b = jnp.take(arr, i1, axis=-1)
        return a * (1.0 - frac) + b * frac

    return (lerp(x[0]), lerp(x[1]))
