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
