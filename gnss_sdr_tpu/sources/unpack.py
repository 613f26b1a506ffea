"""Packed sample-format unpackers (2-bit formats).

Vectorized counterparts of the reference's byte-serial unpacker blocks
(/root/reference/src/algorithms/signal_source/gnuradio_blocks/
unpack_2bit_samples.cc, unpack_byte_2bit_cpx_samples.cc): each byte carries
four signed 2-bit fields (two's complement, values -2..+1), least-significant
bits first, matching the C bit-field layout ``signed sample_0 : 2; ...`` on
little-endian hosts.
"""

from __future__ import annotations

import numpy as np


def _sign_extend_2bit(fields: np.ndarray) -> np.ndarray:
    """Interpret 2-bit fields (0..3) as two's complement (-2..1)."""
    return np.where(fields >= 2, fields.astype(np.int8) - 4, fields).astype(np.int8)


def unpack_2bit_samples(
    data: np.ndarray, big_endian_bytes: bool = False
) -> np.ndarray:
    """Unpack bytes into 4x signed 2-bit samples each.

    ``big_endian_bytes=False`` (default) emits the low-order field first,
    like the reference on a little-endian host; ``True`` reverses the field
    order within each byte.
    """
    b = np.asarray(data, dtype=np.uint8)
    fields = np.stack(
        [(b >> 0) & 0x3, (b >> 2) & 0x3, (b >> 4) & 0x3, (b >> 6) & 0x3], axis=1
    )
    if big_endian_bytes:
        fields = fields[:, ::-1]
    return _sign_extend_2bit(fields.reshape(-1))


def unpack_byte_2bit_cpx_samples(
    data: np.ndarray, reverse_interleaving: bool = False
) -> np.ndarray:
    """Unpack bytes of two 2-bit I/Q pairs into complex64 samples.

    Byte layout (lsb first): I0, Q0, I1, Q1 -- two complex samples per byte
    (unpack_byte_2bit_cpx_samples.cc). ``reverse_interleaving`` swaps the
    I/Q roles (Q first), as the reference option of the same name.
    """
    flat = unpack_2bit_samples(data).astype(np.float32)
    i = flat[0::2]
    q = flat[1::2]
    if reverse_interleaving:
        i, q = q, i
    return (i + 1j * q).astype(np.complex64)
