"""Carrier-wipeoff multicorrelator.

TPU-native equivalent of the reference's hot tracking loop — the fused
VOLK kernel pair ``volk_gnsssdr_32f_xn_resampler_32f_xn`` (tap-shifted code
resampling) + ``volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn`` (carrier
rotator + N dot products), as orchestrated by
Cpu_Multicorrelator_Real_Codes::Carrier_wipeoff_multicorrelator_resampler
(/root/reference/src/algorithms/tracking/libs/
cpu_multicorrelator_real_codes.cc:72-126).

Semantics reproduced exactly:

- code index per tap:  floor(code_step*n + shift - rem_code) mod L
  (volk_gnsssdr_32f_xn_resampler_32f_xn.h:62-80); all quantities in units
  of code-table entries (chips * code_samples_per_chip).
- carrier wipeoff: x[n] * e^{-j(rem_carr + step*n + 0.5*rate*n^2)}
  (phase_offset conjugate + phase_inc = e^{-j step},
  cpu_multicorrelator_real_codes.cc:113-126).

One call computes all taps of all channels as a batched masked reduction;
an invalid tail (n >= length) contributes zero, which makes per-channel
dynamic PRN-period lengths representable with one static shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def multicorrelate(
    x,                    # [..., L] complex64 input samples
    code_table,           # [..., code_len] float32 local code (+-1 chips)
    shifts,               # [T] float32 tap shifts in code-table units
    rem_code_phase,       # [...] float32, code-table units
    code_phase_step,      # [...] float32, code-table units per sample
    rem_carr_phase_rad,   # [...] float32
    carr_phase_step_rad,  # [...] float32
    length,               # [...] int32 valid samples this period
    carr_phase_rate_step_rad=None,   # [...] float32 (high-dyn) or None
    code_phase_rate_step=None,       # [...] float32 (high-dyn) or None
):
    """Return correlator outputs [..., T] complex64.

    ``...`` is any batch shape (channels). L is the static max period
    length; ``length`` masks the live prefix.
    """
    L = x.shape[-1]
    code_len = code_table.shape[-1]
    n = jnp.arange(L, dtype=jnp.float32)
    valid = n < length[..., None].astype(jnp.float32)

    # carrier wipeoff (negative-rotation NCO)
    phase = rem_carr_phase_rad[..., None] + carr_phase_step_rad[..., None] * n
    if carr_phase_rate_step_rad is not None:
        phase = phase + 0.5 * carr_phase_rate_step_rad[..., None] * n * n
    rotated = x * (jnp.cos(phase) - 1j * jnp.sin(phase))
    rotated = jnp.where(valid, rotated, 0.0)

    # tap-shifted code resampling: idx[t, n] = floor(step*n + shift_t - rem)
    base = code_phase_step[..., None] * n - rem_code_phase[..., None]
    if code_phase_rate_step is not None:
        base = base + 0.5 * code_phase_rate_step[..., None] * n * n
    idx = jnp.floor(base[..., None, :] + shifts[:, None]).astype(jnp.int32)
    idx = jnp.mod(idx, code_len)
    codes = jnp.take_along_axis(
        code_table[..., None, :], idx, axis=-1
    )  # [..., T, L]

    return jnp.sum(codes * rotated[..., None, :], axis=-1)
