"""Code and carrier tracking discriminators.

Formula-for-formula ports of
/root/reference/src/algorithms/tracking/libs/tracking_discriminators.cc
(outputs in the reference's units), vectorized over a channel axis.
Complex correlator values are passed as jnp complex64 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def phase_unwrap(phase_rad):
    """Fold into (-pi/2, pi/2] (tracking_discriminators.cc:27-41)."""
    phase_rad = jnp.where(phase_rad >= jnp.pi / 2, phase_rad - jnp.pi, phase_rad)
    return jnp.where(phase_rad <= -jnp.pi / 2, phase_rad + jnp.pi, phase_rad)


def fll_four_quadrant_atan(p1, p2, t1, t2):
    """FLL atan2(cross, dot)/(t2-t1) [rad/s] (:46-57)."""
    dot = p1.real * p2.real + p1.imag * p2.imag
    cross = p1.real * p2.imag - p2.real * p1.imag
    return jnp.arctan2(cross, dot) / (t2 - t1)


def fll_diff_atan(p1, p2, t1, t2):
    """FLL differential atan discriminator [rad/s] (:60-75).

    NaNs from zero real parts collapse to 0 like the reference's isnan
    guard.
    """
    a2 = jnp.arctan(p2.imag / p2.real)
    a1 = jnp.arctan(p1.imag / p1.real)
    diff = a2 - a1
    diff = jnp.where(jnp.isnan(diff), 0.0, diff)
    return phase_unwrap(diff) / (t2 - t1)


def pll_four_quadrant_atan(prompt):
    """PLL atan2(Q, I) [rad] (:78-87)."""
    return jnp.arctan2(prompt.imag, prompt.real)


def pll_cloop_two_quadrant_atan(prompt):
    """Costas-loop atan(Q/I) [rad], 0 when I == 0 (:90-102)."""
    ratio = jnp.where(prompt.real != 0.0, prompt.imag / jnp.where(
        prompt.real != 0.0, prompt.real, 1.0), 0.0)
    return jnp.arctan(ratio)


def dll_nc_e_minus_l_normalized(early, late, spc=0.5, slope=1.0, y_intercept=1.0):
    """Normalized noncoherent E-L envelope discriminator [chips] (:105-124).

    ``slope``/``y_intercept`` implement the BOC correlation-function
    correction the reference applies for sinBOC/CBOC signals
    (dll_pll_conf.h and SinBocCorrelationFunction).
    """
    e = jnp.abs(early)
    l = jnp.abs(late)
    s = e + l
    raw = jnp.where(s > 0.0, (e - l) / jnp.where(s > 0.0, s, 1.0), 0.0)
    return ((y_intercept - slope * spc) / slope) * raw


def dll_nc_vemlp_normalized(very_early, early, late, very_late):
    """VEMLP discriminator for VEML (5-tap) tracking [chips] (:127-149)."""
    e = jnp.sqrt(jnp.abs(very_early) ** 2 + jnp.abs(early) ** 2)
    l = jnp.sqrt(jnp.abs(late) ** 2 + jnp.abs(very_late) ** 2)
    s = e + l
    return jnp.where(s > 0.0, (e - l) / jnp.where(s > 0.0, s, 1.0), 0.0)
