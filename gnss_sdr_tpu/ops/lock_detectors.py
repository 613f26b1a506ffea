"""C/N0 estimators and carrier lock detector (planar complex).

Ports of /root/reference/src/algorithms/tracking/libs/lock_detectors.cc,
vectorized over prompt-sample buffers with arbitrary leading batch dims.
``(p_re, p_im)`` are float32 buffers of the last N prompt correlator
outputs along the last axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def cn0_svn_estimator(p_re, p_im, coh_integration_time_s):
    """SNV C/N0 estimate [dB-Hz] (lock_detectors.cc:56-72)."""
    psig = jnp.mean(jnp.abs(p_re), axis=-1) ** 2
    ptot = jnp.mean(p_re**2 + p_im**2, axis=-1)
    snr = psig / jnp.maximum(ptot - psig, jnp.finfo(jnp.float32).tiny)
    return 10.0 * jnp.log10(jnp.maximum(snr, jnp.finfo(jnp.float32).tiny)) \
        - 10.0 * jnp.log10(coh_integration_time_s)


def cn0_m2m4_estimator(p_re, p_im, coh_integration_time_s):
    """Moments-method C/N0 estimate [dB-Hz] (lock_detectors.cc:75-115)."""
    psig = jnp.mean(jnp.abs(p_re), axis=-1) ** 2
    aux = p_re**2 + p_im**2
    m2 = jnp.mean(aux, axis=-1)
    m4 = jnp.mean(aux**2, axis=-1)
    arg = 2.0 * m2 * m2 - m4
    root = jnp.sqrt(jnp.maximum(arg, 0.0))
    # reference falls back to the SNV numerator when the sqrt is NaN
    num = jnp.where(arg >= 0.0, root, psig)
    snr = num / jnp.maximum(m2 - num, jnp.finfo(jnp.float32).tiny)
    return 10.0 * jnp.log10(jnp.maximum(snr, jnp.finfo(jnp.float32).tiny)) \
        - 10.0 * jnp.log10(coh_integration_time_s)


def carrier_lock_detector(p_re, p_im):
    """cos(2*phase_error) estimate via NBD/NBP (lock_detectors.cc:118-151)."""
    si = jnp.sum(p_re, axis=-1)
    sq = jnp.sum(p_im, axis=-1)
    nbp = si * si + sq * sq
    nbd = si * si - sq * sq
    return nbd / jnp.maximum(nbp, jnp.finfo(jnp.float32).tiny)
