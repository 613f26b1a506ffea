"""Kernel-layer unit tests: discriminators, loop filters, lock detectors,
multicorrelator — planar implementations checked against straightforward
NumPy complex formulations of the reference math."""

import numpy as np

from gnss_sdr_tpu.ops import discriminators as disc
from gnss_sdr_tpu.ops import lock_detectors as lockdet
from gnss_sdr_tpu.ops import loop_filters as lf
from gnss_sdr_tpu.ops.correlator import multicorrelate


def _scalar(x) -> float:
    return float(np.ravel(x)[0])



def test_pll_discriminators():
    p = np.array([1 + 0.5j, -2 + 0.1j, 0.3 - 0.4j], dtype=np.complex64)
    got = np.asarray(disc.pll_four_quadrant_atan(p.real, p.imag))
    np.testing.assert_allclose(got, np.arctan2(p.imag, p.real), rtol=1e-6)
    got2 = np.asarray(disc.pll_cloop_two_quadrant_atan(p.real, p.imag))
    np.testing.assert_allclose(got2, np.arctan(p.imag / p.real), rtol=1e-6)


def test_fll_discriminators():
    p1 = np.array([1 + 0.1j], dtype=np.complex64)
    p2 = np.array([1 + 0.3j], dtype=np.complex64)
    t = 0.001
    got = _scalar((disc.fll_four_quadrant_atan(
        p1.real, p1.imag, p2.real, p2.imag, 0.0, t)))
    dot = (p1.real * p2.real + p1.imag * p2.imag)[0]
    cross = (p1.real * p2.imag - p2.real * p1.imag)[0]
    assert abs(got - np.arctan2(cross, dot) / t) < 1e-3  # f32 atan2
    got2 = _scalar((disc.fll_diff_atan(
        p1.real, p1.imag, p2.real, p2.imag, 0.0, t)))
    expected = (np.arctan(p2.imag / p2.real)
                - np.arctan(p1.imag / p1.real))[0] / t
    assert abs(got2 - expected) < 1e-2


def test_dll_discriminator_zero_at_balance():
    e = np.array([3.0 + 4.0j], dtype=np.complex64)  # |E| = 5
    l = np.array([5.0 + 0.0j], dtype=np.complex64)  # |L| = 5
    got = _scalar((disc.dll_nc_e_minus_l_normalized(
        e.real, e.imag, l.real, l.imag)))
    assert abs(got) < 1e-6
    # sign: E > L -> positive error
    l2 = np.array([2.0 + 0.0j], dtype=np.complex64)
    got2 = _scalar((disc.dll_nc_e_minus_l_normalized(
        e.real, e.imag, l2.real, l2.imag)))
    assert got2 > 0


def test_loop_filter_matches_direct_recurrence():
    # order-2, no last integrator: y[n] = y[n-1] + b0 x[n] + b1 x[n-1]
    T, bw = 0.001, 2.0
    ic, oc = lf.loop_filter_coefficients(T, bw, 2, False)
    state = lf.iir_init(())
    rng = np.random.default_rng(0)
    xs = rng.standard_normal(50).astype(np.float32)
    y_prev, x_prev = 0.0, 0.0
    import jax.numpy as jnp

    for x in xs:
        state, y = lf.iir_step(state, jnp.float32(x), jnp.asarray(ic),
                               jnp.asarray(oc))
        y_ref = y_prev + ic[0] * x + ic[1] * x_prev
        assert abs(float(y) - y_ref) < 1e-4 * max(1.0, abs(y_ref))
        y_prev, x_prev = y_ref, x


def test_fll_pll_filter_order2_recurrence():
    gains = lf.FllPllGains.make(fll_bw_hz=35.0, pll_bw_hz=35.0, order=2)
    state = lf.fll_pll_init(gains, 1000.0)
    w = 1000.0
    import jax.numpy as jnp

    for k in range(10):
        pll_d, fll_d, T = 0.01 * k, 0.1, 0.001
        state, err = lf.fll_pll_step(
            state, jnp.float32(fll_d), jnp.float32(pll_d), jnp.float32(T),
            gains)
        w_new = w + pll_d * gains.pll_w0p2 * T + fll_d * gains.pll_w0f * T
        err_ref = 0.5 * (w_new + w) + gains.pll_a2 * gains.pll_w0p * pll_d
        assert abs(float(err) - err_ref) < 1e-2
        w = w_new


def test_lock_detectors_vs_complex():
    rng = np.random.default_rng(1)
    p = (rng.normal(10, 1, 20) + 1j * rng.normal(0, 1, 20)).astype(
        np.complex64)
    cn0 = _scalar((lockdet.cn0_svn_estimator(
        p.real.astype(np.float32), p.imag.astype(np.float32), 0.001)))
    psig = np.mean(np.abs(p.real)) ** 2
    ptot = np.mean(np.abs(p) ** 2)
    ref = 10 * np.log10(psig / (ptot - psig)) - 10 * np.log10(0.001)
    assert abs(cn0 - ref) < 0.1
    lock = _scalar((lockdet.carrier_lock_detector(
        p.real.astype(np.float32), p.imag.astype(np.float32))))
    si, sq = np.sum(p.real), np.sum(p.imag)
    ref_lock = (si * si - sq * sq) / (si * si + sq * sq)
    assert abs(lock - ref_lock) < 1e-4


def test_multicorrelator_vs_numpy():
    """Planar device correlator == direct numpy complex evaluation of the
    reference semantics (resampler floor indexing + negative rotator)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    L, code_len = 500, 1023
    code = np.where(rng.integers(0, 2, code_len) == 1, 1.0, -1.0).astype(
        np.float32)
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(
        np.complex64)
    shifts = np.array([-0.5, 0.0, 0.5], dtype=np.float32)
    rem_code, step_code = 0.37, 0.2557
    rem_carr, step_carr = 0.8, 0.0026
    length = 480

    got_re, got_im = multicorrelate(
        jnp.asarray(x.real)[None], jnp.asarray(x.imag)[None],
        jnp.asarray(code)[None], jnp.asarray(shifts),
        jnp.float32(rem_code)[None], jnp.float32(step_code)[None],
        jnp.float32(rem_carr)[None], jnp.float32(step_carr)[None],
        jnp.int32(length)[None],
    )
    got = np.asarray(got_re)[0] + 1j * np.asarray(got_im)[0]

    n = np.arange(L)
    rot = np.exp(-1j * (rem_carr + step_carr * n))
    ref = np.zeros(3, dtype=np.complex128)
    for t, sh in enumerate(shifts):
        idx = np.floor(step_code * n + sh - rem_code).astype(np.int64) % code_len
        ref[t] = np.sum((x * rot * code[idx])[:length])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-3)
