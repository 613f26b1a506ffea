import numpy as np

from gnss_sdr_tpu.conditioner import (
    design_lowpass_taps,
    fir_filter,
    freq_xlating_fir_filter,
    direct_resample_indices,
)
from gnss_sdr_tpu.ops.cplx import from_complex, to_complex


def test_lowpass_rejects_out_of_band():
    fs = 4e6
    taps = design_lowpass_taps(fs, 1.2e6, 0.4e6, ntaps=97)
    n = 4096
    t = np.arange(n) / fs
    inband = np.exp(2j * np.pi * 0.5e6 * t).astype(np.complex64)
    outband = np.exp(2j * np.pi * 1.9e6 * t).astype(np.complex64)
    y_in = to_complex(fir_filter(from_complex(inband), taps))
    y_out = to_complex(fir_filter(from_complex(outband), taps))
    # compare steady-state power (skip the transient)
    p_in = np.mean(np.abs(y_in[200:]) ** 2)
    p_out = np.mean(np.abs(y_out[200:]) ** 2)
    assert p_in > 0.9
    assert p_out < 1e-3 * p_in


def test_fir_matches_numpy_convolution():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype(
        np.complex64)
    taps = rng.standard_normal(31).astype(np.float32)
    got = to_complex(fir_filter(from_complex(x), taps))
    ref = np.convolve(x, taps, mode="full")[:500]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_freq_xlating_decimator():
    fs = 8e6
    f0 = 2e6
    n = 8192
    t = np.arange(n) / fs
    # IF carrier at f0 + 10 kHz -> baseband 10 kHz after translation
    x = np.exp(2j * np.pi * (f0 + 1e4) * t).astype(np.complex64)
    taps = design_lowpass_taps(fs, 1.5e6, 0.5e6, ntaps=97)
    y = to_complex(freq_xlating_fir_filter(from_complex(x), taps, f0, fs,
                                           decimation=4))
    assert y.shape[0] == n // 4
    # instantaneous frequency of the decimated output ~ 10 kHz
    ph = np.unwrap(np.angle(y[100:]))
    freq = np.mean(np.diff(ph)) * (fs / 4) / (2 * np.pi)
    assert abs(freq - 1e4) < 200.0


def test_direct_resampler_indices():
    idx = direct_resample_indices(100, 10.0, 4.0)
    assert idx.shape[0] == 40
    assert idx[0] == 0 and idx[1] == 2 and idx[-1] <= 99
    # identity when rates match
    idx2 = direct_resample_indices(50, 5.0, 5.0)
    np.testing.assert_array_equal(idx2, np.arange(50))


def test_pulse_blanking_removes_pulses():
    from gnss_sdr_tpu.conditioner.interference import pulse_blanking

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
        np.complex64)
    x[100:110] += 100.0  # strong pulse
    re, im = pulse_blanking(from_complex(x), threshold_sigma=5.0)
    out = np.asarray(re) + 1j * np.asarray(im)
    assert np.all(np.abs(out[100:110]) == 0)
    # untouched elsewhere (allow a few statistical false blanks)
    untouched = np.mean(out[200:] == x[200:])
    assert untouched > 0.99


def test_notch_excision_removes_cw():
    from gnss_sdr_tpu.conditioner.interference import notch_filter_block

    rng = np.random.default_rng(1)
    n = 4000
    t = np.arange(n)
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    cw = 30.0 * np.exp(2j * np.pi * 0.12 * t)  # strong CW jammer
    x = (noise + cw).astype(np.complex64)
    re, im = notch_filter_block(from_complex(x), excision_factor=8.0)
    out = np.asarray(re) + 1j * np.asarray(im)
    # jammer suppressed: residual power near noise level
    p_out = np.mean(np.abs(out) ** 2)
    p_in = np.mean(np.abs(x) ** 2)
    assert p_out < 0.02 * p_in
    assert abs(p_out - np.mean(np.abs(noise) ** 2)) < 0.5 * np.mean(
        np.abs(noise) ** 2)


def test_beamformer_gain_and_null():
    """Steered array gains M in the look direction and attenuates
    off-axis interference (Beamformer_Filter counterpart)."""
    import numpy as np
    from gnss_sdr_tpu.conditioner.beamformer import (
        BeamformerFilter, array_response, steering_weights)

    rng = np.random.default_rng(0)
    m_ant, n = 8, 4096
    sig = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    jam = 10 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    a_sig = array_response(m_ant, 0.5, 10.0)
    a_jam = array_response(m_ant, 0.5, 55.0)
    x = a_sig[:, None] * sig[None, :] + a_jam[:, None] * jam[None, :]
    bf = BeamformerFilter(steering_weights(m_ant, 0.5, 10.0))
    y = bf.apply(x)
    # signal passes at unity gain (weights normalized by M)
    corr = np.vdot(sig, y) / np.vdot(sig, sig)
    assert abs(abs(corr) - 1.0) < 0.05
    # interference suppressed relative to a single antenna
    jam_res = y - corr * sig
    jam_single = x[0] - a_sig[0] * sig
    assert np.mean(np.abs(jam_res) ** 2) < 0.2 * np.mean(
        np.abs(jam_single) ** 2)
    # wrong channel count rejected
    import pytest
    with pytest.raises(ValueError, match="antenna channels"):
        bf.apply(x[:5])
