"""PCPS acquisition tests.

Mirrors the reference's acquisition unit-test strategy
(src/tests/unit-tests/signal-processing-blocks/acquisition/
gps_l1_ca_pcps_acquisition_test.cc): synthetic signals with known
delay/Doppler plus the recorded 4 Msps fixture with truth
delay=524 samples, Doppler=1680 Hz, and its tolerance bounds
(doppler error <= 666 Hz, delay error < 0.5 chip).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.acquisition import AcqConfig
from gnss_sdr_tpu.acquisition.adapters import make_gps_l1ca_acquisition
from gnss_sdr_tpu.codes import gps_l1ca_code, sample_code
from gnss_sdr_tpu.sources import FileSignalSource
from tests.conftest import reference_sample_file

FS = 4.0e6
SAMPLES_PER_CODE = 4000
CHIP_SAMPLES = FS / 1.023e6  # ~3.91 samples per chip


def synth_signal(
    prn, delay_samples, doppler_hz, n_ms, cn0_db=45.0, fs=FS, seed=1
):
    """Complex baseband C/A signal with known delay/Doppler + AWGN."""
    rng = np.random.default_rng(seed)
    n = int(fs * n_ms * 1e-3)
    code = sample_code(gps_l1ca_code(prn), fs, 1.023e6)
    chips = np.tile(code, n_ms + 2)[: n + int(delay_samples) + 1]
    delayed = np.roll(np.tile(code, n_ms + 1), int(delay_samples))[:n]
    t = np.arange(n) / fs
    carrier = np.exp(2j * np.pi * doppler_hz * t)
    # noise power for target CN0 with unit signal amplitude
    noise_var = 10 ** (-cn0_db / 10) * fs / 2  # per I/Q component... scaled below
    amp = 1.0
    noise_sigma = np.sqrt(amp**2 * fs / (2 * 10 ** (cn0_db / 10)))
    noise = noise_sigma * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    )
    return (amp * delayed * carrier + noise).astype(np.complex64)


def test_acquisition_finds_synthetic_satellite():
    delay, doppler = 1250, 2350.0
    x = synth_signal(5, delay, doppler, n_ms=4)
    acq = make_gps_l1ca_acquisition(
        [5, 11], FS, doppler_max=5000, doppler_step=250, pfa=0.001,
        max_dwells=2,
    )
    results = acq.search(x)
    r5, r11 = results[5], results[11]
    assert r5.positive
    assert abs(r5.doppler_hz - doppler) <= 250.0
    err = abs(r5.delay_samples - delay)
    assert min(err, SAMPLES_PER_CODE - err) < 0.5 * CHIP_SAMPLES
    # PRN 11 is absent: must not be detected at Pfa=1e-3
    assert not r11.positive


def test_acquisition_negative_on_noise():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(8000) + 1j * rng.standard_normal(8000)).astype(
        np.complex64
    )
    acq = make_gps_l1ca_acquisition([1], FS, pfa=0.001, doppler_step=250)
    assert not acq.search(x)[1].positive


def test_two_step_refines_doppler():
    delay, doppler = 600, 1837.0
    x = synth_signal(9, delay, doppler, n_ms=4, cn0_db=48)
    acq = make_gps_l1ca_acquisition(
        [9], FS, doppler_max=5000, doppler_step=500, pfa=0.001,
        make_2_steps=True, doppler_step2=50.0, num_doppler_bins_step2=9,
        pfa2=0.001,
    )
    res = acq.search(x)[9]
    assert res.positive
    assert res.doppler_step == 50.0
    assert abs(res.doppler_hz - doppler) <= 60.0


def test_bit_transition_mode():
    delay, doppler = 3000, -1500.0
    x = synth_signal(3, delay, doppler, n_ms=4, cn0_db=48)
    acq = make_gps_l1ca_acquisition(
        [3], FS, doppler_max=5000, doppler_step=250, pfa=0.001,
        bit_transition_flag=True,
    )
    res = acq.search(x)[3]
    assert res.positive
    assert abs(res.doppler_hz - doppler) <= 250.0
    err = abs(res.delay_samples - delay)
    assert min(err, SAMPLES_PER_CODE - err) < 0.5 * CHIP_SAMPLES


def test_threshold_formula():
    cfg = AcqConfig(
        fs=FS, samples_per_code=4000, doppler_max=5000, doppler_step=250,
        pfa=0.01, max_dwells=1, code_length_chips=1023,
    )
    th = cfg.calculate_threshold()
    # threshold = 2*gamma_p_inv(2*dwells, (1-pfa)^(1/num_bins))
    # (pcps_acquisition.cc:894-910). With dwells=1 the shape is a=2, whose
    # regularized lower incomplete gamma is P(2,x) = 1 - e^-x (1+x); the
    # returned threshold must satisfy the defining equation.
    num_bins = 4000 * cfg.num_doppler_bins
    q = (1.0 - 0.01) ** (1.0 / num_bins)
    x = th / 2.0
    assert abs((1.0 - np.exp(-x) * (1.0 + x)) - q) < 1e-9
    assert th > 0


def test_reference_fixture_truth():
    path = reference_sample_file("GPS_L1_CA_ID_1_Fs_4Msps_2ms.dat")
    if path is None:
        pytest.skip("reference fixtures not mounted")
    src = FileSignalSource(path, FS, "gr_complex")
    x = src.read()
    acq = make_gps_l1ca_acquisition(
        [1], FS, doppler_max=5000, doppler_step=100, threshold=0.00001,
    )
    res = acq.search(x)[1]
    assert res.positive
    # reference truth and tolerances (gps_l1_ca_pcps_acquisition_test.cc:290,360)
    assert abs(res.doppler_hz - 1680.0) <= 666.0
    err = abs(res.delay_samples - 524.0)
    assert min(err, SAMPLES_PER_CODE - err) < 0.5 * CHIP_SAMPLES


def test_delay_unbiased_at_wideband_rates():
    """The AUX_CEIL replica timing bias is corrected at the source: the
    measured delay error stays inside the +-0.5-sample integer
    quantization across fractional true delays, at an L1-class rate AND
    at ~1.17 samples/chip (the L5/E5a/E5b regime where an uncorrected
    one-sample bias exceeds 0.5 chips and used to force a 1-chip E-L
    floor). Reference tolerance model:
    gps_l1_ca_pcps_acquisition_test.cc:360-361."""
    from gnss_sdr_tpu.acquisition.adapters import make_gps_l1ca_acquisition
    from gnss_sdr_tpu.simulate import SatelliteParams, generate_gps_l1ca

    for fs in (2.5e6, 1.2e6):
        spc = fs / (1.023e6 / 1023)
        errs = []
        for frac in np.linspace(0.0, 20.0, 7):
            d = 500.0 + frac
            sig = generate_gps_l1ca(
                [SatelliteParams(prn=7, cn0_db_hz=55.0, delay_samples=d,
                                 doppler_hz=800.0)], fs, 0.05, seed=2)
            acq = make_gps_l1ca_acquisition([7], fs, doppler_max=4000,
                                            doppler_step=250, pfa=0.001)
            res = acq.search(sig[: acq.cfg.consumed_samples * 2])[7]
            err = (res.delay_samples - d) % spc
            if err > spc / 2:
                err -= spc
            errs.append(err)
        errs = np.asarray(errs)
        assert np.abs(errs).max() <= 0.6, (fs, errs)
        # centered, not biased: the mean error is a fraction of a sample
        assert abs(float(errs.mean())) < 0.35, (fs, errs)
        # at 1.17 samples/chip this is < 0.5 chips of worst-case error
        chips = np.abs(errs).max() * 1.023e6 * 1023 / (fs * 1023)
        assert chips < 0.5
