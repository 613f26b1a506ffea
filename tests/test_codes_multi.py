"""GLONASS and BeiDou code generator tests (structural invariants)."""

import numpy as np

from gnss_sdr_tpu.codes.beidou_b1i import beidou_b1i_code
from gnss_sdr_tpu.codes.glonass_l1ca import (
    glonass_l1ca_code,
    glonass_slot_frequency,
)


def test_glonass_msequence():
    code = glonass_l1ca_code()
    assert code.shape == (511,)
    assert set(np.unique(code)) == {-1.0, 1.0}
    # m-sequence balance: 256 of one sign, 255 of the other
    assert abs(int(np.sum(code))) == 1
    # two-valued autocorrelation: peak 511, off-peak -1
    f = np.fft.fft(code.astype(np.float64))
    ac = np.fft.ifft(f * np.conj(f)).real
    assert abs(ac[0] - 511.0) < 1e-6
    assert np.allclose(ac[1:], -1.0, atol=1e-6)
    # ICD 3.3.2.2: sequence starts with seven ones (all-ones seed, output
    # before feedback reaches stage 7)
    assert np.all(code[:7] == code[0])


def test_glonass_fdma_slots():
    assert glonass_slot_frequency(0) == 1602.0e6
    assert glonass_slot_frequency(1) - glonass_slot_frequency(0) == 562_500.0
    assert glonass_slot_frequency(-7) == 1602.0e6 - 7 * 562_500.0
    assert glonass_slot_frequency(3, "L2") == 1246.0e6 + 3 * 437_500.0


def test_beidou_b1i_codes():
    for prn in (1, 19, 37):
        code = beidou_b1i_code(prn)
        assert code.shape == (2046,)
        assert set(np.unique(code)) == {-1.0, 1.0}
    a = beidou_b1i_code(1).astype(np.float64)
    b = beidou_b1i_code(2).astype(np.float64)
    assert not np.array_equal(a, b)
    fa, fb = np.fft.fft(a), np.fft.fft(b)
    auto = np.fft.ifft(fa * np.conj(fa)).real
    xc = np.abs(np.fft.ifft(fa * np.conj(fb)).real)
    assert abs(auto[0] - 2046.0) < 1e-6
    # truncated Gold: modest sidelobes/cross-correlation
    assert np.max(np.abs(auto[10:-10])) < 0.2 * 2046
    assert np.max(xc) < 0.2 * 2046


def test_beidou_acquirable():
    """B1I code works through the generic PCPS engine."""
    from gnss_sdr_tpu.acquisition.pcps import AcqConfig, PcpsAcquisition
    from gnss_sdr_tpu.codes.sampling import sample_code

    fs = 5.0e6
    code = beidou_b1i_code(7)
    sampled = sample_code(code, fs, 2.046e6).astype(np.complex64)
    n = sampled.shape[0]
    rng = np.random.default_rng(0)
    delay, doppler = 1234, 900.0
    idx = (np.arange(2 * n) - delay) % n
    sig = sampled.real[idx]
    t = np.arange(2 * n) / fs
    x = (sig * np.exp(2j * np.pi * doppler * t)
         + 10.0 * (rng.standard_normal(2 * n)
                   + 1j * rng.standard_normal(2 * n))).astype(np.complex64)
    cfg = AcqConfig(fs=fs, samples_per_code=n, code_length_chips=2046,
                    doppler_max=5000, doppler_step=250, pfa=0.001,
                    max_dwells=2)
    acq = PcpsAcquisition(cfg, {7: sampled})
    res = acq.search(x)[7]
    assert res.positive
    assert abs(res.doppler_hz - doppler) <= 250.0
    spc = fs / 2.046e6
    err = abs(res.delay_samples - delay)
    assert min(err, n - err) < 0.5 * spc

def test_gps_l2cm_codes():
    from gnss_sdr_tpu.codes.gps_l2c import gps_l2cm_code

    a = gps_l2cm_code(1)
    b = gps_l2cm_code(2)
    assert a.shape == (10230,) and set(np.unique(a)) == {-1.0, 1.0}
    assert not np.array_equal(a, b)
    fa, fb = np.fft.fft(a.astype(np.float64)), np.fft.fft(b.astype(np.float64))
    xc = np.abs(np.fft.ifft(fa * np.conj(fb)).real)
    assert np.max(xc) < 0.1 * 10230


def test_gps_l5_codes():
    from gnss_sdr_tpu.codes.gps_l5 import gps_l5i_code, gps_l5q_code

    i1 = gps_l5i_code(1)
    q1 = gps_l5q_code(1)
    i2 = gps_l5i_code(7)
    assert i1.shape == (10230,)
    assert not np.array_equal(i1, q1)
    assert not np.array_equal(i1, i2)
    # near-balanced Gold-like codes
    assert abs(int(np.sum(i1))) < 200
    fa = np.fft.fft(i1.astype(np.float64))
    fb = np.fft.fft(i2.astype(np.float64))
    xc = np.abs(np.fft.ifft(fa * np.conj(fb)).real)
    assert np.max(xc) < 0.1 * 10230
    auto = np.fft.ifft(fa * np.conj(fa)).real
    assert abs(auto[0] - 10230) < 1e-6


def test_l5_acquirable():
    from gnss_sdr_tpu.acquisition.pcps import AcqConfig, PcpsAcquisition
    from gnss_sdr_tpu.codes.gps_l5 import gps_l5i_code
    from gnss_sdr_tpu.codes.sampling import sample_code

    fs = 25.0e6  # ~2.44 samples/chip at 10.23 Mcps
    code = gps_l5i_code(3)
    sampled = sample_code(code, fs, 10.23e6).astype(np.complex64)
    n = sampled.shape[0]
    rng = np.random.default_rng(2)
    delay, doppler = 10000, -2600.0
    idx = (np.arange(2 * n) - delay) % n
    sig = sampled.real[idx]
    t = np.arange(2 * n) / fs
    x = (sig * np.exp(2j * np.pi * doppler * t)
         + 20.0 * (rng.standard_normal(2 * n)
                   + 1j * rng.standard_normal(2 * n))).astype(np.complex64)
    cfg = AcqConfig(fs=fs, samples_per_code=n, code_length_chips=10230,
                    doppler_max=5000, doppler_step=250, pfa=0.001,
                    max_dwells=2)
    acq = PcpsAcquisition(cfg, {3: sampled})
    res = acq.search(x)[3]
    assert res.positive
    assert abs(res.doppler_hz - doppler) <= 250.0
    spc = fs / 10.23e6
    err = abs(res.delay_samples - delay)
    assert min(err, n - err) < 0.5 * spc


def test_galileo_e5a_codes():
    from gnss_sdr_tpu.codes.galileo_e5a import (
        galileo_e5a_code,
        galileo_e5a_secondary,
    )

    i1 = galileo_e5a_code(1, "I")
    q1 = galileo_e5a_code(1, "Q")
    i2 = galileo_e5a_code(2, "I")
    assert i1.shape == (10230,)
    assert set(np.unique(i1)) == {-1.0, 1.0}
    assert not np.array_equal(i1, q1)
    fa = np.fft.fft(i1.astype(np.float64))
    fb = np.fft.fft(i2.astype(np.float64))
    xc = np.abs(np.fft.ifft(fa * np.conj(fb)).real)
    assert np.max(xc) < 0.12 * 10230
    assert len(galileo_e5a_secondary(1, "I")) == 20
    assert len(galileo_e5a_secondary(5, "Q")) == 100
    assert galileo_e5a_secondary(1, "Q") != galileo_e5a_secondary(2, "Q")


def test_galileo_e5b_e6_codes():
    from gnss_sdr_tpu.codes.galileo_e5b_e6 import (
        galileo_e5b_code,
        galileo_e5b_secondary,
        galileo_e6_code,
        galileo_e6c_secondary,
    )

    b = galileo_e5b_code(1, "I")
    q = galileo_e5b_code(1, "Q")
    assert b.shape == (10230,) and not np.array_equal(b, q)
    e6b = galileo_e6_code(1, "B")
    e6c = galileo_e6_code(1, "C")
    assert e6b.shape == (5115,) and not np.array_equal(e6b, e6c)
    fa = np.fft.fft(e6b.astype(np.float64))
    fb = np.fft.fft(galileo_e6_code(2, "B").astype(np.float64))
    xc = np.abs(np.fft.ifft(fa * np.conj(fb)).real)
    assert np.max(xc) < 0.12 * 5115
    assert galileo_e5b_secondary(1, "I") == "1110"
    assert len(galileo_e5b_secondary(3, "Q")) == 100
    assert len(galileo_e6c_secondary(1)) == 100
    assert set(galileo_e6c_secondary(2)) <= {"0", "1"}


def test_beidou_b3i_codes():
    from gnss_sdr_tpu.codes.beidou_b3i import beidou_b3i_code

    a = beidou_b3i_code(1)
    b = beidou_b3i_code(2)
    assert a.shape == (10230,)
    assert set(np.unique(a)) == {-1.0, 1.0}
    assert not np.array_equal(a, b)
    fa, fb = np.fft.fft(a.astype(np.float64)), np.fft.fft(b.astype(np.float64))
    xc = np.abs(np.fft.ifft(fa * np.conj(fb)).real)
    assert np.max(xc) < 0.12 * 10230
