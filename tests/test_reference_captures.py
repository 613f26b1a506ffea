"""Acquisition on the reference repo's real recorded IF captures.

The GPS L1 capture test lives in test_acquisition.py; this file covers the
remaining recorded captures (VERDICT round-1 item 5):

- Galileo E1: ``Galileo_E1_ID_1_Fs_4Msps_8ms.dat`` with the reference's
  own truth (delay 2920 samples, Doppler -632 Hz) and tolerances
  (galileo_e1_pcps_ambiguous_acquisition_test.cc:304-371).
- GLONASS L1: ``NT1065_GLONASS_L1_20160831_fs6625e6_if0e3_4ms.bin``.
  The reference's unit test configures fs = 62.314 Msps + 9.54 MHz IF,
  which does not match the shipped file (26 499 complex64 samples = 4 ms
  at the filename's 6.625 Msps, IF 0); its expected delay (31874) even
  exceeds one code period at the file's true rate. The truth used here
  (delay 1343 samples, Doppler -2750 Hz, peak/mean ~37) was measured
  from the capture with an independent NumPy FFT correlator and is
  asserted with the reference test's tolerances
  (glonass_l1_ca_pcps_acquisition_test.cc:279-284).
"""

import numpy as np
import pytest

from tests.conftest import reference_sample_file

E1_FILE = reference_sample_file("Galileo_E1_ID_1_Fs_4Msps_8ms.dat")
GLO_FILE = reference_sample_file(
    "NT1065_GLONASS_L1_20160831_fs6625e6_if0e3_4ms.bin")


@pytest.mark.skipif(E1_FILE is None, reason="reference capture not present")
def test_galileo_e1_acquisition_on_reference_capture():
    from gnss_sdr_tpu.acquisition.adapters import make_galileo_e1_acquisition

    fs = 4.0e6
    x = np.fromfile(E1_FILE, dtype=np.complex64)
    assert len(x) == 32000  # 8 ms at 4 Msps
    acq = make_galileo_e1_acquisition(
        [1], fs, cboc=True, doppler_max=10000.0, doppler_step=250.0,
        pfa=0.001, max_dwells=2)
    res = acq.search(x)[1]
    assert res.positive, f"stat {res.test_statistic} <= {res.threshold}"
    # reference truth/tolerances (:304-305, :364-371); their delay
    # tolerance is 0.175 chips = 684 ns. The reference's expected 2920
    # was measured with its AUX_CEIL replica convention (+1-sample
    # bias); our engine corrects that bias at the source
    # (acquisition/pcps.py _make_result), so the convention-equivalent
    # comparison adds the sample back.
    delay_err_chips = abs(res.delay_samples + 1.0 - 2920.0) * 1023.0 / fs
    doppler_err = abs(res.doppler_hz - (-632.0))
    assert delay_err_chips < 0.175, res.delay_samples
    assert doppler_err <= 166.67, res.doppler_hz  # 2/(3*4 ms)


@pytest.mark.skipif(GLO_FILE is None, reason="reference capture not present")
def test_glonass_l1_acquisition_on_reference_capture():
    from gnss_sdr_tpu.acquisition.adapters import make_acquisition

    fs = 6.625e6
    x = np.fromfile(GLO_FILE, dtype=np.complex64)
    assert len(x) == 26499  # ~4 ms at 6.625 Msps
    acq = make_acquisition(
        "GLONASS_L1_CA_PCPS_Acquisition", [1], fs,
        doppler_max=10000.0, doppler_step=250.0, pfa=0.001, max_dwells=3)
    res = acq.search(x)[1]
    assert res.positive, f"stat {res.test_statistic} <= {res.threshold}"
    delay_err_chips = abs(res.delay_samples - 1343.0) * 511.0 / fs
    doppler_err = abs(res.doppler_hz - (-2750.0))
    assert delay_err_chips < 0.5, res.delay_samples
    assert doppler_err <= 666.0, res.doppler_hz
