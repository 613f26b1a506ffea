"""PRN code generator tests.

Truth values are the ICD first-10-chip octal check numbers (IS-GPS-200
Table 3-Ia), the same invariants the reference's code_generation_test.cc
relies on.
"""

import numpy as np

from gnss_sdr_tpu.codes import gps_l1ca_code, sample_code, samples_per_code
from gnss_sdr_tpu.codes.gps_l1ca import first_10_chips_octal


# IS-GPS-200 Table 3-Ia: first 10 chips (octal, leading 1 = first chip 1)
FIRST_10_CHIPS_OCTAL = {
    1: 1440, 2: 1620, 3: 1710, 4: 1744, 5: 1133, 6: 1455, 7: 1131, 8: 1454,
    9: 1626, 10: 1504, 11: 1642, 12: 1750, 13: 1764, 14: 1772, 15: 1775,
    16: 1776, 17: 1156, 18: 1467, 19: 1633, 20: 1715, 21: 1746, 22: 1763,
    23: 1063, 24: 1706, 25: 1743, 26: 1761, 27: 1770, 28: 1774, 29: 1127,
    30: 1453, 31: 1625, 32: 1712,
}


def test_ca_code_known_octal_prefixes():
    for prn, octal in FIRST_10_CHIPS_OCTAL.items():
        assert first_10_chips_octal(prn) == octal, f"PRN {prn}"


def test_ca_code_is_plus_minus_one_and_balanced():
    for prn in (1, 17, 32):
        code = gps_l1ca_code(prn)
        assert code.shape == (1023,)
        assert set(np.unique(code)) == {-1.0, 1.0}
        # Gold codes have 512 ones / 511 minus-ones (or the inverse)
        assert abs(int(np.sum(code))) == 1


def test_ca_code_cross_correlation_bounded():
    # Gold code cross-correlation takes values in {-65, -1, 63}/1023
    a = gps_l1ca_code(1).astype(np.float64)
    b = gps_l1ca_code(2).astype(np.float64)
    fa = np.fft.fft(a)
    fb = np.fft.fft(b)
    xcorr = np.fft.ifft(fa * np.conj(fb)).real
    assert np.max(np.abs(xcorr)) <= 65.0 + 1e-6
    autocorr = np.fft.ifft(fa * np.conj(fa)).real
    assert abs(autocorr[0] - 1023.0) < 1e-6


def test_chip_shift_rotates():
    base = gps_l1ca_code(7)
    shifted = gps_l1ca_code(7, chip_shift=100)
    assert np.array_equal(shifted, np.roll(base, -100))


def test_sample_code_4msps():
    code = gps_l1ca_code(1)
    fs = 4e6
    sampled = sample_code(code, fs, 1.023e6)
    assert sampled.shape[0] == samples_per_code(fs, 1.023e6, 1023) == 4000
    # each chip spans floor/ceil(fs/chip_rate) ~ 3.9 samples
    transitions = np.count_nonzero(np.diff(sampled))
    chip_transitions = np.count_nonzero(np.diff(code))
    assert transitions == chip_transitions  # nearest-chip keeps every edge
    assert sampled[-1] == code[-1]


def test_sample_code_integer_ratio():
    # The reference's AUX_CEIL(x)-1 digitization index
    # (gps_sdr_signal_replica.cc:159-176) equals floor((i+1)*ts/tc) for
    # positive arguments; at exactly 2 samples/chip that is chip (i+1)//2:
    # [c0, c1, c1, c2, c2, ...] -- NOT np.repeat.
    # The float32 evaluation (faithful to the reference) lands a handful of
    # exact chip-boundary samples one index early; everything else matches.
    code = gps_l1ca_code(3)
    sampled = sample_code(code, 2.046e6, 1.023e6)
    assert sampled.shape[0] == 2046
    expected = code[np.minimum((np.arange(2046) + 1) // 2, 1022)]
    expected[-1] = code[-1]
    mismatches = np.count_nonzero(sampled != expected)
    assert mismatches <= 8, mismatches
