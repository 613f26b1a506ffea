"""Galileo I/NAV full word catalogue + FEC2 CED erasure correction.

Mirrors the reference's word-type coverage in galileo_inav_message.cc
(words 6-10 UTC/almanac, 16 reduced CED, 17-20 Reed-Solomon FEC2).
"""

import itertools

import numpy as np
import pytest

from gnss_sdr_tpu.telemetry.galileo_inav import (
    build_inav_word, parse_inav_word)
from gnss_sdr_tpu.telemetry.galileo_inav_ced import (
    InavCedAssembler, encode_ced_parity_words)


def _roundtrip(fields: dict) -> dict:
    bits = build_inav_word(fields)
    return parse_inav_word(bits)


class TestWordCatalogue:
    def test_word6_gst_utc(self):
        out = _roundtrip({
            "word_type": 6, "a0_s": 3.2e-7, "a1_s_s": -1.1e-13,
            "delta_t_ls_s": 18, "t0t_s": 432000.0, "wn_ot": 45,
            "wn_lsf": 137, "dn": 7, "delta_t_lsf_s": 18, "tow_s": 345600})
        assert out["word_type"] == 6
        np.testing.assert_allclose(out["a0_s"], 3.2e-7, atol=2**-30)
        np.testing.assert_allclose(out["a1_s_s"], -1.1e-13, atol=2**-50)
        assert out["delta_t_ls_s"] == 18
        assert out["t0t_s"] == 432000.0
        assert out["wn_lsf"] == 137 and out["dn"] == 7
        assert out["tow_s"] == 345600

    def test_word7_8_9_10_almanac(self):
        alm = {"delta_sqrt_a": 1.5, "ecc": 3.0e-4, "omega_rad": 0.5,
               "delta_i_rad": 0.01, "omega0_rad": -1.5,
               "omega_dot_rad_s": -2.5e-9, "m0_rad": 2.0}
        out7 = _roundtrip({"word_type": 7, "iod_a": 5, "wn_a": 2,
                           "t0a_s": 336000.0, "svid1": 11, **alm})
        assert out7["svid1"] == 11 and out7["t0a_s"] == 336000.0
        np.testing.assert_allclose(out7["delta_sqrt_a"], 1.5, atol=2**-9)
        np.testing.assert_allclose(out7["m0_rad"], 2.0, atol=np.pi * 2**-15)
        out8 = _roundtrip({"word_type": 8, "iod_a": 5, "af0_s": 1e-5,
                           "af1_s_s": -2e-12, "e5b_hs": 0, "e1b_hs": 0,
                           "svid2": 12, **alm})
        assert out8["svid2"] == 12
        np.testing.assert_allclose(out8["af0_s"], 1e-5, atol=2**-19)
        out9 = _roundtrip({"word_type": 9, "iod_a": 5, "wn_a": 2,
                           "t0a_s": 336000.0, "m0_rad": -0.7,
                           "af0_s": 2e-6, "af1_s_s": 1e-12,
                           "e5b_hs": 1, "e1b_hs": 0, "svid3": 13,
                           "delta_sqrt_a": -2.0, "ecc": 1e-4,
                           "omega_rad": 0.1, "delta_i_rad": -0.005})
        assert out9["svid3"] == 13 and out9["e5b_hs"] == 1
        out10 = _roundtrip({"word_type": 10, "iod_a": 5,
                            "omega0_rad": 0.25, "omega_dot_rad_s": -3e-9,
                            "m0_rad": 1.0, "af0_s": -1e-6,
                            "af1_s_s": 0.0, "e5b_hs": 0, "e1b_hs": 0,
                            "a0g_s": 5e-9, "a1g_s_s": -2e-14,
                            "t0g_s": 172800.0, "wn0g": 33})
        np.testing.assert_allclose(out10["a0g_s"], 5e-9, atol=2**-35)
        assert out10["t0g_s"] == 172800.0 and out10["wn0g"] == 33

    def test_word16_reduced_ced(self):
        out = _roundtrip({
            "word_type": 16, "delta_a_red_m": -1024.0, "ex_red": 1.2e-4,
            "ey_red": -3.4e-5, "delta_i0_red_rad": 0.012,
            "omega0_red_rad": -2.2, "lambda0_red_rad": 1.9,
            "af0_red_s": 4.2e-6, "af1_red_s_s": -5.0e-11})
        np.testing.assert_allclose(out["delta_a_red_m"], -1024.0, atol=2**8)
        np.testing.assert_allclose(out["ex_red"], 1.2e-4, atol=2**-22)
        np.testing.assert_allclose(out["omega0_red_rad"], -2.2,
                                   atol=np.pi * 2**-22)
        np.testing.assert_allclose(out["af0_red_s"], 4.2e-6, atol=2**-26)

    def test_word17_parity_roundtrip(self):
        octets = list(range(100, 115))
        out = _roundtrip({"word_type": 17, "rs_parity_octets": octets,
                          "iodnav_lsbs": 2})
        assert out["rs_parity_octets"] == octets
        assert out["iodnav_lsbs"] == 2


def _ced_words(iodnav=519):
    w1 = build_inav_word({"word_type": 1, "iod_nav": iodnav,
                          "toe_s": 301800.0, "m0_rad": 1.21,
                          "ecc": 0.0003, "sqrt_a": 5440.6})
    w2 = build_inav_word({"word_type": 2, "iod_nav": iodnav,
                          "omega0_rad": -2.5, "i0_rad": 0.97,
                          "omega_rad": 0.7, "idot_rad_s": 3e-10})
    w3 = build_inav_word({"word_type": 3, "iod_nav": iodnav,
                          "omega_dot_rad_s": -8e-9, "delta_n_rad_s": 4e-9,
                          "cuc_rad": 3e-6, "cus_rad": 7e-6,
                          "crc_m": 221.0, "crs_m": -93.0, "sisa": 107})
    w4 = build_inav_word({"word_type": 4, "iod_nav": iodnav, "svid": 19,
                          "cic_rad": -1e-7, "cis_rad": 2e-7,
                          "toc_s": 301800.0, "af0": 2.3e-5,
                          "af1": -1.1e-11, "af2": 0.0})
    return {1: w1, 2: w2, 3: w3, 4: w4}


class TestFec2Ced:
    def test_parity_words_enable_recovery_of_any_four(self):
        words = _ced_words()
        parity = encode_ced_parity_words(words)
        all_words = {**words, **parity}
        truth = {wt: parse_inav_word(words[wt]) for wt in (1, 2, 3, 4)}
        # every 4-subset of the 8 FEC2 words recovers the full CED
        for subset in itertools.combinations(sorted(all_words), 4):
            asm = InavCedAssembler()
            got = None
            for wt in subset:
                got = asm.feed(all_words[wt]) or got
            assert got is not None, f"subset {subset} failed"
            for wt in (1, 2, 3, 4):
                assert got[wt]["iod_nav"] == 519, subset
                for key, val in truth[wt].items():
                    if isinstance(val, float):
                        np.testing.assert_allclose(
                            got[wt][key], val, rtol=0, atol=1e-12,
                            err_msg=f"{subset} w{wt} {key}")
                    else:
                        assert got[wt][key] == val, (subset, wt, key)

    def test_iodnav_change_resets_state(self):
        words_a = _ced_words(iodnav=100)
        words_b = _ced_words(iodnav=101)
        parity_b = encode_ced_parity_words(words_b)
        asm = InavCedAssembler()
        asm.feed(words_a[1])
        asm.feed(words_a[2])
        # new IODnav arrives: stale words must be discarded
        asm.feed(words_b[1])
        asm.feed(words_b[2])
        asm.feed(words_b[3])
        got = asm.feed(parity_b[17])
        assert got is not None
        assert got[4]["iod_nav"] == 101  # word 4 regenerated, new IODnav

    def test_parity_only_recovery(self):
        words = _ced_words(iodnav=77)
        parity = encode_ced_parity_words(words)
        asm = InavCedAssembler()
        got = None
        for wt in (17, 18, 19, 20):
            got = asm.feed(parity[wt]) or got
        assert got is not None
        assert got[1]["iod_nav"] == 77
        np.testing.assert_allclose(got[1]["sqrt_a"],
                                   parse_inav_word(words[1])["sqrt_a"])
