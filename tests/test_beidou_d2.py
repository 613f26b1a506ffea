"""BeiDou D2 NAV (GEO): page codec, split-field merge, streaming decoder.

Counterpart of the reference's D2 coverage
(beidou_dnav_navigation_message.cc d2_subframe_decoder, subframe 1
pages 1-10 with fields split MSB/LSB across pages).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.telemetry.beidou_d2 import (
    BeidouD2Decoder, assemble_ephemeris, build_d2_page, parse_d2_page,
    page_to_symbols, raw_fields_from_physical)

PI = np.pi

PHYSICAL = {
    "sow": 345600, "wn": 810, "toc": 345600.0, "toe": 345600.0,
    "tgd1": 4.7e-9, "tgd2": -3.1e-9,
    "a0": 2.5e-5, "a1": -1.3e-12, "a2": 0.0,
    "delta_n": 4.1e-9 * PI / PI,  # rad/s input
    "cuc": 2.1e-6, "cus": 8.4e-6, "m0": 1.37, "e": 0.00031,
    "sqrt_a": 6493.5, "crc": 180.4, "crs": -220.8,
    "cic": -6.5e-8, "cis": 3.2e-8, "i0": 0.0963,
    "omega0": 2.11, "omega": -2.87, "omega_dot": -1.9e-9,
    "idot": 2.5e-10,
    "alpha0": 1.2e-8, "alpha1": -7.5e-9, "alpha2": 6.0e-8,
    "alpha3": -6.0e-8, "beta0": 90112.0, "beta1": -49152.0,
    "beta2": 131072.0, "beta3": -196608.0,
}


def _pages():
    raw = raw_fields_from_physical({k: v for k, v in PHYSICAL.items()
                                    if k != "sow"})
    raw["AODE"] = 7
    raw["AODC"] = 12
    raw["URAI"] = 1
    return {p: build_d2_page(p, PHYSICAL["sow"], raw) for p in range(1, 11)}


class TestPageCodec:
    def test_page_roundtrip_raw(self):
        pages = _pages()
        for p, bits in pages.items():
            out = parse_d2_page(bits)
            assert out["fra_id"] == 1 and out["pnum"] == p
            assert out["sow"] == PHYSICAL["sow"]

    def test_assemble_merges_split_fields(self):
        parsed = {p: parse_d2_page(b) for p, b in _pages().items()}
        eph = assemble_ephemeris(parsed)
        # per-field quantization tolerance = the field's LSB
        checks = {
            "sqrt_a": 2**-19, "e": 2**-33, "m0": PI * 2**-31,
            "i0": PI * 2**-31, "omega0": PI * 2**-31,
            "omega": PI * 2**-31, "omega_dot": PI * 2**-43,
            "cuc": 2**-31, "cus": 2**-31, "cic": 2**-31, "cis": 2**-31,
            "crc": 2**-6, "crs": 2**-6, "a0": 2**-33, "a1": 2**-50,
            "tgd1": 1e-10, "delta_n": PI * 2**-43, "idot": PI * 2**-43,
            "alpha0": 2**-30, "beta2": 2**16,
        }
        for key, tol in checks.items():
            np.testing.assert_allclose(eph[key], PHYSICAL[key],
                                       atol=tol + 1e-15, rtol=0,
                                       err_msg=key)
        assert eph["toc"] == PHYSICAL["toc"]
        assert eph["toe"] == PHYSICAL["toe"]
        assert eph["wn"] == PHYSICAL["wn"]
        assert eph["aode"] == 7

    def test_missing_page_raises(self):
        parsed = {p: parse_d2_page(b) for p, b in _pages().items()}
        del parsed[6]
        with pytest.raises(ValueError, match="missing pages \\[6\\]"):
            assemble_ephemeris(parsed)


class TestStreamingDecoder:
    def test_symbol_stream_to_ephemeris(self):
        rng = np.random.default_rng(5)
        pages = _pages()
        # channel stream: 2 symbols per bit, bit 1 -> -1.0, noise + inversion
        sym_stream = []
        for p in range(1, 11):
            chan = page_to_symbols(pages[p])
            bits_pm = np.where(chan == 1, -1.0, 1.0)
            sym_stream.append(np.repeat(bits_pm, 2))
        stream = -np.concatenate(sym_stream)  # 180-deg carrier ambiguity
        stream = stream + 0.35 * rng.standard_normal(stream.size)
        dec = BeidouD2Decoder()
        updates = []
        for t, s in enumerate(stream):
            upd = dec.feed(float(s), t * 2046)
            if upd is not None:
                updates.append(upd)
        assert len(updates) >= 9  # first page may be lost to sync
        assert dec.ephemeris is not None
        np.testing.assert_allclose(dec.ephemeris["sqrt_a"],
                                   PHYSICAL["sqrt_a"], atol=2**-19)
        np.testing.assert_allclose(dec.ephemeris["omega0"],
                                   PHYSICAL["omega0"], atol=PI * 2**-31)
        assert dec.ephemeris["sow"] == PHYSICAL["sow"]
