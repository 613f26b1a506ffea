"""BeiDou D1 NAV codec tests."""

import numpy as np

from gnss_sdr_tpu.telemetry.beidou_d1 import (
    BeidouD1Decoder,
    bch15_decode,
    bch15_encode,
    build_subframe,
    ephemeris_fields_from_subframes,
    parse_subframe,
    subframe_to_symbols,
    symbols_to_subframe,
)


def test_bch15_roundtrip_and_correction():
    rng = np.random.default_rng(0)
    for _ in range(30):
        data = rng.integers(0, 2, 11)
        w = bch15_encode(data)
        dec, ok = bch15_decode(w)
        assert ok and np.array_equal(dec, w)
        # single-bit error corrected
        pos = rng.integers(0, 15)
        bad = w.copy()
        bad[pos] ^= 1
        dec, ok = bch15_decode(bad)
        assert ok and np.array_equal(dec, w)


def sf_fields():
    return {
        1: dict(sow=345600.0, wn=810, toc=7200.0, tgd1=-4.7e-9,
                a0=-3.1e-4, a1=2.4e-11, a2=0.0),
        2: dict(sow=345606.0, delta_n=4.5e-9, cuc=1.2e-6, m0=-1.234,
                e=0.0123, cus=8.5e-6, crc=212.4, crs=-54.1,
                sqrt_a=5282.6, toe=7200.0),
        3: dict(sow=345612.0, i0=0.958, cic=-7.4e-8, omega_dot=-8.1e-9,
                cis=5.6e-8, idot=3.9e-10, omega_0=2.345, omega=-2.91,
                toe=7200.0),
    }


def test_subframe_roundtrip():
    for fid, fields in sf_fields().items():
        bits = build_subframe(fid, fields)
        parsed = parse_subframe(bits)
        assert parsed is not None and parsed["fra_id"] == fid
        assert abs(parsed["sow"] - fields["sow"]) < 1e-9
        for k, v in fields.items():
            if k in ("sow", "toe", "wn"):
                continue
            got = parsed[k]
            scale = max(abs(v), 1e-12)
            assert abs(got - v) / scale < 2e-2 or abs(got - v) < 1e-7, \
                (fid, k, v, got)
        # transport-layer roundtrip incl. BCH interleave
        sym = subframe_to_symbols(bits)
        back, ok = symbols_to_subframe(sym)
        assert ok
        assert parse_subframe(back) is not None


def test_ephemeris_merge():
    subs = {fid: parse_subframe(build_subframe(fid, f))
            for fid, f in sf_fields().items()}
    eph = ephemeris_fields_from_subframes(subs)
    assert abs(eph["toe_s"] - 7200.0) < 1e-9
    assert abs(eph["sqrt_a"] - 5282.6) < 1e-3
    assert eph["week_number"] == 810


def test_streaming_decoder():
    rng = np.random.default_rng(2)
    sym_stream = []
    for rep in range(2):
        for fid, fields in sf_fields().items():
            bits = build_subframe(fid, fields)
            tx = subframe_to_symbols(bits)
            sym_stream.append(np.where(tx == 1, 1.0, -1.0))
    soft = np.concatenate(sym_stream) * 500.0
    soft += rng.normal(0, 80.0, soft.shape)
    soft = -soft[23:]  # inversion + offset
    dec = BeidouD1Decoder()
    for i, s in enumerate(soft):
        dec.feed(s, sample_stamp=1000 * i)
    assert dec.has_full_ephemeris()
    eph = dec.ephemeris_fields
    assert abs(eph["sqrt_a"] - 5282.6) < 1e-3
    assert dec.tow_at_last_symbol_ms is not None


def test_d1_almanac_subframe_roundtrip_and_accumulation():
    """SF4/SF5 almanac pages (Beidou_DNAV.h:149-158 layout): field
    roundtrip at ICD scales and per-SV accumulation in the decoder."""
    import numpy as np
    import pytest

    from gnss_sdr_tpu.telemetry.beidou_d1 import (
        BeidouD1Decoder,
        build_subframe,
        parse_subframe,
        subframe_to_symbols,
    )

    fields = dict(sow=351000.0, pnum=7, sqrt_a_alm=5282.6,
                  a1_alm=3.6e-12, a0_alm=-9.5e-5, omega0_alm=-2.91,
                  e_alm=0.012, delta_i_alm=0.051, toa_alm=466944.0,
                  omega_dot_alm=-2.3e-9, omega_alm=1.44, m0_alm=-0.78)
    b = build_subframe(4, fields)
    parsed = parse_subframe(b)
    assert parsed is not None and parsed["fra_id"] == 4
    for k, v in fields.items():
        scale = {"sqrt_a_alm": 2.0**-11, "a1_alm": 2.0**-38,
                 "a0_alm": 2.0**-20, "omega0_alm": 2.0**-23 * np.pi,
                 "e_alm": 2.0**-21, "delta_i_alm": 2.0**-19 * np.pi,
                 "toa_alm": 2.0**12, "omega_dot_alm": 2.0**-38 * np.pi,
                 "omega_alm": 2.0**-23 * np.pi,
                 "m0_alm": 2.0**-23 * np.pi}.get(k, 1.0)
        assert parsed[k] == pytest.approx(v, abs=0.51 * scale), k

    dec = BeidouD1Decoder()
    rng = np.random.default_rng(4)
    # decoder preamble-syncs on the stream directly
    syms = subframe_to_symbols(b)
    tx = np.where(syms == 1, -1.0, 1.0) * (900.0 + rng.normal(
        0, 90, len(syms)))
    for i, s in enumerate(tx):
        dec.feed(float(s), i)
    # second copy so the trailing-subframe structure stays consistent
    f2 = dict(fields, sow=351006.0, pnum=3)
    for i, s in enumerate(subframe_to_symbols(build_subframe(5, f2))):
        dec.feed(float(np.where(s == 1, -1.0, 1.0)) * 900.0, 300 + i)
    assert 7 in dec.almanacs
    assert 27 in dec.almanacs
    assert dec.almanacs[7]["sqrt_a_alm"] == pytest.approx(5282.6, abs=2.0**-11)
