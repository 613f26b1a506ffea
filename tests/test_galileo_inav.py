"""Galileo I/NAV encode/decode roundtrip tests."""

import numpy as np

from gnss_sdr_tpu.telemetry.galileo_inav import (
    GalileoInavDecoder,
    build_inav_word,
    build_page_pair,
    check_page_pair,
    crc24q,
    decode_page_part,
    deinterleave,
    encode_page_part,
    interleave,
    parse_inav_word,
)
from gnss_sdr_tpu.telemetry.viterbi import ViterbiDecoder


def test_crc24q_known_properties():
    # CRC of all-zeros is 0; single-bit sensitivity
    assert crc24q(np.zeros(196, dtype=np.int64)) == 0
    bits = np.zeros(196, dtype=np.int64)
    bits[17] = 1
    assert crc24q(bits) != 0


def test_interleaver_roundtrip():
    x = np.arange(240)
    np.testing.assert_array_equal(deinterleave(interleave(x)), x)


def test_page_part_roundtrip():
    rng = np.random.default_rng(0)
    bits = np.concatenate([rng.integers(0, 2, 114), np.zeros(6, np.int64)])
    symbols = encode_page_part(bits)
    assert symbols.shape == (250,)
    dec = ViterbiDecoder(kk=7, nn=2, g=(121, 91))
    noisy = symbols * 3.0 + rng.normal(0, 0.8, 250)
    out = decode_page_part(noisy, dec)
    np.testing.assert_array_equal(out, bits)


def test_page_pair_crc():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2, 128)
    even, odd = build_page_pair(data)
    ok, recovered = check_page_pair(even, odd)
    assert ok
    np.testing.assert_array_equal(recovered, data)
    odd_bad = odd.copy()
    odd_bad[30] ^= 1
    assert not check_page_pair(even, odd_bad)[0]


def ref_word_fields():
    return [
        dict(word_type=1, iod_nav=77, toe_s=7200.0, m0_rad=-1.234,
             ecc=0.0123, sqrt_a=5440.6),
        dict(word_type=2, iod_nav=77, omega0_rad=2.345, i0_rad=0.958,
             omega_rad=-2.91, idot_rad_s=3.9e-10),
        dict(word_type=3, iod_nav=77, omega_dot_rad_s=-8.1e-9,
             delta_n_rad_s=4.5e-9, cuc_rad=1.2e-6, cus_rad=8.5e-6,
             crc_m=212.4, crs_m=-54.1, sisa=107),
        dict(word_type=4, iod_nav=77, svid=11, cic_rad=-7.4e-8,
             cis_rad=5.6e-8, toc_s=7200.0, af0=-3.2e-4, af1=2.5e-11,
             af2=0.0),
        dict(word_type=5, week_number=1210, tow_s=123456, ai0=12.0,
             ai1=0.1, ai2=0.0, bgd_e1e5a_s=2e-9, bgd_e1e5b_s=3e-9),
    ]


def test_word_encode_parse_roundtrip():
    for fields in ref_word_fields():
        data = build_inav_word(fields)
        parsed = parse_inav_word(data)
        assert parsed["word_type"] == fields["word_type"]
        for key, val in fields.items():
            if key in ("word_type",):
                continue
            got = parsed[key]
            if isinstance(val, int):
                assert got == val, key
            else:
                scale = max(abs(val), 1e-12)
                # coarse-scaled fields (e.g. ai1 at 2^-8) quantize visibly
                assert abs(got - val) / scale < 2e-2 or \
                    abs(got - val) < 1e-7, (key, val, got)


def test_streaming_decoder_collects_ephemeris():
    rng = np.random.default_rng(3)
    symbols = []
    for fields in ref_word_fields() + ref_word_fields():
        even, odd = build_page_pair(build_inav_word(fields))
        symbols.append(encode_page_part(even))
        symbols.append(encode_page_part(odd))
    soft = np.concatenate(symbols) * 2000.0
    soft = soft + rng.normal(0, 300.0, soft.shape)
    # random start offset + polarity inversion
    soft = -soft[137:]
    dec = GalileoInavDecoder()
    for i, s in enumerate(soft):
        dec.feed(s, sample_stamp=16368 * i)
    types = [w.word_type for w in dec.words]
    assert set(types) >= {1, 2, 3, 4, 5}
    assert dec.has_full_ephemeris()
    f = dec.ephemeris_fields
    assert abs(f["sqrt_a"] - 5440.6) < 1e-3
    assert abs(f["omega0_rad"] - 2.345) < 1e-6
    assert f["iod_nav"] == 77
    # TOW propagation from word 5
    assert dec.tow_at_last_symbol_ms is not None