"""LNAV encode/decode tests: parity, subframe parse, streaming sync, TOW."""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris
from gnss_sdr_tpu.simulate.lnav import build_lnav_bits
from gnss_sdr_tpu.telemetry.gps_lnav import (
    GpsLnavDecoder,
    check_subframe,
    check_word,
    compute_parity,
    encode_word,
)


def ref_ephemeris() -> GpsEphemeris:
    """Realistic-magnitude ephemeris exercising signed fields."""
    return GpsEphemeris(
        prn=17, week_number=310, sv_health=0, iodc=345, iode=89,
        toc_s=7200.0, af0=-3.2e-4, af1=2.5e-11, af2=0.0, tgd_s=-4.6e-9,
        toe_s=7200.0, sqrt_a=5153.68, ecc=0.0123,
        m0_rad=-1.234, delta_n_rad_s=4.5e-9,
        omega0_rad=2.345, i0_rad=0.958, omega_rad=-2.91,
        omega_dot_rad_s=-8.1e-9, idot_rad_s=3.9e-10,
        cuc_rad=1.2e-6, cus_rad=8.5e-6, crc_m=212.4, crs_m=-54.1,
        cic_rad=-7.4e-8, cis_rad=5.6e-8,
    )


def test_parity_roundtrip_and_error_detection():
    rng = np.random.default_rng(0)
    d29s, d30s = 0, 0
    for _ in range(50):
        source = rng.integers(0, 2, 24)
        word = encode_word(source, d29s, d30s)
        ok, decoded = check_word(word, d29s, d30s)
        assert ok
        assert np.array_equal(decoded, source)
        # flip any single bit -> parity failure
        flip = rng.integers(0, 30)
        bad = word.copy()
        bad[flip] ^= 1
        assert not check_word(bad, d29s, d30s)[0]
        d29s, d30s = int(word[28]), int(word[29])


def test_lnav_subframe45_iono_and_almanac_roundtrip():
    """Subframe 4 page 18 (Klobuchar + UTC) and subframe 5 almanac pages
    roundtrip through the encoder/parser pair at ICD quantization
    (reference: gps_l1_ca_telemetry_decoder_gs.cc subframe-4/5 handling via
    gps_navigation_message.cc)."""
    from gnss_sdr_tpu.telemetry.gps_lnav import parse_subframe

    eph = ref_ephemeris()
    eph.iono_alpha = (1.2e-8, -7.45e-9, -5.96e-8, 1.19e-7)
    eph.iono_beta = (96256.0, -32768.0, -196608.0, 196608.0)
    bits = build_lnav_bits(eph, start_tow_6s=17000, n_subframes=5)
    hard = (bits > 0).astype(np.int64)
    d29s = d30s = 0
    parsed = {}
    for k in range(5):
        sf = hard[k * 300:(k + 1) * 300]
        ok, sources = check_subframe(sf, d29s, d30s)
        assert ok, f"subframe {k} parity"
        d29s, d30s = int(sf[-2]), int(sf[-1])
        parsed[k + 1] = parse_subframe(sources)

    sf4 = parsed[4]
    assert sf4["sv_page_id"] == 56 and sf4["data_id"] == 1
    for got, want, lsb in zip(sf4["iono_alpha"], eph.iono_alpha,
                              (2.0**-30, 2.0**-27, 2.0**-24, 2.0**-24)):
        assert abs(got - want) <= lsb / 2
    for got, want, lsb in zip(sf4["iono_beta"], eph.iono_beta,
                              (2.0**11, 2.0**14, 2.0**16, 2.0**16)):
        assert abs(got - want) <= lsb / 2
    assert sf4["utc_a0"] == 0.0 and sf4["delta_t_ls"] == 0

    sf5 = parsed[5]
    assert sf5["alm_prn"] == eph.prn % 33
    assert abs(sf5["alm_ecc"] - eph.ecc) <= 2.0**-22
    assert abs(sf5["alm_toa_s"] - eph.toe_s) <= 2.0**11
    assert abs(sf5["alm_sqrt_a"] - eph.sqrt_a) <= 2.0**-12
    assert abs(sf5["alm_delta_i_rad"] - (eph.i0_rad - 0.3 * np.pi)) \
        <= 2.0**-20 * np.pi
    assert abs(sf5["alm_omega0_rad"] - eph.omega0_rad) <= 2.0**-24 * np.pi
    assert abs(sf5["alm_omega_rad"] - eph.omega_rad) <= 2.0**-24 * np.pi
    assert abs(sf5["alm_m0_rad"] - eph.m0_rad) <= 2.0**-24 * np.pi
    assert abs(sf5["alm_omega_dot_rad_s"] - eph.omega_dot_rad_s) \
        <= 2.0**-39 * np.pi
    assert abs(sf5["alm_af0"] - eph.af0) <= 2.0**-21
    assert abs(sf5["alm_af1"] - eph.af1) <= 2.0**-39
    assert sf5["alm_health"] == eph.sv_health


def test_streaming_decoder_collects_iono():
    """The streaming decoder exposes subframe-4 Klobuchar terms via
    utc_iono_fields (consumed by the receiver's PVT layer like
    rtklib_pvt's broadcast iono)."""
    eph = ref_ephemeris()
    eph.iono_alpha = (1.2e-8, -7.45e-9, -5.96e-8, 1.19e-7)
    eph.iono_beta = (96256.0, -32768.0, -196608.0, 196608.0)
    bits = build_lnav_bits(eph, start_tow_6s=9000, n_subframes=6)
    dec = GpsLnavDecoder()
    for i, b in enumerate(bits):
        for _ in range(20):  # 20 code periods per bit
            dec.feed(float(b), i * 20)
    assert "iono_alpha" in dec.utc_iono_fields
    a = dec.utc_iono_fields["iono_alpha"]
    assert abs(a[0] - eph.iono_alpha[0]) <= 2.0**-31


def test_lnav_stream_roundtrip():
    eph = ref_ephemeris()
    bits = build_lnav_bits(eph, start_tow_6s=17000, n_subframes=5)
    assert bits.shape == (1500,)
    hard = (bits > 0).astype(np.int64)
    d29s = d30s = 0
    fields = {}
    for k in range(5):
        sf = hard[k * 300:(k + 1) * 300]
        ok, sources = check_subframe(sf, d29s, d30s)
        assert ok, f"subframe {k} parity"
        d29s, d30s = int(sf[-2]), int(sf[-1])
        from gnss_sdr_tpu.telemetry.gps_lnav import parse_subframe
        f = parse_subframe(sources)
        assert f["tow_truncated"] == 17000 + k + 1
        assert f["subframe_id"] == k + 1
        fields.update(f)
    eph2 = GpsEphemeris.from_fields(17, fields)
    # quantization-limited roundtrip
    assert eph2.week_number == eph.week_number % 1024
    assert eph2.iodc == eph.iodc and eph2.iode == eph.iode
    assert abs(eph2.af0 - eph.af0) < 2.0**-30
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0**-18
    assert abs(eph2.ecc - eph.ecc) < 2.0**-32
    assert abs(eph2.m0_rad - eph.m0_rad) < 2.0**-30 * np.pi
    assert abs(eph2.omega_dot_rad_s - eph.omega_dot_rad_s) < 2.0**-42 * np.pi
    assert abs(eph2.crc_m - eph.crc_m) < 2.0**-4
    # orbit positions agree to meters after quantization
    p1 = np.array(eph.sat_pos(7500.0))
    p2 = np.array(eph2.sat_pos(7500.0))
    assert np.linalg.norm(p1 - p2) < 5.0


@pytest.mark.parametrize("invert,offset", [(False, 0), (True, 7), (False, 133)])
def test_streaming_decoder_sync(invert, offset):
    eph = ref_ephemeris()
    bits = build_lnav_bits(eph, start_tow_6s=5000, n_subframes=6)
    symbols = np.repeat(bits, 20)  # 20 symbols (code periods) per bit
    rng = np.random.default_rng(2)
    soft = symbols * 4000.0 + rng.normal(0, 400.0, symbols.shape)
    if invert:
        soft = -soft
    soft = soft[offset:]
    dec = GpsLnavDecoder()
    updates = []
    for i, s in enumerate(soft):
        upd = dec.feed(s, sample_stamp=1000 * i)
        if upd:
            updates.append((i, upd))
    # the first decodable subframe is #1 if offset==0 else #2
    assert len(updates) >= 3
    first_idx, first = updates[0]
    k0 = 0 if offset == 0 else 1
    assert first.subframe_id == k0 + 1
    assert first.tow_ms == (5000 + k0 + 1) * 6000
    # TOW propagation ground truth: the stream starts at the subframe-0
    # boundary (TOW 5000*6 s) plus `offset` discarded symbols, so the end
    # of the last fed symbol is at 30,000,000 + offset + len(soft) ms.
    assert dec.tow_at_last_symbol_ms is not None
    assert dec.tow_at_last_symbol_ms == 5000 * 6000 + offset + len(soft)
    assert dec.has_full_ephemeris()
    eph2 = GpsEphemeris.from_fields(17, dec.ephemeris_fields)
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0**-18


def test_tlm_crc_stats_counters_and_dump(tmp_path):
    """Tlm_CRC_Stats counterpart: per-channel counters + dump file
    (tlm_crc_stats.cc)."""
    from gnss_sdr_tpu.telemetry.tlm_crc_stats import TlmCrcStats

    stats = TlmCrcStats()
    stats.initialize(str(tmp_path / "crc_stats_ch"))
    assert stats.set_channel(3)
    for ok in (True, True, False, True):
        stats.update(ok)
    assert stats.num_crc_ok == 3 and stats.num_total == 4
    assert abs(stats.success_rate - 0.75) < 1e-12
    text = (tmp_path / "crc_stats_ch3.txt").read_text()
    assert "3 / 4" in text and "75.00" in text


def test_tlm_crc_stats_wired_into_lnav_decoder():
    """The LNAV decoder reports every subframe parity outcome."""
    import numpy as np

    from gnss_sdr_tpu.simulate.lnav import build_lnav_bits
    from gnss_sdr_tpu.simulate.scenario import make_constellation
    from gnss_sdr_tpu.telemetry import GpsLnavDecoder
    from gnss_sdr_tpu.telemetry.tlm_crc_stats import TlmCrcStats

    eph = make_constellation([4], toe_s=7200.0)[4]
    bits = build_lnav_bits(eph, 1200, 3)
    symbols = np.repeat(bits, 20) * 900.0
    stats = TlmCrcStats()
    stats.initialize()
    dec = GpsLnavDecoder(crc_stats=stats)
    for i, s in enumerate(symbols):
        dec.feed(s, i * 2000)
    assert dec.tow_at_last_symbol_ms is not None
    assert stats.num_crc_ok >= 2 and stats.num_crc_not_ok == 0


def test_lnav_feed_array_equivalent_to_per_symbol():
    """feed_array == per-symbol feed on a clean stream (chunked feeding is
    the production receiver's host fast path)."""
    import numpy as np

    from gnss_sdr_tpu.simulate.lnav import build_lnav_bits
    from gnss_sdr_tpu.simulate.scenario import make_constellation
    from gnss_sdr_tpu.telemetry import GpsLnavDecoder

    eph = make_constellation([6], toe_s=7200.0)[6]
    bits = build_lnav_bits(eph, 1800, 4)
    rng = np.random.default_rng(5)
    symbols = np.repeat(bits, 20) * 800.0 + rng.normal(0.0, 120.0,
                                                       len(bits) * 20)
    stamps = (np.arange(len(symbols)) + 1) * 2000

    d1 = GpsLnavDecoder()
    tow1 = []
    for s, st in zip(symbols, stamps):
        d1.feed(float(s), int(st))
        tow1.append(np.nan if d1.tow_at_last_symbol_ms is None
                    else d1.tow_at_last_symbol_ms)
    d2 = GpsLnavDecoder()
    tow2 = np.zeros(0)
    pos = 0
    rng2 = np.random.default_rng(7)
    while pos < len(symbols):
        k = int(rng2.integers(50, 700))
        tow2 = np.concatenate(
            [tow2, d2.feed_array(symbols[pos:pos + k], stamps[pos:pos + k])])
        pos += k

    assert d1.tow_at_last_symbol_ms == d2.tow_at_last_symbol_ms
    assert d1.tow_at_last_symbol_ms is not None
    assert d1.ephemeris_fields == d2.ephemeris_fields
    # wherever the per-symbol path knows TOW, the array path agrees
    t1 = np.asarray(tow1)
    known = ~np.isnan(t1)
    assert known.any()
    assert np.allclose(t1[known], tow2[known], atol=1e-9)
