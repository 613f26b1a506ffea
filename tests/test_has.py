"""Galileo E6 HAS subsystem: Reed-Solomon, C/NAV transport, MT1 decoding.

Mirrors the reference's HAS chain (galileo_telemetry_decoder_gs CNAV
branch -> galileo_e6_has_msg_receiver) with an encode/decode roundtrip
as the correctness oracle, including the vertical RS(255,32) mother-code
erasure recovery from non-systematic pages.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.telemetry.reed_solomon import ReedSolomon
from gnss_sdr_tpu.telemetry.galileo_cnav import (
    GalileoCnavDecoder, HasPage, decode_cnav_frame, encode_has_page,
    PREAMBLE_BITS, SYMBOLS_PER_PAGE)
from gnss_sdr_tpu.telemetry.galileo_has import (
    HasMessageReceiver, build_mt1_message, encode_mt1_pages,
    format_has_data, GPS_SYSTEM, GALILEO_SYSTEM)


class TestReedSolomon:
    def test_e6b_parity_matches_icd_generator_matrix(self):
        # First parity column of the HAS SIS ICD generator matrix
        # (reference reed_solomon.cc:37+: rows 32..36, first column)
        rs = ReedSolomon("E6B")
        info = np.zeros(32, dtype=np.uint8)
        info[0] = 1
        cw = rs.encode(info)
        assert list(cw[32:37]) == [19, 27, 98, 95, 172]
        assert (cw[:32] == info).all()  # systematic

    @pytest.mark.parametrize("n_eras", [0, 5, 100, 223])
    def test_erasure_roundtrip(self, n_eras):
        rng = np.random.default_rng(n_eras)
        rs = ReedSolomon("E6B")
        info = rng.integers(0, 256, 32).astype(np.uint8)
        cw = rs.encode(info)
        eras = list(rng.choice(255, n_eras, replace=False)) if n_eras else []
        rx = cw.copy()
        if n_eras:
            rx[eras] = rng.integers(0, 256, n_eras).astype(np.uint8)
        n_corr, out = rs.decode(rx, eras)
        assert n_corr >= 0
        assert (out == cw).all()

    def test_errors_and_erasures(self):
        rng = np.random.default_rng(7)
        rs = ReedSolomon("E6B")
        info = rng.integers(0, 256, 32).astype(np.uint8)
        cw = rs.encode(info)
        rx = cw.copy()
        eras = [3, 77, 200]
        rx[eras] = 0
        for p in (10, 150):  # unknown-position errors
            rx[p] ^= 0x5A
        n_corr, out = rs.decode(rx, eras)
        assert n_corr >= 0 and (out == cw).all()

    def test_failure_beyond_capacity(self):
        rs = ReedSolomon(nroots=16, fcr=1)  # small code: corrects 8 errors
        rng = np.random.default_rng(1)
        info = rng.integers(0, 256, rs.info_len).astype(np.uint8)
        cw = rs.encode(info)
        rx = cw.copy()
        for p in rng.choice(rs.block_len, 12, replace=False):
            rx[p] ^= 0xFF
        n_corr, _ = rs.decode(rx)
        assert n_corr == -1

    def test_e1b_shortened_preset(self):
        rs = ReedSolomon("E1B")
        assert rs.block_len == 118 and rs.info_len == 58
        rng = np.random.default_rng(2)
        info = rng.integers(0, 256, 58).astype(np.uint8)
        cw = rs.encode(info)
        rx = cw.copy()
        rx[5] ^= 1
        rx[60] ^= 0x80
        n_corr, out = rs.decode(rx)
        assert n_corr == 2 and (out == cw).all()


class TestCnavTransport:
    def test_page_roundtrip(self):
        rng = np.random.default_rng(0)
        content = rng.integers(0, 2, 424)
        syms = encode_has_page(content, status=1, message_id=5,
                               message_size=3, page_id=7)
        assert syms.size == SYMBOLS_PER_PAGE
        page = decode_cnav_frame(syms[PREAMBLE_BITS.size:])
        assert page is not None and not page.dummy
        assert page.message_id == 5
        assert page.message_size == 3
        assert page.message_page_id == 7
        assert page.has_status == 1
        assert page.has_message_string == "".join(str(b) for b in content)

    def test_dummy_page(self):
        content = np.zeros(424, dtype=np.int64)
        syms = encode_has_page(content, dummy=True)
        page = decode_cnav_frame(syms[PREAMBLE_BITS.size:])
        assert page is not None and page.dummy

    def test_crc_rejects_corruption(self):
        content = np.zeros(424, dtype=np.int64)
        syms = encode_has_page(content, page_id=1)
        rng = np.random.default_rng(9)
        bad = syms.copy()
        flips = rng.choice(np.arange(16, 1000), 450, replace=False)
        bad[flips] = -bad[flips]  # way beyond FEC capacity
        assert decode_cnav_frame(bad[PREAMBLE_BITS.size:]) is None

    def test_streaming_decoder_with_noise_and_inversion(self):
        rng = np.random.default_rng(3)
        content = rng.integers(0, 2, 424)
        syms = encode_has_page(content, message_id=2, message_size=1,
                               page_id=1)
        stream = np.concatenate([rng.choice([-1.0, 1.0], 37), -syms, -syms])
        stream = stream + 0.3 * rng.standard_normal(stream.size)
        # phase-inverted stream (180-deg carrier ambiguity)
        dec = GalileoCnavDecoder()
        pages = [p for s in stream for p in [dec.feed(float(s))] if p]
        assert len(pages) >= 1
        assert pages[0].message_id == 2
        assert pages[0].has_message_string == "".join(str(b) for b in content)


def _example_message():
    # GPS PRNs 1,2 + Galileo PRN 5 with orbit + clock sections
    gps_mask = (1 << 39) | (1 << 38)        # bits are MSB-first PRN order
    gal_mask = (1 << 35)
    msg = build_mt1_message(
        toh=120, mask_id=4, iod_set_id=9,
        gnss_systems=[
            {"gnss_id": GPS_SYSTEM, "satellite_mask": gps_mask,
             "signal_mask": 0b1000000000000001, "nav_message": 0},
            {"gnss_id": GALILEO_SYSTEM, "satellite_mask": gal_mask,
             "signal_mask": 0b0100000000000000, "nav_message": 1},
        ],
        orbit={"validity": 7, "gnss_ids": [0, 0, 2],
               "iods": [33, 44, 600],
               "radial": [100, -100, 1000],
               "in_track": [50, -50, 500],
               "cross_track": [25, -25, 250]},
        clock={"validity": 5, "multipliers": [1, 2],
               "corrections": [-200, 200, 800]},
    )
    return msg


class TestHasMessageReceiver:
    def test_systematic_pages_decode(self):
        msg = _example_message()
        pages = encode_mt1_pages(msg, message_id=11)
        ms = len(pages)
        rx = HasMessageReceiver()
        out = None
        for pid, content in pages:
            hp = HasPage(has_message_string=content, has_status=1,
                         message_type=1, message_id=11, message_size=ms,
                         message_page_id=pid, time_stamp=1000)
            out = rx.process_page(hp) or out
        assert out is not None
        assert out.header.toh == 120
        assert out.header.mask_id == 4
        assert out.header.iod_set_id == 9
        assert out.Nsys == 2
        assert out.prns() == [(GPS_SYSTEM, 1), (GPS_SYSTEM, 2),
                              (GALILEO_SYSTEM, 5)]
        np.testing.assert_allclose(out.delta_radial_m(),
                                   [0.25, -0.25, 2.5])
        np.testing.assert_allclose(out.delta_in_track_m(),
                                   [0.4, -0.4, 4.0])
        assert out.gnss_iod == [33, 44, 600]
        # clock: multipliers [1, 2] -> GPS sats x1, Galileo sat x2
        np.testing.assert_allclose(out.delta_clock_m(),
                                   [-0.5, 0.5, 4.0])
        assert "HAS MT1" in format_has_data(out)

    def test_erasure_recovery_from_parity_pages(self):
        # lose systematic pages; decode from parity pages (PIDs > 32)
        msg = _example_message()
        n_pages = (len(msg) + 423) // 424
        pids = [1] + list(range(40, 40 + n_pages - 1))
        pages = encode_mt1_pages(msg, message_id=3, pids=pids)
        rx = HasMessageReceiver()
        out = None
        for pid, content in pages:
            hp = HasPage(has_message_string=content, has_status=1,
                         message_type=1, message_id=3, message_size=n_pages,
                         message_page_id=pid, time_stamp=50)
            out = rx.process_page(hp) or out
        assert out is not None
        assert out.header.toh == 120
        assert out.prns() == [(GPS_SYSTEM, 1), (GPS_SYSTEM, 2),
                              (GALILEO_SYSTEM, 5)]

    def test_mask_reuse_across_messages(self):
        # first message carries the mask; second reuses it by mask_id
        msg1 = _example_message()
        pages1 = encode_mt1_pages(msg1, message_id=1)
        msg2 = build_mt1_message(
            toh=180, mask_id=4,
            orbit={"validity": 2, "gnss_ids": [0, 0, 2],
                   "iods": [35, 46, 601],
                   "radial": [10, 20, 30], "in_track": [1, 2, 3],
                   "cross_track": [4, 5, 6]})
        pages2 = encode_mt1_pages(msg2, message_id=2)
        rx = HasMessageReceiver()
        for pid, content in pages1:
            rx.process_page(HasPage(
                has_message_string=content, has_status=1, message_type=1,
                message_id=1, message_size=len(pages1),
                message_page_id=pid, time_stamp=10))
        out = None
        for pid, content in pages2:
            out = rx.process_page(HasPage(
                has_message_string=content, has_status=1, message_type=1,
                message_id=2, message_size=len(pages2),
                message_page_id=pid, time_stamp=20)) or out
        assert out is not None
        assert out.header.toh == 180
        assert not out.header.mask_flag
        assert out.Nsys == 2  # inherited mask
        assert out.gnss_iod == [35, 46, 601]

    def test_full_chain_symbols_to_has_data(self):
        # MT1 message -> mother-code pages -> CNAV symbol stream ->
        # streaming decoder -> message receiver
        msg = _example_message()
        pages = encode_mt1_pages(msg, message_id=21)
        ms = len(pages)
        stream = []
        for pid, content in pages:
            bits = np.array([int(c) for c in content], dtype=np.int64)
            stream.append(encode_has_page(
                bits, status=1, message_id=21, message_size=ms, page_id=pid))
        syms = np.concatenate(stream)
        dec = GalileoCnavDecoder()
        rx = HasMessageReceiver()
        out = None
        for s in syms:
            page = dec.feed(float(s), time_stamp_s=99)
            if page is not None:
                out = rx.process_page(page) or out
        assert out is not None
        assert out.header.toh == 120
        assert out.prns() == [(GPS_SYSTEM, 1), (GPS_SYSTEM, 2),
                              (GALILEO_SYSTEM, 5)]
