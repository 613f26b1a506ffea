"""RTCM 3.2 encoder: framing, ephemeris messages, MSM, TCP server.

Counterpart of the reference's rtcm_test.cc coverage (instantiate,
encode, decode own messages, byte-level framing checks).
"""

import socket

import numpy as np
import pytest

from gnss_sdr_tpu.monitor.rtcm import (
    BitWriter, MsmObservation, RtcmPrinter, RtcmTcpServer, crc24q_bytes,
    decode_msm, decode_mt1005, decode_mt1019, decode_mt1020, decode_mt1045,
    deframe, encode_msm, encode_mt1005, encode_mt1019, encode_mt1020,
    encode_mt1045, frame, message_number)
from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris
from gnss_sdr_tpu.pvt.glonass_ephemeris import GlonassEphemeris


def _eph(prn=7):
    return GpsEphemeris(
        prn=prn, week_number=345, sv_health=0, iodc=123, iode=123,
        toc_s=302400.0, af0=2.3e-5, af1=-1.1e-11, af2=0.0, tgd_s=4.6e-9,
        toe_s=302400.0, sqrt_a=5153.68, ecc=0.0123, m0_rad=1.21,
        delta_n_rad_s=4.3e-9, omega0_rad=-2.5, i0_rad=0.96,
        omega_rad=0.7, omega_dot_rad_s=-8.1e-9, idot_rad_s=3.2e-10,
        cuc_rad=3.1e-6, cus_rad=7.2e-6, crc_m=221.4, crs_m=-93.6,
        cic_rad=-1.2e-7, cis_rad=2.1e-7)


class TestFraming:
    def test_frame_structure_and_crc(self):
        payload = bytes([0x3F, 0xAA, 0x00, 0x01])
        f = frame(payload)
        assert f[0] == 0xD3
        assert ((f[1] & 3) << 8 | f[2]) == len(payload)
        assert crc24q_bytes(f[:-3]) == (f[-3] << 16) | (f[-2] << 8) | f[-1]
        assert deframe(f) == [payload]

    def test_deframe_skips_corruption_and_noise(self):
        p1 = encode_mt1005(1, 1e6, 2e6, 3e6)
        p2 = encode_mt1019(_eph())
        stream = b"\x55\xd3junk" + frame(p1) + b"\x00\x00" + frame(p2)
        corrupted = bytearray(frame(p1))
        corrupted[10] ^= 0xFF
        stream += bytes(corrupted)
        payloads = deframe(stream)
        assert payloads == [p1, p2]
        assert [message_number(p) for p in payloads] == [1005, 1019]


class TestEphemerisMessages:
    def test_mt1019_roundtrip(self):
        eph = _eph()
        payload = encode_mt1019(eph)
        assert message_number(payload) == 1019
        assert len(payload) == 61  # 488 bits
        back = decode_mt1019(payload)
        # quantization tolerances per RTCM field scale factors
        assert back.prn == eph.prn
        assert back.iodc == eph.iodc
        assert back.toe_s == eph.toe_s
        np.testing.assert_allclose(back.sqrt_a, eph.sqrt_a, atol=2**-19)
        np.testing.assert_allclose(back.ecc, eph.ecc, atol=2**-33)
        np.testing.assert_allclose(back.m0_rad, eph.m0_rad, atol=np.pi * 2**-31)
        np.testing.assert_allclose(back.af0, eph.af0, atol=2**-31)
        np.testing.assert_allclose(back.omega_dot_rad_s, eph.omega_dot_rad_s,
                                   atol=np.pi * 2**-43)
        np.testing.assert_allclose(back.crs_m, eph.crs_m, atol=2**-5)
        np.testing.assert_allclose(back.tgd_s, eph.tgd_s, atol=2**-31)

    def test_mt1045_roundtrip(self):
        eph = _eph(prn=11)
        eph.toc_s = 301980.0  # MT1045 toc scale is 60 s
        eph.toe_s = 301980.0
        payload = encode_mt1045(eph)
        assert message_number(payload) == 1045
        back = decode_mt1045(payload)
        assert back.prn == 11
        assert back.toe_s == eph.toe_s
        np.testing.assert_allclose(back.m0_rad, eph.m0_rad, atol=np.pi * 2**-31)
        np.testing.assert_allclose(back.af0, eph.af0, atol=2**-34)
        np.testing.assert_allclose(back.af1, eph.af1, atol=2**-46)

    def test_mt1020_roundtrip(self):
        eph = GlonassEphemeris(
            slot=5, freq_slot=-3, tb_s=8100.0,
            pos_m=(12_340_123.0, -9_876_543.0, 19_000_321.0),
            vel_m_s=(-1234.5, 2345.6, -345.7),
            acc_m_s2=(1e-6, -2e-6, 3e-6),
            gamma_n=3.4e-11, tau_n_s=-5.6e-8)
        payload = encode_mt1020(eph)
        assert message_number(payload) == 1020
        back = decode_mt1020(payload)
        assert back.slot == 5 and back.freq_slot == -3
        assert back.tb_s == eph.tb_s
        np.testing.assert_allclose(back.pos_m, eph.pos_m, atol=2**-11 * 1e3)
        np.testing.assert_allclose(back.vel_m_s, eph.vel_m_s, atol=2**-20 * 1e3)
        np.testing.assert_allclose(back.gamma_n, eph.gamma_n, atol=2**-40)
        np.testing.assert_allclose(back.tau_n_s, eph.tau_n_s, atol=2**-30)

    def test_mt1005_and_1006(self):
        p = encode_mt1005(2003, 3275558.234, 321234.567, 5445042.123)
        d = decode_mt1005(p)
        assert d["station_id"] == 2003
        np.testing.assert_allclose([d["x"], d["y"], d["z"]],
                                   [3275558.234, 321234.567, 5445042.123],
                                   atol=1e-4)
        # DF028 antenna height: 16 bits at 0.1 mm -> max 6.5535 m
        p6 = encode_mt1005(2003, 1.0, 2.0, 3.0, height_m=1.2345)
        d6 = decode_mt1005(p6)
        assert d6["mt"] == 1006
        np.testing.assert_allclose(d6["height"], 1.2345, atol=1e-4)


def _observations():
    return [
        MsmObservation(prn=3, signal="1C", pseudorange_m=21_345_678.9,
                       carrier_phase_cycles=21_345_678.9 / 0.1902936728,
                       doppler_hz=1830.0, cn0_dbhz=44.5, lock_time_s=12.0),
        MsmObservation(prn=17, signal="1C", pseudorange_m=24_987_654.3,
                       carrier_phase_cycles=24_987_654.3 / 0.1902936728,
                       doppler_hz=-3120.0, cn0_dbhz=38.25, lock_time_s=2.5),
    ]


class TestMsm:
    @pytest.mark.parametrize("msm,mt", [(4, 1074), (7, 1077)])
    def test_gps_msm_roundtrip(self, msm, mt):
        payload = encode_msm("G", _observations(), station_id=99,
                             epoch_time_ms=123_456_000, msm=msm)
        assert message_number(payload) == mt
        d = decode_msm(payload)
        assert d["system"] == "G" and d["station_id"] == 99
        assert d["epoch_time_ms"] == 123_456_000
        prns = [o["prn"] for o in d["observations"]]
        assert prns == [3, 17]
        for sent, got in zip(_observations(), d["observations"]):
            # MSM4 fine range resolution 2^-24 ms ~ 1.8 cm; MSM7 ~ 0.6 mm
            tol = 0.02 if msm == 4 else 0.001
            np.testing.assert_allclose(got["pseudorange_m"],
                                       sent.pseudorange_m, atol=tol)
            cn0_tol = 0.5 if msm == 4 else 1 / 16
            np.testing.assert_allclose(got["cn0_dbhz"], sent.cn0_dbhz,
                                       atol=cn0_tol + 1e-9)
        if msm == 7:
            np.testing.assert_allclose(
                d["observations"][0]["range_rate_m_s"],
                -1830.0 * 0.1902936728, atol=1e-4 + 1e-9)

    def test_galileo_msm(self):
        obs = [MsmObservation(prn=12, signal="1B",
                              pseudorange_m=23_111_222.3, cn0_dbhz=41.0)]
        payload = encode_msm("E", obs, msm=7)
        assert message_number(payload) == 1097
        d = decode_msm(payload)
        assert d["system"] == "E"
        np.testing.assert_allclose(d["observations"][0]["pseudorange_m"],
                                   23_111_222.3, atol=1e-3)


class TestPrinterAndServer:
    def test_rate_gating(self):
        printer = RtcmPrinter(mt1019_rate_ms=5000, msm_rate_ms=1000)
        ephs = {7: _eph()}
        obs = _observations()
        sent_at_1000 = printer.epoch(1000, ephs, obs)
        assert [message_number(p) for p in deframe(b"".join(sent_at_1000))] == [1077]
        sent_at_5000 = printer.epoch(5000, ephs, obs,
                                     galileo_ephemerides={1: _eph(1)})
        mts = [message_number(p) for p in deframe(b"".join(sent_at_5000))]
        assert mts == [1019, 1045, 1077]
        assert printer.epoch(1020, ephs, obs) == []  # off-cadence

    def test_tcp_server_broadcast(self):
        server = RtcmTcpServer(port=0)
        try:
            client = socket.create_connection(("127.0.0.1", server.port),
                                              timeout=5)
            import time
            time.sleep(0.1)  # let accept loop register the client
            printer = RtcmPrinter(msm_rate_ms=1000, mt1019_rate_ms=0,
                                  server=server)
            printer.epoch(2000, {}, _observations())
            client.settimeout(5)
            buf = b""
            while True:
                try:
                    chunk = client.recv(4096)
                except TimeoutError:
                    break
                if not chunk:
                    break
                buf += chunk
                if deframe(buf):
                    break
            payloads = deframe(buf)
            assert [message_number(p) for p in payloads] == [1077]
            client.close()
        finally:
            server.close()


def test_decode_published_mt1005_reference_bytes():
    """Cross-validation against a THIRD-PARTY byte stream: the RTCM
    10403 standard's published MT1005 example message (also reproduced
    in the gpsd/RTKLIB documentation), NOT produced by our encoder.
    Station 2003, ARP ECEF (1114104.5999, -4850729.7108, 3975521.4643) m.
    A symmetric encode/decode bug cannot pass this."""
    from gnss_sdr_tpu.monitor.rtcm import (
        crc24q_bytes,
        decode_mt1005,
        deframe,
        message_number,
    )

    wire = bytes.fromhex(
        "D300133ED7D30202980EDEEF34B4BD62AC0941986F33360B98")
    payloads = deframe(wire)
    assert len(payloads) == 1, "framing/CRC-24Q failed on reference bytes"
    assert message_number(payloads[0]) == 1005
    fields = decode_mt1005(payloads[0])
    assert fields["station_id"] == 2003
    assert fields["gps"] is True
    assert abs(fields["x"] - 1114104.5999) < 1e-4
    assert abs(fields["y"] - (-4850729.7108)) < 1e-4
    assert abs(fields["z"] - 3975521.4643) < 1e-4
