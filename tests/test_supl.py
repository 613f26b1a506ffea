"""SUPL A-GNSS client over a mock server (VERDICT round-1 item 6).

A real TCP (and TLS-capable) server thread speaks the ULP session flow;
the client fetches reference time/location, Klobuchar iono, UTC and the
navigation model, which round-trips into GpsEphemeris containers whose
orbits match the originals to sub-meter level at ICD quantization —
ready for the warm-start path (control_thread.cc assist_GNSS role).
"""

import socket
import threading

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.supl import (
    MSG_SUPL_END,
    MSG_SUPL_POS,
    MSG_SUPL_POS_INIT,
    MSG_SUPL_RESPONSE,
    MSG_SUPL_START,
    AssistanceData,
    SuplClient,
    _frame,
    _read_frame,
    decode_navigation_model,
    encode_assistance,
    encode_navigation_model,
)
from gnss_sdr_tpu.simulate.scenario import make_constellation


class MockSuplServer(threading.Thread):
    """Single-session SUPL server: START -> RESPONSE; POS INIT ->
    POS(assistance) + END."""

    def __init__(self, assistance: AssistanceData):
        super().__init__(daemon=True)
        self.assistance = assistance
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.requested = None

    def run(self):
        conn, _ = self.sock.accept()
        with conn:
            msg, sid, _ = _read_frame(conn)
            assert msg == MSG_SUPL_START
            conn.sendall(_frame(MSG_SUPL_RESPONSE, sid, b"\x00"))
            msg, sid, body = _read_frame(conn)
            assert msg == MSG_SUPL_POS_INIT
            self.requested = body[0]
            conn.sendall(_frame(MSG_SUPL_POS, sid,
                                encode_assistance(self.assistance)))
            conn.sendall(_frame(MSG_SUPL_END, sid, b""))
        self.sock.close()


def test_navigation_model_codec_orbit_accuracy():
    """ICD-quantized nav-model roundtrip keeps orbits to sub-meter."""
    ephs = make_constellation([4, 9], toe_s=7200.0)
    back = decode_navigation_model(encode_navigation_model(ephs))
    assert set(back) == {4, 9}
    for p in (4, 9):
        t = 7200.0 + 900.0
        pos_a = np.asarray(ephs[p].sat_pos(t))
        pos_b = np.asarray(back[p].sat_pos(t))
        assert np.linalg.norm(pos_a - pos_b) < 1.0, p
        assert abs(ephs[p].clock_bias_s(t)
                   - back[p].clock_bias_s(t)) < 2e-9, p


def test_supl_session_over_tcp():
    ephs = make_constellation([2, 5, 11], toe_s=7200.0)
    served = AssistanceData(
        ephemerides=ephs,
        iono_alpha=(1.1176e-8, 1.4901e-8, -5.9605e-8, -1.1921e-7),
        iono_beta=(90112.0, 16384.0, -196608.0, -65536.0),
        utc_a0=9.3e-9, utc_a1=2.2e-15,
        ref_time_tow_s=346512.0, ref_time_week=312,
        ref_lat_deg=41.27, ref_lon_deg=1.99)
    server = MockSuplServer(served)
    server.start()

    client = SuplClient("127.0.0.1", port=server.port)
    got = client.fetch_assistance(session_id=7)
    server.join(timeout=10)

    assert server.requested & 0b111111 == client.requested
    assert set(got.ephemerides) == {2, 5, 11}
    t = 7200.0 + 600.0
    for p, e in ephs.items():
        d = np.linalg.norm(np.asarray(e.sat_pos(t))
                           - np.asarray(got.ephemerides[p].sat_pos(t)))
        assert d < 1.0, (p, d)
    assert got.iono_alpha == pytest.approx(served.iono_alpha, rel=0.05)
    assert got.iono_beta == pytest.approx(served.iono_beta, rel=0.05)
    assert got.utc_a0 == pytest.approx(9.3e-9, abs=2.0**-30)
    assert got.ref_time_week == 312
    assert got.ref_time_tow_s == pytest.approx(346512.0, abs=0.08)
    assert got.ref_lat_deg == pytest.approx(41.27, abs=1e-4)
    assert got.ref_lon_deg == pytest.approx(1.99, abs=1e-4)
