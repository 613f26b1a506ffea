"""TCP-connector tracking: loop filters running in an external process
(gps_l1_ca_tcp_connector_tracking_cc + tcp_communication roles)."""

import math
import socket
import struct
import threading

import numpy as np
import pytest

from gnss_sdr_tpu.simulate import SatelliteParams, generate_gps_l1ca
from gnss_sdr_tpu.tracking.tcp_connector import TcpConnectorTracking

FS = 2.5e6


class _LoopServer:
    """The far-end algorithm host: normalized E-L DLL + Costas-atan PLL
    with simple first/second-order filters, speaking the reference's
    9-float/4-float packet format."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.errors: list = []
        self.n_packets = 0

    def _serve(self):
        try:
            conn, _ = self.sock.accept()
            doppler = None
            carr_int = 0.0
            t = 1.023e-3
            while True:
                data = conn.recv(36, socket.MSG_WAITALL)
                if len(data) < 36:
                    return
                (cid, e_re, e_im, l_re, l_im, p_re, p_im, acq_dopp,
                 enabled) = struct.unpack("<9f", data)
                if doppler is None:
                    doppler = acq_dopp
                e = abs(complex(e_re, e_im))
                ll = abs(complex(l_re, l_im))
                code_error = 0.5 * (e - ll) / (e + ll) if (e + ll) else 0.0
                carr_error = math.atan(p_im / p_re) / (2.0 * math.pi) \
                    if p_re else 0.0
                # PI carrier loop + proportional DLL, closed remotely;
                # code command is in CHIPS (the reference NCO formula
                # divides it by the code length)
                carr_int += 1500.0 * carr_error * t
                doppler = acq_dopp + 50.0 * carr_error + carr_int
                # the receiver's NCO formula 1/(T_chip - cmd/1023) takes
                # the command as a per-period timing correction in
                # SECONDS (the MATLAB bridge convention)
                code_cmd = -0.3 * code_error / 1.023e6
                conn.sendall(struct.pack(
                    "<4f", cid, code_cmd, carr_error, doppler))
                self.n_packets += 1
        except Exception as exc:
            self.errors.append(exc)

    def start(self):
        self.thread.start()

    def close(self):
        self.sock.close()


def test_external_loop_tracks_signal():
    delay = 500.0
    doppler = 750.0
    sig = generate_gps_l1ca(
        [SatelliteParams(prn=9, cn0_db_hz=50.0, delay_samples=delay,
                         doppler_hz=doppler)], FS, 0.25, seed=5)
    srv = _LoopServer()
    srv.start()
    trk = TcpConnectorTracking(
        prn=9, fs=FS, host="127.0.0.1", port=srv.port,
        doppler_hz=750.0, code_phase_samples=delay)
    trk.position = int(delay)
    trk.process(sig, 200)
    trk.close()
    srv.close()
    assert not srv.errors, srv.errors
    assert srv.n_packets >= 200
    # carrier NCO command converged to the true Doppler
    assert abs(trk.carrier_doppler_hz - doppler) < 30.0, \
        trk.carrier_doppler_hz
    # prompts keep coherent power (the external loop holds lock)
    tail = np.abs(np.asarray(trk.prompts[-50:]))
    head = np.abs(np.asarray(trk.prompts[:10]))
    assert tail.mean() > 0.7 * head.mean()


def test_control_id_mismatch_raises():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)

    def bad_server():
        conn, _ = srv.accept()
        conn.recv(36, socket.MSG_WAITALL)
        conn.sendall(struct.pack("<4f", 99.0, 0.0, 0.0, 0.0))

    th = threading.Thread(target=bad_server, daemon=True)
    th.start()
    from gnss_sdr_tpu.tracking.tcp_connector import TcpLoopClient

    cli = TcpLoopClient("127.0.0.1", srv.getsockname()[1], control_id=3)
    with pytest.raises(ValueError, match="control id"):
        cli.exchange(1 + 0j, 1 + 0j, 1 + 0j, 0.0)
    cli.close()
    srv.close()
