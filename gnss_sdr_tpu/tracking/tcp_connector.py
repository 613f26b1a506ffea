"""TCP-connector tracking: correlators here, loop filters in an
external process over TCP.

Counterpart of the reference's GPS_L1_CA_TCP_CONNECTOR_Tracking
(/root/reference/src/algorithms/tracking/gnuradio_blocks/
gps_l1_ca_tcp_connector_tracking_cc.cc:133-470 and
../libs/tcp_communication.cc): each code period the channel sends its
Early/Late/Prompt correlator outputs plus the acquisition Doppler as a
9-float packet and receives a 4-float packet carrying the
externally-computed code timing correction [s/period], carrier error and the absolute
carrier-Doppler NCO command — the hardware-in-the-loop / algorithm
prototyping hook (originally a MATLAB/Simulink bridge).

Wire format (tcp_communication.h:38-39): little-endian float32 arrays,
TX = [control_id, E.re, E.im, L.re, L.im, P.re, P.im, acq_doppler_hz,
enabled], RX = [control_id, code_error_s, carr_error,
carrier_doppler_hz].
"""

from __future__ import annotations

import math
import socket
import struct

import numpy as np

from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.codes.sampling import sampled_code_phase_indices

CODE_RATE = 1.023e6
CODE_LENGTH = 1023
TWO_PI = 2.0 * math.pi


class TcpLoopClient:
    """One channel's packet exchange (Tcp_Communication role)."""

    def __init__(self, host: str, port: int, control_id: int = 0,
                 timeout_s: float = 10.0):
        self.control_id = float(control_id)
        self._sock = socket.create_connection((host, port),
                                              timeout=timeout_s)

    def exchange(self, early: complex, late: complex, prompt: complex,
                 acq_doppler_hz: float, enabled: bool = True
                 ) -> tuple[float, float, float]:
        tx = struct.pack(
            "<9f", self.control_id, early.real, early.imag, late.real,
            late.imag, prompt.real, prompt.imag, acq_doppler_hz,
            1.0 if enabled else 0.0)
        self._sock.sendall(tx)
        rx = self._sock.recv(16, socket.MSG_WAITALL)
        cid, code_error, carr_error, doppler = struct.unpack("<4f", rx)
        if cid != self.control_id:
            raise ValueError(
                f"TCP loop packet error: control id {cid} != "
                f"{self.control_id}")
        return code_error, carr_error, doppler

    def close(self) -> None:
        self._sock.close()


class TcpConnectorTracking:
    """Single-channel GPS L1 C/A tracker with the loop closed remotely.

    Host/NumPy correlators: this block exists for algorithm-in-the-loop
    experiments at one channel, not the production signal plane (the
    reference's version is likewise a one-channel gnuradio block).
    """

    def __init__(self, prn: int, fs: float, host: str, port: int,
                 doppler_hz: float = 0.0, code_phase_samples: float = 0.0,
                 early_late_space_chips: float = 0.5,
                 control_id: int = 0):
        self.fs = fs
        self.prn = prn
        self.code = np.asarray(gps_l1ca_code(prn), dtype=np.float32)
        self.client = TcpLoopClient(host, port, control_id)
        self.acq_doppler_hz = doppler_hz
        self.carrier_doppler_hz = doppler_hz
        self.code_freq_hz = CODE_RATE
        self.rem_code_phase_samples = 0.0
        self.rem_carr_phase_rad = 0.0
        self.position = int(round(code_phase_samples))
        self.els_chips = early_late_space_chips
        self.prompts: list[complex] = []

    def _period_length(self) -> int:
        t_prn_samples = CODE_LENGTH / self.code_freq_hz * self.fs
        return int(round(t_prn_samples + self.rem_code_phase_samples))

    def process(self, samples: np.ndarray, n_periods: int) -> int:
        """Track ``n_periods`` code periods starting at self.position;
        returns the stream position after the last period."""
        for _ in range(n_periods):
            n = self._period_length()
            seg = samples[self.position: self.position + n]
            if len(seg) < n:
                break
            step = self.code_freq_hz / self.fs
            rem_chips = self.rem_code_phase_samples * step
            corr = {}
            for name, shift in (("E", -self.els_chips / 2.0),
                                ("P", 0.0),
                                ("L", self.els_chips / 2.0)):
                idx = sampled_code_phase_indices(
                    n, CODE_LENGTH, step, rem_chips, shift)
                replica = self.code[idx]
                t = (np.arange(n) + 0.0) / self.fs
                ph = (TWO_PI * self.carrier_doppler_hz * t
                      + self.rem_carr_phase_rad)
                wiped = seg * np.exp(-1j * ph)
                corr[name] = complex(np.sum(wiped * replica))
            # loop closure lives at the far end of the TCP pipe
            code_error, _carr_error, doppler = self.client.exchange(
                corr["E"], corr["L"], corr["P"], self.acq_doppler_hz)
            # carrier phase continuity: advance by the Doppler the
            # correlation actually used, THEN adopt the NCO command
            self.rem_carr_phase_rad = math.fmod(
                self.rem_carr_phase_rad
                + TWO_PI * self.carrier_doppler_hz * n / self.fs, TWO_PI)
            self.carrier_doppler_hz = doppler
            # NCO command application (tcp_connector :364-397)
            self.code_freq_hz = 1.0 / (
                1.0 / CODE_RATE - code_error / CODE_LENGTH)
            t_prn_samples = CODE_LENGTH / self.code_freq_hz * self.fs
            k_blk = t_prn_samples + self.rem_code_phase_samples
            n_next = int(round(k_blk))
            self.rem_code_phase_samples = k_blk - n_next
            self.position += n
            self.prompts.append(corr["P"])
        return self.position

    def close(self) -> None:
        self.client.close()
