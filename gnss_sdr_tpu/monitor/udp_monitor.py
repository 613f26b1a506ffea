"""UDP monitor sinks.

Counterpart of the reference's gnss_synchro_monitor / monitor_pvt_udp_sink
(/root/reference/src/core/monitor/gnss_synchro_monitor.h:41-77,
src/algorithms/PVT/libs/monitor_pvt_udp_sink.cc). The reference serializes
with protobuf (docs/protobuf/gnss_synchro.proto) or boost::serialization;
here the payload is JSON (schema-compatible field names) — a documented
divergence until the protobuf wire format lands.
"""

from __future__ import annotations

import json
import socket


class UdpMonitor:
    def __init__(self, host: str = "127.0.0.1", port: int = 1234):
        self.address = (host, port)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def send_observables(self, periods) -> int:
        """Stream per-period tracking rows (Gnss_Synchro equivalents)."""
        rows = [{
            "PRN": p.prn,
            "Channel_ID": p.channel,
            "Prompt_I": p.prompt.real,
            "Prompt_Q": p.prompt.imag,
            "CN0_dB_hz": p.cn0_db_hz,
            "Carrier_Doppler_hz": p.carrier_doppler_hz,
            "Carrier_phase_rads": p.acc_carrier_phase_rad,
            "Tracking_sample_counter": p.sample_start,
            "EVM": p.evm,
        } for p in periods]
        payload = json.dumps(rows).encode()
        self._sock.sendto(payload, self.address)
        return len(payload)

    def send_pvt(self, sol) -> int:
        """Stream one PVT solution (Monitor_Pvt equivalent)."""
        payload = json.dumps({
            "lat": sol.lat_rad, "lon": sol.lon_rad, "height": sol.height_m,
            "x": sol.pos_ecef[0], "y": sol.pos_ecef[1], "z": sol.pos_ecef[2],
            "vx": None if sol.vel_ecef is None else sol.vel_ecef[0],
            "vy": None if sol.vel_ecef is None else sol.vel_ecef[1],
            "vz": None if sol.vel_ecef is None else sol.vel_ecef[2],
            "user_clk_offset": sol.clock_bias_s,
            "gdop": sol.gdop, "pdop": sol.pdop, "hdop": sol.hdop,
            "vdop": sol.vdop, "valid_sats": sol.n_sats,
        }).encode()
        self._sock.sendto(payload, self.address)
        return len(payload)

    def close(self) -> None:
        self._sock.close()
