"""Advanced-Navigation packet output of the PVT solution.

Counterpart of the reference's An_Packet_Printer
(/root/reference/src/algorithms/PVT/libs/an_packet_printer.cc /
an_packet_printer.h:39-66): the custom "SDR GNSS" ANPP packet (id 201,
73-byte little-endian payload) carrying fix satellite counts, runtime
microseconds, geodetic position, NED velocity, six per-satellite
(PRN, C/N0, Doppler) slots and a status word, framed with a CRC16-CCITT
over the payload and an LRC over the header. The reference writes these
to a serial port; here :func:`encode_an_packet` returns the bytes for
any transport (serial/UDP/file) and :func:`decode_an_packet` validates
and unpacks them (the test oracle and a listener-side helper).
"""

from __future__ import annotations

import dataclasses
import struct

AN_PACKET_ID = 201
AN_PAYLOAD_LEN = 73

_PAYLOAD_HEAD = "<BBBIddd3f"        # through velocity[3]
_SAT = "<BBh"


def _crc16_ccitt(data: bytes) -> int:
    """CRC16-CCITT, init 0xFFFF, poly 0x1021 (an_packet_printer.cc:310
    table implementation)."""
    crc = 0xFFFF
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _header_lrc(h1: int, h2: int, h3: int) -> int:
    return (((h1 + h2 + h3) ^ 0xFF) + 1) & 0xFF


@dataclasses.dataclass
class SdrGnssPacket:
    nsvfix: int = 0
    gps_satellites: int = 0
    galileo_satellites: int = 0
    microseconds: int = 0
    latitude_rad: float = 0.0
    longitude_rad: float = 0.0
    height_m: float = 0.0
    velocity_ned: tuple = (0.0, 0.0, 0.0)
    #: up to six (prn, snr_db_hz, doppler_hz); Galileo PRNs carry +100
    sats: tuple = ()
    status: int = 0


def encode_an_packet(p: SdrGnssPacket) -> bytes:
    payload = bytearray(AN_PAYLOAD_LEN)
    struct.pack_into(_PAYLOAD_HEAD, payload, 0,
                     p.nsvfix & 0xFF, p.gps_satellites & 0xFF,
                     p.galileo_satellites & 0xFF,
                     p.microseconds & 0xFFFFFFFF,
                     p.latitude_rad, p.longitude_rad, p.height_m,
                     *((list(p.velocity_ned) + [0.0] * 3)[:3]))
    off = struct.calcsize(_PAYLOAD_HEAD)
    for k in range(6):
        prn, snr, dopp = (p.sats[k] if k < len(p.sats) else (0, 0, 0.0))
        d = max(-32768, min(32767, int(round(dopp))))
        struct.pack_into(_SAT, payload, off, prn & 0xFF,
                         int(round(snr)) & 0xFF, d)
        off += struct.calcsize(_SAT)
    struct.pack_into("<H", payload, AN_PAYLOAD_LEN - 2, p.status & 0xFFFF)
    crc = _crc16_ccitt(bytes(payload))
    h1, h2, h3 = AN_PACKET_ID, crc & 0xFF, (crc >> 8) & 0xFF
    return bytes([_header_lrc(h1, h2, h3), h1, h2, h3]) + bytes(payload)


def decode_an_packet(frame: bytes) -> SdrGnssPacket:
    if len(frame) != 4 + AN_PAYLOAD_LEN:
        raise ValueError(f"bad AN packet length {len(frame)}")
    lrc, pid, c_lo, c_hi = frame[:4]
    if pid != AN_PACKET_ID:
        raise ValueError(f"unexpected packet id {pid}")
    if lrc != _header_lrc(pid, c_lo, c_hi):
        raise ValueError("header LRC mismatch")
    payload = frame[4:]
    if _crc16_ccitt(payload) != (c_lo | (c_hi << 8)):
        raise ValueError("payload CRC mismatch")
    head = struct.unpack_from(_PAYLOAD_HEAD, payload, 0)
    off = struct.calcsize(_PAYLOAD_HEAD)
    sats = []
    for _ in range(6):
        prn, snr, dopp = struct.unpack_from(_SAT, payload, off)
        off += struct.calcsize(_SAT)
        if prn:
            sats.append((prn, snr, float(dopp)))
    status, = struct.unpack_from("<H", payload, AN_PAYLOAD_LEN - 2)
    return SdrGnssPacket(
        nsvfix=head[0], gps_satellites=head[1], galileo_satellites=head[2],
        microseconds=head[3], latitude_rad=head[4], longitude_rad=head[5],
        height_m=head[6], velocity_ned=tuple(head[7:10]),
        sats=tuple(sats), status=status)


def packet_from_solution(sol, periods=(), microseconds: int = 0,
                         status: int = 0) -> SdrGnssPacket:
    """Build the packet from a :class:`PvtSolution` + tracked channel
    info (update_sdr_gnss_packet role, an_packet_printer.cc:89-160).

    ``periods``: iterable of (system, prn, cn0_db_hz, doppler_hz)."""
    sats = []
    n_gps = n_gal = 0
    for sysc, prn, cn0, dopp in periods:
        if sysc == "E":
            n_gal += 1
            prn = prn + 100
        else:
            n_gps += 1
        if len(sats) < 6:
            sats.append((prn, cn0, dopp))
    vel = tuple(sol.vel_ecef) if sol.vel_ecef is not None \
        else (0.0, 0.0, 0.0)
    return SdrGnssPacket(
        nsvfix=sol.n_sats, gps_satellites=n_gps, galileo_satellites=n_gal,
        microseconds=microseconds, latitude_rad=sol.lat_rad,
        longitude_rad=sol.lon_rad, height_m=sol.height_m,
        velocity_ned=vel, sats=tuple(sats), status=status)
