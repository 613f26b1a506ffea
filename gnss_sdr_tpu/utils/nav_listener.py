"""nav-listener: print navigation messages streamed by the UDP monitor.

Counterpart of the reference utility
(/root/reference/src/utils/nav-listener/nav_msg_udp_listener.cc +
main.cc): binds a UDP socket, decodes each datagram as a ``navMsg``
protobuf (nav_message.proto) and prints constellation / signal / PRN /
TOW and the raw navigation bits.

Usage: ``python -m gnss_sdr_tpu.utils.nav_listener <port>``
"""

from __future__ import annotations

import socket
import sys

SYSTEM_NAMES = {"G": "GPS", "E": "Galileo", "R": "Glonass", "C": "Beidou"}


def format_nav_message(msg) -> str:
    """Human-readable rendering (nav_msg_udp_listener.cc
    print_message)."""
    name = SYSTEM_NAMES.get(msg.system, msg.system)
    return (f"New {name} NAV message received in channel:\n"
            f"   Signal: {msg.signal}\n"
            f"   Sat ID: {msg.prn}\n"
            f"   TOW at current symbol: "
            f"{msg.tow_at_current_symbol_ms} ms\n"
            f"   Nav message: {msg.nav_message}\n")


def listen(port: int, out=sys.stdout, max_messages: int | None = None,
           timeout: float | None = None) -> int:
    from gnss_sdr_tpu.monitor.udp_monitor import decode_nav_message

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("0.0.0.0", port))
    if timeout is not None:
        sock.settimeout(timeout)
    n = 0
    try:
        while max_messages is None or n < max_messages:
            try:
                payload, _addr = sock.recvfrom(65536)
            except socket.timeout:
                break
            try:
                msg = decode_nav_message(payload)
            except Exception:
                continue
            out.write(format_nav_message(msg))
            out.flush()
            n += 1
    finally:
        sock.close()
    return n


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: nav_listener <port>", file=sys.stderr)
        return 2
    listen(int(argv[0]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
