"""Telemetry CRC success-rate statistics.

Counterpart of ``Tlm_CRC_Stats``
(/root/reference/src/algorithms/telemetry_decoder/libs/tlm_crc_stats.{h,cc}):
per-channel counters of frame CRC/parity outcomes, with the reference's
dump-file contract — ``initialize(filename)`` + ``set_channel(ch)`` opens
``<filename><ch>.txt`` and every update rewrites the summary line
(num_ok, num_total, rate).

Streaming decoders accept an optional ``crc_stats`` and report every
frame-level integrity check (LNAV word parity set, I/NAV & CNAV CRC-24Q,
F/NAV CRC, GNAV KX, D1 BCH), so a receiver can watch decode health per
channel exactly like the reference's ``TelemetryDecoder_XX.dump_crc_stats``
option.
"""

from __future__ import annotations

import os


class TlmCrcStats:
    def __init__(self) -> None:
        self.num_crc_ok = 0
        self.num_crc_not_ok = 0
        self.channel = 0
        self._enabled = False
        self._filename: str | None = None
        self._path: str | None = None

    # -- reference API -----------------------------------------------------
    def initialize(self, dump_filename: str | None = None) -> None:
        self._enabled = True
        self._filename = dump_filename

    def set_channel(self, channel: int) -> bool:
        self.channel = int(channel)
        if self._filename:
            self._path = f"{self._filename}{self.channel}.txt"
            try:
                with open(self._path, "w", encoding="ascii"):
                    pass
            except OSError:
                self._path = None
                return False
        return True

    def update(self, crc_ok: bool) -> None:
        """update_CRC_stats counterpart."""
        if crc_ok:
            self.num_crc_ok += 1
        else:
            self.num_crc_not_ok += 1
        if self._path:
            self._write()

    @property
    def num_total(self) -> int:
        return self.num_crc_ok + self.num_crc_not_ok

    @property
    def success_rate(self) -> float:
        total = self.num_total
        return self.num_crc_ok / total if total else 0.0

    def _write(self) -> None:
        tmp = f"{self._path}.tmp"
        with open(tmp, "w", encoding="ascii") as f:
            f.write(f"Channel {self.channel}: {self.num_crc_ok} / "
                    f"{self.num_total} frames validated "
                    f"({100.0 * self.success_rate:.2f} %)\n")
        os.replace(tmp, self._path)
