"""SBAS L1 telemetry transport layer.

Counterpart of the reference's SBAS chain
(/root/reference/src/algorithms/telemetry_decoder/gnuradio_blocks/
sbas_l1_telemetry_decoder_gs.cc + viterbi_decoder_sbas): continuous
rate-1/2 K=7 convolutional code at 500 sps over 250-bit 1-second blocks:
8-bit cycling preamble (0x53, 0x9A, 0xC6), 6-bit message type, 212-bit
payload, 24-bit CRC-24Q over the first 226 bits. This module provides the
transport (sync + Viterbi + CRC) and raw message extraction; correction
application lives with the PVT layer.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.telemetry.galileo_inav import crc24q
from gnss_sdr_tpu.telemetry.viterbi import ViterbiDecoder, encode_conv

BLOCK_BITS = 250
PREAMBLES = (0x53, 0x9A, 0xC6)


def _bits_of(byte: int, n: int = 8) -> np.ndarray:
    return np.array([(byte >> (n - 1 - i)) & 1 for i in range(n)],
                    dtype=np.int64)


def check_block(bits250: np.ndarray, preamble_index: int | None = None):
    """Validate preamble (any of the cycle, or a specific one) + CRC."""
    b = np.asarray(bits250, dtype=np.int64)
    candidates = ([preamble_index] if preamble_index is not None
                  else range(3))
    pre_ok = any(np.array_equal(b[:8], _bits_of(PREAMBLES[i]))
                 for i in candidates)
    if not pre_ok:
        return False, None
    crc = 0
    for bit in b[226:250]:
        crc = (crc << 1) | int(bit)
    if crc24q(b[:226]) != crc:
        return False, None
    msg_type = 0
    for bit in b[8:14]:
        msg_type = (msg_type << 1) | int(bit)
    return True, dict(msg_type=msg_type, payload=b[14:226].copy())


def build_block(msg_type: int, payload212: np.ndarray,
                preamble_index: int = 0) -> np.ndarray:
    b = np.zeros(BLOCK_BITS, dtype=np.int64)
    b[:8] = _bits_of(PREAMBLES[preamble_index % 3])
    for i in range(6):
        b[8 + i] = (msg_type >> (5 - i)) & 1
    b[14:226] = np.asarray(payload212, dtype=np.int64)
    crc = crc24q(b[:226])
    for i in range(24):
        b[226 + i] = (crc >> (23 - i)) & 1
    return b


@dataclasses.dataclass
class SbasMessage:
    msg_type: int
    payload: np.ndarray
    sample_stamp: int


class SbasL1Decoder:
    """Streaming SBAS decoder (500 sps coded symbols in)."""

    CHUNK_BITS = 2 * BLOCK_BITS
    MARGIN = 32

    def __init__(self):
        self.viterbi = ViterbiDecoder(kk=7, nn=2, g=(0o171, 0o133))
        self.symbols: list[float] = []
        self.stamps: list[int] = []
        self.bits: list[int] = []
        self.bit_stamps: list[int] = []
        self._consumed = 0
        self.messages: list[SbasMessage] = []
        self._polarity = 1.0

    def feed(self, symbol: float, sample_stamp: int) -> SbasMessage | None:
        self.symbols.append(float(symbol))
        self.stamps.append(int(sample_stamp))
        need = 2 * (self.CHUNK_BITS + 2 * self.MARGIN)
        if len(self.symbols) - self._consumed >= need:
            return self._decode_chunk()
        return None

    def _decode_chunk(self) -> SbasMessage | None:
        lo = self._consumed
        lead = min(self.MARGIN, lo // 2)
        start = lo - 2 * lead
        need = 2 * (lead + self.CHUNK_BITS + self.MARGIN)
        sym = np.asarray(self.symbols[start: start + need]) * self._polarity
        decoded = self.viterbi.decode(sym, terminated=False)
        good = decoded[lead: lead + self.CHUNK_BITS]
        stamps = self.stamps[lo + 1: lo + 2 * self.CHUNK_BITS + 1: 2]
        self.bits.extend(int(x) for x in good)
        self.bit_stamps.extend(stamps)
        self._consumed += 2 * self.CHUNK_BITS
        return self._search()

    def _search(self) -> SbasMessage | None:
        bits = np.asarray(self.bits, dtype=np.int64)
        update = None
        i = 0
        while i + BLOCK_BITS <= len(bits):
            matched = False
            for inv in (0, 1):
                ok, fields = check_block(bits[i:i + BLOCK_BITS] ^ inv)
                if ok:
                    update = SbasMessage(fields["msg_type"],
                                         fields["payload"],
                                         self.bit_stamps[i + BLOCK_BITS - 1])
                    self.messages.append(update)
                    if inv:
                        self._polarity = -self._polarity
                    i += BLOCK_BITS
                    matched = True
                    break
            if not matched:
                i += 1
        del self.bits[:i]
        del self.bit_stamps[:i]
        return update
