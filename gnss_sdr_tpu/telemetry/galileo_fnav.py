"""Galileo E5a F/NAV transport layer.

Counterpart of the F/NAV path in the reference's Galileo telemetry decoder
(galileo_telemetry_decoder_gs.cc, d_band == '5' branches): 500-symbol
pages at 250 sym/s (2 s), 12-symbol preamble 101101110000, 488 coded
symbols -> 8x61 block deinterleaver -> rate-1/2 K=7 Viterbi with the G2
NOT gate -> 244 bits: page type (6) + nav data (208) + CRC-24Q (24) +
tail (6). This module provides page encode/decode + CRC and a streaming
decoder emitting validated page payloads; word-field parsing (ephemeris)
shares the Kepler container conventions of I/NAV.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.telemetry.galileo_inav import crc24q
from gnss_sdr_tpu.telemetry.viterbi import ViterbiDecoder, encode_conv

PREAMBLE = np.array([1, 0, 1, 1, 0, 1, 1, 1, 0, 0, 0, 0], dtype=np.int64)
PAGE_SYMBOLS = 500
CODED_SYMBOLS = 488
PAGE_BITS = 244
ROWS, COLS = 8, 61


def interleave(x: np.ndarray) -> np.ndarray:
    return np.asarray(x).reshape(COLS, ROWS).T.reshape(-1)


def deinterleave(x: np.ndarray) -> np.ndarray:
    return np.asarray(x).reshape(ROWS, COLS).T.reshape(-1)


def build_page(page_type: int, data208: np.ndarray) -> np.ndarray:
    """244 bits (type + data + CRC + tail) for one F/NAV page."""
    b = np.zeros(PAGE_BITS, dtype=np.int64)
    for i in range(6):
        b[i] = (page_type >> (5 - i)) & 1
    b[6:214] = np.asarray(data208, dtype=np.int64)
    crc = crc24q(b[:214])
    for i in range(24):
        b[214 + i] = (crc >> (23 - i)) & 1
    return b  # last 6 tail bits zero


def check_page(bits244: np.ndarray):
    b = np.asarray(bits244, dtype=np.int64)
    crc = 0
    for bit in b[214:238]:
        crc = (crc << 1) | int(bit)
    if crc24q(b[:214]) != crc:
        return False, None
    ptype = 0
    for bit in b[:6]:
        ptype = (ptype << 1) | int(bit)
    return True, dict(page_type=ptype, data=b[6:214].copy())


def encode_page_symbols(bits244: np.ndarray) -> np.ndarray:
    """244 bits -> 500 +-1 symbols (conv + G2 NOT + interleave + sync)."""
    coded = encode_conv(np.asarray(bits244, dtype=np.int64))  # 488
    coded = coded.reshape(-1, 2)
    coded[:, 1] ^= 1
    coded = interleave(coded.reshape(-1))
    page = np.concatenate([PREAMBLE, coded])
    return np.where(page == 1, -1.0, 1.0)


def decode_page_symbols(symbols500: np.ndarray,
                        decoder: ViterbiDecoder) -> np.ndarray:
    soft = np.asarray(symbols500, dtype=np.float64)[12:]
    soft = deinterleave(soft).copy()
    soft[1::2] = -soft[1::2]
    return decoder.decode(soft, terminated=True)


@dataclasses.dataclass
class FnavPage:
    page_type: int
    data: np.ndarray
    sample_stamp: int


class GalileoFnavDecoder:
    """Streaming F/NAV decoder (one soft symbol per E5a-I symbol, 4 ms)."""

    def __init__(self):
        self.viterbi = ViterbiDecoder(kk=7, nn=2, g=(121, 91))
        self.history: list[float] = []
        self.stamps: list[int] = []
        self.synced = False
        self.inverted = False
        self.page_start = 0
        self.pages: list[FnavPage] = []

    def feed(self, symbol: float, sample_stamp: int) -> FnavPage | None:
        self.history.append(float(symbol))
        self.stamps.append(int(sample_stamp))
        if not self.synced:
            self._search()
            return None
        return self._decode()

    def _search(self) -> None:
        n = len(PREAMBLE)
        if len(self.history) < n:
            return
        ref = np.where(PREAMBLE == 1, -1.0, 1.0)
        corr = float(np.sum(np.sign(self.history[-n:]) * ref))
        if abs(corr) == n:
            self.synced = True
            self.inverted = corr < 0
            start = len(self.history) - n
            del self.history[:start]
            del self.stamps[:start]
            self.page_start = 0

    def _decode(self) -> FnavPage | None:
        if len(self.history) - self.page_start < PAGE_SYMBOLS:
            return None
        lo = self.page_start
        sym = np.asarray(self.history[lo: lo + PAGE_SYMBOLS])
        if self.inverted:
            sym = -sym
        stamp = self.stamps[lo + PAGE_SYMBOLS - 1]
        self.page_start += PAGE_SYMBOLS
        ref = np.where(PREAMBLE == 1, -1.0, 1.0)
        if float(np.sum(np.sign(sym[:12]) * ref)) != 12.0:
            self.synced = False
            self.history = self.history[-12:]
            self.stamps = self.stamps[-12:]
            self.page_start = 0
            return None
        bits = decode_page_symbols(sym, self.viterbi)
        ok, fields = check_page(bits)
        if self.page_start > PAGE_SYMBOLS:
            drop = self.page_start - 1
            del self.history[:drop]
            del self.stamps[:drop]
            self.page_start -= drop
        if not ok:
            return None
        page = FnavPage(fields["page_type"], fields["data"], stamp)
        self.pages.append(page)
        return page
