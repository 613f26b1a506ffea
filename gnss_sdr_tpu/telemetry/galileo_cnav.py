"""Galileo E6-B C/NAV page transport layer (HAS page carrier).

Counterpart of the reference's C/NAV branch in
``galileo_telemetry_decoder_gs`` (reference:
src/algorithms/telemetry_decoder/gnuradio_blocks/galileo_telemetry_decoder_gs.cc:200-210
for the framing constants and :580-659 ``decode_CNAV_word``) plus the
page-level logic of ``Galileo_Cnav_Message::read_HAS_page``
(src/core/system_parameters/galileo_cnav_message.cc).

Framing per HAS SIS ICD 1.0 (constants mirrored from
src/core/system_parameters/Galileo_CNAV.h:58-105):

- a page is 1000 symbols at 1000 sym/s: 16-symbol sync pattern
  ``1011011101110000`` + 984 coded symbols;
- the 984 symbols are an 8x123 block interleaving of the rate-1/2 K=7
  convolutional encoding (G1=171o, G2=133o with NOT on G2) of 492 bits;
- the 492 bits are [14 reserved | 24 page header | 424 HAS message
  content | 24 CRC-24Q | 6 tail], CRC over the first 462 bits;
- the page header is [status(2) | reserved(2) | MT(2) | MID(5) |
  MS(5) | PID(8)]; a dummy page has header 0xAF3BC3.

The symbol convention matches the I/NAV module: bit 1 -> -1.0.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .galileo_inav import crc24q
from .viterbi import ViterbiDecoder, encode_conv

SYMBOLS_PER_PAGE = 1000
PREAMBLE_BITS = np.array([1, 0, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1, 0, 0, 0, 0],
                         dtype=np.int64)
FRAME_SYMBOLS = SYMBOLS_PER_PAGE - PREAMBLE_BITS.size  # 984
ROWS, COLS = 8, 123
PAGE_RESERVED_BITS = 14
PAGE_HEADER_BITS = 24
MESSAGE_BITS_PER_PAGE = 424  # 53 octets
BITS_FOR_CRC = PAGE_RESERVED_BITS + PAGE_HEADER_BITS + MESSAGE_BITS_PER_PAGE  # 462
DECODED_BITS = FRAME_SYMBOLS // 2  # 492 = 462 + 24 CRC + 6 tail
DUMMY_HEADER = "101011110011101111000011"  # 0xAF3BC3

_PREAMBLE_SYMS = np.where(PREAMBLE_BITS == 1, -1.0, 1.0)


@dataclass
class HasPage:
    """Decoded HAS page, the unit passed to the HAS message receiver
    (reference: src/core/system_parameters/galileo_has_page.h:38-52)."""

    has_message_string: str = ""  # 424 content bits as '0'/'1'
    time_stamp: int = 0           # [s]
    tow: int = 2 ** 32 - 1
    has_status: int = 0
    reserved: int = 0
    message_type: int = 0
    message_id: int = 0
    message_size: int = 0
    message_page_id: int = 0
    dummy: bool = False
    test_mode: bool = False


def _bits_to_int(bits: np.ndarray) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def _int_to_bits(value: int, width: int) -> np.ndarray:
    return np.array([(value >> (width - 1 - i)) & 1 for i in range(width)],
                    dtype=np.int64)


def interleave_cnav(x: np.ndarray) -> np.ndarray:
    """Encoder side: write column-wise into 8 rows x 123 cols, read row-wise."""
    return np.asarray(x).reshape(COLS, ROWS).T.reshape(-1)


def deinterleave_cnav(x: np.ndarray) -> np.ndarray:
    """out[c*8+r] = in[r*123+c] (decode_CNAV_word step 1)."""
    return np.asarray(x).reshape(ROWS, COLS).T.reshape(-1)


def build_page_header(status: int, reserved: int, message_type: int,
                      message_id: int, message_size: int,
                      page_id: int) -> np.ndarray:
    """HAS page header bits (ICD Table 7). ``message_size`` is the real
    size 1..32 (encoded as MS-1 on the wire, galileo_cnav_message.cc
    ``read_HAS_page_header``: +1 on read)."""
    return np.concatenate([
        _int_to_bits(status, 2),
        _int_to_bits(reserved, 2),
        _int_to_bits(message_type, 2),
        _int_to_bits(message_id, 5),
        _int_to_bits(message_size - 1, 5),
        _int_to_bits(page_id, 8),
    ])


def encode_has_page(content_bits: np.ndarray, *, status: int = 1,
                    message_type: int = 1, message_id: int = 0,
                    message_size: int = 1, page_id: int = 1,
                    dummy: bool = False) -> np.ndarray:
    """424 content bits -> 1000 +-1 page symbols (test/simulation source)."""
    content_bits = np.asarray(content_bits, dtype=np.int64)
    if content_bits.size != MESSAGE_BITS_PER_PAGE:
        raise ValueError("HAS page content must be 424 bits")
    if dummy:
        header = np.array([int(c) for c in DUMMY_HEADER], dtype=np.int64)
    else:
        header = build_page_header(status, 0, message_type, message_id,
                                   message_size, page_id)
    body = np.concatenate([np.zeros(PAGE_RESERVED_BITS, dtype=np.int64),
                           header, content_bits])
    crc = crc24q(body)
    bits = np.concatenate([body, _int_to_bits(crc, 24),
                           np.zeros(6, dtype=np.int64)])
    coded = encode_conv(bits).reshape(-1, 2)
    coded[:, 1] ^= 1  # G2 NOT gate (decode_CNAV_word step 2.1)
    syms = interleave_cnav(coded.reshape(-1))
    page = np.concatenate([PREAMBLE_BITS, syms])
    return np.where(page == 1, -1.0, 1.0)


def decode_cnav_frame(symbols984: np.ndarray,
                      decoder: ViterbiDecoder | None = None) -> HasPage | None:
    """984 soft symbols (sync removed) -> HasPage, or None if CRC fails."""
    if decoder is None:
        decoder = ViterbiDecoder(kk=7, nn=2, g=(121, 91))
    soft = deinterleave_cnav(np.asarray(symbols984, dtype=np.float64)).copy()
    soft[1::2] = -soft[1::2]  # undo G2 NOT
    bits = decoder.decode(soft, terminated=True)
    body = bits[:BITS_FOR_CRC]
    crc_rx = _bits_to_int(bits[BITS_FOR_CRC:BITS_FOR_CRC + 24])
    if crc24q(body) != crc_rx:
        return None
    header_bits = bits[PAGE_RESERVED_BITS:PAGE_RESERVED_BITS + PAGE_HEADER_BITS]
    header_str = "".join(str(int(b)) for b in header_bits)
    page = HasPage()
    page.has_message_string = "".join(
        str(int(b)) for b in
        bits[PAGE_RESERVED_BITS + PAGE_HEADER_BITS:BITS_FOR_CRC])
    if header_str == DUMMY_HEADER:
        page.dummy = True
        return page
    page.has_status = _bits_to_int(header_bits[0:2])
    page.reserved = _bits_to_int(header_bits[2:4])
    page.message_type = _bits_to_int(header_bits[4:6])
    page.message_id = _bits_to_int(header_bits[6:11])
    page.message_size = _bits_to_int(header_bits[11:16]) + 1
    page.message_page_id = _bits_to_int(header_bits[16:24])
    page.test_mode = page.has_status == 0
    # status 2 ("reserved") / 3 ("do not use") pages are dropped
    # (galileo_cnav_message.cc read_HAS_page switch)
    if page.has_status >= 2:
        return None
    return page


@dataclass
class GalileoCnavDecoder:
    """Per-channel streaming E6-B C/NAV decoder (one symbol per ms)."""

    history: list[float] = field(default_factory=list)
    synced: bool = False
    inverted: bool = False
    viterbi: ViterbiDecoder | None = None

    def __post_init__(self):
        if self.viterbi is None:
            self.viterbi = ViterbiDecoder(kk=7, nn=2, g=(121, 91))

    def feed(self, symbol: float, time_stamp_s: int = 0) -> HasPage | None:
        self.history.append(float(symbol))
        if not self.synced:
            self._search_sync()
            return None
        if len(self.history) < SYMBOLS_PER_PAGE:
            return None
        syms = np.asarray(self.history[:SYMBOLS_PER_PAGE])
        del self.history[:SYMBOLS_PER_PAGE]
        if self.inverted:
            syms = -syms
        page = decode_cnav_frame(syms[PREAMBLE_BITS.size:], self.viterbi)
        if page is None:
            # lost lock on framing: resync
            self.synced = False
            self.history.clear()
            return None
        page.time_stamp = int(time_stamp_s)
        return page

    def _search_sync(self) -> None:
        n = _PREAMBLE_SYMS.size
        if len(self.history) < n:
            return
        corr = float(np.sum(np.sign(self.history[-n:]) * _PREAMBLE_SYMS))
        if abs(corr) == n:
            self.synced = True
            self.inverted = corr < 0
            # keep the preamble so the next full page starts at index 0
            del self.history[:len(self.history) - n]
