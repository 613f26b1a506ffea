"""Galileo I/NAV FEC2 erasure correction for the clock-ephemeris data (CED).

Counterpart of the reference's `enable_rs` machinery inside
``Galileo_Inav_Message`` (reference:
src/core/system_parameters/galileo_inav_message.cc:255-360 — erasure
vector + decode + page regeneration — and :840-1000 — per-word RS buffer
assembly; layout constants Galileo_INAV.h:266-275).

Galileo OS SIS ICD 2.0 section 5.1.9.4: the 58-octet CED information
vector is spread over word types 1-4 and protected by the shortened
RS(118,58) outer code whose 60 parity octets travel in word types 17-20
(15 octets each). Receiving ANY four of the eight words recovers the
full CED — halving the worst-case time to ephemeris.

RS buffer layout (octet indices):
  [0]       c0 = (word_type_1 << 2) | (IODnav & 3)  -- always known
  [1]       IODnav MSBs (word 1 bits 6..14)
  [2..15]   word 1 bits 16..128
  [16..29]  word 2 bits 16..128
  [30..43]  word 3 bits 16..128
  [44..57]  word 4 bits 16..128
  [58..72]  word 17 parity octets
  [73..87]  word 18 parity octets
  [88..102] word 19 parity octets
  [103..117] word 20 parity octets
"""

from __future__ import annotations

import numpy as np

from gnss_sdr_tpu.telemetry.galileo_inav import build_inav_word, parse_inav_word
from gnss_sdr_tpu.telemetry.reed_solomon import ReedSolomon

INFO_LEN = 58
SUBVECTOR_LEN = 15
BUFFER_LEN = 118


def _word_octets(data128: np.ndarray) -> list[int]:
    """Octets of a CED word's bits 16..128 (14 octets)."""
    d = np.asarray(data128, dtype=np.int64)
    return [int("".join(str(b) for b in d[16 + 8 * i:24 + 8 * i]), 2)
            for i in range(14)]


def _iodnav_of(data128: np.ndarray) -> int:
    d = np.asarray(data128, dtype=np.int64)
    return int("".join(str(b) for b in d[6:16]), 2)


def encode_ced_parity_words(word_bits: dict[int, np.ndarray]) -> dict[int, np.ndarray]:
    """Build word types 17-20 (RS parity) from the CED words 1-4.

    ``word_bits`` maps word type (1..4) -> 128 data bits. Returns
    {17: bits, ..., 20: bits} (simulation-side counterpart; the reference
    receiver only decodes)."""
    for wt in (1, 2, 3, 4):
        if wt not in word_bits:
            raise ValueError("all four CED words are required to encode parity")
    iodnav = _iodnav_of(word_bits[1])
    info = np.zeros(INFO_LEN, dtype=np.uint8)
    info[0] = (1 << 2) | (iodnav & 3)
    info[1] = (iodnav >> 2) & 0xFF
    info[2:16] = _word_octets(word_bits[1])
    info[16:30] = _word_octets(word_bits[2])
    info[30:44] = _word_octets(word_bits[3])
    info[44:58] = _word_octets(word_bits[4])
    rs = ReedSolomon("E1B")
    codeword = rs.encode(info)
    parity = codeword[INFO_LEN:]
    out = {}
    for k, wt in enumerate((17, 18, 19, 20)):
        octets = [int(v) for v in parity[k * SUBVECTOR_LEN:(k + 1) * SUBVECTOR_LEN]]
        out[wt] = build_inav_word({
            "word_type": wt, "rs_parity_octets": octets,
            "iodnav_lsbs": iodnav & 3})
    return out


def _octets_to_bits(prefix_bits: list[int], octets: list[int],
                    word_type: int, iodnav: int) -> np.ndarray:
    """Regenerate a CED word's 128 data bits from its RS octets
    (regenerate_page_N counterpart, galileo_inav_message.cc)."""
    d = np.zeros(128, dtype=np.int64)
    for i in range(6):
        d[i] = (word_type >> (5 - i)) & 1
    for i in range(10):
        d[6 + i] = (iodnav >> (9 - i)) & 1
    for i, octet in enumerate(octets):
        for b in range(8):
            d[16 + 8 * i + b] = (octet >> (7 - b)) & 1
    del prefix_bits
    return d


class InavCedAssembler:
    """Per-channel FEC2 state: collect any 4 of words {1,2,3,4,17..20},
    erasure-decode, and regenerate the missing CED words."""

    def __init__(self):
        self._rs = ReedSolomon("E1B")
        self.reset()

    def reset(self):
        self.buffer = np.zeros(BUFFER_LEN, dtype=np.uint8)
        self.have = [False] * 8  # words 1..4, 17..20
        self.current_iodnav: int | None = None

    def _check_iodnav(self, iodnav: int) -> None:
        if self.current_iodnav is None:
            self.current_iodnav = iodnav
        elif self.current_iodnav != iodnav:
            self.reset()
            self.current_iodnav = iodnav

    def feed(self, data128: np.ndarray) -> dict[int, dict] | None:
        """Feed one I/NAV word's 128 data bits. Returns
        {word_type: parsed fields} for ALL four CED words once any four
        of the eight FEC2 words have arrived (then resets), else None."""
        d = np.asarray(data128, dtype=np.int64)
        wtype = int("".join(str(b) for b in d[0:6]), 2)
        if wtype in (1, 2, 3, 4):
            iodnav = _iodnav_of(d)
            self._check_iodnav(iodnav)
            octets = _word_octets(d)
            if wtype == 1:
                self.buffer[0] = (1 << 2) | (iodnav & 3)
                self.buffer[1] = (iodnav >> 2) & 0xFF
                self.buffer[2:16] = octets
            else:
                self.buffer[0] = (1 << 2) | (self.current_iodnav & 3)
                lo = 16 + (wtype - 2) * 14
                self.buffer[lo:lo + 14] = octets
            self.have[wtype - 1] = True
        elif wtype in (17, 18, 19, 20):
            fields = parse_inav_word(d)
            if self.current_iodnav is not None and \
                    fields["iodnav_lsbs"] != (self.current_iodnav & 3):
                # IODnav changed: parity belongs to a new CED set
                self.reset()
            k = wtype - 17
            lo = INFO_LEN + k * SUBVECTOR_LEN
            self.buffer[lo:lo + SUBVECTOR_LEN] = fields["rs_parity_octets"]
            self.have[4 + k] = True
            # c0 is fully determined by the IODnav LSBs carried in the
            # parity word header ("we always know c_{0,0}", ref :904)
            self.buffer[0] = 4 + fields["iodnav_lsbs"]
        else:
            return None
        if sum(self.have) < 4:
            return None
        # erasure-decode (erasure positions in the shortened 118 block;
        # position 0 is always known once any CED word has arrived)
        erasures: list[int] = []
        if not self.have[0]:
            erasures.extend(range(1, 16))
        for w in (1, 2, 3):
            if not self.have[w]:
                erasures.extend(range(16 + (w - 1) * 14, 16 + w * 14))
        for k in range(4):
            if not self.have[4 + k]:
                erasures.extend(range(INFO_LEN + k * SUBVECTOR_LEN,
                                      INFO_LEN + (k + 1) * SUBVECTOR_LEN))
        n_corr, decoded = self._rs.decode(self.buffer, erasures)
        if n_corr < 0:
            return None
        iodnav = ((int(decoded[1]) << 2) | (int(decoded[0]) & 3)) & 0x3FF
        out: dict[int, dict] = {}
        for wt in (1, 2, 3, 4):
            lo = 2 + (wt - 1) * 14 if wt == 1 else 16 + (wt - 2) * 14
            octets = [int(v) for v in decoded[lo:lo + 14]]
            bits = _octets_to_bits([], octets, wt, iodnav)
            out[wt] = parse_inav_word(bits)
        self.reset()
        return out
