"""GPS CNAV (L2C / L5) navigation-message decoding.

Counterpart of the reference's CNAV chain
(/root/reference/src/algorithms/telemetry_decoder/gnuradio_blocks/
gps_l2c_telemetry_decoder_gs.cc + libswiftcnav {viterbi27,cnav_msg}.c):

- continuous rate-1/2 K=7 convolutional code (171, 133 octal,
  non-inverted) over the 300-bit message stream;
- message: preamble 0b10001011 (8) + PRN (6) + type (6) + TOW17 (x6 s)
  + alert (1) + payload (238) + CRC-24Q (24);
- decoding: chunked Viterbi with history overlap, then bit-domain
  preamble + CRC search (the role of cnav_msg_decoder_decode);
- message types 10/11 (ephemeris with the CNAV delta-parameterization,
  IS-GPS-200 30.3.3.1) and 30 (clock + group delay) parsed into the
  shared Kepler container.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.telemetry.galileo_inav import crc24q
from gnss_sdr_tpu.telemetry.viterbi import ViterbiDecoder, encode_conv

PREAMBLE = np.array([1, 0, 0, 0, 1, 0, 1, 1], dtype=np.int64)
MSG_BITS = 300
A_REF_M = 26_559_710.0          # IS-GPS-200 30.3.3.1.1
OMEGA_DOT_REF = -2.6e-9         # semicircles/s
PI = np.pi


def _u(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def _s(bits) -> int:
    v = _u(bits)
    if bits[0] == 1:
        v -= 1 << len(bits)
    return v


def check_message(bits300: np.ndarray):
    """Validate preamble + CRC-24Q; returns (ok, fields header dict)."""
    b = np.asarray(bits300, dtype=np.int64)
    if not np.array_equal(b[:8], PREAMBLE):
        return False, None
    crc_val = _u(b[276:300])
    if crc24q(b[:276]) != crc_val:
        return False, None
    return True, dict(prn=_u(b[8:14]), msg_type=_u(b[14:20]),
                      tow_s=_u(b[20:37]) * 6.0, alert=int(b[37]))


def parse_message(bits300: np.ndarray) -> dict | None:
    """Parse a validated CNAV message (types 10, 11, 30)."""
    ok, hdr = check_message(bits300)
    if not ok:
        return None
    b = np.asarray(bits300, dtype=np.int64)
    out = dict(hdr)
    t = hdr["msg_type"]
    p = 38  # payload start
    if t == 10:  # ephemeris 1
        out["week_number"] = _u(b[p:p + 13])
        out["toe_s"] = _u(b[p + 21:p + 32]) * 300.0
        out["delta_a_m"] = _s(b[p + 32:p + 58]) * 2.0**-9
        out["a_dot"] = _s(b[p + 58:p + 83]) * 2.0**-21
        out["delta_n_rad_s"] = _s(b[p + 83:p + 100]) * 2.0**-44 * PI
        out["delta_n_dot"] = _s(b[p + 100:p + 123]) * 2.0**-57 * PI
        out["m0_rad"] = _s(b[p + 123:p + 156]) * 2.0**-32 * PI
        out["ecc"] = _u(b[p + 156:p + 189]) * 2.0**-34
        out["omega_rad"] = _s(b[p + 189:p + 222]) * 2.0**-32 * PI
    elif t == 11:  # ephemeris 2
        out["toe_s"] = _u(b[p:p + 11]) * 300.0
        out["omega0_rad"] = _s(b[p + 11:p + 44]) * 2.0**-32 * PI
        out["i0_rad"] = _s(b[p + 44:p + 77]) * 2.0**-32 * PI
        out["delta_omega_dot_rad_s"] = _s(b[p + 77:p + 94]) * 2.0**-44 * PI
        out["idot_rad_s"] = _s(b[p + 94:p + 109]) * 2.0**-44 * PI
        out["cis_rad"] = _s(b[p + 109:p + 125]) * 2.0**-30
        out["cic_rad"] = _s(b[p + 125:p + 141]) * 2.0**-30
        out["crs_m"] = _s(b[p + 141:p + 165]) * 2.0**-8
        out["crc_m"] = _s(b[p + 165:p + 189]) * 2.0**-8
        out["cus_rad"] = _s(b[p + 189:p + 210]) * 2.0**-30
        out["cuc_rad"] = _s(b[p + 210:p + 231]) * 2.0**-30
    elif t == 30:  # clock + group delay
        out["toc_s"] = _u(b[p + 11:p + 22]) * 300.0
        out["af0"] = _s(b[p + 22:p + 48]) * 2.0**-35
        out["af1"] = _s(b[p + 48:p + 68]) * 2.0**-48
        out["af2"] = _s(b[p + 68:p + 78]) * 2.0**-60
        out["tgd_s"] = _s(b[p + 78:p + 91]) * 2.0**-35
    return out


def build_message(fields: dict) -> np.ndarray:
    """Encode a CNAV message (inverse of parse, simulation side)."""
    b = np.zeros(MSG_BITS, dtype=np.int64)
    b[:8] = PREAMBLE

    def put_u(lo, n, value, scale=1.0):
        iv = int(round(value / scale))
        assert 0 <= iv < (1 << n), (lo, n, value)
        for i in range(n):
            b[lo + i] = (iv >> (n - 1 - i)) & 1

    def put_s(lo, n, value, scale=1.0):
        iv = int(round(value / scale))
        assert -(1 << (n - 1)) <= iv < (1 << (n - 1))
        if iv < 0:
            iv += 1 << n
        for i in range(n):
            b[lo + i] = (iv >> (n - 1 - i)) & 1

    put_u(8, 6, fields["prn"])
    put_u(14, 6, fields["msg_type"])
    put_u(20, 17, fields["tow_s"], 6.0)
    b[37] = fields.get("alert", 0)
    t = fields["msg_type"]
    p = 38
    if t == 10:
        put_u(p, 13, fields["week_number"])
        put_u(p + 21, 11, fields["toe_s"], 300.0)
        put_s(p + 32, 26, fields["delta_a_m"], 2.0**-9)
        put_s(p + 58, 25, fields.get("a_dot", 0.0), 2.0**-21)
        put_s(p + 83, 17, fields["delta_n_rad_s"] / PI, 2.0**-44)
        put_s(p + 100, 23, fields.get("delta_n_dot", 0.0) / PI, 2.0**-57)
        put_s(p + 123, 33, fields["m0_rad"] / PI, 2.0**-32)
        put_u(p + 156, 33, fields["ecc"], 2.0**-34)
        put_s(p + 189, 33, fields["omega_rad"] / PI, 2.0**-32)
    elif t == 11:
        put_u(p, 11, fields["toe_s"], 300.0)
        put_s(p + 11, 33, fields["omega0_rad"] / PI, 2.0**-32)
        put_s(p + 44, 33, fields["i0_rad"] / PI, 2.0**-32)
        put_s(p + 77, 17, fields.get("delta_omega_dot_rad_s", 0.0) / PI,
              2.0**-44)
        put_s(p + 94, 15, fields["idot_rad_s"] / PI, 2.0**-44)
        put_s(p + 109, 16, fields["cis_rad"], 2.0**-30)
        put_s(p + 125, 16, fields["cic_rad"], 2.0**-30)
        put_s(p + 141, 24, fields["crs_m"], 2.0**-8)
        put_s(p + 165, 24, fields["crc_m"], 2.0**-8)
        put_s(p + 189, 21, fields["cus_rad"], 2.0**-30)
        put_s(p + 210, 21, fields["cuc_rad"], 2.0**-30)
    elif t == 30:
        put_u(p + 11, 11, fields["toc_s"], 300.0)
        put_s(p + 22, 26, fields["af0"], 2.0**-35)
        put_s(p + 48, 20, fields["af1"], 2.0**-48)
        put_s(p + 68, 10, fields.get("af2", 0.0), 2.0**-60)
        put_s(p + 78, 13, fields.get("tgd_s", 0.0), 2.0**-35)
    crc = crc24q(b[:276])
    for i in range(24):
        b[276 + i] = (crc >> (23 - i)) & 1
    return b


def cnav_ephemeris_fields(msgs: dict[int, dict]) -> dict:
    """Merge parsed messages {type: fields} into Kepler-container fields."""
    out: dict = {}
    m10 = msgs.get(10)
    m11 = msgs.get(11)
    m30 = msgs.get(30)
    if m10:
        a = A_REF_M + m10["delta_a_m"]
        out.update(week_number=m10["week_number"], toe_s=m10["toe_s"],
                   sqrt_a=float(np.sqrt(a)),
                   delta_n_rad_s=m10["delta_n_rad_s"],
                   m0_rad=m10["m0_rad"], ecc=m10["ecc"],
                   omega_rad=m10["omega_rad"])
    if m11:
        out.update(omega0_rad=m11["omega0_rad"], i0_rad=m11["i0_rad"],
                   omega_dot_rad_s=OMEGA_DOT_REF * PI
                   + m11["delta_omega_dot_rad_s"],
                   idot_rad_s=m11["idot_rad_s"],
                   cis_rad=m11["cis_rad"], cic_rad=m11["cic_rad"],
                   crs_m=m11["crs_m"], crc_m=m11["crc_m"],
                   cus_rad=m11["cus_rad"], cuc_rad=m11["cuc_rad"])
    if m30:
        out.update(toc_s=m30["toc_s"], af0=m30["af0"], af1=m30["af1"],
                   af2=m30["af2"], tgd_s=m30["tgd_s"])
    return out


@dataclasses.dataclass
class CnavMessageUpdate:
    msg_type: int
    fields: dict
    sample_stamp: int


class GpsCnavDecoder:
    """Streaming CNAV decoder: symbols in (rate-1/2 coded, one per symbol
    period), messages out. The convolutional code runs continuously, so
    decoding uses overlapping Viterbi chunks with a settled-prefix margin
    (libswiftcnav viterbi27 role), then message sync in the bit domain."""

    CHUNK_BITS = 2 * MSG_BITS     # decode window
    MARGIN = 32                   # traceback settling margin

    def __init__(self, symbol_ms: float = 20.0, crc_stats=None):
        #: optional TlmCrcStats; the bit-domain message search has no fixed
        #: frame grid, so only validated messages (and CRC failures at the
        #: boundary expected after a found message) are counted
        self.crc_stats = crc_stats
        self.viterbi = ViterbiDecoder(kk=7, nn=2, g=(0o171, 0o133))
        self.symbols: list[float] = []
        self.stamps: list[int] = []
        self.bits: list[int] = []
        self.bit_stamps: list[int] = []
        self._bits_base = 0           # global bit index of bits[0]
        self._n_fed = 0               # total symbols fed
        self._consumed_symbols = 0
        self.messages: list[CnavMessageUpdate] = []
        self.msgs_by_type: dict[int, dict] = {}
        self.tow_at_last_symbol_ms: float | None = None
        self._symbol_ms = float(symbol_ms)  # 20 ms (L2C 50 sps)
        self._polarity = 1.0

    def feed(self, symbol: float, sample_stamp: int) -> CnavMessageUpdate | None:
        self.symbols.append(float(symbol))
        self.stamps.append(int(sample_stamp))
        self._n_fed += 1
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += self._symbol_ms
        update = None
        need = 2 * (self.CHUNK_BITS + 2 * self.MARGIN)
        if len(self.symbols) - self._consumed_symbols >= need:
            update = self._decode_chunk()
        return update

    def _decode_chunk(self) -> CnavMessageUpdate | None:
        # decode with MARGIN bits of lead-in (the chunk-start Viterbi state
        # is unknown for a continuous code) and MARGIN of tail settling
        lo = self._consumed_symbols
        lead_bits = min(self.MARGIN, lo // 2)
        start = lo - 2 * lead_bits
        need = 2 * (lead_bits + self.CHUNK_BITS + self.MARGIN)
        sym = np.asarray(self.symbols[start: start + need]) * self._polarity
        decoded = self.viterbi.decode(sym, terminated=False)
        good = decoded[lead_bits: lead_bits + self.CHUNK_BITS]
        stamps = self.stamps[lo + 1: lo + 2 * self.CHUNK_BITS + 1: 2]
        self.bits.extend(int(x) for x in good)
        self.bit_stamps.extend(stamps)
        self._consumed_symbols += 2 * self.CHUNK_BITS
        return self._search_messages()

    def _search_messages(self) -> CnavMessageUpdate | None:
        bits = np.asarray(self.bits, dtype=np.int64)
        update = None
        i = 0
        while i + MSG_BITS <= len(bits):
            for inv in (0, 1):
                cand = bits[i:i + MSG_BITS] ^ inv
                ok, _ = check_message(cand)
                if ok and self.crc_stats is not None:
                    self.crc_stats.update(True)
                if ok:
                    fields = parse_message(cand)
                    stamp = self.bit_stamps[i + MSG_BITS - 1]
                    update = CnavMessageUpdate(fields["msg_type"], fields,
                                               stamp)
                    self.messages.append(update)
                    self.msgs_by_type[fields["msg_type"]] = fields
                    if inv:
                        self._polarity = -self._polarity
                    # the TOW field is the GPS time at the start of the
                    # NEXT message == the end of this message's last
                    # symbol; account for decode lag in fed symbols
                    gbit_end = self._bits_base + i + MSG_BITS - 1
                    last_sym = 2 * gbit_end + 1
                    lag = (self._n_fed - 1) - last_sym
                    self.tow_at_last_symbol_ms = (
                        fields["tow_s"] * 1000.0 + lag * self._symbol_ms)
                    i += MSG_BITS
                    break
            else:
                i += 1
        del self.bits[:i]
        del self.bit_stamps[:i]
        self._bits_base += i
        return update

    @property
    def ephemeris_fields(self) -> dict:
        return cnav_ephemeris_fields(self.msgs_by_type)

    def has_full_ephemeris(self) -> bool:
        return {10, 11, 30} <= set(self.msgs_by_type)
