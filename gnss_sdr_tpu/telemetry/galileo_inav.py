"""Galileo E1-B I/NAV navigation-message decoding.

Counterpart of the reference's Galileo telemetry chain
(/root/reference/src/algorithms/telemetry_decoder/gnuradio_blocks/
galileo_telemetry_decoder_gs.cc and
src/core/system_parameters/galileo_inav_message.cc):

- 250 symbols/s page parts: 10-symbol sync pattern + 240 coded symbols;
- 8x30 block deinterleaver (out[c*8+r] = in[r*30+c], :340-349);
- rate-1/2 K=7 Viterbi with the G2 NOT gate (every second symbol negated,
  :359-366), polynomials (121, 91) decimal = (171, 133) octal;
- even/odd page-part pairing with CRC-24Q over the joined 196 bits
  (split_page semantics);
- word types 0-5 parsed into ephemeris/clock/GST fields (Galileo OS SIS
  ICD 4.3.5), feeding the same Kepler evaluator as GPS.

An encoder (for the simulator/tests) inverts every stage.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.telemetry.viterbi import ViterbiDecoder, encode_conv

SYNC_PATTERN = np.array([0, 1, 0, 1, 1, 0, 0, 0, 0, 0], dtype=np.int64)
PART_SYMBOLS = 250
CODED_SYMBOLS = 240
PART_BITS = 120  # after Viterbi (incl. 6 tail bits)
ROWS, COLS = 8, 30
CRC24_POLY = 0x1864CFB
PI = np.pi


def crc24q(bits: np.ndarray) -> int:
    """CRC-24Q over a bit array (MSB-first), as used by Galileo I/NAV
    (generator 0x1864CFB; the register keeps the low 24 bits)."""
    poly24 = CRC24_POLY & 0xFFFFFF  # drop the x^24 term
    reg = 0
    for b in np.concatenate([np.asarray(bits, dtype=np.int64),
                             np.zeros(24, dtype=np.int64)]):
        top = (reg >> 23) & 1
        reg = ((reg << 1) | int(b)) & 0xFFFFFF
        if top:
            reg ^= poly24
    return reg


def interleave(bits_or_syms: np.ndarray) -> np.ndarray:
    """Interleaver (encoder side): in[c*8+r] -> out[r*30+c]."""
    x = np.asarray(bits_or_syms)
    return x.reshape(COLS, ROWS).T.reshape(-1)


def deinterleave(symbols: np.ndarray) -> np.ndarray:
    """Deinterleaver: out[c*8+r] = in[r*30+c] (:340-349)."""
    x = np.asarray(symbols)
    return x.reshape(ROWS, COLS).T.reshape(-1)


def encode_page_part(bits120: np.ndarray) -> np.ndarray:
    """120 bits -> 250 +-1 symbols (conv encode, G2 NOT, interleave, sync).

    The 120 bits must already end with 6 zero tail bits.
    """
    coded = encode_conv(np.asarray(bits120, dtype=np.int64))  # 240 bits
    coded = coded.reshape(-1, 2)
    coded[:, 1] ^= 1  # G2 NOT gate
    coded = interleave(coded.reshape(-1))
    part = np.concatenate([SYNC_PATTERN, coded])
    return np.where(part == 1, -1.0, 1.0)  # bit 1 -> -1 symbol


def decode_page_part(symbols250: np.ndarray,
                     decoder: ViterbiDecoder) -> np.ndarray:
    """250 soft symbols (sync first) -> 120 decoded bits."""
    soft = np.asarray(symbols250, dtype=np.float64)[10:]
    soft = deinterleave(soft)
    # undo G2 NOT: negate every 2nd symbol (:359-366)
    soft = soft.copy()
    soft[1::2] = -soft[1::2]
    # our symbol convention: bit 1 -> -1, so feed soft directly (decoder
    # expects +1 == bit 0)
    return decoder.decode(soft, terminated=True)


# ---------------------------------------------------------------------------
# Page pairing + CRC (split_page semantics)
# ---------------------------------------------------------------------------


def check_page_pair(even120: np.ndarray, odd120: np.ndarray):
    """CRC-check an even/odd page-part pair.

    CRC-24Q covers even bits 0..111 (without the 6+2 tail/spare... per ICD:
    even part bits 0..113) concatenated with odd bits 0..81; the CRC field
    is odd bits 82..105. Returns (ok, data_bits[128]) where data = even
    data field (112 bits incl. type) + odd data continuation (16 bits).
    """
    even120 = np.asarray(even120, dtype=np.int64)
    odd120 = np.asarray(odd120, dtype=np.int64)
    if even120[0] != 0 or odd120[0] != 1:
        return False, None
    msg = np.concatenate([even120[:114], odd120[:82]])
    crc_bits = odd120[82:106]
    crc_val = 0
    for b in crc_bits:
        crc_val = (crc_val << 1) | int(b)
    ok = crc24q(msg) == crc_val
    data = np.concatenate([even120[2:114], odd120[2:18]])
    return ok, data


def build_page_pair(data128: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of check_page_pair: 128 data bits -> (even120, odd120)."""
    data128 = np.asarray(data128, dtype=np.int64)
    even = np.zeros(120, dtype=np.int64)
    odd = np.zeros(120, dtype=np.int64)
    even[0] = 0  # even/odd flag
    even[1] = 0  # page type: nominal
    even[2:114] = data128[:112]
    odd[0] = 1
    odd[1] = 0
    odd[2:18] = data128[112:]
    msg = np.concatenate([even[:114], odd[:82]])
    crc = crc24q(msg)
    for i in range(24):
        odd[82 + i] = (crc >> (23 - i)) & 1
    # tails (last 6 bits of each part) stay zero
    return even, odd


# ---------------------------------------------------------------------------
# Word parsing (ICD 4.3.5) — types 0-5
# ---------------------------------------------------------------------------


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


def parse_inav_word(data128: np.ndarray) -> dict:
    """Parse one I/NAV word (128 data bits, type in bits 0..5)."""
    d = np.asarray(data128, dtype=np.int64)
    wtype = _u(d[0:6])
    out: dict = {"word_type": wtype}
    if wtype == 1:
        out["iod_nav"] = _u(d[6:16])
        out["toe_s"] = _u(d[16:30]) * 60.0
        out["m0_rad"] = _s(d[30:62]) * 2.0**-31 * PI
        out["ecc"] = _u(d[62:94]) * 2.0**-33
        out["sqrt_a"] = _u(d[94:126]) * 2.0**-19
    elif wtype == 2:
        out["iod_nav"] = _u(d[6:16])
        out["omega0_rad"] = _s(d[16:48]) * 2.0**-31 * PI
        out["i0_rad"] = _s(d[48:80]) * 2.0**-31 * PI
        out["omega_rad"] = _s(d[80:112]) * 2.0**-31 * PI
        out["idot_rad_s"] = _s(d[112:126]) * 2.0**-43 * PI
    elif wtype == 3:
        out["iod_nav"] = _u(d[6:16])
        out["omega_dot_rad_s"] = _s(d[16:40]) * 2.0**-43 * PI
        out["delta_n_rad_s"] = _s(d[40:56]) * 2.0**-43 * PI
        out["cuc_rad"] = _s(d[56:72]) * 2.0**-29
        out["cus_rad"] = _s(d[72:88]) * 2.0**-29
        out["crc_m"] = _s(d[88:104]) * 2.0**-5
        out["crs_m"] = _s(d[104:120]) * 2.0**-5
        out["sisa"] = _u(d[120:128])
    elif wtype == 4:
        out["iod_nav"] = _u(d[6:16])
        out["svid"] = _u(d[16:22])
        out["cic_rad"] = _s(d[22:38]) * 2.0**-29
        out["cis_rad"] = _s(d[38:54]) * 2.0**-29
        out["toc_s"] = _u(d[54:68]) * 60.0
        out["af0"] = _s(d[68:99]) * 2.0**-34
        out["af1"] = _s(d[99:120]) * 2.0**-46
        out["af2"] = _s(d[120:126]) * 2.0**-59
    elif wtype == 5:
        # iono, BGD, health + GST
        out["ai0"] = _u(d[6:17]) * 2.0**-2
        out["ai1"] = _s(d[17:28]) * 2.0**-8
        out["ai2"] = _s(d[28:42]) * 2.0**-15
        out["bgd_e1e5a_s"] = _s(d[47:57]) * 2.0**-32
        out["bgd_e1e5b_s"] = _s(d[57:67]) * 2.0**-32
        out["week_number"] = _u(d[73:85])
        out["tow_s"] = _u(d[85:105])
    elif wtype == 0:
        out["time_flags"] = _u(d[6:8])
        out["week_number"] = _u(d[96:108])
        out["tow_s"] = _u(d[108:128])
    return out


def build_inav_word(fields: dict) -> np.ndarray:
    """Encode one I/NAV word (inverse of parse, for simulation)."""
    d = np.zeros(128, dtype=np.int64)

    def put_u(lo, hi, value, scale=1.0):
        n = hi - lo
        iv = int(round(value / scale))
        assert 0 <= iv < (1 << n), (lo, hi, value)
        for i in range(n):
            d[lo + i] = (iv >> (n - 1 - i)) & 1

    def put_s(lo, hi, value, scale=1.0):
        n = hi - lo
        iv = int(round(value / scale))
        assert -(1 << (n - 1)) <= iv < (1 << (n - 1))
        if iv < 0:
            iv += 1 << n
        for i in range(n):
            d[lo + i] = (iv >> (n - 1 - i)) & 1

    wtype = fields["word_type"]
    put_u(0, 6, wtype)
    if wtype == 1:
        put_u(6, 16, fields["iod_nav"])
        put_u(16, 30, fields["toe_s"], 60.0)
        put_s(30, 62, fields["m0_rad"] / PI, 2.0**-31)
        put_u(62, 94, fields["ecc"], 2.0**-33)
        put_u(94, 126, fields["sqrt_a"], 2.0**-19)
    elif wtype == 2:
        put_u(6, 16, fields["iod_nav"])
        put_s(16, 48, fields["omega0_rad"] / PI, 2.0**-31)
        put_s(48, 80, fields["i0_rad"] / PI, 2.0**-31)
        put_s(80, 112, fields["omega_rad"] / PI, 2.0**-31)
        put_s(112, 126, fields["idot_rad_s"] / PI, 2.0**-43)
    elif wtype == 3:
        put_u(6, 16, fields["iod_nav"])
        put_s(16, 40, fields["omega_dot_rad_s"] / PI, 2.0**-43)
        put_s(40, 56, fields["delta_n_rad_s"] / PI, 2.0**-43)
        put_s(56, 72, fields["cuc_rad"], 2.0**-29)
        put_s(72, 88, fields["cus_rad"], 2.0**-29)
        put_s(88, 104, fields["crc_m"], 2.0**-5)
        put_s(104, 120, fields["crs_m"], 2.0**-5)
        put_u(120, 128, fields.get("sisa", 107))
    elif wtype == 4:
        put_u(6, 16, fields["iod_nav"])
        put_u(16, 22, fields.get("svid", 1))
        put_s(22, 38, fields["cic_rad"], 2.0**-29)
        put_s(38, 54, fields["cis_rad"], 2.0**-29)
        put_u(54, 68, fields["toc_s"], 60.0)
        put_s(68, 99, fields["af0"], 2.0**-34)
        put_s(99, 120, fields["af1"], 2.0**-46)
        put_s(120, 126, fields["af2"], 2.0**-59)
    elif wtype == 5:
        put_u(6, 17, fields.get("ai0", 0.0), 2.0**-2)
        put_s(17, 28, fields.get("ai1", 0.0), 2.0**-8)
        put_s(28, 42, fields.get("ai2", 0.0), 2.0**-15)
        put_s(47, 57, fields.get("bgd_e1e5a_s", 0.0), 2.0**-32)
        put_s(57, 67, fields.get("bgd_e1e5b_s", 0.0), 2.0**-32)
        put_u(73, 85, fields["week_number"])
        put_u(85, 105, fields["tow_s"])
    elif wtype == 0:
        put_u(6, 8, fields.get("time_flags", 2))
        put_u(96, 108, fields["week_number"])
        put_u(108, 128, fields["tow_s"])
    return d


# ---------------------------------------------------------------------------
# Streaming decoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class InavWordUpdate:
    word_type: int
    fields: dict
    sample_stamp: int


class GalileoInavDecoder:
    """Per-channel streaming I/NAV decoder (E1-B, one symbol per 4 ms)."""

    def __init__(self):
        self.viterbi = ViterbiDecoder(kk=7, nn=2, g=(121, 91))
        self.history: list[float] = []
        self.stamps: list[int] = []
        self.synced = False
        self.inverted = False
        self.part_start = 0  # index into history of current part
        self.even_bits: np.ndarray | None = None
        self.words: list[InavWordUpdate] = []
        self.ephemeris_fields: dict = {}
        self.iod_nav: int | None = None
        self.tow_at_last_symbol_ms: float | None = None

    def feed(self, symbol: float, sample_stamp: int) -> InavWordUpdate | None:
        self.history.append(float(symbol))
        self.stamps.append(int(sample_stamp))
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += 4.0  # one E1 code period = 4 ms
        if not self.synced:
            self._search_sync()
            return None
        return self._try_decode_part()

    def _search_sync(self) -> None:
        n = len(SYNC_PATTERN)
        if len(self.history) < n:
            return
        window = np.sign(self.history[-n:])
        ref = np.where(SYNC_PATTERN == 1, -1.0, 1.0)
        corr = float(np.sum(window * ref))
        if abs(corr) == n:
            self.synced = True
            self.inverted = corr < 0
            self.part_start = len(self.history) - n
            del self.history[: self.part_start]
            del self.stamps[: self.part_start]
            self.part_start = 0

    def _try_decode_part(self) -> InavWordUpdate | None:
        if len(self.history) - self.part_start < PART_SYMBOLS:
            return None
        sym = np.asarray(
            self.history[self.part_start: self.part_start + PART_SYMBOLS])
        if self.inverted:
            sym = -sym
        stamp = self.stamps[self.part_start + PART_SYMBOLS - 1]
        self.part_start += PART_SYMBOLS
        # verify the sync pattern still matches (resync on failure)
        ref = np.where(SYNC_PATTERN == 1, -1.0, 1.0)
        if float(np.sum(np.sign(sym[:10]) * ref)) != 10.0:
            self.synced = False
            self.even_bits = None
            keep = len(SYNC_PATTERN)
            self.history = self.history[-keep:]
            self.stamps = self.stamps[-keep:]
            self.part_start = 0
            return None
        bits = decode_page_part(sym, self.viterbi)
        update = None
        if bits[0] == 0:
            self.even_bits = bits
        elif self.even_bits is not None:
            ok, data = check_page_pair(self.even_bits, bits)
            self.even_bits = None
            if ok:
                fields = parse_inav_word(data)
                update = InavWordUpdate(fields["word_type"], fields, stamp)
                self.words.append(update)
                self._integrate(fields, stamp)
        # trim history
        if self.part_start > PART_SYMBOLS:
            drop = self.part_start - 1
            del self.history[:drop]
            del self.stamps[:drop]
            self.part_start -= drop
        return update

    def _integrate(self, fields: dict, stamp: int) -> None:
        wtype = fields["word_type"]
        if wtype in (1, 2, 3, 4):
            iod = fields.get("iod_nav")
            if self.iod_nav is not None and iod != self.iod_nav:
                self.ephemeris_fields = {}
            self.iod_nav = iod
            self.ephemeris_fields.update(fields)
        if wtype in (0, 5) and "tow_s" in fields:
            # TOW refers to the start of the page's even part; the odd
            # part's last symbol lands 2 s minus... the ICD stamps GST at
            # the start of the NEXT even page part: TOW at the end of this
            # odd part.
            self.tow_at_last_symbol_ms = fields["tow_s"] * 1000.0
            self.ephemeris_fields.setdefault(
                "week_number", fields.get("week_number", 0))

    def has_full_ephemeris(self) -> bool:
        f = self.ephemeris_fields
        return all(k in f for k in
                   ("sqrt_a", "ecc", "m0_rad", "omega0_rad", "i0_rad",
                    "omega_rad", "af0", "toe_s"))


def galileo_ephemeris_from_inav(prn: int, fields: dict):
    """Map accumulated I/NAV word fields onto the shared Kepler ephemeris
    container (Galileo_Ephemeris counterpart; GST == simulation time base;
    the E1/E5b broadcast group delay BGD plays the TGD role for E1
    single-frequency users)."""
    from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris

    return GpsEphemeris(
        prn=prn,
        week_number=fields.get("week_number", 0),
        iodc=fields.get("iod_nav", 0), iode=fields.get("iod_nav", 0),
        toc_s=fields.get("toc_s", 0.0), af0=fields.get("af0", 0.0),
        af1=fields.get("af1", 0.0), af2=fields.get("af2", 0.0),
        tgd_s=fields.get("bgd_e1e5b_s", 0.0),
        toe_s=fields.get("toe_s", 0.0), sqrt_a=fields.get("sqrt_a", 0.0),
        ecc=fields.get("ecc", 0.0), m0_rad=fields.get("m0_rad", 0.0),
        delta_n_rad_s=fields.get("delta_n_rad_s", 0.0),
        omega0_rad=fields.get("omega0_rad", 0.0),
        i0_rad=fields.get("i0_rad", 0.0),
        omega_rad=fields.get("omega_rad", 0.0),
        omega_dot_rad_s=fields.get("omega_dot_rad_s", 0.0),
        idot_rad_s=fields.get("idot_rad_s", 0.0),
        cuc_rad=fields.get("cuc_rad", 0.0), cus_rad=fields.get("cus_rad", 0.0),
        crc_m=fields.get("crc_m", 0.0), crs_m=fields.get("crs_m", 0.0),
        cic_rad=fields.get("cic_rad", 0.0), cis_rad=fields.get("cis_rad", 0.0),
    )
