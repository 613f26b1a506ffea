"""BeiDou B1I D1 NAV navigation-message codec.

Counterpart of the reference's DNAV chain
(/root/reference/src/algorithms/telemetry_decoder/gnuradio_blocks/
beidou_b1i_telemetry_decoder_gs.cc and
src/core/system_parameters/beidou_dnav_navigation_message.cc):

- BCH(15,11) with generator x^4+x+1, single-error correction via the
  syndrome->position map (decode_bch15_11_01, :162-195);
- 30-bit words: word 1 raw, words 2-10 carry two interleaved BCH
  codewords (even/odd symbols, :198-239);
- 300-bit subframes, preamble 11100010010, fields per the BDS-SIS-ICD
  position tables (_beidou_d1_data), subframes 1-3 -> Kepler ephemeris
  (same evaluator as GPS with the BDT/CGCS2000 frame treated as aligned).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from gnss_sdr_tpu.telemetry._beidou_d1_data import FIELDS

PREAMBLE = np.array([1, 1, 1, 0, 0, 0, 1, 0, 0, 1, 0], dtype=np.int64)
SUBFRAME_BITS = 300
PI = np.pi

# field scales (Beidou_DNAV.h D1_*_LSB constants / BDS ICD)
_SCALES = {
    "SOW": 1.0, "WN": 1.0, "TOC": 8.0, "TGD1": 1e-10,
    "A0": 2.0**-33, "A1": 2.0**-50, "A2": 2.0**-66,
    "DELTA_N": 2.0**-43 * PI, "CUC": 2.0**-31, "CUS": 2.0**-31,
    "M0": 2.0**-31 * PI, "E": 2.0**-33, "SQRT_A": 2.0**-19,
    "CRC": 2.0**-6, "CRS": 2.0**-6, "CIC": 2.0**-31, "CIS": 2.0**-31,
    "I0": 2.0**-31 * PI, "OMEGA_0": 2.0**-31 * PI, "OMEGA": 2.0**-31 * PI,
    "OMEGA_DOT": 2.0**-43 * PI, "IDOT": 2.0**-43 * PI,
    # almanac page scales (Beidou_DNAV.h:65-74)
    "SQRT_A_ALM": 2.0**-11, "A1_ALM": 2.0**-38, "A0_ALM": 2.0**-20,
    "OMEGA0_ALM": 2.0**-23 * PI, "E_ALM": 2.0**-21,
    "DELTA_I_ALM": 2.0**-19 * PI, "TOA_ALM": 2.0**12,
    "OMEGA_DOT_ALM": 2.0**-38 * PI, "OMEGA_ALM": 2.0**-23 * PI,
    "M0_ALM": 2.0**-23 * PI,
}
_SIGNED = {"TGD1", "A0", "A1", "A2", "DELTA_N", "CUC", "CUS", "M0",
           "CRC", "CRS", "CIC", "CIS", "I0", "OMEGA_0", "OMEGA",
           "OMEGA_DOT", "IDOT",
           "A1_ALM", "A0_ALM", "OMEGA0_ALM", "DELTA_I_ALM",
           "OMEGA_DOT_ALM", "OMEGA_ALM", "M0_ALM"}


# -- BCH(15,11) ------------------------------------------------------------


def _bch15_syndrome(bits15: np.ndarray) -> int:
    """4-bit syndrome of a 15-bit word under g(x) = x^4 + x + 1."""
    reg = 0
    for b in bits15:
        top = (reg >> 3) & 1
        reg = ((reg << 1) & 0xF) | int(b)
        if top:
            reg ^= 0b0011
    # final: syndrome = remainder
    return reg


@functools.lru_cache(maxsize=1)
def _syndrome_to_pos() -> dict[int, int]:
    """Map single-bit-error syndromes to bit positions (built by trial)."""
    table = {}
    for pos in range(15):
        w = np.zeros(15, dtype=np.int64)
        w[pos] = 1
        table[_bch15_syndrome(w)] = pos
    return table


def bch15_encode(data11: np.ndarray) -> np.ndarray:
    """11 data bits -> 15-bit systematic codeword (4 parity appended)."""
    data11 = np.asarray(data11, dtype=np.int64)
    word = np.concatenate([data11, np.zeros(4, dtype=np.int64)])
    syn = _bch15_syndrome(word)
    for i in range(4):
        word[11 + i] = (syn >> (3 - i)) & 1
    assert _bch15_syndrome(word) == 0
    return word


def bch15_decode(bits15: np.ndarray) -> tuple[np.ndarray, bool]:
    """Correct up to one bit error; returns (corrected word, ok)."""
    w = np.asarray(bits15, dtype=np.int64).copy()
    syn = _bch15_syndrome(w)
    if syn == 0:
        return w, True
    pos = _syndrome_to_pos().get(syn)
    if pos is None:
        return w, False
    w[pos] ^= 1
    return w, True


# -- word layer ------------------------------------------------------------


def encode_word(data_bits: np.ndarray, first_word: bool) -> np.ndarray:
    """30 transmitted bits from word data (30 raw for word 1; 22 data ->
    two interleaved BCH codewords for words 2-10)."""
    d = np.asarray(data_bits, dtype=np.int64)
    if first_word:
        assert d.shape[0] == 30
        return d.copy()
    assert d.shape[0] == 22
    b1 = bch15_encode(d[:11])
    b2 = bch15_encode(d[11:])
    out = np.empty(30, dtype=np.int64)
    out[0::2] = b1
    out[1::2] = b2
    return out


def decode_word(symbols30: np.ndarray, first_word: bool):
    """Inverse of encode_word; returns (30 decoded bits in the reference's
    layout: 22 data then 8 parity, ok)."""
    s = np.asarray(symbols30, dtype=np.int64)
    if first_word:
        return s.copy(), True
    b1, ok1 = bch15_decode(s[0::2])
    b2, ok2 = bch15_decode(s[1::2])
    out = np.concatenate([b1[:11], b2[:11], b1[11:], b2[11:]])
    return out, (ok1 and ok2)


# -- subframe layer --------------------------------------------------------


def _read(bits300: np.ndarray, name: str) -> float:
    slices = FIELDS[name]
    raw = 0
    total = 0
    for first, length in slices:
        for j in range(length):
            raw = (raw << 1) | int(bits300[first - 1 + j])
        total += length
    if name in _SIGNED and (raw >> (total - 1)):
        raw -= 1 << total
    return raw * _SCALES.get(name, 1.0)


def _write(bits300: np.ndarray, name: str, value: float) -> None:
    slices = FIELDS[name]
    total = sum(length for _, length in slices)
    iv = int(round(value / _SCALES.get(name, 1.0)))
    if name in _SIGNED and iv < 0:
        iv += 1 << total
    assert 0 <= iv < (1 << total), (name, value)
    pos = total
    for first, length in slices:
        for j in range(length):
            pos -= 1
            bits300[first - 1 + j] = (iv >> pos) & 1


SF_FIELDS = {
    1: ("SOW", "WN", "TOC", "TGD1", "A0", "A1", "A2"),
    2: ("SOW", "DELTA_N", "CUC", "M0", "E", "CUS", "CRC", "CRS", "SQRT_A",
        "TOE_SF2"),
    3: ("SOW", "TOE_SF3", "I0", "CIC", "OMEGA_DOT", "CIS", "IDOT",
        "OMEGA_0", "OMEGA"),
    # subframes 4 and 5 share the almanac page layout; the page number
    # (PNUM 1-24) selects the almanac satellite (beidou_dnav_
    # navigation_message.cc d_SOW_SF4/SF5 + almanac branches)
    4: ("SOW", "PNUM", "SQRT_A_ALM", "A1_ALM", "A0_ALM", "OMEGA0_ALM",
        "E_ALM", "DELTA_I_ALM", "TOA_ALM", "OMEGA_DOT_ALM", "OMEGA_ALM",
        "M0_ALM"),
    5: ("SOW", "PNUM", "SQRT_A_ALM", "A1_ALM", "A0_ALM", "OMEGA0_ALM",
        "E_ALM", "DELTA_I_ALM", "TOA_ALM", "OMEGA_DOT_ALM", "OMEGA_ALM",
        "M0_ALM"),
}


def build_subframe(fra_id: int, fields: dict) -> np.ndarray:
    """300 data bits (pre-encoding) for subframe ``fra_id``."""
    b = np.zeros(SUBFRAME_BITS, dtype=np.int64)
    b[:11] = PREAMBLE
    _write(b, "FRAID", fra_id)
    for name in SF_FIELDS[fra_id]:
        if name in ("TOE_SF2", "TOE_SF3"):
            continue
        _write(b, name, fields.get(name.lower(), 0.0))
    if fra_id == 2:
        _write(b, "TOE_SF2", (int(fields.get("toe", 0.0) / 8.0) >> 15))
    if fra_id == 3:
        _write(b, "TOE_SF3", (int(fields.get("toe", 0.0) / 8.0) & 0x7FFF))
    return b


def parse_subframe(bits300: np.ndarray) -> dict | None:
    b = np.asarray(bits300, dtype=np.int64)
    if not np.array_equal(b[:11], PREAMBLE):
        return None
    out = {"fra_id": int(_read(b, "FRAID")), "sow": _read(b, "SOW")}
    fid = out["fra_id"]
    if fid not in SF_FIELDS:
        return out
    for name in SF_FIELDS[fid]:
        if name in ("SOW", "TOE_SF2", "TOE_SF3"):
            continue
        out[name.lower()] = _read(b, name)
    if fid == 2:
        out["toe_msb"] = int(_read(b, "TOE_SF2"))
    if fid == 3:
        out["toe_lsb"] = int(_read(b, "TOE_SF3"))
    return out


def subframe_to_symbols(bits300: np.ndarray) -> np.ndarray:
    """Transmitted 300 symbols: word 1 raw + words 2-10 BCH-interleaved.

    Word data layout matches decode_word's output convention
    (22 data + 8 parity rearranged), so encode is its exact inverse.
    """
    b = np.asarray(bits300, dtype=np.int64)
    out = [encode_word(b[:30], True)]
    for w in range(1, 10):
        out.append(encode_word(b[30 * w: 30 * w + 22], False))
    return np.concatenate(out)


def symbols_to_subframe(symbols300: np.ndarray):
    s = np.asarray(symbols300, dtype=np.int64)
    bits = np.zeros(SUBFRAME_BITS, dtype=np.int64)
    ok = True
    w0, _ = decode_word(s[:30], True)
    bits[:30] = w0
    for w in range(1, 10):
        dec, wok = decode_word(s[30 * w: 30 * (w + 1)], False)
        ok &= wok
        bits[30 * w: 30 * w + 22] = dec[:22]
    return bits, ok


def ephemeris_fields_from_subframes(subframes: dict[int, dict]) -> dict:
    """Merge parsed D1 subframes 1-3 into Kepler-container fields."""
    out: dict = {}
    s1 = subframes.get(1)
    s2 = subframes.get(2)
    s3 = subframes.get(3)
    if s1:
        out.update(week_number=int(s1.get("wn", 0)), toc_s=s1.get("toc", 0.0),
                   af0=s1.get("a0", 0.0), af1=s1.get("a1", 0.0),
                   af2=s1.get("a2", 0.0), tgd_s=s1.get("tgd1", 0.0))
    if s2:
        out.update(delta_n_rad_s=s2.get("delta_n", 0.0),
                   cuc_rad=s2.get("cuc", 0.0), cus_rad=s2.get("cus", 0.0),
                   m0_rad=s2.get("m0", 0.0), ecc=s2.get("e", 0.0),
                   crc_m=s2.get("crc", 0.0), crs_m=s2.get("crs", 0.0),
                   sqrt_a=s2.get("sqrt_a", 0.0))
    if s3:
        out.update(i0_rad=s3.get("i0", 0.0), cic_rad=s3.get("cic", 0.0),
                   cis_rad=s3.get("cis", 0.0),
                   omega0_rad=s3.get("omega_0", 0.0),
                   omega_rad=s3.get("omega", 0.0),
                   omega_dot_rad_s=s3.get("omega_dot", 0.0),
                   idot_rad_s=s3.get("idot", 0.0))
    if s2 and s3:
        out["toe_s"] = float(((s2["toe_msb"] << 15) | s3["toe_lsb"]) * 8.0)
    return out


@dataclasses.dataclass
class D1SubframeUpdate:
    fra_id: int
    fields: dict
    sample_stamp: int


class BeidouD1Decoder:
    """Streaming D1 decoder over 20 ms data symbols (post NH wipe-off)."""

    def __init__(self, crc_stats=None):
        self.crc_stats = crc_stats   # optional TlmCrcStats (BCH outcomes)
        self.history: list[float] = []
        self.stamps: list[int] = []
        self.synced = False
        self.inverted = False
        self.frame_start = 0
        self.subframes: dict[int, dict] = {}
        self.updates: list[D1SubframeUpdate] = []
        self.almanacs: dict[int, dict] = {}  # SV -> SF4/5 almanac page
        self.tow_at_last_symbol_ms: float | None = None

    def feed(self, symbol: float, sample_stamp: int) -> D1SubframeUpdate | None:
        self.history.append(float(symbol))
        self.stamps.append(int(sample_stamp))
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += 20.0
        if not self.synced:
            self._search_preamble()
            return None
        return self._try_decode()

    def _search_preamble(self) -> None:
        n = len(PREAMBLE)
        if len(self.history) < n:
            return
        ref = np.where(PREAMBLE == 1, 1.0, -1.0)
        corr = float(np.sum(np.sign(self.history[-n:]) * ref))
        if abs(corr) == n:
            self.synced = True
            self.inverted = corr < 0
            start = len(self.history) - n
            del self.history[:start]
            del self.stamps[:start]
            self.frame_start = 0

    def _try_decode(self) -> D1SubframeUpdate | None:
        if len(self.history) - self.frame_start < SUBFRAME_BITS:
            return None
        lo = self.frame_start
        sym = np.asarray(self.history[lo: lo + SUBFRAME_BITS])
        if self.inverted:
            sym = -sym
        stamp = self.stamps[lo + SUBFRAME_BITS - 1]
        self.frame_start += SUBFRAME_BITS
        hard = (sym > 0).astype(np.int64)
        bits, ok = symbols_to_subframe(hard)
        if self.crc_stats is not None:
            self.crc_stats.update(bool(ok))
        fields = parse_subframe(bits) if ok else None
        if fields is None or fields["fra_id"] not in (1, 2, 3, 4, 5):
            self.synced = False
            keep = len(PREAMBLE)
            self.history = self.history[-keep:]
            self.stamps = self.stamps[-keep:]
            self.frame_start = 0
            return None
        if self.frame_start > SUBFRAME_BITS:
            drop = self.frame_start - 1
            del self.history[:drop]
            del self.stamps[:drop]
            self.frame_start -= drop
        update = D1SubframeUpdate(fields["fra_id"], fields, stamp)
        self.updates.append(update)
        if fields["fra_id"] in (1, 2, 3):
            self.subframes[fields["fra_id"]] = fields
        elif fields["fra_id"] in (4, 5) and fields.get("pnum"):
            # almanac pages: SF4 pages 1-24 -> SVs 1-24, SF5 pages 1-6 ->
            # SVs 25-30 (beidou_dnav_navigation_message.cc SF4/SF5)
            pnum = int(fields["pnum"])
            sv = pnum if fields["fra_id"] == 4 else 24 + pnum
            if 1 <= sv <= 30:
                self.almanacs[sv] = fields
        # SOW stamps the start of the CURRENT subframe (BDS ICD); its last
        # symbol ends 6 s later
        self.tow_at_last_symbol_ms = fields["sow"] * 1000.0 + 6000.0
        return update

    @property
    def ephemeris_fields(self) -> dict:
        return ephemeris_fields_from_subframes(self.subframes)

    def has_full_ephemeris(self) -> bool:
        return {1, 2, 3} <= set(self.subframes)
