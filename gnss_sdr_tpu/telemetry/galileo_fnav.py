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


# ---------------------------------------------------------------------------
# Field-level page content (OS SIS ICD 4.2.2; reference parser
# galileo_fnav_message.cc split_page/decode_page_type_*)
# ---------------------------------------------------------------------------

PI = np.pi

#: page type -> ordered (name, bits, scale, signed); scale None = raw uint.
#: Semicircle fields carry scale * PI so stored values are radians.
_FNAV_LAYOUTS = {
    1: [("svid", 6, None, False), ("iod_nav", 10, None, False),
        ("toc_s", 14, 60.0, False), ("af0", 31, 2.0**-34, True),
        ("af1", 21, 2.0**-46, True), ("af2", 6, 2.0**-59, True),
        ("sisa", 8, None, False),
        ("ai0", 11, 2.0**-2, False), ("ai1", 11, 2.0**-8, True),
        ("ai2", 14, 2.0**-15, True), ("region_flags", 5, None, False),
        ("bgd_e1e5a_s", 10, 2.0**-32, True), ("e5a_hs", 2, None, False),
        ("week_number", 12, None, False), ("tow_s", 20, 1.0, False),
        ("e5a_dvs", 1, None, False), ("_spare", 26, None, False)],
    2: [("iod_nav", 10, None, False), ("m0_rad", 32, 2.0**-31 * PI, True),
        ("omega_dot_rad_s", 24, 2.0**-43 * PI, True),
        ("ecc", 32, 2.0**-33, False), ("sqrt_a", 32, 2.0**-19, False),
        ("omega0_rad", 32, 2.0**-31 * PI, True),
        ("idot_rad_s", 14, 2.0**-43 * PI, True),
        ("week_number", 12, None, False), ("tow_s", 20, 1.0, False)],
    3: [("iod_nav", 10, None, False), ("i0_rad", 32, 2.0**-31 * PI, True),
        ("omega_rad", 32, 2.0**-31 * PI, True),
        ("delta_n_rad_s", 16, 2.0**-43 * PI, True),
        ("cuc_rad", 16, 2.0**-29, True), ("cus_rad", 16, 2.0**-29, True),
        ("crc_m", 16, 2.0**-5, True), ("crs_m", 16, 2.0**-5, True),
        ("toe_s", 14, 60.0, False), ("week_number", 12, None, False),
        ("tow_s", 20, 1.0, False), ("_spare", 8, None, False)],
    4: [("iod_nav", 10, None, False), ("cic_rad", 16, 2.0**-29, True),
        ("cis_rad", 16, 2.0**-29, True), ("a0_s", 32, 2.0**-30, True),
        ("a1_s_s", 24, 2.0**-50, True), ("delta_t_ls", 8, None, False),
        ("t0t", 8, None, False), ("wn0t", 8, None, False),
        ("wn_lsf", 8, None, False), ("dn", 3, None, False),
        ("delta_t_lsf", 8, None, False), ("t0g", 8, None, False),
        ("wn0g", 6, None, False), ("a0g_s", 16, 2.0**-35, True),
        ("a1g_s_s", 12, 2.0**-51, True), ("tow_s", 20, 1.0, False),
        ("_spare", 5, None, False)],
}


def build_fnav_fields(page_type: int, fields: dict) -> np.ndarray:
    """Encode field dict -> 208-bit page body (simulation side)."""
    layout = _FNAV_LAYOUTS[page_type]
    b = np.zeros(208, dtype=np.int64)
    pos = 0
    for name, nbits, scale, signed in layout:
        v = fields.get(name, 0)
        iv = int(round(v / scale)) if scale is not None else int(v)
        if signed and iv < 0:
            iv += 1 << nbits
        assert 0 <= iv < (1 << nbits), (name, v)
        for i in range(nbits):
            b[pos + i] = (iv >> (nbits - 1 - i)) & 1
        pos += nbits
    assert pos == 208, pos
    return b


def parse_fnav_fields(page_type: int, data208: np.ndarray) -> dict | None:
    """Decode a 208-bit page body into scaled fields (pages 1-4)."""
    layout = _FNAV_LAYOUTS.get(page_type)
    if layout is None:
        return None
    b = np.asarray(data208, dtype=np.int64)
    out: dict = {"page_type": page_type}
    pos = 0
    for name, nbits, scale, signed in layout:
        iv = 0
        for bit in b[pos:pos + nbits]:
            iv = (iv << 1) | int(bit)
        if signed and b[pos] == 1:
            iv -= 1 << nbits
        pos += nbits
        if name == "_spare":
            continue
        out[name] = iv * scale if scale is not None else iv
    return out


def fnav_ephemeris_fields(pages: dict[int, dict]) -> dict:
    """Merge parsed pages {type: fields} into the shared Kepler container
    (galileo_fnav_message.cc have_new_ephemeris role). BGD(E1,E5a) fills
    the tgd_s slot for the E5a observable."""
    out: dict = {}
    p1, p2, p3, p4 = (pages.get(t) for t in (1, 2, 3, 4))
    if p1:
        out.update(toc_s=p1["toc_s"], af0=p1["af0"], af1=p1["af1"],
                   af2=p1["af2"], tgd_s=p1["bgd_e1e5a_s"],
                   week_number=p1["week_number"])
    if p2:
        out.update(m0_rad=p2["m0_rad"],
                   omega_dot_rad_s=p2["omega_dot_rad_s"], ecc=p2["ecc"],
                   sqrt_a=p2["sqrt_a"], omega0_rad=p2["omega0_rad"],
                   idot_rad_s=p2["idot_rad_s"])
    if p3:
        out.update(i0_rad=p3["i0_rad"], omega_rad=p3["omega_rad"],
                   delta_n_rad_s=p3["delta_n_rad_s"],
                   cuc_rad=p3["cuc_rad"], cus_rad=p3["cus_rad"],
                   crc_m=p3["crc_m"], crs_m=p3["crs_m"], toe_s=p3["toe_s"])
    if p4:
        out.update(cic_rad=p4["cic_rad"], cis_rad=p4["cis_rad"])
    return out


@dataclasses.dataclass
class FnavPage:
    page_type: int
    data: np.ndarray
    sample_stamp: int


class GalileoFnavDecoder:
    """Streaming F/NAV decoder (one soft symbol per E5a-I data symbol,
    20 ms / 50 sps; 500-symbol 10 s pages).

    TOW convention: the page's TOW field stamps GST at the page START, so
    a decoded page anchors ``tow_at_last_symbol_ms = (TOW + 10) * 1e3``
    at its final symbol; between decodes TOW advances one symbol period
    per feed (galileo_telemetry_decoder_gs.cc F/NAV TOW propagation
    role).
    """

    SYMBOL_MS = 20.0
    PAGE_S = 10.0

    def __init__(self, crc_stats=None):
        self.crc_stats = crc_stats   # optional TlmCrcStats (page CRC)
        self.viterbi = ViterbiDecoder(kk=7, nn=2, g=(121, 91))
        self.history: list[float] = []
        self.stamps: list[int] = []
        self.synced = False
        self.inverted = False
        self.page_start = 0
        self.pages: list[FnavPage] = []
        self.pages_by_type: dict[int, dict] = {}
        self.tow_at_last_symbol_ms: float | None = None

    def feed(self, symbol: float, sample_stamp: int) -> FnavPage | None:
        self.history.append(float(symbol))
        self.stamps.append(int(sample_stamp))
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += self.SYMBOL_MS
        if not self.synced:
            self._search()
            return None
        return self._decode()

    @property
    def ephemeris_fields(self) -> dict:
        return fnav_ephemeris_fields(self.pages_by_type)

    def has_full_ephemeris(self) -> bool:
        return {1, 2, 3} <= set(self.pages_by_type)

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
        if self.crc_stats is not None:
            self.crc_stats.update(bool(ok))
        if self.page_start > PAGE_SYMBOLS:
            drop = self.page_start - 1
            del self.history[:drop]
            del self.stamps[:drop]
            self.page_start -= drop
        if not ok:
            return None
        page = FnavPage(fields["page_type"], fields["data"], stamp)
        self.pages.append(page)
        parsed = parse_fnav_fields(page.page_type, page.data)
        if parsed is not None:
            self.pages_by_type[page.page_type] = parsed
            if "tow_s" in parsed:
                # the page's last symbol ends PAGE_S after the stamped TOW
                self.tow_at_last_symbol_ms = (
                    parsed["tow_s"] + self.PAGE_S) * 1e3
        return page
