"""BeiDou B1I D2 NAV codec (GEO satellites, 500 sps).

Counterpart of the reference's D2 branch
(reference: src/algorithms/telemetry_decoder/gnuradio_blocks/
beidou_b1i_telemetry_decoder_gs.cc:341-365 — GEO PRNs 1-5/59-63 switch
to D2 with 2 symbols/bit and no NH modulation — and
src/core/system_parameters/beidou_dnav_navigation_message.cc:410-560
``d2_subframe_decoder``; bit positions from Beidou_DNAV.h:213-287).

D2 runs at 500 bps: the ephemeris is spread over subframe 1's pages
1-10 (one page per 0.6 s, full set in 6 s vs 30 s for D1), with several
fields split MSB/LSB across consecutive pages. Word coding (BCH(15,11)
x2 interleaved) is shared with D1.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.telemetry.beidou_d1 import (
    PREAMBLE, SUBFRAME_BITS, subframe_to_symbols, symbols_to_subframe)

PI = np.pi

# (start, len) pairs are 1-based MSB-first, per Beidou_DNAV.h D2_* tables
_COMMON = {
    "PRE": ((1, 11),), "FRAID": ((16, 3),), "SOW": ((19, 8), (31, 12)),
    "PNUM": ((43, 4),),
}
_PAGE_FIELDS: dict[int, dict[str, tuple]] = {
    1: {"SAT_H1": ((47, 1),), "AODC": ((48, 5),), "URAI": ((61, 4),),
        "WN": ((65, 13),), "TOC": ((78, 5), (91, 12)),
        "TGD1": ((103, 10),), "TGD2": ((121, 10),)},
    2: {"ALPHA0": ((47, 6), (61, 2)), "ALPHA1": ((63, 8),),
        "ALPHA2": ((71, 8),), "ALPHA3": ((79, 4), (91, 4)),
        "BETA0": ((95, 8),), "BETA1": ((103, 8),),
        "BETA2": ((111, 2), (121, 6)), "BETA3": ((127, 8),)},
    3: {"A0": ((101, 12), (121, 12)), "A1_MSB": ((133, 4),)},
    4: {"A1_LSB": ((47, 6), (61, 12)), "A2": ((73, 10), (91, 1)),
        "AODE": ((92, 5),), "DELTA_N": ((97, 16),),
        "CUC_MSB": ((121, 14),)},
    5: {"CUC_LSB": ((47, 4),), "M0": ((51, 2), (61, 22), (91, 8)),
        "CUS": ((99, 14), (121, 4)), "E_MSB": ((125, 10),)},
    6: {"E_LSB": ((47, 6), (61, 16)),
        "SQRT_A": ((77, 6), (91, 22), (121, 4)), "CIC_MSB": ((125, 10),)},
    7: {"CIC_LSB": ((47, 6), (61, 2)), "CIS": ((63, 18),),
        "TOE": ((81, 2), (91, 15)), "I0_MSB": ((106, 7), (121, 14))},
    8: {"I0_LSB": ((47, 6), (61, 5)), "CRC": ((66, 17), (91, 1)),
        "CRS": ((92, 18),), "OMEGA_DOT_MSB": ((110, 3), (121, 16))},
    9: {"OMEGA_DOT_LSB": ((47, 5),), "OMEGA0": ((52, 1), (61, 22), (91, 9)),
        "OMEGA_MSB": ((100, 13), (121, 14))},
    10: {"OMEGA_LSB": ((47, 5),), "IDOT": ((52, 1), (61, 13))},
}

# MSB/LSB splits across pages: name -> (msb_key, lsb_key, lsb_width)
_SPLITS = {
    "A1": ("A1_MSB", "A1_LSB", 18),
    "CUC": ("CUC_MSB", "CUC_LSB", 4),
    "E": ("E_MSB", "E_LSB", 22),
    "CIC": ("CIC_MSB", "CIC_LSB", 8),
    "I0": ("I0_MSB", "I0_LSB", 11),
    "OMEGA_DOT": ("OMEGA_DOT_MSB", "OMEGA_DOT_LSB", 5),
    "OMEGA": ("OMEGA_MSB", "OMEGA_LSB", 5),
}

# physical scales (D1_*_LSB constants shared by D2, Beidou_DNAV.h)
_SCALES = {
    "SOW": 1.0, "WN": 1.0, "TOC": 8.0, "TOE": 8.0,
    "TGD1": 1e-10, "TGD2": 1e-10,
    "A0": 2.0**-33, "A1": 2.0**-50, "A2": 2.0**-66,
    "DELTA_N": 2.0**-43 * PI, "CUC": 2.0**-31, "CUS": 2.0**-31,
    "M0": 2.0**-31 * PI, "E": 2.0**-33, "SQRT_A": 2.0**-19,
    "CRC": 2.0**-6, "CRS": 2.0**-6, "CIC": 2.0**-31, "CIS": 2.0**-31,
    "I0": 2.0**-31 * PI, "OMEGA0": 2.0**-31 * PI, "OMEGA": 2.0**-31 * PI,
    "OMEGA_DOT": 2.0**-43 * PI, "IDOT": 2.0**-43 * PI,
    "ALPHA0": 2.0**-30, "ALPHA1": 2.0**-27, "ALPHA2": 2.0**-24,
    "ALPHA3": 2.0**-24, "BETA0": 2.0**11, "BETA1": 2.0**14,
    "BETA2": 2.0**16, "BETA3": 2.0**16,
}
_SIGNED = {"TGD1", "TGD2", "A0", "A1", "A2", "DELTA_N", "CUC", "CUS",
           "M0", "CRC", "CRS", "CIC", "CIS", "I0", "OMEGA0", "OMEGA",
           "OMEGA_DOT", "IDOT", "ALPHA0", "ALPHA1", "ALPHA2", "ALPHA3",
           "BETA0", "BETA1", "BETA2", "BETA3"}

GEO_PRNS = frozenset(list(range(1, 6)) + list(range(59, 64)))


def _width(spec) -> int:
    return sum(n for _, n in spec)


def _read_raw(bits300: np.ndarray, spec) -> int:
    v = 0
    for start, n in spec:
        for i in range(n):
            v = (v << 1) | int(bits300[start - 1 + i])
    return v


def _write_raw(bits300: np.ndarray, spec, value: int) -> None:
    w = _width(spec)
    value &= (1 << w) - 1
    pos = w
    for start, n in spec:
        for i in range(n):
            pos -= 1
            bits300[start - 1 + i] = (value >> pos) & 1


def parse_d2_page(bits300: np.ndarray) -> dict | None:
    """Parse one D2 subframe's raw fields; returns None unless FraID=1
    (pages of subframes 2-5 carry integrity/almanac, not ephemeris)."""
    d = np.asarray(bits300, dtype=np.int64)
    out = {"fra_id": _read_raw(d, _COMMON["FRAID"]),
           "sow": _read_raw(d, _COMMON["SOW"]),
           "pnum": _read_raw(d, _COMMON["PNUM"])}
    if out["fra_id"] != 1:
        return out
    page = out["pnum"]
    for name, spec in _PAGE_FIELDS.get(page, {}).items():
        out[name] = _read_raw(d, spec)
    return out


def build_d2_page(page: int, sow: int, raw_fields: dict[str, int]) -> np.ndarray:
    """Assemble the 300 bits of subframe 1, page ``page`` (encoder for
    tests/simulation). ``raw_fields`` holds raw unsigned integers."""
    d = np.zeros(SUBFRAME_BITS, dtype=np.int64)
    d[: 11] = PREAMBLE
    _write_raw(d, _COMMON["FRAID"], 1)
    _write_raw(d, _COMMON["SOW"], sow)
    _write_raw(d, _COMMON["PNUM"], page)
    for name, spec in _PAGE_FIELDS[page].items():
        _write_raw(d, spec, raw_fields.get(name, 0))
    return d


def raw_fields_from_physical(fields: dict) -> dict[str, int]:
    """Physical ephemeris values -> raw per-page integers (with MSB/LSB
    splits applied). Input keys are the _SCALES names in lowercase."""
    raw: dict[str, int] = {}
    for name, scale in _SCALES.items():
        key = name.lower()
        if key not in fields:
            continue
        v = int(round(fields[key] / scale))
        w_total = None
        if name in _SPLITS:
            msb_key, lsb_key, lsb_w = _SPLITS[name]
            msb_page = next(p for p, f in _PAGE_FIELDS.items() if msb_key in f)
            lsb_page = next(p for p, f in _PAGE_FIELDS.items() if lsb_key in f)
            w_total = _width(_PAGE_FIELDS[msb_page][msb_key]) + lsb_w
            if v < 0:
                v += 1 << w_total
            raw[msb_key] = v >> lsb_w
            raw[lsb_key] = v & ((1 << lsb_w) - 1)
        else:
            page_spec = next((f[name] for f in _PAGE_FIELDS.values()
                              if name in f), None)
            if page_spec is None:
                continue
            w_total = _width(page_spec)
            if v < 0:
                v += 1 << w_total
            raw[name] = v
    return raw


def assemble_ephemeris(pages: dict[int, dict]) -> dict:
    """Combine raw page fields (pages 1-10) into physical ephemeris and
    iono values (d2_subframe_decoder merge semantics)."""
    need = set(range(1, 11))
    if not need.issubset(pages):
        raise ValueError(f"missing pages {sorted(need - set(pages))}")
    raw: dict[str, int] = {}
    for p in need:
        for k, v in pages[p].items():
            if k not in ("fra_id", "sow", "pnum"):
                raw[k] = v
    # merge splits
    for name, (msb_key, lsb_key, lsb_w) in _SPLITS.items():
        raw[name] = (raw.pop(msb_key) << lsb_w) | raw.pop(lsb_key)
    out: dict = {}
    for name, v in raw.items():
        scale = _SCALES.get(name, 1.0)
        if name in _SIGNED:
            # total width: splits computed above; plain fields from spec
            if name in _SPLITS:
                msb_key, _, lsb_w = _SPLITS[name]
                page = next(p for p, f in _PAGE_FIELDS.items()
                            if msb_key in f)
                w = _width(_PAGE_FIELDS[page][msb_key]) + lsb_w
            else:
                page = next(p for p, f in _PAGE_FIELDS.items() if name in f)
                w = _width(_PAGE_FIELDS[page][name])
            if v >= 1 << (w - 1):
                v -= 1 << w
        out[name.lower()] = v * scale
    out["sow"] = pages[1]["sow"]
    return out


# word coding (BCH(15,11) x2 interleaved) is the same as D1:
page_to_symbols = subframe_to_symbols
symbols_to_page = symbols_to_subframe


@dataclasses.dataclass
class D2PageUpdate:
    fra_id: int
    pnum: int
    sow: int
    fields: dict
    sample_stamp: int


class BeidouD2Decoder:
    """Streaming D2 decoder: 1 symbol per 1 ms code period, 2 symbols
    per bit (no NH), preamble-synchronized 300-bit subframes."""

    SYMBOLS_PER_BIT = 2

    def __init__(self):
        self.bit_history: list[float] = []
        self.stamps: list[int] = []
        self._sym_acc = 0.0
        self._sym_count = 0
        self.synced = False
        self.inverted = False
        self.pages: dict[int, dict] = {}
        self.ephemeris: dict | None = None

    def feed(self, symbol: float, sample_stamp: int) -> D2PageUpdate | None:
        self._sym_acc += float(symbol)
        self._sym_count += 1
        if self._sym_count < self.SYMBOLS_PER_BIT:
            return None
        bit_soft = self._sym_acc / self.SYMBOLS_PER_BIT
        self._sym_acc = 0.0
        self._sym_count = 0
        self.bit_history.append(bit_soft)
        self.stamps.append(int(sample_stamp))
        if not self.synced:
            self._search_preamble()
            return None
        if len(self.bit_history) < SUBFRAME_BITS:
            return None
        chan = np.sign(self.bit_history[:SUBFRAME_BITS])
        stamp = self.stamps[0]
        del self.bit_history[:SUBFRAME_BITS]
        del self.stamps[:SUBFRAME_BITS]
        if self.inverted:
            chan = -chan
        chan_bits = (chan < 0).astype(np.int64)  # +1 symbol == bit 0
        bits, ok = symbols_to_page(chan_bits)
        if not ok or not np.array_equal(bits[:11], PREAMBLE):
            self.synced = False
            self.bit_history.clear()
            self.stamps.clear()
            return None
        fields = parse_d2_page(bits)
        if fields is None:
            return None
        if fields["fra_id"] == 1:
            self.pages[fields["pnum"]] = fields
            if set(range(1, 11)).issubset(self.pages):
                self.ephemeris = assemble_ephemeris(self.pages)
        return D2PageUpdate(fra_id=fields["fra_id"], pnum=fields["pnum"],
                            sow=fields["sow"], fields=fields,
                            sample_stamp=stamp)

    def _search_preamble(self) -> None:
        n = PREAMBLE.size
        if len(self.bit_history) < n:
            return
        window = np.sign(self.bit_history[-n:])
        ref = np.where(PREAMBLE == 1, -1.0, 1.0)
        corr = float(np.sum(window * ref))
        if abs(corr) == n:
            self.synced = True
            self.inverted = corr < 0
            keep = len(self.bit_history) - n
            del self.bit_history[:keep]
            del self.stamps[:keep]
