"""SBAS correction decoding and application (RTCA DO-229 / WAAS MOPS).

Counterpart of the reference's RTKLIB SBAS layer
(reference: src/algorithms/libs/rtklib/rtklib_sbas.cc —
``sbsupdatecorr`` dispatch :542-600 and the ``decode_sbstype*``
family; application ``sbssatcorr``/``sbsioncorr``). The transport
layer (preamble sync, Viterbi, CRC) lives in ``sbas_l1.py``; this
module parses the 250-bit blocks into corrections and applies them:

- MT1: PRN mask (IODP);
- MT2-5, MT24(first half): fast pseudorange corrections (PRC, UDREI);
- MT6: integrity (UDREI refresh);
- MT7: fast-correction degradation factors;
- MT25, MT24(second half): long-term satellite position/clock deltas;
- MT18: ionospheric grid point (IGP) masks per band;
- MT26: ionospheric vertical delays + GIVEI on the masked IGPs;
- application: pseudorange += PRC, satellite pos/clock deltas, and the
  MOPS bilinear IGP interpolation with the standard obliquity factor.

The IGP band geometry (bands 0-8, 201 IGPs each) is generated from the
DO-229 grid rules: meridians every 5 deg; latitudes every 5 deg within
+-55, plus +-65 and +-75 on 10-deg meridians, plus a single +-85 row
point on the band's 40-deg meridian (N on even bands, S on odd).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

# UDREI -> sigma^2 (m^2), DO-229 Table A-6 (rtklib varerr equivalent)
UDREI_VAR = [0.052, 0.0924, 0.1444, 0.283, 0.4678, 0.8315, 1.2992, 1.8709,
             2.5465, 3.326, 5.1968, 20.787, 230.9661, 2078.695, None, None]
# GIVEI -> sigma^2 (m^2), DO-229 Table A-17
GIVEI_VAR = [0.0084, 0.0333, 0.0749, 0.1331, 0.2079, 0.2994, 0.4075, 0.5322,
             0.6735, 0.8315, 1.1974, 1.8709, 3.326, 20.787, 187.0826, None]

RE_KM = 6378.1363
HION_KM = 350.0


def _u(bits, lo, n):
    v = 0
    for i in range(lo, lo + n):
        v = (v << 1) | int(bits[i])
    return v


def _s(bits, lo, n):
    v = _u(bits, lo, n)
    if v >= 1 << (n - 1):
        v -= 1 << n
    return v


def _put(bits, lo, n, value):
    value = int(value) & ((1 << n) - 1)
    for i in range(n):
        bits[lo + i] = (value >> (n - 1 - i)) & 1


# ---------------------------------------------------------------------------
# IGP band geometry
# ---------------------------------------------------------------------------


def igp_band_table(band: int) -> list[tuple[float, float]]:
    """(lat, lon) of the 201 IGPs of band 0..8, in mask-bit order
    (south->north along each meridian, meridians west->east)."""
    if not 0 <= band <= 8:
        raise ValueError("band must be 0..8")
    lon0 = -180 + 40 * band
    out: list[tuple[float, float]] = []
    for m in range(8):
        lon = lon0 + 5 * m
        if lon % 10 == 0:
            lats = list(range(-75, -55, 10)) + list(range(-55, 60, 5)) + \
                list(range(65, 85, 10))
        else:
            lats = list(range(-55, 60, 5))
        if m == 0:
            # the band's 40-deg meridian carries one 85-deg point:
            # north for even bands, south for odd (DO-229 Table A-14)
            lats = ([-85] + lats) if band % 2 else (lats + [85])
        out.extend((float(lat), float(lon)) for lat in lats)
    assert len(out) == 201, len(out)
    return out


# ---------------------------------------------------------------------------
# Correction store
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FastCorrection:
    prc_m: float = 0.0
    udrei: int = 14
    t_s: float = 0.0


@dataclasses.dataclass
class LongTermCorrection:
    iod: int = 0
    dpos_m: tuple = (0.0, 0.0, 0.0)
    dvel_m_s: tuple = (0.0, 0.0, 0.0)
    daf0_s: float = 0.0
    daf1_s_s: float = 0.0
    t0_s: float | None = None


class SbasCorrections:
    """Holds the current SBAS correction state for one GEO provider."""

    def __init__(self):
        self.iodp: int | None = None
        self.mask: list[int] = []         # mask slot -> PRN (1-based slots)
        self.fast: dict[int, FastCorrection] = {}       # prn -> fast
        self.long_term: dict[int, LongTermCorrection] = {}
        self.iodi: int | None = None
        self.igp_masks: dict[int, list[int]] = {}       # band -> igp indices
        self.igp_delay: dict[tuple[int, int], tuple[float, int]] = {}
        # (band, igp_index_in_band) -> (vertical delay m, givei)

    # -- message intake ----------------------------------------------------

    def update(self, bits250: np.ndarray, t_s: float = 0.0) -> int:
        """Feed one CRC-checked 250-bit SBAS block (sbsupdatecorr role).
        Returns the handled message type or -1."""
        bits = np.asarray(bits250, dtype=np.int64)
        mt = _u(bits, 8, 6)
        if mt == 1:
            self._mt1(bits)
        elif mt in (0, 2, 3, 4, 5):
            # MT0 ("do not use") carries MT2 content during testing
            self._mt2(bits, mt if mt else 2, t_s)
        elif mt == 6:
            self._mt6(bits, t_s)
        elif mt == 7:
            pass  # degradation factors: parsed but unused in SPP weighting
        elif mt == 18:
            self._mt18(bits)
        elif mt == 24:
            self._mt2(bits, 24, t_s, n_slots=6)
            self._mt25_half(bits, 120)
        elif mt == 25:
            self._mt25_half(bits, 14)
            self._mt25_half(bits, 120)
        elif mt == 26:
            self._mt26(bits)
        else:
            return -1
        return mt

    def _mt1(self, bits) -> None:
        prns = [prn for prn in range(1, 211) if bits[14 + prn - 1]]
        self.mask = prns[:51]
        self.iodp = _u(bits, 224, 2)
        self.fast.clear()
        self.long_term.clear()

    def _slot_prn(self, slot: int) -> int | None:
        """1-based mask slot -> PRN."""
        if 1 <= slot <= len(self.mask):
            return self.mask[slot - 1]
        return None

    def _mt2(self, bits, mt: int, t_s: float, n_slots: int = 13) -> None:
        if self.iodp is None or _u(bits, 16, 2) != self.iodp:
            return
        base = 0 if mt == 24 else (mt - 2) * 13
        for i in range(n_slots):
            prc = _s(bits, 18 + 12 * i, 12) * 0.125
            udrei = _u(bits, 18 + 12 * n_slots + 4 * i, 4)
            prn = self._slot_prn(base + i + 1)
            if prn is not None and udrei < 14:
                self.fast[prn] = FastCorrection(prc_m=prc, udrei=udrei,
                                                t_s=t_s)

    def _mt6(self, bits, t_s: float) -> None:
        for i in range(51):
            udrei = _u(bits, 22 + 4 * i, 4)
            prn = self._slot_prn(i + 1)
            if prn is not None and prn in self.fast:
                self.fast[prn].udrei = udrei

    def _mt25_half(self, bits, lo: int) -> None:
        vel = _u(bits, lo, 1)
        if vel == 0:
            for k in range(2):
                off = lo + 1 + 51 * k
                slot = _u(bits, off, 6)
                prn = self._slot_prn(slot)
                if prn is None or slot == 0:
                    continue
                self.long_term[prn] = LongTermCorrection(
                    iod=_u(bits, off + 6, 8),
                    dpos_m=(_s(bits, off + 14, 9) * 0.125,
                            _s(bits, off + 23, 9) * 0.125,
                            _s(bits, off + 32, 9) * 0.125),
                    daf0_s=_s(bits, off + 41, 10) * 2.0**-31)
        else:
            off = lo + 1
            slot = _u(bits, off, 6)
            prn = self._slot_prn(slot)
            if prn is None or slot == 0:
                return
            self.long_term[prn] = LongTermCorrection(
                iod=_u(bits, off + 6, 8),
                dpos_m=(_s(bits, off + 14, 11) * 0.125,
                        _s(bits, off + 25, 11) * 0.125,
                        _s(bits, off + 36, 11) * 0.125),
                dvel_m_s=(_s(bits, off + 47, 8) * 2.0**-11,
                          _s(bits, off + 55, 8) * 2.0**-11,
                          _s(bits, off + 63, 8) * 2.0**-11),
                daf0_s=_s(bits, off + 71, 11) * 2.0**-31,
                daf1_s_s=_s(bits, off + 82, 8) * 2.0**-39,
                t0_s=_u(bits, off + 90, 13) * 16.0)

    def _mt18(self, bits) -> None:
        band = _u(bits, 18, 4)
        iodi = _u(bits, 22, 2)
        if self.iodi is not None and iodi != self.iodi:
            self.igp_delay.clear()
        self.iodi = iodi
        self.igp_masks[band] = [i for i in range(201) if bits[24 + i]]

    def _mt26(self, bits) -> None:
        band = _u(bits, 14, 4)
        block = _u(bits, 18, 4)
        iodi = _u(bits, 217, 2)
        if self.iodi is not None and iodi != self.iodi:
            return
        mask = self.igp_masks.get(band)
        if mask is None:
            return
        for i in range(15):
            pos = block * 15 + i
            if pos >= len(mask):
                break
            delay_raw = _u(bits, 22 + 13 * i, 9)
            givei = _u(bits, 22 + 13 * i + 9, 4)
            if delay_raw == 0x1FF:
                continue  # don't use
            self.igp_delay[(band, mask[pos])] = (delay_raw * 0.125, givei)

    # -- application ---------------------------------------------------------

    def pseudorange_correction(self, prn: int,
                               max_age_s: float = 18.0,
                               t_s: float | None = None) -> float | None:
        fc = self.fast.get(prn)
        if fc is None or fc.udrei >= 14:
            return None
        if t_s is not None and t_s - fc.t_s > max_age_s:
            return None
        return fc.prc_m

    def satellite_correction(self, prn: int, t_s: float = 0.0):
        """(dpos_ecef_m, dclock_s) from the long-term correction
        (sbssatcorr equivalent)."""
        lt = self.long_term.get(prn)
        if lt is None:
            return None
        dt = 0.0 if lt.t0_s is None else t_s - lt.t0_s
        dpos = tuple(p + v * dt for p, v in zip(lt.dpos_m, lt.dvel_m_s))
        dclk = lt.daf0_s + lt.daf1_s_s * dt
        return dpos, dclk

    def _vertical_delay(self, lat: float, lon: float):
        """Bilinear interpolation of the IGP vertical delays around
        (lat, lon) (sbsioncorr grid interpolation)."""
        # collect the 4 surrounding 5-deg grid nodes that have delays
        lat0 = math.floor(lat / 5.0) * 5.0
        lon0 = math.floor(lon / 5.0) * 5.0
        corners = []
        for dla, dlo in ((0, 0), (0, 5), (5, 0), (5, 5)):
            gla, glo = lat0 + dla, lon0 + dlo
            glo_wrapped = ((glo + 180) % 360) - 180
            band = int((glo_wrapped + 180) // 40)
            band = min(band, 8)
            table = igp_band_table(band)
            try:
                idx = table.index((gla, glo_wrapped))
            except ValueError:
                return None
            entry = self.igp_delay.get((band, idx))
            if entry is None:
                return None
            corners.append(entry[0])
        x = (lon - lon0) / 5.0
        y = (lat - lat0) / 5.0
        d00, d01, d10, d11 = corners  # (lat0,lon0),(lat0,lon0+5),(lat0+5,...)
        return ((1 - x) * (1 - y) * d00 + x * (1 - y) * d01
                + (1 - x) * y * d10 + x * y * d11)

    def iono_delay(self, lat_rad: float, lon_rad: float,
                   elevation_rad: float, azimuth_rad: float) -> float | None:
        """Slant L1 iono delay [m] at the ionospheric pierce point
        (DO-229 A.4.4.10; sbsioncorr equivalent). None when the
        surrounding grid is not available."""
        el, az = elevation_rad, azimuth_rad
        psi = math.pi / 2 - el - math.asin(
            RE_KM / (RE_KM + HION_KM) * math.cos(el))
        lat_pp = math.asin(math.sin(lat_rad) * math.cos(psi)
                           + math.cos(lat_rad) * math.sin(psi) * math.cos(az))
        lon_pp = lon_rad + math.asin(
            math.sin(psi) * math.sin(az) / max(math.cos(lat_pp), 1e-9))
        vert = self._vertical_delay(math.degrees(lat_pp),
                                    math.degrees(lon_pp))
        if vert is None:
            return None
        fpp = 1.0 / math.sqrt(1.0 - (RE_KM / (RE_KM + HION_KM)
                                     * math.cos(el)) ** 2)
        return fpp * vert

    def fast_variance(self, prn: int) -> float | None:
        fc = self.fast.get(prn)
        if fc is None:
            return None
        return UDREI_VAR[fc.udrei]


# ---------------------------------------------------------------------------
# Encoders (simulation / tests)
# ---------------------------------------------------------------------------


def encode_mt1(prns: list[int], iodp: int) -> np.ndarray:
    bits = np.zeros(250, dtype=np.int64)
    _put(bits, 8, 6, 1)
    for prn in prns:
        bits[14 + prn - 1] = 1
    _put(bits, 224, 2, iodp)
    return bits


def encode_mt2(mt: int, iodp: int, iodf: int, prcs_m: list[float],
               udreis: list[int]) -> np.ndarray:
    bits = np.zeros(250, dtype=np.int64)
    _put(bits, 8, 6, mt)
    _put(bits, 14, 2, iodf)
    _put(bits, 16, 2, iodp)
    for i, prc in enumerate(prcs_m):
        _put(bits, 18 + 12 * i, 12, int(round(prc / 0.125)))
    for i, u in enumerate(udreis):
        _put(bits, 18 + 12 * 13 + 4 * i, 4, u)
    return bits


def encode_mt25_v1(slot: int, iod: int, dpos_m, dvel_m_s, daf0_s: float,
                   daf1_s_s: float, t0_s: float) -> np.ndarray:
    bits = np.zeros(250, dtype=np.int64)
    _put(bits, 8, 6, 25)
    for lo in (14, 120):
        _put(bits, lo, 1, 1)
        off = lo + 1
        _put(bits, off, 6, slot if lo == 14 else 0)
        _put(bits, off + 6, 8, iod)
        _put(bits, off + 14, 11, int(round(dpos_m[0] / 0.125)))
        _put(bits, off + 25, 11, int(round(dpos_m[1] / 0.125)))
        _put(bits, off + 36, 11, int(round(dpos_m[2] / 0.125)))
        _put(bits, off + 47, 8, int(round(dvel_m_s[0] * 2**11)))
        _put(bits, off + 55, 8, int(round(dvel_m_s[1] * 2**11)))
        _put(bits, off + 63, 8, int(round(dvel_m_s[2] * 2**11)))
        _put(bits, off + 71, 11, int(round(daf0_s * 2**31)))
        _put(bits, off + 82, 8, int(round(daf1_s_s * 2**39)))
        _put(bits, off + 90, 13, int(round(t0_s / 16.0)))
    return bits


def encode_mt18(band: int, iodi: int, igp_indices: list[int]) -> np.ndarray:
    bits = np.zeros(250, dtype=np.int64)
    _put(bits, 8, 6, 18)
    _put(bits, 14, 4, 9)  # number of bands broadcast
    _put(bits, 18, 4, band)
    _put(bits, 22, 2, iodi)
    for i in igp_indices:
        bits[24 + i] = 1
    return bits


def encode_mt26(band: int, block: int, iodi: int,
                delays_m: list[float], giveis: list[int]) -> np.ndarray:
    bits = np.zeros(250, dtype=np.int64)
    _put(bits, 8, 6, 26)
    _put(bits, 14, 4, band)
    _put(bits, 18, 4, block)
    for i, (d, g) in enumerate(zip(delays_m, giveis)):
        _put(bits, 22 + 13 * i, 9, int(round(d / 0.125)))
        _put(bits, 22 + 13 * i + 9, 4, g)
    _put(bits, 217, 2, iodi)
    return bits
