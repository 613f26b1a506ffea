"""IONEX 1.0 global TEC map reader + slant ionospheric delay.

Counterpart of the reference's IONEX block
(/root/reference/src/algorithms/libs/rtklib/rtklib_ionex.cc:
``readionexh``/``readionexb`` header+body parse :188-370, ``interptec``
bilinear grid interpolation :498-560, ``iondelay``/``iontec`` single-layer
slant delay with temporal interpolation :599-720). Supplies the
ionosphere for single-frequency PPP and the iono-corrected fallback when
the iono-free combination is unavailable.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from gnss_sdr_tpu.pvt import geodesy

RE_M = 6_371_000.0   # mean earth radius used by the single-layer model
#: delay/TEC constant: d = 40.3e16/f^2 * TEC(u) meters
K_TEC = 40.3e16


@dataclasses.dataclass
class IonexTec:
    """One set of epoch-ordered TEC grids (TECU)."""

    epochs_s: np.ndarray       # [T] seconds (file epoch -> caller's scale)
    lats_deg: np.ndarray       # [I] grid latitudes (monotonic)
    lons_deg: np.ndarray       # [J] grid longitudes (monotonic)
    height_km: float           # single-layer shell height
    tec: np.ndarray            # [T, I, J] TECU; NaN = missing

    def _interp_grid(self, k: int, lat_deg: float, lon_deg: float) -> float:
        """Bilinear interpolation in one epoch's grid (interptec)."""
        lats, lons = self.lats_deg, self.lons_deg
        lat = min(max(lat_deg, min(lats[0], lats[-1])),
                  max(lats[0], lats[-1]))
        lon = lon_deg
        span = lons[-1] - lons[0]
        while lon < min(lons[0], lons[-1]):
            lon += 360.0
        while lon > max(lons[0], lons[-1]):
            lon -= 360.0
        lon = min(max(lon, min(lons[0], lons[-1])),
                  max(lons[0], lons[-1]))
        del span
        i = np.clip(np.searchsorted(
            lats if lats[0] < lats[-1] else -lats,
            lat if lats[0] < lats[-1] else -lat) - 1, 0, len(lats) - 2)
        j = np.clip(np.searchsorted(
            lons if lons[0] < lons[-1] else -lons,
            lon if lons[0] < lons[-1] else -lon) - 1, 0, len(lons) - 2)
        a = (lat - lats[i]) / (lats[i + 1] - lats[i])
        b = (lon - lons[j]) / (lons[j + 1] - lons[j])
        g = self.tec[k]
        v = ((1 - a) * (1 - b) * g[i, j] + (1 - a) * b * g[i, j + 1]
             + a * (1 - b) * g[i + 1, j] + a * b * g[i + 1, j + 1])
        return float(v)

    def vtec(self, t_s: float, lat_deg: float, lon_deg: float) -> float:
        """Vertical TEC at an epoch/location: linear in time between the
        straddling maps, with the longitude rotated by earth rate to
        follow the sun-fixed pattern (iondelay's rotation term)."""
        eps = self.epochs_s
        k = int(np.clip(np.searchsorted(eps, t_s) - 1, 0, len(eps) - 2))
        t0, t1 = float(eps[k]), float(eps[k + 1])
        w = 0.0 if t1 == t0 else (t_s - t0) / (t1 - t0)
        w = min(max(w, 0.0), 1.0)
        # sun-fixed rotation: the pattern at t between maps is the map
        # grid rotated in longitude by the elapsed fraction of a day
        lon0 = lon_deg + 360.0 * (t_s - t0) / 86400.0
        lon1 = lon_deg - 360.0 * (t1 - t_s) / 86400.0
        v0 = self._interp_grid(k, lat_deg, lon0)
        v1 = self._interp_grid(k + 1, lat_deg, lon1)
        return (1 - w) * v0 + w * v1

    def slant_delay_m(self, t_s: float, rx_llh: tuple[float, float, float],
                      az_rad: float, el_rad: float,
                      freq_hz: float) -> float:
        """Slant group delay [m] at ``freq_hz`` via the single-layer
        mapping (iondelay :599-660): pierce-point lat/lon + obliquity
        1/cos(z') with sin z' = Re/(Re+H) cos(el)."""
        lat, lon, _h = rx_llh
        hs = self.height_km * 1000.0
        sinz = RE_M / (RE_M + hs) * math.cos(el_rad)
        z = math.asin(sinz)
        psi = math.pi / 2.0 - el_rad - z      # earth-central angle
        lat_pp = math.asin(math.sin(lat) * math.cos(psi)
                           + math.cos(lat) * math.sin(psi)
                           * math.cos(az_rad))
        lon_pp = lon + math.asin(math.sin(psi) * math.sin(az_rad)
                                 / max(math.cos(lat_pp), 1e-9))
        v = self.vtec(t_s, math.degrees(lat_pp), math.degrees(lon_pp))
        return K_TEC / (freq_hz * freq_hz) * v / math.cos(z)


def _ymd_to_sow(y: int, mo: int, d: int, h: int, mi: int, s: float) -> float:
    """Calendar epoch -> seconds since the GPS epoch (1980-01-06)."""
    # days since 1980-01-06 via a Julian day number
    a = (14 - mo) // 12
    yy = y + 4800 - a
    mm = mo + 12 * a - 3
    jdn = d + (153 * mm + 2) // 5 + 365 * yy + yy // 4 - yy // 100 \
        + yy // 400 - 32045
    days = jdn - 2_444_245   # JDN of 1980-01-06
    return days * 86400.0 + h * 3600.0 + mi * 60.0 + s


def parse_ionex(text: str) -> IonexTec:
    """Parse an IONEX 1.0 stream (readionexh + readionexb roles).

    Epochs are returned as seconds since the GPS epoch; ``EXPONENT``
    scales the integer grid values to TECU."""
    lines = text.splitlines()
    lat1 = lat2 = dlat = lon1 = lon2 = dlon = None
    hgt = 450.0
    exponent = -1
    i = 0
    while i < len(lines):
        line = lines[i]
        label = line[60:].strip()
        if label == "LAT1 / LAT2 / DLAT":
            lat1, lat2, dlat = (float(line[2 + 6 * k: 8 + 6 * k])
                                for k in range(3))
        elif label == "LON1 / LON2 / DLON":
            lon1, lon2, dlon = (float(line[2 + 6 * k: 8 + 6 * k])
                                for k in range(3))
        elif label == "HGT1 / HGT2 / DHGT":
            hgt = float(line[2:8])
        elif label == "EXPONENT":
            exponent = int(line[:6])
        elif label == "END OF HEADER":
            i += 1
            break
        i += 1
    assert lat1 is not None and lon1 is not None, "incomplete IONEX header"
    lats = np.arange(lat1, lat2 + 0.5 * dlat, dlat)
    lons = np.arange(lon1, lon2 + 0.5 * dlon, dlon)
    epochs: list[float] = []
    maps: list[np.ndarray] = []
    cur: np.ndarray | None = None
    row_lat_idx = 0
    while i < len(lines):
        line = lines[i]
        label = line[60:].strip()
        if label == "START OF TEC MAP":
            cur = np.full((len(lats), len(lons)), np.nan)
        elif label == "EPOCH OF CURRENT MAP":
            f = [int(line[6 * k: 6 * (k + 1)]) for k in range(6)]
            epochs.append(_ymd_to_sow(*f[:5], float(f[5])))
        elif label == "LAT/LON1/LON2/DLON/H":
            lat_v = float(line[2:8])
            row_lat_idx = int(round((lat_v - lat1) / dlat))
            vals: list[float] = []
            while len(vals) < len(lons):
                i += 1
                row = lines[i]
                vals.extend(int(row[5 * k: 5 * (k + 1)])
                            for k in range(len(row.rstrip()) // 5))
            arr = np.asarray(vals[:len(lons)], dtype=float)
            arr[arr == 9999.0] = np.nan
            cur[row_lat_idx] = arr * (10.0 ** exponent)
        elif label == "END OF TEC MAP":
            maps.append(cur)
        elif label == "START OF RMS MAP":
            # RMS maps share the body format; skipped (the reference
            # stores them for weighting only)
            while i < len(lines) and \
                    lines[i][60:].strip() != "END OF RMS MAP":
                i += 1
        i += 1
    return IonexTec(epochs_s=np.asarray(epochs), lats_deg=lats,
                    lons_deg=lons, height_km=hgt,
                    tec=np.stack(maps) if maps else np.zeros((0,)))


def read_ionex(path: str) -> IonexTec:
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        return parse_ionex(fh.read())


def write_ionex(tec: IonexTec, path: str) -> None:
    """Minimal IONEX 1.0 writer (test fixtures + the rinex-tools role of
    producing interchange products)."""
    lats, lons = tec.lats_deg, tec.lons_deg
    dlat = lats[1] - lats[0] if len(lats) > 1 else 1.0
    dlon = lons[1] - lons[0] if len(lons) > 1 else 1.0
    out = []

    def card(body: str, label: str) -> None:
        out.append(f"{body:<60s}{label}")

    card(f"{1.0:8.1f}{'':12s}{'IONOSPHERE MAPS':<20s}{'GNSS':<20s}",
         "IONEX VERSION / TYPE")
    card(f"{len(tec.epochs_s):6d}", "# OF MAPS IN FILE")
    card(f"  {lats[0]:6.1f}{lats[-1]:6.1f}{dlat:6.1f}",
         "LAT1 / LAT2 / DLAT")
    card(f"  {lons[0]:6.1f}{lons[-1]:6.1f}{dlon:6.1f}",
         "LON1 / LON2 / DLON")
    card(f"  {tec.height_km:6.1f}{tec.height_km:6.1f}{0.0:6.1f}",
         "HGT1 / HGT2 / DHGT")
    card(f"{-1:6d}", "EXPONENT")
    card("", "END OF HEADER")
    for m, t in enumerate(tec.epochs_s):
        card(f"{m + 1:6d}", "START OF TEC MAP")
        days = int(t // 86400)
        rem = t - days * 86400.0
        jdn = days + 2_444_245
        a = jdn + 32044
        b = (4 * a + 3) // 146097
        c = a - 146097 * b // 4
        d4 = (4 * c + 3) // 1461
        e = c - 1461 * d4 // 4
        m2 = (5 * e + 2) // 153
        day = e - (153 * m2 + 2) // 5 + 1
        mon = m2 + 3 - 12 * (m2 // 10)
        year = 100 * b + d4 - 4800 + m2 // 10
        card(f"{year:6d}{mon:6d}{day:6d}{int(rem // 3600):6d}"
             f"{int(rem % 3600 // 60):6d}{int(rem % 60):6d}",
             "EPOCH OF CURRENT MAP")
        for ii, lat in enumerate(lats):
            card(f"  {lat:6.1f}{lons[0]:6.1f}{lons[-1]:6.1f}{dlon:6.1f}"
                 f"{tec.height_km:6.1f}", "LAT/LON1/LON2/DLON/H")
            vals = np.round(tec.tec[m, ii] * 10.0).astype(int)
            for k in range(0, len(vals), 16):
                out.append("".join(f"{v:5d}" for v in vals[k:k + 16]))
        card(f"{m + 1:6d}", "END OF TEC MAP")
    card("", "END OF FILE")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(out) + "\n")
