"""RINEX 3.02 writers: multi-GNSS observation + navigation files.

Counterpart of the reference's RINEX printer
(/root/reference/src/algorithms/PVT/libs/rinex_printer.cc — 13.5k LoC
covering every constellation/version). Implemented here: RINEX 3.02
mixed navigation files with GPS LNAV (G), Galileo I/NAV (E), GLONASS
GNAV (R, state-vector records) and BeiDou DNAV (C) records, iono /
time-system-correction header lines, and multi-GNSS observation files
with per-system observable codes.

GPS time note: epochs are written from (week, TOW); the civil date uses
the GPS epoch 1980-01-06 without leap-second handling (raw GPS time, as
RINEX nav records expect).
"""

from __future__ import annotations

import datetime
import math

from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris
from gnss_sdr_tpu.pvt.glonass_ephemeris import GlonassEphemeris

GPS_EPOCH = datetime.datetime(1980, 1, 6, tzinfo=datetime.timezone.utc)

# per-system observable codes (rinex_printer obsType mapping), default
# L1-class set per system (single-band receivers)
OBS_CODES = {
    "G": ("C1C", "L1C", "D1C", "S1C"),
    "E": ("C1B", "L1B", "D1B", "S1B"),
    "R": ("C1C", "L1C", "D1C", "S1C"),
    "C": ("C2I", "L2I", "D2I", "S2I"),
    "S": ("C1C", "L1C", "D1C", "S1C"),
}

#: receiver signal suffix -> (system, RINEX 3.02 band+attribute): the
#: full obs-code catalogue of the signals this receiver tracks
#: (rinex_printer.cc signal-to-code mapping across its version tables;
#: BDS B1I/B3I are bands 2/6 in 3.02)
BAND_OBS_CODES = {
    "1C": ("G", "1C"),
    "2S": ("G", "2S"),
    "L5": ("G", "5Q"),
    "1B": ("E", "1B"),
    "5X": ("E", "5Q"),
    "7X": ("E", "7Q"),
    "E6": ("E", "6C"),
    "1G": ("R", "1C"),
    "2G": ("R", "2C"),
    "B1": ("C", "2I"),
    "B3": ("C", "6I"),
    "S1": ("S", "1C"),
}


def gps_time_to_datetime(week: int, tow_s: float) -> datetime.datetime:
    return GPS_EPOCH + datetime.timedelta(weeks=week, seconds=tow_s)


def _e19(value: float) -> str:
    """19-char RINEX float field."""
    s = f"{value: .12E}"  # ' 1.234567890123E+05'
    mant, exp = s.split("E")
    return f"{mant}D{int(exp):+03d}".rjust(19)


def _rows(lines: list[str], rows) -> None:
    for row in rows:
        lines.append("    " + "".join(_e19(v) for v in row))


class RinexNavWriter:
    """Mixed GNSS navigation message file (RINEX 3.02 'N').

    ``add_ephemeris`` dispatches on the ephemeris type / system code:
    GPS and Galileo share the Kepler container (system "G"/"E"), GLONASS
    uses the state-vector container, BeiDou passes system="C".
    """

    def __init__(self, path):
        self.path = str(path)
        self.records: list[str] = []
        self.systems: set[str] = set()
        self.iono_gps: tuple | None = None        # (alpha[4], beta[4])
        self.iono_gal: tuple | None = None        # (ai0, ai1, ai2)
        self.utc_gps: tuple | None = None         # (a0, a1, t0t, wn_t)

    # -- header corrections -------------------------------------------------

    def set_gps_iono(self, alpha, beta) -> None:
        self.iono_gps = (tuple(alpha), tuple(beta))

    def set_galileo_iono(self, ai0: float, ai1: float, ai2: float) -> None:
        self.iono_gal = (ai0, ai1, ai2)

    def set_gps_utc(self, a0: float, a1: float, t0t: int, wn_t: int) -> None:
        self.utc_gps = (a0, a1, t0t, wn_t)

    # -- records -------------------------------------------------------------

    def add_ephemeris(self, eph, system: str = "G") -> None:
        if isinstance(eph, GlonassEphemeris):
            self._add_glonass(eph)
        elif system == "E":
            self._add_galileo(eph)
        elif system == "C":
            self._add_beidou(eph)
        else:
            self._add_gps(eph)

    def _add_gps(self, eph: GpsEphemeris) -> None:
        self.systems.add("G")
        dt = gps_time_to_datetime(eph.week_number + 2048, eph.toc_s)
        lines = [f"G{eph.prn:02d} {dt:%Y %m %d %H %M %S}"
                 + _e19(eph.af0) + _e19(eph.af1) + _e19(eph.af2)]
        _rows(lines, [
            (eph.iode, eph.crs_m, eph.delta_n_rad_s, eph.m0_rad),
            (eph.cuc_rad, eph.ecc, eph.cus_rad, eph.sqrt_a),
            (eph.toe_s, eph.cic_rad, eph.omega0_rad, eph.cis_rad),
            (eph.i0_rad, eph.crc_m, eph.omega_rad, eph.omega_dot_rad_s),
            (eph.idot_rad_s, 1.0, float(eph.week_number + 2048), 0.0),
            (2.0, float(eph.sv_health), eph.tgd_s, float(eph.iodc)),
            (eph.toe_s, 4.0, 0.0, 0.0),
        ])
        self.records.append("\n".join(lines))

    def _add_galileo(self, eph: GpsEphemeris) -> None:
        """Galileo record (I/NAV): data-sources 513 = I/NAV E1-B,
        BGD E1/E5b carried in the tgd slot (rinex_printer Galileo block)."""
        self.systems.add("E")
        dt = gps_time_to_datetime(eph.week_number + 1024, eph.toc_s)
        lines = [f"E{eph.prn:02d} {dt:%Y %m %d %H %M %S}"
                 + _e19(eph.af0) + _e19(eph.af1) + _e19(eph.af2)]
        _rows(lines, [
            (float(eph.iode), eph.crs_m, eph.delta_n_rad_s, eph.m0_rad),
            (eph.cuc_rad, eph.ecc, eph.cus_rad, eph.sqrt_a),
            (eph.toe_s, eph.cic_rad, eph.omega0_rad, eph.cis_rad),
            (eph.i0_rad, eph.crc_m, eph.omega_rad, eph.omega_dot_rad_s),
            (eph.idot_rad_s, 513.0, float(eph.week_number + 1024), 0.0),
            (3.12, float(eph.sv_health), eph.tgd_s, eph.tgd_s),
            (eph.toe_s, 0.0, 0.0, 0.0),
        ])
        self.records.append("\n".join(lines))

    def _add_glonass(self, eph: GlonassEphemeris) -> None:
        """GLONASS state-vector record (positions/velocities in km,
        message-frame time in UTC day seconds)."""
        self.systems.add("R")
        day = datetime.datetime(2020, 1, 1,
                                tzinfo=datetime.timezone.utc)  # date-less tb
        dt = day + datetime.timedelta(seconds=eph.tb_s)
        lines = [f"R{eph.slot:02d} {dt:%Y %m %d %H %M %S}"
                 + _e19(-eph.tau_n_s) + _e19(eph.gamma_n) + _e19(eph.tb_s)]
        _rows(lines, [
            (eph.pos_m[0] / 1e3, eph.vel_m_s[0] / 1e3,
             eph.acc_m_s2[0] / 1e3, 0.0),
            (eph.pos_m[1] / 1e3, eph.vel_m_s[1] / 1e3,
             eph.acc_m_s2[1] / 1e3, float(eph.freq_slot)),
            (eph.pos_m[2] / 1e3, eph.vel_m_s[2] / 1e3,
             eph.acc_m_s2[2] / 1e3, 0.0),
        ])
        self.records.append("\n".join(lines))

    def _add_beidou(self, eph: GpsEphemeris) -> None:
        self.systems.add("C")
        dt = gps_time_to_datetime(eph.week_number + 1356, eph.toc_s)
        lines = [f"C{eph.prn:02d} {dt:%Y %m %d %H %M %S}"
                 + _e19(eph.af0) + _e19(eph.af1) + _e19(eph.af2)]
        _rows(lines, [
            (float(eph.iode), eph.crs_m, eph.delta_n_rad_s, eph.m0_rad),
            (eph.cuc_rad, eph.ecc, eph.cus_rad, eph.sqrt_a),
            (eph.toe_s, eph.cic_rad, eph.omega0_rad, eph.cis_rad),
            (eph.i0_rad, eph.crc_m, eph.omega_rad, eph.omega_dot_rad_s),
            (eph.idot_rad_s, 0.0, float(eph.week_number), 0.0),
            (2.0, float(eph.sv_health), eph.tgd_s, eph.tgd_s),
            (eph.toe_s, float(eph.iodc), 0.0, 0.0),
        ])
        self.records.append("\n".join(lines))

    def close(self) -> str:
        now = datetime.datetime.now(datetime.timezone.utc)
        if len(self.systems) == 1:
            sys_field = {"G": "G: GPS", "E": "E: GALILEO",
                         "R": "R: GLONASS", "C": "C: BEIDOU"}[
                next(iter(self.systems))]
        else:
            sys_field = "M: MIXED"
        lines = [
            f"{'3.02':>9}{'':11}{'N: GNSS NAV DATA':<20}{sys_field:<20}"
            "RINEX VERSION / TYPE",
            f"{'GNSS-SDR-TPU':<20}{'':20}{now:%Y%m%d %H%M%S} UTC "
            "PGM / RUN BY / DATE",
        ]
        if self.iono_gps is not None:
            alpha, beta = self.iono_gps
            a = "".join(f"{v:12.4E}" for v in alpha)
            b = "".join(f"{v:12.4E}" for v in beta)
            lines.append(f"GPSA {a}{'':7}IONOSPHERIC CORR")
            lines.append(f"GPSB {b}{'':7}IONOSPHERIC CORR")
        if self.iono_gal is not None:
            g = "".join(f"{v:12.4E}" for v in self.iono_gal)
            lines.append(f"GAL  {g}{'':19}IONOSPHERIC CORR")
        if self.utc_gps is not None:
            a0, a1, t0t, wn = self.utc_gps
            lines.append(
                f"GPUT {a0:17.10E}{a1:16.9E}{int(t0t):7d}{int(wn):5d}"
                f"{'':10}TIME SYSTEM CORR")
        lines.append(f"{'':60}END OF HEADER")
        with open(self.path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
            for rec in self.records:
                fh.write(rec + "\n")
        return self.path


def _parse_d19(field: str) -> float:
    return float(field.replace("D", "E").replace("d", "E") or 0.0)


def read_rinex_nav(path) -> dict[tuple[str, int], object]:
    """Parse a RINEX 3.02 navigation file back into ephemeris
    containers — the ingest half of the printer (rinex2assist's
    Rinex3NavStream role, /root/reference/src/utils/rinex2assist/
    main.cc): GPS/Galileo/BeiDou Kepler records -> :class:`GpsEphemeris`,
    GLONASS state vectors -> :class:`GlonassEphemeris`. Returns
    ``{(system letter, prn): ephemeris}``."""
    out: dict[tuple[str, int], object] = {}
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines) and lines[i][60:80].strip() != "END OF HEADER":
        i += 1
    i += 1

    def fields(ln: str):
        vals = []
        for k in range(4):
            f = ln[4 + 19 * k: 4 + 19 * (k + 1)].strip()
            vals.append(_parse_d19(f) if f else 0.0)
        return vals

    while i < len(lines):
        ln = lines[i]
        if len(ln) < 4 or ln[0] not in "GERC" or not ln[1:3].strip().isdigit():
            i += 1
            continue
        sysc = ln[0]
        prn = int(ln[1:3])
        head = ln[23:].rstrip()
        af = [_parse_d19(head[19 * k: 19 * (k + 1)]) for k in range(3)]
        ymd = ln[4:23].split()
        rows = []
        n_rows = 3 if sysc == "R" else 7
        for r in range(n_rows):
            i += 1
            rows.append(fields(lines[i]))
        if sysc == "R":
            eph = GlonassEphemeris(
                slot=prn, freq_slot=int(rows[1][3]),
                tb_s=af[2],
                pos_m=(rows[0][0] * 1e3, rows[1][0] * 1e3,
                       rows[2][0] * 1e3),
                vel_m_s=(rows[0][1] * 1e3, rows[1][1] * 1e3,
                         rows[2][1] * 1e3),
                acc_m_s2=(rows[0][2] * 1e3, rows[1][2] * 1e3,
                          rows[2][2] * 1e3),
                gamma_n=af[1], tau_n_s=-af[0])
        else:
            week_raw = int(rows[4][2])
            week = week_raw - {"G": 2048, "E": 1024, "C": 0}.get(sysc, 0)
            y, mo, d, h, mi, s = (int(v) for v in ymd[:6])
            # toc from the epoch line: seconds into the GPS week
            jd_a = (14 - mo) // 12
            yy = y + 4800 - jd_a
            mm = mo + 12 * jd_a - 3
            jdn = d + (153 * mm + 2) // 5 + 365 * yy + yy // 4 \
                - yy // 100 + yy // 400 - 32045
            days = jdn - 2_444_245
            toc = (days % 7) * 86400.0 + h * 3600.0 + mi * 60.0 + s
            eph = GpsEphemeris(
                prn=prn, week_number=week,
                toc_s=toc, af0=af[0], af1=af[1], af2=af[2],
                iode=int(rows[0][0]), crs_m=rows[0][1],
                delta_n_rad_s=rows[0][2], m0_rad=rows[0][3],
                cuc_rad=rows[1][0], ecc=rows[1][1], cus_rad=rows[1][2],
                sqrt_a=rows[1][3],
                toe_s=rows[2][0], cic_rad=rows[2][1],
                omega0_rad=rows[2][2], cis_rad=rows[2][3],
                i0_rad=rows[3][0], crc_m=rows[3][1],
                omega_rad=rows[3][2], omega_dot_rad_s=rows[3][3],
                idot_rad_s=rows[4][0],
                sv_health=int(rows[5][1]), tgd_s=rows[5][2],
                iodc=int(rows[5][3]) if sysc == "G" else 0)
        out[(sysc, prn)] = eph
        i += 1
    return out


class Rinex2NavWriter:
    """GPS navigation file in RINEX 2.11 (the reference's
    rinex_printer.cc version-2 catalogue: Rinex_Printer with
    ``rinex_version=2``). One system per file, D19.12 fields, ION
    ALPHA/BETA + DELTA-UTC header records."""

    def __init__(self, path):
        self.path = str(path)
        self.records: list[str] = []
        self.iono: tuple | None = None
        self.utc: tuple | None = None

    def set_gps_iono(self, alpha, beta) -> None:
        self.iono = (tuple(alpha), tuple(beta))

    def set_gps_utc(self, a0, a1, t0t, wn_t) -> None:
        self.utc = (a0, a1, int(t0t), int(wn_t))

    def add_ephemeris(self, eph: GpsEphemeris) -> None:
        dt = gps_time_to_datetime(eph.week_number + 2048, eph.toc_s)
        head = (f"{eph.prn:2d} {dt:%y %m %d %H %M} {dt.second:4.1f}"
                + _e19(eph.af0) + _e19(eph.af1) + _e19(eph.af2))
        rows = [
            (float(eph.iode), eph.crs_m, eph.delta_n_rad_s, eph.m0_rad),
            (eph.cuc_rad, eph.ecc, eph.cus_rad, eph.sqrt_a),
            (eph.toe_s, eph.cic_rad, eph.omega0_rad, eph.cis_rad),
            (eph.i0_rad, eph.crc_m, eph.omega_rad, eph.omega_dot_rad_s),
            (eph.idot_rad_s, 0.0, float(eph.week_number), 0.0),
            (2.0, float(eph.sv_health), eph.tgd_s, float(eph.iodc)),
            (eph.toe_s, 0.0, 0.0, 0.0),
        ]
        lines = [head] + ["   " + "".join(_e19(v) for v in row)
                          for row in rows]
        self.records.append("\n".join(lines))

    def close(self) -> str:
        now = datetime.datetime.now(datetime.timezone.utc)
        lines = [
            f"{'2.11':>9}{'':11}{'N: GPS NAV DATA':<20}{'':20}"
            "RINEX VERSION / TYPE",
            f"{'GNSS-SDR-TPU':<20}{'':20}{now:%Y%m%d %H%M%S} UTC "
            "PGM / RUN BY / DATE",
        ]
        if self.iono is not None:
            alpha, beta = self.iono
            a = "".join(f"{v:12.4E}" for v in alpha)
            b = "".join(f"{v:12.4E}" for v in beta)
            lines.append(f"  {a:<58}ION ALPHA")
            lines.append(f"  {b:<58}ION BETA")
        if self.utc is not None:
            a0, a1, t0t, wn = self.utc
            body = f"   {a0:19.12E}{a1:19.12E}{t0t:9d}{wn:9d}"
            lines.append(f"{body:<60}DELTA-UTC: A0,A1,T,W")
        lines.append(f"{'':60}END OF HEADER")
        with open(self.path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
            for rec in self.records:
                fh.write(rec + "\n")
        return self.path


class Rinex2ObsWriter:
    """GPS observation file in RINEX 2.11 ('# / TYPES OF OBSERV' header,
    epoch satellite lists, C1/L1/D1/S1 columns)."""

    OBS_TYPES = ("C1", "L1", "D1", "S1")

    def __init__(self, path, approx_pos=(0.0, 0.0, 0.0)):
        self.path = str(path)
        self.approx_pos = approx_pos
        self.epochs: list[str] = []

    def add_epoch(self, week: int, tow_s: float, rows) -> None:
        rows = sorted(rows, key=lambda r: r["prn"])
        dt = gps_time_to_datetime(week + 2048, tow_s)
        frac = tow_s - math.floor(tow_s)
        sats = "".join(f"G{r['prn']:02d}" for r in rows)
        lines = [
            f" {dt:%y %m %d %H %M} {dt.second:2d}.{int(frac*1e7):07d}"
            f"  0{len(rows):3d}{sats}"
        ]
        for r in rows:
            lines.append(
                f"{r['pseudorange_m']:14.3f}  "
                f"{r['carrier_phase_cycles']:14.3f}  "
                f"{r['doppler_hz']:14.3f}  "
                f"{r['cn0_db_hz']:14.3f}  ")
        self.epochs.append("\n".join(lines))

    def close(self) -> str:
        now = datetime.datetime.now(datetime.timezone.utc)
        x, y, z = self.approx_pos
        types = "".join(f"{t:>6}" for t in self.OBS_TYPES)
        lines = [
            f"{'2.11':>9}{'':11}{'OBSERVATION DATA':<20}{'G (GPS)':<20}"
            "RINEX VERSION / TYPE",
            f"{'GNSS-SDR-TPU':<20}{'':20}{now:%Y%m%d %H%M%S} UTC "
            "PGM / RUN BY / DATE",
            f"{x:14.4f}{y:14.4f}{z:14.4f}{'':18}APPROX POSITION XYZ",
            f"{len(self.OBS_TYPES):6d}{types:<54}# / TYPES OF OBSERV",
            f"{'':60}END OF HEADER",
        ]
        with open(self.path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
            for rec in self.epochs:
                fh.write(rec + "\n")
        return self.path


class RinexObsWriter:
    """Multi-GNSS observation file (RINEX 3.02 'O').

    ``bands``: receiver signal suffixes whose observables this file
    carries (one C/L/D/S quartet per band per system in SYS / # / OBS
    TYPES — the rinex_printer obs-header machinery); rows tag their
    band via 'band' (default "1C"), and one line per satellite merges
    every configured band's columns."""

    def __init__(self, path, approx_pos=(0.0, 0.0, 0.0),
                 bands=("1C",)):
        self.path = str(path)
        self.approx_pos = approx_pos
        self.epochs: list[str] = []
        self.systems: set[str] = set()
        #: system -> [band suffix, ...] in header/column order
        self.sys_bands: dict[str, list[str]] = {}
        for sx in bands:
            sysc, _code = BAND_OBS_CODES[sx]
            self.sys_bands.setdefault(sysc, []).append(sx)

    def _column(self, sysc: str, band: str) -> int:
        return self.sys_bands[sysc].index(band)

    def add_epoch(self, week: int, tow_s: float, rows) -> None:
        """rows: iterable of dicts with prn, pseudorange_m,
        carrier_phase_cycles, doppler_hz, cn0_db_hz, optional 'system'
        (default "G") and optional 'band' suffix (default "1C")."""
        dt = gps_time_to_datetime(week + 2048, tow_s)
        frac = tow_s - math.floor(tow_s)
        merged: dict[tuple[str, int], dict[str, dict]] = {}
        default_band = {"G": "1C", "E": "1B", "R": "1G", "C": "B1",
                        "S": "S1"}
        for r in rows:
            sysc = r.get("system", "G")
            self.systems.add(sysc)
            band = r.get("band") or self.sys_bands.get(
                sysc, [default_band.get(sysc, "1C")])[0]
            if sysc not in self.sys_bands:
                self.sys_bands[sysc] = [band]
            elif band not in self.sys_bands[sysc]:
                self.sys_bands[sysc].append(band)
            merged.setdefault((sysc, r["prn"]), {})[band] = r
        lines = [
            f"> {dt:%Y %m %d %H %M} {dt:%S}.{int(frac*1e7):07d}  0"
            f"{len(merged):3d}"
        ]
        blank = " " * 16
        for (sysc, prn) in sorted(merged):
            per_band = merged[(sysc, prn)]
            fields = []
            for band in self.sys_bands[sysc]:
                r = per_band.get(band)
                if r is None:
                    fields.append(blank * 4)
                else:
                    fields.append(
                        f"{r['pseudorange_m']:14.3f}  "
                        f"{r['carrier_phase_cycles']:14.3f}  "
                        f"{r['doppler_hz']:14.3f}  "
                        f"{r['cn0_db_hz']:14.3f}  ")
            lines.append(f"{sysc}{prn:02d}" + "".join(fields).rstrip())
        self.epochs.append("\n".join(lines))

    def close(self) -> str:
        now = datetime.datetime.now(datetime.timezone.utc)
        x, y, z = self.approx_pos
        systems = sorted(self.systems) or ["G"]
        sys_field = ({"G": "G: GPS", "E": "E: GALILEO", "R": "R: GLONASS",
                      "C": "C: BEIDOU"}[systems[0]]
                     if len(systems) == 1 else "M: MIXED")
        lines = [
            f"{'3.02':>9}{'':11}{'OBSERVATION DATA':<20}{sys_field:<20}"
            "RINEX VERSION / TYPE",
            f"{'GNSS-SDR-TPU':<20}{'':20}{now:%Y%m%d %H%M%S} UTC "
            "PGM / RUN BY / DATE",
            f"{x:14.4f}{y:14.4f}{z:14.4f}{'':18}APPROX POSITION XYZ",
        ]
        for sysc in systems:
            codes = []
            for band in self.sys_bands.get(sysc, ["1C"]):
                _sys, code = BAND_OBS_CODES.get(band, (sysc, "1C"))
                codes.extend(
                    (f"C{code}", f"L{code}", f"D{code}", f"S{code}"))
            # SYS / # / OBS TYPES continuation lines carry 13 codes max
            first = True
            while codes:
                chunk, codes = codes[:13], codes[13:]
                if first:
                    body = f"{sysc}  {len(chunk) + len(codes):3d} " \
                        + " ".join(chunk)
                    first = False
                else:
                    body = "       " + " ".join(chunk)
                lines.append(f"{body:<60}SYS / # / OBS TYPES")
        lines.append(f"{'':60}END OF HEADER")
        with open(self.path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
            for rec in self.epochs:
                fh.write(rec + "\n")
        return self.path
