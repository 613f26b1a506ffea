"""RINEX 3.02 writers (observation + GPS navigation), compact subset.

Counterpart of the reference's RINEX printer
(/root/reference/src/algorithms/PVT/libs/rinex_printer.cc — 13.5k LoC
covering every constellation/version; here: RINEX 3.02, GPS L1 C/A
observables C1C/L1C/D1C/S1C and GPS LNAV ephemeris records, the subset
the round-1 receiver produces).

GPS time note: epochs are written from (week, TOW); the civil date uses
the GPS epoch 1980-01-06 without leap-second handling (raw GPS time, as
RINEX nav records expect).
"""

from __future__ import annotations

import datetime
import math

from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris

GPS_EPOCH = datetime.datetime(1980, 1, 6, tzinfo=datetime.timezone.utc)


def gps_time_to_datetime(week: int, tow_s: float) -> datetime.datetime:
    return GPS_EPOCH + datetime.timedelta(weeks=week, seconds=tow_s)


def _e19(value: float) -> str:
    """19-char RINEX float field."""
    s = f"{value: .12E}"  # ' 1.234567890123E+05'
    mant, exp = s.split("E")
    return f"{mant}D{int(exp):+03d}".rjust(19)


class RinexNavWriter:
    """GPS navigation message file (RINEX 3.02 'N')."""

    def __init__(self, path):
        self.path = str(path)
        self.records: list[str] = []

    def add_ephemeris(self, eph: GpsEphemeris) -> None:
        dt = gps_time_to_datetime(eph.week_number + 2048, eph.toc_s)
        lines = []
        lines.append(
            f"G{eph.prn:02d} {dt:%Y %m %d %H %M %S}"
            + _e19(eph.af0) + _e19(eph.af1) + _e19(eph.af2))
        rows = [
            (eph.iode, eph.crs_m, eph.delta_n_rad_s, eph.m0_rad),
            (eph.cuc_rad, eph.ecc, eph.cus_rad, eph.sqrt_a),
            (eph.toe_s, eph.cic_rad, eph.omega0_rad, eph.cis_rad),
            (eph.i0_rad, eph.crc_m, eph.omega_rad, eph.omega_dot_rad_s),
            (eph.idot_rad_s, 1.0, float(eph.week_number + 2048), 0.0),
            (2.0, float(eph.sv_health), eph.tgd_s, float(eph.iodc)),
            (eph.toe_s, 4.0, 0.0, 0.0),
        ]
        for row in rows:
            lines.append("    " + "".join(_e19(v) for v in row))
        self.records.append("\n".join(lines))

    def close(self) -> str:
        now = datetime.datetime.now(datetime.timezone.utc)
        header = (
            f"{'3.02':>9}{'':11}{'N: GNSS NAV DATA':<20}{'G: GPS':<20}"
            "RINEX VERSION / TYPE\n"
            f"{'GNSS-SDR-TPU':<20}{'':20}{now:%Y%m%d %H%M%S} UTC "
            "PGM / RUN BY / DATE\n"
            f"{'':60}END OF HEADER\n"
        )
        with open(self.path, "w") as fh:
            fh.write(header)
            for rec in self.records:
                fh.write(rec + "\n")
        return self.path


class RinexObsWriter:
    """Observation file (RINEX 3.02 'O') with C1C L1C D1C S1C."""

    def __init__(self, path, approx_pos=(0.0, 0.0, 0.0)):
        self.path = str(path)
        self.approx_pos = approx_pos
        self.epochs: list[str] = []

    def add_epoch(self, week: int, tow_s: float, rows) -> None:
        """rows: iterable of dicts with prn, pseudorange_m,
        carrier_phase_cycles, doppler_hz, cn0_db_hz."""
        rows = list(rows)
        dt = gps_time_to_datetime(week + 2048, tow_s)
        frac = tow_s - math.floor(tow_s)
        lines = [
            f"> {dt:%Y %m %d %H %M} {dt:%S}.{int(frac*1e7):07d}  0"
            f"{len(rows):3d}"
        ]
        for r in rows:
            lines.append(
                f"G{r['prn']:02d}"
                f"{r['pseudorange_m']:14.3f}  "
                f"{r['carrier_phase_cycles']:14.3f}  "
                f"{r['doppler_hz']:14.3f}  "
                f"{r['cn0_db_hz']:14.3f}  "
            )
        self.epochs.append("\n".join(lines))

    def close(self) -> str:
        now = datetime.datetime.now(datetime.timezone.utc)
        x, y, z = self.approx_pos
        header = (
            f"{'3.02':>9}{'':11}{'OBSERVATION DATA':<20}{'G: GPS':<20}"
            "RINEX VERSION / TYPE\n"
            f"{'GNSS-SDR-TPU':<20}{'':20}{now:%Y%m%d %H%M%S} UTC "
            "PGM / RUN BY / DATE\n"
            f"{x:14.4f}{y:14.4f}{z:14.4f}{'':18}APPROX POSITION XYZ\n"
            f"G    4 C1C L1C D1C S1C{'':38}SYS / # / OBS TYPES\n"
            f"{'':60}END OF HEADER\n"
        )
        with open(self.path, "w") as fh:
            fh.write(header)
            for rec in self.epochs:
                fh.write(rec + "\n")
        return self.path
