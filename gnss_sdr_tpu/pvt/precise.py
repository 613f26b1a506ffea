"""Precise ephemeris/clock products: SP3 reader + polynomial evaluation.

Counterpart of the reference's precise-products layer
(/root/reference/src/algorithms/libs/rtklib/rtklib_preceph.cc:1-1006):
``readsp3`` parses SP3-c position/clock files, ``peph2pos`` evaluates a
satellite position by NMAX-point polynomial interpolation over the
15-minute epoch grid and the clock by linear interpolation between
samples. :class:`PreciseEphemeris` exposes the same ``sat_pos`` /
``sat_vel`` / ``clock_bias_s`` protocol as the broadcast Kepler
containers, so the single-point/RTK solvers accept precise products as a
drop-in ephemeris source — the honest first step toward the PPP role.
"""

from __future__ import annotations

import dataclasses

import numpy as np

#: polynomial interpolation order (rtklib_preceph.cc NMAX = 10)
NMAX = 10
_BAD_CLOCK = 999999.999999


def parse_sp3(text: str) -> dict[tuple[str, int], "PreciseEphemeris"]:
    """Parse SP3-c content into per-satellite precise ephemerides.

    Epoch times are taken as seconds of week from the first epoch's
    day-of-week (the caller aligns the week to its receiver time base).
    Positions arrive in km, clocks in microseconds
    (rtklib_preceph.cc readsp3b field layout).
    """
    recs: dict[tuple[str, int], list[tuple[float, float, float, float,
                                           float]]] = {}
    t = None
    for line in text.splitlines():
        if line.startswith("*"):
            f = line.split()
            # *  2024  1  7  0 15  0.00000000
            y, mo, d, h, mi = (int(f[1]), int(f[2]), int(f[3]),
                               int(f[4]), int(f[5]))
            sec = float(f[6])
            # day-of-week via a Zeller-style weekday (0 = Sunday, the
            # GPS week origin)
            a = (14 - mo) // 12
            yy = y + 4800 - a
            mm = mo + 12 * a - 3
            jdn = d + (153 * mm + 2) // 5 + 365 * yy + yy // 4 \
                - yy // 100 + yy // 400 - 32045
            dow = (jdn + 1) % 7
            t = dow * 86400.0 + h * 3600.0 + mi * 60.0 + sec
        elif line.startswith("P") and t is not None:
            sys_c = line[1]
            try:
                prn = int(line[2:4])
                x = float(line[4:18])
                y_ = float(line[18:32])
                z = float(line[32:46])
                clk = float(line[46:60])
            except ValueError:
                continue
            recs.setdefault((sys_c, prn), []).append(
                (t, x * 1e3, y_ * 1e3, z * 1e3,
                 np.nan if clk >= _BAD_CLOCK else clk * 1e-6))
    out = {}
    for key, rows in recs.items():
        rows.sort()
        arr = np.asarray(rows, dtype=np.float64)
        out[key] = PreciseEphemeris(
            prn=key[1], system=key[0], times=arr[:, 0],
            pos_m=arr[:, 1:4], clock_s=arr[:, 4])
    return out


def read_sp3(path: str) -> dict[tuple[str, int], "PreciseEphemeris"]:
    with open(path) as fh:
        return parse_sp3(fh.read())


def _neville(ts: np.ndarray, ys: np.ndarray, t: float) -> float:
    """Neville polynomial interpolation (rtklib interppol)."""
    y = ys.astype(np.float64).copy()
    n = len(ts)
    for j in range(1, n):
        for i in range(n - j):
            y[i] = ((t - ts[i + j]) * y[i] - (t - ts[i]) * y[i + 1]) \
                / (ts[i] - ts[i + j])
    return float(y[0])


@dataclasses.dataclass
class PreciseEphemeris:
    """Satellite precise orbit/clock sampled on an epoch grid."""

    prn: int
    system: str
    times: np.ndarray      # [N] seconds of week
    pos_m: np.ndarray      # [N, 3] ECEF meters
    clock_s: np.ndarray    # [N] seconds (NaN where absent)
    tgd_s: float = 0.0

    def _window(self, t_sv: float) -> slice:
        n = len(self.times)
        k = int(np.searchsorted(self.times, t_sv))
        lo = max(0, min(k - NMAX // 2, n - NMAX))
        return slice(lo, min(lo + NMAX, n))

    def sat_pos(self, t_sv: float) -> tuple[float, float, float]:
        """NMAX-point polynomial interpolation of the orbit
        (rtklib_preceph.cc pephpos)."""
        w = self._window(t_sv)
        ts = self.times[w]
        return tuple(_neville(ts, self.pos_m[w, i], t_sv)
                     for i in range(3))

    def sat_vel(self, t_sv: float, dt: float = 1e-3):
        p0 = np.asarray(self.sat_pos(t_sv - dt))
        p1 = np.asarray(self.sat_pos(t_sv + dt))
        return tuple((p1 - p0) / (2.0 * dt))

    def clock_bias_s(self, t_sv: float) -> float:
        """Linear interpolation between the two bracketing clock samples
        plus the periodic relativistic correction -2 r.v/c^2 — precise
        clock products exclude it by convention and the evaluator
        re-applies it (rtklib_preceph.cc pephpos/pephclk)."""
        good = ~np.isnan(self.clock_s)
        ts = self.times[good]
        cs = self.clock_s[good]
        if len(ts) == 0:
            return 0.0
        if t_sv <= ts[0]:
            base = float(cs[0])
        elif t_sv >= ts[-1]:
            base = float(cs[-1])
        else:
            k = int(np.searchsorted(ts, t_sv))
            f = (t_sv - ts[k - 1]) / (ts[k] - ts[k - 1])
            base = float(cs[k - 1] + f * (cs[k] - cs[k - 1]))
        r = np.asarray(self.sat_pos(t_sv))
        v = np.asarray(self.sat_vel(t_sv))
        return base - 2.0 * float(r @ v) / (299_792_458.0 ** 2)


def sp3_from_ephemerides(ephs: dict, t0_s: float, duration_s: float,
                         step_s: float = 900.0) -> str:
    """Synthesize SP3-c content by sampling Kepler ephemerides — the
    test/simulation source (the inverse of :func:`parse_sp3`)."""
    times = np.arange(t0_s, t0_s + duration_s + step_s / 2, step_s)
    lines = ["#cP2024  1  7  0  0  0.00000000      "
             f"{len(times)} ORBIT IGS20 HLM  IGS"]
    dow = int(t0_s // 86400)
    for t in times:
        sod = t - dow * 86400.0
        h = int(sod // 3600)
        mi = int((sod % 3600) // 60)
        sec = sod % 60
        lines.append(f"*  2024  1  {7 + dow:2d} {h:2d} {mi:2d} "
                     f"{sec:11.8f}")
        for prn, eph in sorted(ephs.items()):
            x, y, z = eph.sat_pos(t)
            vx, vy, vz = eph.sat_vel(t)
            # product convention: clocks EXCLUDE the periodic
            # relativistic term (the evaluator re-applies -2 r.v/c^2)
            rel = -2.0 * (x * vx + y * vy + z * vz) / (299_792_458.0 ** 2)
            clk = eph.clock_bias_s(t) - rel
            lines.append(
                f"PG{prn:02d}{x / 1e3:14.6f}{y / 1e3:14.6f}"
                f"{z / 1e3:14.6f}{clk * 1e6:14.6f}")
    lines.append("EOF")
    return "\n".join(lines) + "\n"
