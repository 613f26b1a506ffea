"""Dual-frequency observables: the ionosphere-free combination.

The reference reaches dual-frequency processing through its RTKLIB port
(rtklib_pntpos.cc prange() IF combination, ionoopt == IONOOPT_IFLC and
the PPP chain in rtklib_ppp.cc). Here the combination is a small pure
function the multi-band receiver applies to same-satellite rows from two
bands (e.g. GPS L1 C/A + L5, Galileo E1 + E5a):

    P_IF = (f1^2 P1 - f2^2 P2) / (f1^2 - f2^2)

which cancels the first-order ionospheric delay (~1/f^2) and leaves the
geometric range + clocks. First-order only — exactly what the reference's
IFLC does.
"""

from __future__ import annotations

from gnss_sdr_tpu.pvt.solver import Observation


def iono_free_pseudorange(pr1_m: float, f1_hz: float,
                          pr2_m: float, f2_hz: float) -> float:
    g1 = f1_hz * f1_hz
    g2 = f2_hz * f2_hz
    return (g1 * pr1_m - g2 * pr2_m) / (g1 - g2)


def combine_dual_freq(obs: list[Observation]) -> list[Observation]:
    """Collapse same-(system, prn) pairs on different carriers into one
    iono-free observation; unpaired rows pass through unchanged.

    Doppler/carrier metadata follow the higher-frequency (primary) row —
    the velocity solution stays single-frequency, like the reference's
    single-point path.
    """
    by_sat: dict[tuple[str, int], list[Observation]] = {}
    for o in obs:
        by_sat.setdefault((o.system, o.prn), []).append(o)
    out: list[Observation] = []
    for rows in by_sat.values():
        if len(rows) < 2:
            out.extend(rows)
            continue
        rows = sorted(rows, key=lambda o: -o.carrier_hz)
        a, b = rows[0], rows[1]
        if abs(a.carrier_hz - b.carrier_hz) < 1.0:
            out.extend(rows)      # same band twice: nothing to combine
            continue
        pr = iono_free_pseudorange(a.pseudorange_m, a.carrier_hz,
                                   b.pseudorange_m, b.carrier_hz)
        out.append(Observation(
            prn=a.prn, pseudorange_m=pr, eph=a.eph,
            doppler_hz=a.doppler_hz, carrier_hz=a.carrier_hz,
            cn0_db_hz=min(a.cn0_db_hz, b.cn0_db_hz), system=a.system))
        out.extend(rows[2:])
    return out
