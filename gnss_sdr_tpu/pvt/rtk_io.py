"""RTK base-station observables ingest.

The reference's rover gets its base data as an RTCM stream or RINEX
file into rtkpos (rtklib_pvt_gs base-station plumbing); here the
"configure and run" path: ``PVT.rtk_base_obs_file`` names a RINEX
observation file recorded by the base receiver (ours writes one with
``PVT.rinex_output_enabled``/``PVT.log_base_obs``), and this module
converts it to the ``{rx_tow_ms: {prn: (pseudorange_m,
carrier_cycles)}}`` store the DD engine consumes
(:meth:`MultiBandReceiver.set_rtk_base`).
"""

from __future__ import annotations


def _epoch_str_to_tow_ms(stamp: str) -> float:
    """RINEX 3 epoch field ('YYYY MM DD HH MM SS.sssssss') -> GPS
    time-of-week in milliseconds (inverse of
    monitor.rinex.gps_time_to_datetime)."""
    parts = stamp.split()
    y, mo, d, h, mi = (int(v) for v in parts[:5])
    s = float(parts[5])
    a = (14 - mo) // 12
    yy = y + 4800 - a
    mm = mo + 12 * a - 3
    jdn = d + (153 * mm + 2) // 5 + 365 * yy + yy // 4 - yy // 100 \
        + yy // 400 - 32045
    days = jdn - 2_444_245          # days since the GPS epoch Sunday
    return ((days % 7) * 86400.0 + h * 3600.0 + mi * 60.0 + s) * 1e3


def base_obs_from_rinex(path) -> dict[float, dict[int, tuple]]:
    """Parse a base receiver's RINEX obs file into the RTK base store.

    GPS (system G) L1-band code+carrier columns are used — the DD
    engine is single-frequency single-baseline (pvt/rtk.py). Keys are
    rounded to 0.1 ms so rover epochs match through the text format's
    1e-7 s timestamp precision."""
    from gnss_sdr_tpu.utils.obsdiff import parse_rinex_obs

    parsed = parse_rinex_obs(str(path))
    out: dict[float, dict[int, tuple]] = {}
    for stamp, sats in parsed["epochs"]:
        tow_ms = round(_epoch_str_to_tow_ms(stamp), 1)
        rec: dict[int, tuple] = {}
        for sat, vals in sats.items():
            if sat[0] != "G":
                continue
            pr = vals.get("C1C")
            cp = vals.get("L1C")
            if pr is None or cp is None:
                continue
            rec[int(sat[1:3])] = (pr, cp)
        if rec:
            out[tow_ms] = rec
    return out
