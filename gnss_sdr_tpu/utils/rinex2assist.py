"""rinex2assist: convert navigation RINEX files into Assisted-GNSS XML.

Counterpart of the reference utility
(/root/reference/src/utils/rinex2assist/main.cc): reads a RINEX 3
navigation file, extracts the GPS ephemerides and writes the assistance
XML the receiver loads at startup
(``GNSS-SDR.AGNSS_gps_ephemeris_xml``).

Usage: ``python -m gnss_sdr_tpu.utils.rinex2assist <nav.rnx>
[gps_ephemeris.xml]``
"""

from __future__ import annotations

import sys


def convert(nav_path: str, xml_path: str | None = None) -> tuple[str, int]:
    from gnss_sdr_tpu.monitor.rinex import read_rinex_nav
    from gnss_sdr_tpu.receiver.assistance import save_ephemeris_xml

    ephs = read_rinex_nav(nav_path)
    gps = {prn: eph for (sysc, prn), eph in ephs.items() if sysc == "G"}
    out = xml_path or "gps_ephemeris.xml"
    save_ephemeris_xml(gps, out)
    return out, len(gps)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: rinex2assist <nav.rnx> [gps_ephemeris.xml]",
              file=sys.stderr)
        return 2
    out, n = convert(argv[0], argv[1] if len(argv) > 1 else None)
    print(f"Generated file {out} with {n} GPS ephemerides")
    return 0


if __name__ == "__main__":
    sys.exit(main())
