"""RINEX writer tests: structural validity + field roundtrip."""

import re

from gnss_sdr_tpu.monitor.rinex import (
    RinexNavWriter,
    RinexObsWriter,
    gps_time_to_datetime,
)
from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris


def test_gps_time_mapping():
    dt = gps_time_to_datetime(0, 0.0)
    assert dt.year == 1980 and dt.month == 1 and dt.day == 6


def test_nav_writer(tmp_path):
    eph = GpsEphemeris(prn=7, week_number=310, toc_s=7200.0, toe_s=7200.0,
                       af0=-3.2e-4, af1=2.5e-11, sqrt_a=5153.68, ecc=0.0123,
                       m0_rad=-1.234, omega0_rad=2.345, i0_rad=0.958,
                       omega_rad=-2.91, omega_dot_rad_s=-8.1e-9, iode=89,
                       iodc=345, tgd_s=-4.6e-9)
    w = RinexNavWriter(tmp_path / "nav.rnx")
    w.add_ephemeris(eph)
    path = w.close()
    text = open(path).read()
    assert "RINEX VERSION / TYPE" in text and "END OF HEADER" in text
    assert "G07" in text
    # 8 lines per record (1 clock + 7 broadcast orbit lines)
    body = text.split("END OF HEADER\n", 1)[1].strip().split("\n")
    assert len(body) == 8
    # sqrt_a appears in D-exponent notation
    assert re.search(r"5\.15368\d+D\+03", text)


def test_obs_writer(tmp_path):
    w = RinexObsWriter(tmp_path / "obs.rnx", approx_pos=(4797642.0, 166854.0,
                                                         4185504.0))
    rows = [
        dict(prn=7, pseudorange_m=21234567.123, carrier_phase_cycles=-1234.5,
             doppler_hz=1680.0, cn0_db_hz=45.0),
        dict(prn=13, pseudorange_m=23456789.456, carrier_phase_cycles=987.0,
             doppler_hz=-2345.0, cn0_db_hz=41.5),
    ]
    w.add_epoch(310, 7200.0, rows)
    w.add_epoch(310, 7200.02, rows)
    path = w.close()
    text = open(path).read()
    assert "OBSERVATION DATA" in text
    assert "SYS / # / OBS TYPES" in text
    assert text.count("> ") == 2
    assert "G07" in text and "G13" in text
    assert "21234567.123" in text
