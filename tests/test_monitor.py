"""Output/monitoring layer tests: NMEA checksums, track writers, dumps,
UDP monitor round trip."""

import json
import math
import socket

import numpy as np

from gnss_sdr_tpu.monitor import (
    GeoJsonWriter,
    GpxWriter,
    KmlWriter,
    TrackingDump,
    UdpMonitor,
    nmea_gga,
    nmea_rmc,
)
from gnss_sdr_tpu.tracking.channels import PeriodOutput


def _fake_period(prn=7, ch=0):
    return PeriodOutput(
        channel=ch, prn=prn, sample_start=123456, length=4000,
        rem_code_phase_samples=0.25, prompt=complex(4000.0, -30.0),
        corr=np.array([2800 + 10j, 4000 - 30j, 2790 - 5j]),
        carrier_doppler_hz=1234.5, code_freq_chips=1023001.2,
        acc_carrier_phase_rad=-9876.5, cn0_db_hz=44.5,
        carrier_lock_test=0.93, evm=0.21, loss_of_lock=False,
    )


def test_nmea_checksum_and_format():
    s = nmea_gga(math.radians(41.275), math.radians(1.9876), 80.0, 7, 1.2)
    assert s.startswith("$GPGGA,") and s.endswith("\r\n")
    body, csum = s[1:].rsplit("*", 1)
    calc = 0
    for ch in body:
        calc ^= ord(ch)
    assert int(csum.strip(), 16) == calc
    assert ",N," in s and ",E," in s
    r = nmea_rmc(math.radians(-33.9), math.radians(-70.1), 5.0, 90.0)
    assert ",S," in r and ",W," in r


def test_track_writers(tmp_path):
    fixes = [(math.radians(41.0 + i * 1e-5), math.radians(2.0), 50.0 + i)
             for i in range(3)]
    for cls, name in ((KmlWriter, "t.kml"), (GpxWriter, "t.gpx"),
                      (GeoJsonWriter, "t.geojson")):
        w = cls(tmp_path / name)
        for lat, lon, h in fixes:
            w.add_fix(lat, lon, h)
        path = w.close()
        text = open(path).read()
        assert "41.0" in text
    gj = json.loads(open(tmp_path / "t.geojson").read())
    assert gj["geometry"]["type"] == "LineString"
    assert len(gj["geometry"]["coordinates"]) == 3


def test_tracking_dump(tmp_path):
    dump = TrackingDump()
    for _ in range(5):
        dump.append(_fake_period())
    arrays = dump.arrays()
    assert arrays["Prompt_I"].shape == (5,)
    assert arrays["abs_P"][0] > 0
    dump.save_npz(tmp_path / "trk.npz")
    dump.save_mat(tmp_path / "trk.mat")
    loaded = np.load(tmp_path / "trk.npz")
    assert loaded["CN0_SNV_dB_Hz"][0] == 44.5
    from scipy import io as sp_io

    mat = sp_io.loadmat(tmp_path / "trk.mat")
    assert mat["carrier_doppler_hz"].flatten()[0] == np.float64(1234.5)


def test_udp_monitor_json_roundtrip():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    mon = UdpMonitor("127.0.0.1", port, wire="json")
    mon.send_observables([_fake_period()])
    data, _ = rx.recvfrom(65536)
    rows = json.loads(data)
    assert rows[0]["PRN"] == 7 and rows[0]["CN0_dB_hz"] == 44.5
    mon.close()
    rx.close()


def test_udp_monitor_protobuf_roundtrip():
    """Default wire format is the reference's protobuf schema
    (docs/protobuf/gnss_synchro.proto field numbering)."""
    from gnss_sdr_tpu.monitor.udp_monitor import (
        decode_observables, decode_monitor_pvt, decode_nav_message)

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    mon = UdpMonitor("127.0.0.1", port)
    assert mon.wire == "protobuf"
    mon.send_observables([_fake_period()])
    data, _ = rx.recvfrom(65536)
    obs = decode_observables(data)
    assert obs[0].prn == 7
    assert obs[0].cn0_db_hz == 44.5
    assert obs[0].flag_valid_symbol_output

    # full GnssSynchro dataclass path
    from gnss_sdr_tpu.core_types import GnssSynchro
    s = GnssSynchro(system="G", signal="1C", prn=12, channel_id=3,
                    cn0_db_hz=39.25, pseudorange_m=22_222_333.4,
                    flag_valid_pseudorange=True, evm=0.07)
    mon.send_observables([s])
    data, _ = rx.recvfrom(65536)
    obs = decode_observables(data)
    assert obs[0].system == "G" and obs[0].prn == 12
    assert obs[0].pseudorange_m == 22_222_333.4
    assert obs[0].flag_valid_pseudorange
    assert obs[0].evm == 0.07

    # PVT message
    class Sol:
        rx_time_s = 345678.9
        clock_bias_s = 1.2e-6
        pos_ecef = (1.0e6, 2.0e6, 3.0e6)
        vel_ecef = (1.0, -2.0, 3.0)
        lat_rad = 0.72
        lon_rad = 0.02
        height_m = 120.5
        n_sats = 9
        gdop, pdop, hdop, vdop = 2.1, 1.8, 1.0, 1.5
    mon.send_pvt(Sol())
    data, _ = rx.recvfrom(65536)
    pvt = decode_monitor_pvt(data)
    assert pvt.valid_sats == 9
    np.testing.assert_allclose(pvt.latitude, np.degrees(0.72))
    np.testing.assert_allclose(pvt.pos_x, 1.0e6)

    # nav message
    mon.send_nav_message(system="G", signal="1C", prn=5, tow_ms=123000,
                         bits="10" * 150)
    data, _ = rx.recvfrom(65536)
    nav = decode_nav_message(data)
    assert nav.prn == 5 and nav.nav_message == "10" * 150
    mon.close()
    rx.close()


def test_udp_ephemeris_sink_roundtrip():
    """Monitor_Ephemeris_Udp_Sink counterpart: 'G'/'E'-tagged protobuf
    ephemeris datagrams (monitor_ephemeris_udp_sink.cc:42-96,
    docs/protobuf/{gps,galileo}_ephemeris.proto field numbering)."""
    from gnss_sdr_tpu.monitor.udp_monitor import decode_ephemeris
    from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    mon = UdpMonitor("127.0.0.1", port)

    eph = GpsEphemeris(prn=17, week_number=2260, iodc=44, iode=44,
                       toc_s=345600.0, af0=4.2e-5, af1=-1.1e-11,
                       tgd_s=5.6e-9, toe_s=345600.0, sqrt_a=5153.71,
                       ecc=0.0123, m0_rad=0.5, omega0_rad=-1.2,
                       i0_rad=0.96, omega_rad=2.2,
                       omega_dot_rad_s=-8.1e-9, sv_health=0)
    mon.send_gps_ephemeris(eph)
    data, _ = rx.recvfrom(65536)
    assert data[:1] == b"G"
    m = decode_ephemeris(data)
    assert m.PRN == 17 and m.WN == 2260 and m.IODC == 44
    np.testing.assert_allclose(m.sqrtA, 5153.71)
    np.testing.assert_allclose(m.TGD, 5.6e-9)
    np.testing.assert_allclose(m.M_0, 0.5)
    assert m.toe == 345600

    # Galileo path: INAV assembler stores BGD(E1,E5b) in tgd_s
    eph.prn = 11
    eph.tgd_s = -2.3e-9
    mon.send_galileo_ephemeris(eph, bgd_e1e5a=-1.0e-9)
    data, _ = rx.recvfrom(65536)
    assert data[:1] == b"E"
    g = decode_ephemeris(data)
    assert g.PRN == 11 and g.IOD_ephemeris == 44
    np.testing.assert_allclose(g.BGD_E1E5b, -2.3e-9)
    np.testing.assert_allclose(g.BGD_E1E5a, -1.0e-9)
    mon.close()
    rx.close()
