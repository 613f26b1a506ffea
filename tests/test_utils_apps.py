"""Utility applications (reference src/utils/ + AN packet printer):
rinex2assist, nav-listener, obsdiff, RINEX nav reader, ANPP encoder."""

import pytest
import socket
import threading

import numpy as np

from gnss_sdr_tpu.monitor.rinex import (RinexNavWriter, RinexObsWriter,
                                        read_rinex_nav)
from gnss_sdr_tpu.simulate.scenario import make_constellation


def _free_udp_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_rinex_nav_reader_roundtrip(tmp_path):
    """Writer -> reader roundtrip reproduces satellite positions and
    clocks (the Rinex3NavData ingest role of rinex2assist)."""
    ephs = make_constellation([3, 7, 21], toe_s=7200.0)
    nav = RinexNavWriter(tmp_path / "r.rnx")
    for p, e in ephs.items():
        nav.add_ephemeris(e, "G")
    nav.close()
    back = read_rinex_nav(tmp_path / "r.rnx")
    assert set(back) == {("G", 3), ("G", 7), ("G", 21)}
    for p in (3, 7, 21):
        e0, e1 = ephs[p], back[("G", p)]
        t = 8000.0
        np.testing.assert_allclose(e1.sat_pos(t), e0.sat_pos(t), atol=0.5)
        assert abs(e1.clock_bias_s(t) - e0.clock_bias_s(t)) < 1e-11
        assert e1.week_number == e0.week_number


def test_rinex2assist_conversion(tmp_path):
    from gnss_sdr_tpu.receiver.assistance import load_ephemeris_xml
    from gnss_sdr_tpu.utils.rinex2assist import convert, main

    ephs = make_constellation([5, 9], toe_s=7200.0)
    nav = RinexNavWriter(tmp_path / "nav.rnx")
    for p, e in ephs.items():
        nav.add_ephemeris(e, "G")
    nav.close()
    out, n = convert(str(tmp_path / "nav.rnx"),
                     str(tmp_path / "agnss.xml"))
    assert n == 2
    loaded = load_ephemeris_xml(out)
    np.testing.assert_allclose(loaded[5].sat_pos(8000.0),
                               ephs[5].sat_pos(8000.0), atol=0.5)
    assert main([str(tmp_path / "nav.rnx"),
                 str(tmp_path / "x.xml")]) == 0


def test_nav_listener_prints_udp_messages():
    """UDP monitor -> nav-listener loop: the navMsg datagram decodes and
    renders like nav_msg_udp_listener.cc."""
    import io

    from gnss_sdr_tpu.monitor.udp_monitor import UdpMonitor
    from gnss_sdr_tpu.utils.nav_listener import listen

    port = _free_udp_port()
    out = io.StringIO()
    result = {}

    def run():
        result["n"] = listen(port, out=out, max_messages=2, timeout=5.0)

    th = threading.Thread(target=run)
    th.start()
    mon = UdpMonitor(host="127.0.0.1", port=port)
    import time

    time.sleep(0.3)
    mon.send_nav_message(system="G", signal="1C", prn=17,
                         tow_ms=345600000, bits="10" * 150)
    mon.send_nav_message(system="E", signal="1B", prn=11,
                         tow_ms=345601000, bits="01" * 60)
    th.join(timeout=10.0)
    mon.close()
    assert result.get("n") == 2
    text = out.getvalue()
    assert "New GPS NAV message" in text and "Sat ID: 17" in text
    assert "New Galileo NAV message" in text
    assert "345600000 ms" in text


def test_an_packet_roundtrip_and_integrity():
    from gnss_sdr_tpu.monitor.an_packet import (SdrGnssPacket,
                                                decode_an_packet,
                                                encode_an_packet)

    p = SdrGnssPacket(
        nsvfix=7, gps_satellites=5, galileo_satellites=2,
        microseconds=1234567, latitude_rad=0.7204, longitude_rad=0.0305,
        height_m=123.4, velocity_ned=(0.1, -0.2, 0.05),
        sats=((3, 45, 1234.0), (7, 44, -2345.0), (111, 41, 500.0)),
        status=3)
    frame = encode_an_packet(p)
    assert len(frame) == 4 + 73 and frame[1] == 201
    q = decode_an_packet(frame)
    assert q.nsvfix == 7 and q.galileo_satellites == 2
    assert abs(q.latitude_rad - p.latitude_rad) < 1e-12
    assert q.sats[2] == (111, 41, 500.0)
    assert q.status == 3
    # corrupted payload must be rejected by the CRC16
    bad = bytearray(frame)
    bad[10] ^= 0x40
    import pytest

    with pytest.raises(ValueError, match="CRC"):
        decode_an_packet(bytes(bad))
    bad2 = bytearray(frame)
    bad2[0] ^= 0x01
    with pytest.raises(ValueError, match="LRC"):
        decode_an_packet(bytes(bad2))


def test_an_packet_from_solution():
    from gnss_sdr_tpu.monitor.an_packet import (decode_an_packet,
                                                encode_an_packet,
                                                packet_from_solution)
    from gnss_sdr_tpu.pvt.solver import PvtSolution

    sol = PvtSolution(valid=True, pos_ecef=np.zeros(3), clock_bias_s=0.0,
                      vel_ecef=None, clock_drift_s_s=None, gdop=2.0,
                      pdop=1.5, hdop=1.0, vdop=1.1, n_sats=5,
                      residuals_m=np.zeros(5), lat_rad=0.72,
                      lon_rad=0.03, height_m=80.0)
    pkt = packet_from_solution(
        sol, periods=[("G", 3, 45.0, 100.0), ("E", 11, 43.0, -200.0)],
        microseconds=5_000_000)
    q = decode_an_packet(encode_an_packet(pkt))
    assert q.nsvfix == 5 and q.gps_satellites == 1
    assert q.sats[1][0] == 111  # Galileo PRN + 100


def test_obsdiff_single_differences(tmp_path):
    from gnss_sdr_tpu.utils.obsdiff import diff_stats, parse_rinex_obs

    def write(path, bias):
        w = RinexObsWriter(path, bands=("1C",))
        for k in range(5):
            w.add_epoch(2200, 345600.0 + k, [
                dict(system="G", prn=3, pseudorange_m=2.1e7 + bias + k,
                     carrier_phase_cycles=100.0 + k, doppler_hz=50.0,
                     cn0_db_hz=45.0),
                dict(system="G", prn=7, pseudorange_m=2.3e7 + bias - k,
                     carrier_phase_cycles=-20.0, doppler_hz=-10.0,
                     cn0_db_hz=44.0),
            ])
        w.close()

    write(tmp_path / "ref.obs", 0.0)
    write(tmp_path / "test.obs", 2.5)
    stats = diff_stats(parse_rinex_obs(tmp_path / "ref.obs"),
                       parse_rinex_obs(tmp_path / "test.obs"))
    assert stats["C1C"]["n"] == 10
    assert abs(stats["C1C"]["mean"] - 2.5) < 1e-6
    assert abs(stats["L1C"]["mean"]) < 1e-9


def test_plot_utilities(tmp_path):
    """Python counterparts of src/utils/matlab plot scripts render PNGs
    from our dump artifacts (dll_pll_veml_plot_sample.m,
    plot_acq_grid.m, gps_l1_ca_pvt_raw_plot_sample.m)."""
    pytest.importorskip("matplotlib")
    from gnss_sdr_tpu.monitor.dumps import TrackingDump
    from gnss_sdr_tpu.tracking.channels import PeriodOutput
    from gnss_sdr_tpu.utils.plots import (
        plot_acq_grid, plot_pvt, plot_tracking)

    dump = TrackingDump()
    rng = np.random.default_rng(3)
    for k in range(50):
        dump.append(PeriodOutput(
            channel=0, prn=7, sample_start=4000 * k, length=4000,
            rem_code_phase_samples=0.1,
            prompt=complex(4000.0 + rng.normal(0, 50), rng.normal(0, 50)),
            corr=np.array([2800 + 10j, 4000 - 30j, 2790 - 5j]),
            carrier_doppler_hz=1234.5, code_freq_chips=1023001.2,
            acc_carrier_phase_rad=-9876.5, cn0_db_hz=44.5,
            carrier_lock_test=0.93, evm=0.21, loss_of_lock=False))
    npz = tmp_path / "trk.npz"
    dump.save_npz(npz)
    out = plot_tracking(npz, out=tmp_path / "trk.png")
    assert (tmp_path / "trk.png").stat().st_size > 5000

    grid = rng.random((11, 400)).astype(np.float32)
    grid[5, 123] = 30.0
    out = plot_acq_grid(grid, np.linspace(-5000, 5000, 11), 4.0e6,
                        1.023e6, prn=7, out=tmp_path / "acq.png")
    assert (tmp_path / "acq.png").stat().st_size > 5000

    class Sol:
        valid = True
        n_sats = 8
        gdop, pdop, hdop, vdop = 2.0, 1.7, 1.0, 1.4

        def __init__(self, dl, dh):
            self.lat_rad = 0.72 + dl
            self.lon_rad = 0.02 + dl / 2
            self.height_m = 100.0 + dh

    sols = [Sol(rng.normal(0, 3e-8), rng.normal(0, 2.0)) for _ in range(40)]
    plot_pvt(sols, out=tmp_path / "pvt.png")
    assert (tmp_path / "pvt.png").stat().st_size > 5000
