"""Config-driven UDP monitor assembly (gnss_flowgraph.cc:190-275 +
rtklib_pvt.cc:846-864 key parity): the factory attaches the enabled
monitor sinks to the receiver, and the receiver's choke points stream
reference-schema datagrams."""

import socket

import numpy as np

from gnss_sdr_tpu.config import InMemoryConfiguration
from gnss_sdr_tpu.monitor.udp_monitor import (
    decode_ephemeris, decode_monitor_pvt, decode_observables)
from gnss_sdr_tpu.monitor.wiring import ConfigMonitors
from gnss_sdr_tpu.receiver.factory import make_receiver


def _rx_socket():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    return rx, rx.getsockname()[1]


def _l1_conf(**extra):
    config = InMemoryConfiguration()
    for k, v in {
        "GNSS-SDR.internal_fs_sps": "4000000",
        "Channels_1C.count": "2",
        "Acquisition_1C.implementation": "GPS_L1_CA_PCPS_Acquisition",
        "Tracking_1C.implementation": "GPS_L1_CA_DLL_PLL_Tracking",
        "TelemetryDecoder_1C.implementation": "GPS_L1_CA_Telemetry_Decoder",
        "Observables.implementation": "Hybrid_Observables",
        "PVT.implementation": "RTKLIB_PVT",
        **extra,
    }.items():
        config.set_property(k, str(v))
    return config


def test_disabled_by_default():
    config = _l1_conf()
    assert ConfigMonitors.from_config(config) is None


def test_factory_attaches_monitors_and_streams():
    rx_obs, p_obs = _rx_socket()
    rx_pvt, p_pvt = _rx_socket()
    rx_eph, p_eph = _rx_socket()
    config = _l1_conf(**{
        "Monitor.enable_monitor": "true",
        "Monitor.udp_port": p_obs,
        "PVT.enable_monitor": "true",
        "PVT.monitor_udp_port": p_pvt,
        "PVT.enable_monitor_ephemeris": "true",
        "PVT.monitor_ephemeris_udp_port": p_eph,
    })
    rec = make_receiver(config, engine="scan")
    mons = rec.monitors
    assert mons is not None
    assert mons.observables is not None and mons.pvt_sink is not None
    assert mons.ephemeris_sink is not None and mons.tracking is None

    # observables epoch tap through the receiver's own mapper
    from gnss_sdr_tpu.observables.observables import ChannelEpoch
    rec._chan_sat[0] = ("G", 5)
    rec._stream_epoch([ChannelEpoch(
        prn=5, channel=0, tow_ms=100000.0, pseudorange_m=21_000_123.0,
        doppler_hz=1500.0, carrier_phase_rad=-3210.5, cn0_db_hz=43.0,
        rx_tow_ms=100070.0, sample=400000)])
    rows = decode_observables(rx_obs.recvfrom(65536)[0])
    assert rows[0].prn == 5
    assert rows[0].pseudorange_m == 21_000_123.0
    assert rows[0].flag_valid_pseudorange

    # PVT tap
    class Sol:
        rx_time_s = 100.07
        clock_bias_s = 2.0e-6
        pos_ecef = (1.0e6, 2.0e6, 3.0e6)
        vel_ecef = None
        lat_rad, lon_rad, height_m = 0.7, 0.01, 50.0
        n_sats = 6
        gdop = pdop = hdop = vdop = 1.5
    mons.pvt(Sol())
    pvt = decode_monitor_pvt(rx_pvt.recvfrom(65536)[0])
    assert pvt.valid_sats == 6
    np.testing.assert_allclose(pvt.latitude, np.degrees(0.7))

    # ephemeris tap fires exactly when a new ephemeris is assembled
    from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris
    mons.ephemeris("G", GpsEphemeris(prn=5, week_number=2260))
    data = rx_eph.recvfrom(65536)[0]
    assert data[:1] == b"G"
    assert decode_ephemeris(data).PRN == 5
    mons.close()
    for s in (rx_obs, rx_pvt, rx_eph):
        s.close()


def test_tracking_monitor_decimation():
    """TrackingMonitor.decimation_factor thins the per-period stream
    like the reference's gnss_synchro_monitor decimation."""
    rx, port = _rx_socket()
    config = _l1_conf(**{
        "TrackingMonitor.enable_monitor": "true",
        "TrackingMonitor.udp_port": port,
        "TrackingMonitor.decimation_factor": "4",
    })
    mons = ConfigMonitors.from_config(config)
    assert mons.tracking is not None and mons.tracking.decimation == 4

    from gnss_sdr_tpu.tracking.channels import PeriodOutput
    recs = [PeriodOutput(
        channel=0, prn=9, sample_start=4000 * k, length=4000,
        rem_code_phase_samples=0.0, prompt=complex(4000.0, 10.0),
        corr=np.array([2800 + 0j, 4000 + 10j, 2790 + 0j]),
        carrier_doppler_hz=1000.0, code_freq_chips=1023000.0,
        acc_carrier_phase_rad=0.0, cn0_db_hz=45.0,
        carrier_lock_test=0.95, evm=0.1, loss_of_lock=False)
        for k in range(8)]
    mons.period(recs)
    rows = decode_observables(rx.recvfrom(65536)[0])
    assert len(rows) == 2  # 8 periods / decimation 4
    assert rows[0].prn == 9
    mons.close()
    rx.close()


def test_multiple_client_addresses():
    """The reference accepts N client addresses separated by '_'
    (gnss_flowgraph.cc:203-209); every endpoint gets each datagram."""
    rx1, p = _rx_socket()
    config = _l1_conf(**{
        "PVT.enable_monitor": "true",
        "PVT.monitor_client_addresses": "127.0.0.1_127.0.0.1",
        "PVT.monitor_udp_port": p,
    })
    mons = ConfigMonitors.from_config(config)
    assert len(mons.pvt_sink.monitors) == 2
    mons.close()
    rx1.close()
