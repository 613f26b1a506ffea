"""Control-plane tests: FSM, telecommand TCP server, receiver management
verbs, assistance XML persistence.

Mirrors the reference's control-plane unit tests
(src/tests/unit-tests/control-plane/): fake events in, applied actions out.
"""

import socket

import numpy as np

from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris
from gnss_sdr_tpu.receiver import ChannelState, Receiver, ReceiverConfig
from gnss_sdr_tpu.receiver.assistance import (
    load_ephemeris_xml,
    save_ephemeris_xml,
)
from gnss_sdr_tpu.receiver.fsm import ChannelFsm
from gnss_sdr_tpu.receiver.telecommand import TelecommandServer


def test_channel_fsm_transitions():
    fsm = ChannelFsm(0)
    assert fsm.state is ChannelState.STANDBY
    assert fsm.start_acquisition(7)
    assert fsm.state is ChannelState.ACQUISITION and fsm.prn == 7
    assert fsm.valid_acquisition()
    assert fsm.state is ChannelState.TRACKING
    # can't start acquisition while tracking
    assert not fsm.start_acquisition(9)
    prn = fsm.loss_of_lock()
    assert prn == 7 and fsm.state is ChannelState.ACQUISITION
    fsm.prn = 5
    assert fsm.stop() == 5 and fsm.state is ChannelState.STANDBY


def _mini_receiver():
    return Receiver(ReceiverConfig(fs=2.046e6, n_channels=3),
                    satellites=[1, 2, 3, 4])


def test_receiver_commands():
    rec = _mini_receiver()
    status = rec.apply_command("status")
    assert "ch 0" in status and "pool" in status
    # force a satellite onto a channel
    reply = rec.apply_command("set_ch_satellite", ["1", "4"])
    assert "OK" in reply
    assert rec.fsms[1].prn == 4
    assert rec.fsms[1].state is ChannelState.ACQUISITION
    # coldstart clears ephemerides
    rec.ephemerides[1] = GpsEphemeris(prn=1)
    assert "OK" in rec.apply_command("coldstart")
    assert not rec.ephemerides
    # warmstart keeps them
    rec.ephemerides[2] = GpsEphemeris(prn=2)
    assert "OK" in rec.apply_command("warmstart")
    assert 2 in rec.ephemerides
    assert "ERROR" in rec.apply_command("set_ch_satellite", ["9", "1"])


def test_telecommand_tcp_roundtrip():
    rec = _mini_receiver()
    server = TelecommandServer(rec.apply_command)
    server.start()
    try:
        with socket.create_connection(("127.0.0.1", server.port), 2.0) as s:
            f = s.makefile("rw")
            f.write("status\n")
            f.flush()
            reply = f.readline()
            assert "ch 0" in reply
            f.write("standby\n")
            f.flush()
            assert "OK" in f.readline()
            f.write("bogus\n")
            f.flush()
            assert "ERROR" in f.readline()
            f.write("set_ch_satellite 0\n")  # missing arg
            f.flush()
            assert "ERROR" in f.readline()
            f.write("exit\n")
            f.flush()
    finally:
        server.stop()


def test_assistance_xml_roundtrip(tmp_path):
    ephs = {
        5: GpsEphemeris(prn=5, week_number=310, toe_s=7200.0,
                        sqrt_a=5153.71, ecc=0.0123, m0_rad=-1.2,
                        af0=-3e-4, omega0_rad=2.1),
        9: GpsEphemeris(prn=9, week_number=310, toe_s=7200.0),
    }
    path = save_ephemeris_xml(ephs, tmp_path / "eph.xml")
    loaded = load_ephemeris_xml(path)
    assert set(loaded) == {5, 9}
    assert loaded[5].sqrt_a == ephs[5].sqrt_a
    assert loaded[5].m0_rad == ephs[5].m0_rad
    assert loaded[9].week_number == 310
    # usable for a warm start: positions match
    p1 = np.array(ephs[5].sat_pos(7300.0))
    p2 = np.array(loaded[5].sat_pos(7300.0))
    assert np.linalg.norm(p1 - p2) < 1e-6
