"""Telemetry watchdog: no valid frame within the window forces loss of
lock and returns the satellite to the pool
(gps_l1_ca_telemetry_decoder_gs.cc:118,456-464)."""

import numpy as np

from gnss_sdr_tpu.receiver import ChannelState, Receiver, ReceiverConfig
from gnss_sdr_tpu.telemetry import GpsLnavDecoder
from gnss_sdr_tpu.tracking.channels import PeriodOutput


def test_lnav_watchdog_trips_without_frames():
    dec = GpsLnavDecoder(watchdog_symbols=200)
    rng = np.random.default_rng(1)
    for i in range(190):
        dec.feed(float(rng.standard_normal()), i)
    assert not dec.telemetry_failed
    for i in range(190, 220):
        dec.feed(float(rng.standard_normal()), i)
    assert dec.telemetry_failed


def test_lnav_watchdog_quiet_on_valid_stream():
    from gnss_sdr_tpu.simulate.lnav import build_lnav_bits
    from gnss_sdr_tpu.simulate.scenario import make_constellation

    eph = make_constellation([7], toe_s=7200.0)[7]
    bits = build_lnav_bits(eph, 1800, 3)
    symbols = np.repeat(np.where(bits == 1, -1.0, 1.0), 20)
    dec = GpsLnavDecoder(watchdog_symbols=13_000)
    for i, s in enumerate(symbols[:14_000]):
        dec.feed(1000.0 * s, i)
    assert dec.frame_sync
    assert not dec.telemetry_failed


def test_receiver_requeues_channel_on_telemetry_failure():
    """A channel that tracks (high C/N0) but never decodes a frame is
    returned to the satellite pool — the reference's 'bad telemetry'
    event path into the channel FSM."""
    cfg = ReceiverConfig(fs=2.5e6, n_channels=1)
    rec = Receiver(cfg, satellites=[7, 9])
    fsm = rec.fsms[0]
    fsm.start_acquisition(7)
    fsm.valid_acquisition()
    assert fsm.state is ChannelState.TRACKING
    rec.decoders[0] = GpsLnavDecoder(watchdog_symbols=50)
    rng = np.random.default_rng(2)

    def fake_period(i):
        return PeriodOutput(
            channel=0, prn=7, sample_start=2500 * i, length=2500,
            rem_code_phase_samples=0.0,
            prompt=complex(rng.standard_normal(), 0.1),
            corr=np.zeros(3, dtype=complex), carrier_doppler_hz=0.0,
            code_freq_chips=1.023e6, acc_carrier_phase_rad=0.0,
            cn0_db_hz=45.0, carrier_lock_test=0.9, evm=0.1,
            loss_of_lock=False)

    rec._feed_decoders([[fake_period(i) for i in range(60)]])
    assert fsm.state is not ChannelState.TRACKING
    assert 7 in rec.sat_pool
