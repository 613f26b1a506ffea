"""Receiver checkpoint/resume + kernel profiler tests."""

import numpy as np

from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.receiver.checkpoint import load_receiver, save_receiver
from gnss_sdr_tpu.simulate import SatelliteParams, generate_gps_l1ca


def test_checkpoint_resume_continues_tracking(tmp_path):
    fs = 2.046e6
    sat = SatelliteParams(prn=7, cn0_db_hz=47.0, delay_samples=100.0,
                          doppler_hz=700.0)
    x = generate_gps_l1ca([sat], fs, 1.0, seed=4)
    cfg = ReceiverConfig(fs=fs, n_channels=2, acq_pfa=0.001,
                        pull_in_time_s=0.2)
    rec1 = Receiver(cfg, satellites=[7, 9])
    block = rec1.block_samples
    n_blocks = (len(x) - rec1.overlap) // block
    half = n_blocks // 2
    for b in range(half):
        rec1.process_block(x[b * block:(b + 1) * block + rec1.overlap])
    dopp_before = float(np.asarray(rec1.tracking.state.carrier_doppler_hz)[0])
    save_receiver(rec1, tmp_path / "ckpt")

    rec2 = Receiver(cfg, satellites=[7, 9])
    load_receiver(rec2, tmp_path / "ckpt")
    assert rec2.tracking.abs_block_start == rec1.tracking.abs_block_start
    assert rec2.fsms[0].prn == rec1.fsms[0].prn
    dopp_loaded = float(np.asarray(rec2.tracking.state.carrier_doppler_hz)[0])
    assert abs(dopp_loaded - dopp_before) < 1e-3
    # resume: tracking continues without re-acquisition and stays locked
    for b in range(half, n_blocks):
        rec2.process_block(x[b * block:(b + 1) * block + rec2.overlap])
    dopp_end = float(np.asarray(rec2.tracking.state.carrier_doppler_hz)[0])
    assert abs(dopp_end - 700.0) < 10.0
    assert not bool(np.asarray(rec2.tracking.state.loss_of_lock)[0])


def test_profiler_produces_numbers(tmp_path):
    from gnss_sdr_tpu.utils.profiler import run_profile

    prof = run_profile(tmp_path / "profile.json")
    assert prof["acquisition"] and prof["tracking"]
    for row in prof["acquisition"]:
        assert row["seconds"] > 0 and row["grids_per_s"] > 0
    for row in prof["tracking"]:
        assert row["samples_per_s"] > 0
    import json

    loaded = json.load(open(tmp_path / "profile.json"))
    assert loaded["platform"]
