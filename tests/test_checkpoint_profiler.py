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


def test_front_end_cal_fit_and_e4000_model():
    """front-end-cal counterpart: Doppler prediction + LS fit of IF
    bias/oscillator ppm + the E4000 PLL model (front_end_cal.cc)."""
    import numpy as np

    from gnss_sdr_tpu.simulate.scenario import (
        make_constellation,
        rx_position,
        visible_sats,
    )
    from gnss_sdr_tpu.pvt.geodesy import ecef_to_geodetic
    from gnss_sdr_tpu.utils.front_end_cal import (
        estimate_doppler_from_eph,
        fit_front_end,
        gps_l1_front_end_model_e4000,
    )

    toe = 7200.0
    t = toe + 600.0
    rx = rx_position()
    lat, lon, h = ecef_to_geodetic(rx)
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t)[:5]
    pred = [estimate_doppler_from_eph(ephs[p], t, np.degrees(lat),
                                      np.degrees(lon), h) for p in prns]
    # a front-end with a +2.4 ppm oscillator: every satellite shifts by
    # ppm*1e-6*f_L1; one satellite is a mis-acquisition outlier
    ppm_true = 2.4
    offset = ppm_true * 1e-6 * 1575.42e6
    meas = [d + offset for d in pred]
    meas[2] += 5000.0   # outlier the median must reject
    bias, ppm = fit_front_end(pred, meas)
    assert abs(bias - offset) < 1e-6
    assert abs(ppm - ppm_true) < 1e-9

    fs_est, f_if, ppm_e = gps_l1_front_end_model_e4000(
        1000.0, 1000.0 + 3100.0, 2.0e6)
    # the E4000 PLL quantization offset is absorbed: a ~3.1 kHz measured
    # error at L1 is ~2 ppm of the 28.8 MHz TCXO
    assert abs(ppm_e) < 10.0
    assert abs(fs_est - 2.0e6) / 2.0e6 < 1e-4
    assert abs(f_if) < 5000.0
