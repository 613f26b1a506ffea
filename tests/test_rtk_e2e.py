"""Receiver-level RTK: two receivers over a short baseline, DD-EKF +
LAMBDA through the PVT.positioning_mode config path
(rtklib_pvt_gs positioning-mode plumbing; rtklib_rtkpos.cc)."""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.multiband import (
    BandConfig,
    MultiBandConfig,
    MultiBandReceiver,
)
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)

FS = 2.5e6


def _run_receiver(x, prns, ephs, **cfg_kwargs):
    cfg = MultiBandConfig(fs=FS, block_ms=20, output_rate_ms=20,
                          **cfg_kwargs)
    bands = [BandConfig(suffix="1C", satellites=list(prns), n_channels=5,
                        doppler_max=5000.0, doppler_step=250.0,
                        acq_pfa=0.001, acq_dwells=2, pull_in_time_s=0.4)]
    assisted = {("G", p): ephs[p] for p in prns}
    rec = MultiBandReceiver(cfg, bands, assisted_ephemeris=assisted)
    return rec, lambda: rec.run(x)


def test_two_receiver_kinematic_rtk():
    from gnss_sdr_tpu.simulate.rf_scene import generate_scene

    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 5.0
    duration = 16.0
    rover_pos = rx_position()
    # short baseline: ~600 m east of the rover
    up = rover_pos / np.linalg.norm(rover_pos)
    east = np.cross([0.0, 0.0, 1.0], up)
    east /= np.linalg.norm(east)
    base_pos = rover_pos + 600.0 * east
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rover_pos, t_start)[:5]
    assert len(prns) >= 5
    x_rov = generate_scene(ephs, prns, rover_pos, t_start, duration, FS,
                           bits_start_tow_s=bits_start, n_subframes=4,
                           cn0_db_hz=48.0, seed=91)
    x_base = generate_scene(ephs, prns, base_pos, t_start, duration, FS,
                            bits_start_tow_s=bits_start, n_subframes=4,
                            cn0_db_hz=48.0, seed=92)

    # base receiver logs its RAW observables (the RTCM base-stream
    # role); Hatch smoothing is deliberately OFF — it would freeze the
    # pull-in transient code bias into every pseudorange, while the DD
    # EKF's own averaging wants the unbiased raw code
    base_rec, run_base = _run_receiver(x_base, prns, ephs,
                                       log_base_obs=True)
    run_base()
    assert len(base_rec.base_obs_log) >= 100, len(base_rec.base_obs_log)

    rover_rec, run_rover = _run_receiver(
        x_rov, prns, ephs, positioning_mode="RTK_Kinematic")
    rover_rec.set_rtk_base(base_pos, base_rec.base_obs_log,
                           code_sigma_m=2.0)
    sols = run_rover()
    assert len(sols) >= 100, (
        f"got {len(sols)} RTK epochs; states={rover_rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rover_pos) for s in sols]
    # DD-EKF float accuracy on a ~9 s kinematic window; cm-level FIXED
    # accuracy is covered by the engine-level LAMBDA tests
    # (tests/test_rtk.py::test_fixed_solution_centimeter_accuracy) —
    # reliable AR needs minutes of geometry at 5 satellites
    tail = np.asarray(errs[3 * len(errs) // 4:])
    assert float(np.mean(tail)) < 2.5, (
        f"mean 3D error {np.mean(tail):.2f} m over {len(tail)} RTK epochs "
        f"(first/last: {errs[0]:.2f}/{errs[-1]:.2f})")
