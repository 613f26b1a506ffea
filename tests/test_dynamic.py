"""Dynamic (moving-receiver) system test.

Counterpart of the reference position_test in dynamic mode
(src/tests/system-tests/position_test.cc with a Spirent motion file;
bounds from position_test_flags.h: dynamic 3D RMSE < 10 m, velocity
error < 5 m/s). The trajectory is a constant-velocity 15 m/s east run;
the scene evaluates the antenna position at each reception time.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.geodesy import ecef_to_geodetic, enu_matrix
from gnss_sdr_tpu.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.rf_scene import generate_scene
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)

FS = 2.5e6
SPEED_M_S = 15.0


@pytest.fixture(scope="module")
def dynamic_scene():
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 4.5
    duration = 9.8
    rx0 = rx_position()
    lat, lon, _ = ecef_to_geodetic(rx0)
    east = enu_matrix(lat, lon)[0]
    vel = SPEED_M_S * east

    def traj(t):
        return rx0 + vel * (t - t_start)

    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx0, t_start)[:6]
    assert len(prns) >= 5
    x = generate_scene(ephs, prns, traj, t_start, duration, FS,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=23)
    return dict(x=x, traj=traj, vel=vel, ephs=ephs, prns=prns,
                t_start=t_start)


def test_dynamic_position_and_velocity(dynamic_scene):
    sc = dynamic_scene
    cfg = ReceiverConfig(
        fs=FS, n_channels=6, doppler_max=5000.0, doppler_step=250.0,
        acq_pfa=0.001, acq_dwells=2, output_rate_ms=100,
    )
    receiver = Receiver(cfg, satellites=list(sc["prns"]),
                        assisted_ephemeris={p: sc["ephs"][p]
                                            for p in sc["prns"]})
    sols = receiver.run(sc["x"])
    assert len(sols) >= 5, f"got {len(sols)} fixes"
    # truth position at the *GPS* time of each epoch: the solved clock
    # bias maps receiver TOW back to true time (15 m/s x 70 ms ~ 1 m
    # otherwise)
    errs = []
    vel_errs = []
    for s in sols[1:]:
        truth = sc["traj"](s.rx_tow_s - s.clock_bias_s)
        errs.append(np.linalg.norm(s.pos_ecef - truth))
        if s.vel_ecef is not None:
            vel_errs.append(np.linalg.norm(s.vel_ecef - sc["vel"]))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 10.0, f"dynamic 3D RMSE {rmse} m (bound 10 m)"
    assert vel_errs, "no velocity solutions"
    assert max(vel_errs) < 5.0, f"velocity error {max(vel_errs)} m/s"
    # the solved track actually moves at the true speed: displacement
    # between first and last scored fix matches 15 m/s x elapsed time
    dt = sols[-1].rx_tow_s - sols[1].rx_tow_s
    disp = np.linalg.norm(sols[-1].pos_ecef - sols[1].pos_ecef)
    assert dt > 1.0
    assert abs(disp - SPEED_M_S * dt) < 5.0, (disp, dt)
