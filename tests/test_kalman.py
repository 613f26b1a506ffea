"""Kalman tracking filter tests: convergence on a synthetic trajectory."""

import numpy as np

from gnss_sdr_tpu.ops.kalman import KfConfig, kf_init, kf_step


def test_kf_converges_to_doppler_and_rate():
    rng = np.random.default_rng(0)
    cfg = KfConfig()
    t = 0.001
    true_doppler0, true_rate = 1200.0, 50.0  # Hz, Hz/s
    beta = cfg.chip_rate_cps / cfg.carrier_hz

    state = kf_init(0.0, 0.0, 1100.0)  # 100 Hz initial error
    # simulate: the local replica uses the KF state; discriminators
    # measure true-minus-estimated phases
    true_code, true_phase, est_dopp = 0.0, 0.0, []
    for k in range(1500):
        td = true_doppler0 + true_rate * (k * t)
        true_code += beta * td * t
        true_phase += 2 * np.pi * td * t
        x = np.asarray(state.x)
        code_err = (true_code - x[0]) + rng.normal(0, 0.05)
        phase_err = (true_phase - x[1]) + rng.normal(0, 0.1)
        # fold phase error like a discriminator would (half-cycle Costas)
        phase_err = (phase_err + np.pi / 2) % np.pi - np.pi / 2
        state, _ = kf_step(state, code_err, phase_err, t, cfg)
        est_dopp.append(float(np.asarray(state.x)[2]))

    tail = np.array(est_dopp[-100:])
    true_tail = true_doppler0 + true_rate * (np.arange(1400, 1500) * t)
    assert np.mean(np.abs(tail - true_tail)) < 5.0
    # doppler rate estimated
    assert abs(float(np.asarray(state.x)[3]) - true_rate) < 20.0


def test_kf_batched_channels():
    cfg = KfConfig()
    state = kf_init(np.zeros(3), np.zeros(3), np.array([0.0, 500.0, -800.0]))
    state, _ = kf_step(state, np.zeros(3), np.full(3, 0.1), 0.001, cfg)
    x = np.asarray(state.x)
    assert x.shape == (3, 4)
    assert np.all(np.isfinite(np.asarray(state.p)))
