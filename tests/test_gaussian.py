"""Gaussian (carrier-KF + Bayesian R) tracking tests.

Reference behavior: gps_l1_ca_gaussian_tracking_cc.cc:652-760 and
bayesian_estimation.cc:88-130.
"""

import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.ops.gaussian import (GaussianConfig, gaussian_init,
                                       gaussian_step,
                                       phase_detector_variance)
from gnss_sdr_tpu.simulate import SatelliteParams, generate_gps_l1ca
from gnss_sdr_tpu.tracking import TrackingConfig
from gnss_sdr_tpu.tracking.channels import TrackingChannels
from gnss_sdr_tpu.tracking.fast_engine import FastTrackingEngine

FS = 4.0e6


def test_gaussian_step_converges_on_doppler():
    """The carrier KF pulls a 40 Hz Doppler error to < 2 Hz and estimates
    the Doppler rate."""
    rng = np.random.default_rng(5)
    cfg = GaussianConfig(order=3, bayes_run=False)
    t = 0.001
    true_dop0, true_rate = 1000.0, 30.0
    state = gaussian_init(960.0, cfg, t)  # 40 Hz initial error

    nco_phase = 0.0
    true_phase = 0.0
    est = []
    for k in range(2000):
        td = true_dop0 + true_rate * (k * t)
        true_phase += 2 * np.pi * td * t
        dop_est = float(np.asarray(state.x)[1])
        nco_phase += 2 * np.pi * dop_est * t
        err = (true_phase - nco_phase + np.pi / 2) % np.pi - np.pi / 2
        err += rng.normal(0, 0.05)
        state, info = gaussian_step(state, err, 45.0, t, cfg)
        nco_phase += float(info["phase_corr_rad"])
        est.append(float(info["carrier_doppler_hz"]))
    est = np.array(est)
    true_tail = true_dop0 + true_rate * (np.arange(1900, 2000) * t)
    assert np.mean(np.abs(est[-100:] - true_tail)) < 2.0
    assert abs(float(info["doppler_rate_hz_s"]) - true_rate) < 15.0


def test_gaussian_step_batched_shapes():
    cfg = GaussianConfig(order=3)
    state = gaussian_init(np.array([0.0, 500.0, -700.0]), cfg, 0.001)
    state, info = gaussian_step(state, np.full(3, 0.1), np.full(3, 42.0),
                                0.001, cfg)
    assert np.asarray(state.x).shape == (3, 3)
    assert np.asarray(state.p).shape == (3, 3, 3)
    assert np.all(np.isfinite(np.asarray(state.p)))
    # error-state reset: phase slot zeroed after the correction is exported
    assert np.allclose(np.asarray(state.x)[:, 0], 0.0)
    assert np.asarray(info["phase_corr_rad"]).shape == (3,)


def test_niw_recursion_matches_reference_batch_form():
    """Sequential NIW (kappa/nu increment per sample, scatter vs moving
    prior) must equal the conjugate batch posterior the reference
    update_sequential accumulates (bayesian_estimation.cc:88-130)."""
    rng = np.random.default_rng(11)
    ys = rng.normal(0.3, 0.7, 200)
    kappa0, nu0, psi0 = 0, 0, 2.5

    # reference transcription: priors updated after every call
    mu_p, kap_p, nu_p, psi_p = 0.0, kappa0, nu0, psi0
    for y in ys:
        mu_post = (kap_p * mu_p + y) / (kap_p + 1)
        psi_post = psi_p + kap_p / (kap_p + 1.0) * (y - mu_p) ** 2
        kap_p, nu_p = kap_p + 1, nu_p + 1
        mu_p, psi_p = mu_post, psi_post
    ref_psi_est = psi_p / (nu_p - 2) if nu_p - 2 > 0 else psi_p / (nu_p + 2)

    # ours (inside gaussian_step): run with p_transient=0, s_transient huge
    # so NIW updates but R_est stays CN0-driven; inspect the carried psi
    cfg = GaussianConfig(order=2, bayes_run=True, p_transient=0,
                         s_transient=10**6, bce_kappa=kappa0, bce_nu=nu0)
    state = gaussian_init(0.0, cfg, 0.001)
    state = state._replace(niw_psi=jnp.asarray(psi0, jnp.float32))
    for y in ys:
        state, _ = gaussian_step(state, float(y), 45.0, 0.001, cfg)
    nu_post = nu0 + int(np.asarray(state.niw_n))
    got = float(np.asarray(state.niw_psi)) / (nu_post - 2)
    assert abs(got - ref_psi_est) / ref_psi_est < 1e-3
    assert abs(float(np.asarray(state.niw_mu)) - mu_p) < 1e-4
    # the posterior variance approaches the true noise variance
    assert abs(got - 0.49) < 0.15


def test_adaptive_r_tracks_noise_level():
    """With bayes on, r_est converges near the injected measurement
    variance rather than the CN0-model value."""
    rng = np.random.default_rng(3)
    sigma = 0.2
    cfg = GaussianConfig(order=2, bayes_run=True, p_transient=10,
                         s_transient=40)
    t = 0.001
    state = gaussian_init(0.0, cfg, t)
    for _ in range(600):
        y = rng.normal(0.0, sigma)
        state, info = gaussian_step(state, y, 30.0, t, cfg)
    r = float(np.asarray(info["r_est"]))
    model_r = float(phase_detector_variance(30.0, t))
    assert abs(r - sigma**2) < 0.5 * sigma**2
    assert abs(r - model_r) > 0.05 * model_r  # actually adapted


def test_gaussian_loop_mode_tracks():
    """Fast engine with loop='gaussian' (GPS_L1_CA_Gaussian_Tracking
    counterpart) converges on Doppler and holds lock."""
    true_doppler = -600.0
    sat = SatelliteParams(prn=8, cn0_db_hz=46.0, delay_samples=600.0,
                          doppler_hz=true_doppler)
    x = generate_gps_l1ca([sat], FS, 1.4, seed=23)
    cfg = TrackingConfig(fs=FS, extend_correlation_symbols=20,
                         pll_bw_narrow_hz=5.0, dll_bw_narrow_hz=0.75,
                         cn0_smoother_alpha=0.05)
    block = int(FS * 0.02)
    tc = TrackingChannels(cfg, 1, block)
    tc.start_channel(0, 8, gps_l1ca_code(8), 600.0, true_doppler + 25.0, 0)
    for b in range(20):
        tc.process_block(x[b * block: (b + 1) * block + tc.overlap])
    fast = FastTrackingEngine(cfg, 1, groups_per_block=5, loop="gaussian")
    state = fast.from_track_state(tc.state)
    codes = jnp.asarray(np.asarray(gps_l1ca_code(8), np.float32)[None, :])
    pos = 20 * block
    dopplers, cn0s = [], []
    n_blocks = (len(x) - pos - fast.overlap) // fast.block_samples
    for b in range(n_blocks):
        lo = pos + b * fast.block_samples
        seg = x[lo: lo + fast.block_samples + fast.overlap]
        re = jnp.asarray(np.ascontiguousarray(seg.real, np.float32))
        im = jnp.asarray(np.ascontiguousarray(seg.imag, np.float32))
        state, out = fast.process_block(state, re, im, codes)
        valid = np.asarray(out["valid"])[:, 0]
        dopplers.extend(np.asarray(out["carrier_doppler_hz"])[valid, 0])
        cn0s.extend(np.asarray(out["cn0_db_hz"])[valid, 0])
        assert not np.asarray(out["loss_of_lock"]).any()
    dopplers = np.array(dopplers)
    assert abs(np.mean(dopplers[-10:]) - true_doppler) < 5.0
    assert abs(cn0s[-1] - 46.0) < 5.0
