"""Cubature/unscented filters + NIW Bayesian estimator.

Counterpart of the reference's cubature_filter_test.cc /
unscented_filter_test.cc (nonlinear state estimation converges on a
known linear system, where CKF/UKF must match the analytic KF closely)
and bayesian_estimation positive tests.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.ops.nonlinear import (
    BayesianEstimator, CubatureFilter, UnscentedFilter)


def _run_filter(filt, rng, steps=300):
    """Scalar constant-velocity system: x=[pos, vel], z = pos + noise."""
    import jax.numpy as jnp

    dt = 0.1
    f_mat = np.array([[1.0, dt], [0.0, 1.0]])
    q = 1e-4 * np.eye(2)
    r = np.array([[0.25]])
    truth = np.array([0.0, 1.0])
    errs = []
    for _ in range(steps):
        truth = f_mat @ truth
        z = truth[0] + 0.5 * rng.standard_normal()
        filt.predict_sequential(lambda x: jnp.stack(
            [x[0] + dt * x[1], x[1]]), q)
        filt.update_sequential(lambda x: x[0:1], np.array([z]), r)
        errs.append(float(filt.x[0]) - truth[0])
    return np.asarray(errs)


@pytest.mark.parametrize("cls", [CubatureFilter, UnscentedFilter])
def test_filter_converges_on_linear_system(cls):
    rng = np.random.default_rng(0)
    filt = cls(np.array([0.0, 0.0]), np.eye(2))
    errs = _run_filter(filt, rng)
    # steady-state position error well below measurement sigma
    assert np.sqrt(np.mean(errs[-100:] ** 2)) < 0.25
    # velocity estimated from position-only measurements
    assert abs(float(filt.x[1]) - 1.0) < 0.05


def test_cubature_tracks_nonlinear_measurement():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    filt = CubatureFilter(np.array([2.5, 0.0]), np.eye(2))
    truth = np.array([3.0, 0.2])
    dt = 0.1
    for _ in range(400):
        truth = np.array([truth[0] + dt * truth[1], truth[1]])
        z = truth[0] ** 2 + 0.1 * rng.standard_normal()  # quadratic sensor
        filt.predict_sequential(
            lambda x: jnp.stack([x[0] + dt * x[1], x[1]]), 1e-5 * np.eye(2))
        filt.update_sequential(lambda x: (x[0] * x[0])[None],
                               np.array([z]), np.array([[0.01]]))
    assert abs(float(filt.x[0]) - truth[0]) < 0.1


def test_bayesian_estimator_recovers_mean_and_covariance():
    rng = np.random.default_rng(2)
    true_mu = np.array([1.5, -0.5])
    true_cov = np.array([[0.8, 0.3], [0.3, 0.5]])
    est = BayesianEstimator(mu_prior=np.zeros(2), kappa_prior=1,
                            nu_prior=4, psi_prior=np.eye(2))
    chol = np.linalg.cholesky(true_cov)
    for _ in range(3000):
        est.update_sequential(true_mu + chol @ rng.standard_normal(2))
    np.testing.assert_allclose(np.asarray(est.get_mu_est()), true_mu,
                               atol=0.06)
    np.testing.assert_allclose(np.asarray(est.get_psi_est()), true_cov,
                               atol=0.08)
