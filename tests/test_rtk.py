"""RTK engine: DD float EKF + LAMBDA integer ambiguity resolution.

Counterpart of the reference's rtkpos/relpos + lambda coverage
(rtklib_rtkpos.cc, rtklib_lambda.cc): synthetic dual-receiver epochs
with known integer ambiguities must converge to a centimeter-level
fixed solution with the correct integers.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.rtk import (
    L1_WAVELENGTH, RtkConfig, RtkEngine, RtkSolution, lambda_fix)


class TestLambda:
    def test_recovers_known_integers(self):
        rng = np.random.default_rng(0)
        n = 6
        truth = rng.integers(-30, 30, n).astype(float)
        # well-conditioned but correlated covariance
        a_mat = rng.standard_normal((n, n)) * 0.02
        q = a_mat @ a_mat.T + 0.0004 * np.eye(n)
        a_float = truth + np.linalg.cholesky(q) @ rng.standard_normal(n)
        fixed, ratio = lambda_fix(a_float, q)
        np.testing.assert_array_equal(fixed, truth)
        assert ratio > 1.0

    def test_low_confidence_gives_small_ratio(self):
        rng = np.random.default_rng(1)
        n = 5
        truth = rng.integers(-5, 5, n).astype(float)
        q = np.eye(n) * 4.0  # sigma 2 cycles: hopeless
        a_float = truth + 2.0 * rng.standard_normal(n)
        _, ratio = lambda_fix(a_float, q)
        assert ratio < 3.0


def _constellation(seed=0, n_sats=8):
    rng = np.random.default_rng(seed)
    r_orbit = 26_560e3
    sats = {}
    for prn in range(1, n_sats + 1):
        az = rng.uniform(0, 2 * np.pi)
        el = rng.uniform(np.radians(15), np.radians(85))
        # place on the orbit shell above a site near (45N, 7E)
        up = np.array([0.45399, 0.05727, 0.88928])
        east = np.array([-0.12187, 0.99255, 0.0])
        north = np.cross(up, east)
        d = (np.sin(el) * up
             + np.cos(el) * (np.sin(az) * east + np.cos(az) * north))
        sats[prn] = 6_378e3 * up + d * (r_orbit - 6_378e3)
    return sats


class TestRtkEngine:
    def test_fixed_solution_centimeter_accuracy(self):
        rng = np.random.default_rng(7)
        base = np.array([4_424_000.0, 558_000.0, 4_572_000.0])
        true_rover = base + np.array([120.0, -340.0, 210.0])  # ~430 m baseline
        sats0 = _constellation()
        lam = L1_WAVELENGTH
        amb = {p: int(rng.integers(-5_000_000, 5_000_000))
               for p in sats0}

        eng = RtkEngine(RtkConfig(code_sigma_m=0.4, phase_sigma_m=0.003),
                        base)
        sol = None
        for epoch in range(25):
            # satellites drift ~ 3 km per epoch (geometry change for
            # float-ambiguity observability)
            sat_pos = {p: sp + epoch * np.array([2500.0, -1800.0, 900.0])
                       for p, sp in sats0.items()}
            rover_obs, base_obs = {}, {}
            for p, sp in sat_pos.items():
                rr = np.linalg.norm(sp - true_rover)
                rb = np.linalg.norm(sp - base)
                rover_obs[p] = (rr + 0.3 * rng.standard_normal(),
                                rr / lam + amb[p]
                                + 0.002 / lam * rng.standard_normal())
                base_obs[p] = (rb + 0.3 * rng.standard_normal(),
                               rb / lam + 0.002 / lam * rng.standard_normal())
            sol = eng.process_epoch(rover_obs, base_obs, sat_pos)
        assert isinstance(sol, RtkSolution)
        float_err = np.linalg.norm(sol.float_pos_ecef - true_rover)
        assert float_err < 0.5, f"float err {float_err}"
        assert sol.fixed, f"no fix (ratio {sol.ratio})"
        fixed_err = np.linalg.norm(sol.pos_ecef - true_rover)
        assert fixed_err < 0.02, f"fixed err {fixed_err}"
        # recovered DD ambiguities match the truth DD integers
        ref = eng.ref_sat
        for i, s in enumerate(eng.sats):
            dd_truth = amb[s] - amb[ref]
            # the float state after conditioning is near the integer
            assert abs(sol.ambiguities[s] - dd_truth) < 0.5

    def test_satellite_set_changes(self):
        rng = np.random.default_rng(3)
        base = np.array([4_424_000.0, 558_000.0, 4_572_000.0])
        true_rover = base + np.array([10.0, 20.0, -15.0])
        sats0 = _constellation(seed=5, n_sats=7)
        lam = L1_WAVELENGTH
        amb = {p: int(rng.integers(-1000, 1000)) for p in sats0}
        eng = RtkEngine(RtkConfig(), base)
        for epoch in range(12):
            sat_pos = {p: sp + epoch * np.array([2000.0, 1000.0, -500.0])
                       for p, sp in sats0.items()}
            if epoch > 6:
                sat_pos.pop(3)  # satellite sets: one drops out
            rover_obs, base_obs = {}, {}
            for p, sp in sat_pos.items():
                rr = np.linalg.norm(sp - true_rover)
                rb = np.linalg.norm(sp - base)
                rover_obs[p] = (rr + 0.3 * rng.standard_normal(),
                                rr / lam + amb[p])
                base_obs[p] = (rb + 0.3 * rng.standard_normal(), rb / lam)
            sol = eng.process_epoch(rover_obs, base_obs, sat_pos)
        assert sol is not None
        assert 3 not in eng.sats
        assert np.linalg.norm(sol.float_pos_ecef - true_rover) < 0.5

    def test_too_few_satellites(self):
        base = np.array([4_424_000.0, 558_000.0, 4_572_000.0])
        eng = RtkEngine(RtkConfig(), base)
        sats = dict(list(_constellation().items())[:3])
        obs = {p: (2e7, 1e8) for p in sats}
        assert eng.process_epoch(obs, obs, sats) is None
