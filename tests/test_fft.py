"""Planar matmul-FFT correctness vs numpy."""

import numpy as np
import pytest

from gnss_sdr_tpu.ops.cplx import from_complex, to_complex
from gnss_sdr_tpu.ops.fft import fft_planar, ifft_planar, plan_fft


@pytest.mark.parametrize("n", [64, 100, 2046, 2500, 4000, 8000, 5115])
def test_fft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    plan = plan_fft(n)
    got = to_complex(fft_planar(plan, from_complex(x)))
    ref = np.fft.fft(x)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale)


@pytest.mark.parametrize("n", [100, 4000])
def test_ifft_roundtrip(n):
    rng = np.random.default_rng(n + 1)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    plan = plan_fft(n)
    back = to_complex(ifft_planar(plan, fft_planar(plan, from_complex(x))))
    np.testing.assert_allclose(back, x, atol=1e-4 * np.max(np.abs(x)))


def test_batched_fft():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((3, 5, 100))
         + 1j * rng.standard_normal((3, 5, 100))).astype(np.complex64)
    plan = plan_fft(100)
    got = to_complex(fft_planar(plan, from_complex(x)))
    ref = np.fft.fft(x, axis=-1)
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.max(np.abs(ref)))


def test_large_prime_rejected():
    with pytest.raises(ValueError):
        plan_fft(8191)  # prime
