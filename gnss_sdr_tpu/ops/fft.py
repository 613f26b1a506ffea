"""Complex-free FFT: two-stage Cooley-Tukey built from real matmuls.

The environment's TPU backend implements no complex dtype and no FFT op,
so the PCPS acquisition FFTs are synthesized from dense DFT-factor
matmuls — which is also the MXU-friendly formulation: for N = N1*N2 the
cost is N*(N1+N2) complex MACs executed as a handful of [N1,N1] and
[N2,N2] real matrix products, instead of a memory-bound butterfly network.

Algorithm (decimation in time, n = N2*n1 + n2, k = N1*k2 + k1):

    X[N1*k2 + k1] = sum_{n2} W_N2^{n2 k2} * W_N^{n2 k1}
                    * sum_{n1} x[N2*n1 + n2] * W_N1^{n1 k1}

Twiddle factors are float32; for the ~1e4-point FFTs used in acquisition
the resulting relative error vs numpy is ~1e-5 — far below the noise floor
of any correlation statistic.

Replaces the roles of the reference's FFTW wrapper
(/root/reference/src/algorithms/libs/gnss_sdr_fft.h) and its CUDA/OpenCL
FFT variants (src/algorithms/libs/opencl/fft_*.cc).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.ops.cplx import Cf


def _best_factor_pair(n: int) -> tuple[int, int]:
    """Divisor pair (n1, n2) with n1*n2 = n, n1 <= n2, n1 maximal."""
    best = (1, n)
    for d in range(2, int(math.isqrt(n)) + 1):
        if n % d == 0:
            best = (d, n // d)
    return best


@dataclasses.dataclass(frozen=True, eq=False)
class FftPlan:
    """Precomputed DFT factor matrices (host numpy, planar float32).

    ``eq=False`` keeps identity hashing so a plan can be a hashable jit
    static argument; plan_fft's lru_cache makes plans canonical per size.
    """

    n: int
    n1: int
    n2: int
    w1_re: np.ndarray  # [N1, N1]
    w1_im: np.ndarray
    w2_re: np.ndarray  # [N2, N2]
    w2_im: np.ndarray
    tw_re: np.ndarray  # [N1(k1), N2(n2)] twiddle W_N^{n2 k1}
    tw_im: np.ndarray


@functools.lru_cache(maxsize=None)
def plan_fft(n: int) -> FftPlan:
    n1, n2 = _best_factor_pair(n)
    if n1 == 1 and n > 4096:
        raise ValueError(
            f"FFT size {n} is prime and too large for a direct DFT; "
            "pad to a composite size")

    def dft_matrix(m: int):
        k = np.arange(m)
        ang = -2.0 * np.pi * np.outer(k, k) / m
        return (np.cos(ang).astype(np.float32),
                np.sin(ang).astype(np.float32))

    w1_re, w1_im = dft_matrix(n1)
    w2_re, w2_im = dft_matrix(n2)
    k1 = np.arange(n1)[:, None]
    nn2 = np.arange(n2)[None, :]
    ang = -2.0 * np.pi * (k1 * nn2) / n
    return FftPlan(
        n=n, n1=n1, n2=n2,
        w1_re=w1_re, w1_im=w1_im, w2_re=w2_re, w2_im=w2_im,
        tw_re=np.cos(ang).astype(np.float32),
        tw_im=np.sin(ang).astype(np.float32),
    )


def _cmatmul(ar, ai, br, bi, contract):
    """(a @ b) for planar complex via 4 real contractions.

    ``contract(x, y)`` performs the real contraction (an einsum closure).
    """
    rr = contract(ar, br) - contract(ai, bi)
    ri = contract(ar, bi) + contract(ai, br)
    return rr, ri


def fft_planar(plan: FftPlan, x: Cf, inverse: bool = False) -> Cf:
    """Batched FFT along the last axis of a planar complex array.

    ``x = (re, im)`` with shape [..., N]. ``inverse=True`` computes the
    unnormalized... no: the *normalized* inverse (divided by N), matching
    jnp.fft.ifft.
    """
    xr, xi = x
    n, n1, n2 = plan.n, plan.n1, plan.n2
    if xr.shape[-1] != n:
        raise ValueError(f"last axis {xr.shape[-1]} != plan size {n}")
    batch = xr.shape[:-1]

    w1r = jnp.asarray(plan.w1_re)
    w1i = jnp.asarray(plan.w1_im)
    w2r = jnp.asarray(plan.w2_re)
    w2i = jnp.asarray(plan.w2_im)
    twr = jnp.asarray(plan.tw_re)
    twi = jnp.asarray(plan.tw_im)
    if inverse:
        # conj all twiddles
        w1i, w2i, twi = -w1i, -w2i, -twi

    # x[..., N2*n1 + n2] -> [..., n1, n2]
    xr2 = xr.reshape(batch + (n1, n2))
    xi2 = xi.reshape(batch + (n1, n2))

    # stage 1: A[k1, n2] = sum_n1 x[n1, n2] W1[n1, k1]
    c1 = lambda a, b: jnp.einsum("...nm,nk->...km", a, b)
    ar, ai = _cmatmul(xr2, xi2, w1r, w1i, c1)

    # twiddle: B[k1, n2] = A[k1, n2] * T[k1, n2]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr

    # stage 2: X[k1, k2] = sum_n2 B[k1, n2] W2[n2, k2]
    c2 = lambda a, b: jnp.einsum("...km,mj->...kj", a, b)
    yr, yi = _cmatmul(br, bi, w2r, w2i, c2)

    # X[N1*k2 + k1] <- X[k1, k2]: transpose then flatten
    yr = jnp.swapaxes(yr, -1, -2).reshape(batch + (n,))
    yi = jnp.swapaxes(yi, -1, -2).reshape(batch + (n,))
    if inverse:
        yr = yr / n
        yi = yi / n
    return (yr, yi)


def ifft_planar(plan: FftPlan, x: Cf) -> Cf:
    return fft_planar(plan, x, inverse=True)
