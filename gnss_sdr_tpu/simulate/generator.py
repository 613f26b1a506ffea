"""Multi-satellite GPS L1 C/A and Galileo E1 baseband signal synthesis."""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.codes.galileo_e1 import (
    CODE_LENGTH as E1_CODE_LENGTH,
    galileo_e1_subchips,
)

CHIP_RATE = 1.023e6
CODE_LEN = 1023
CARRIER_HZ = 1575.42e6
CODES_PER_BIT = 20  # 20 ms data bits (50 bps)


@dataclasses.dataclass
class SatelliteParams:
    """Truth parameters for one simulated satellite."""

    prn: int
    cn0_db_hz: float = 45.0
    delay_samples: float = 0.0      # code-start delay at t=0 [samples]
    doppler_hz: float = 0.0
    doppler_rate_hz_s: float = 0.0
    data_bits: np.ndarray | None = None  # +-1 bits at 50 bps (20 ms each)
    phase_rad: float = 0.0

    def code_doppler_factor(self) -> float:
        """Code-carrier coherence: chip rate scales with carrier Doppler."""
        return 1.0 + self.doppler_hz / CARRIER_HZ


def generate_gps_l1ca(
    sats: list[SatelliteParams],
    fs: float,
    duration_s: float,
    seed: int = 0,
    noise: bool = True,
) -> np.ndarray:
    """Sum of delayed/Doppler-shifted BPSK C/A signals plus AWGN.

    Unit amplitude per satellite; the AWGN variance realizes each
    satellite's C/N0 against its own unit power (per-satellite C/N0 is only
    exact for the strongest noise term; with equal C/N0s it is exact).
    Bit index b and chip index c at sample n derive from the code phase
    chips(n) = (n - delay) * chip_rate' / fs: c = floor(chips) mod 1023,
    b = floor(chips / (1023*20)).
    """
    n = int(round(fs * duration_s))
    t = np.arange(n) / fs
    out = np.zeros(n, dtype=np.complex128)

    sigma = 0.0
    for sat in sats:
        code = gps_l1ca_code(sat.prn).astype(np.float64)
        chip_rate_eff = CHIP_RATE * sat.code_doppler_factor()
        chips = (np.arange(n) - sat.delay_samples) * chip_rate_eff / fs
        chip_idx = np.floor(chips).astype(np.int64) % CODE_LEN
        spread = code[chip_idx]
        if sat.data_bits is not None:
            bit_idx = np.floor(chips / (CODE_LEN * CODES_PER_BIT)).astype(np.int64)
            bit_idx = np.clip(bit_idx, 0, len(sat.data_bits) - 1)
            spread = spread * np.asarray(sat.data_bits, dtype=np.float64)[bit_idx]
        phase = (2.0 * np.pi * (sat.doppler_hz * t
                                + 0.5 * sat.doppler_rate_hz_s * t * t)
                 + sat.phase_rad)
        out += spread * np.exp(1j * phase)
        sigma = max(sigma, np.sqrt(fs / (2.0 * 10.0 ** (sat.cn0_db_hz / 10.0))))

    if noise and sigma > 0:
        rng = np.random.default_rng(seed)
        out += sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def generate_galileo_e1(
    sats: list[SatelliteParams],
    fs: float,
    duration_s: float,
    seed: int = 0,
    noise: bool = True,
    component: str = "B",
    cboc: bool = True,
) -> np.ndarray:
    """Sum of delayed/Doppler-shifted CBOC E1 signals plus AWGN.

    ``data_bits`` (if given) are 4 ms I/NAV symbols (250 sps), one per
    primary code period.
    """
    n = int(round(fs * duration_s))
    t = np.arange(n) / fs
    out = np.zeros(n, dtype=np.complex128)
    sub_per_code = E1_CODE_LENGTH * 12

    sigma = 0.0
    for sat in sats:
        sub = galileo_e1_subchips(sat.prn, component, cboc).astype(np.float64)
        sub_rate_eff = 1.023e6 * 12.0 * sat.code_doppler_factor()
        pos = (np.arange(n) - sat.delay_samples) * sub_rate_eff / fs
        sub_idx = np.floor(pos).astype(np.int64)
        spread = sub[sub_idx % sub_per_code]
        if sat.data_bits is not None:
            sym_idx = np.floor(sub_idx / sub_per_code).astype(np.int64)
            sym_idx = np.clip(sym_idx, 0, len(sat.data_bits) - 1)
            spread = spread * np.asarray(sat.data_bits, np.float64)[sym_idx]
        phase = (2.0 * np.pi * (sat.doppler_hz * t
                                + 0.5 * sat.doppler_rate_hz_s * t * t)
                 + sat.phase_rad)
        out += spread * np.exp(1j * phase)
        sigma = max(sigma, np.sqrt(fs / (2.0 * 10.0 ** (sat.cn0_db_hz / 10.0))))

    if noise and sigma > 0:
        rng = np.random.default_rng(seed)
        out += sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)
