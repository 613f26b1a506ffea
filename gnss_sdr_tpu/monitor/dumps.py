"""Per-channel tracking dumps with MATLAB .mat export.

Counterpart of the reference's binary dump + matio export
(dll_pll_veml_tracking.cc log_data :1403 / save_matfile :1511): collects
per-PRN-period tracking internals and writes .npz and/or MATLAB-readable
.mat (scipy.io.savemat) with the reference's variable naming where it has
one (abs_E/abs_P/abs_L, Prompt_I/Q, carrier_doppler_hz, code_freq_chips,
CN0_SNV_dB_Hz, PRN...).
"""

from __future__ import annotations

import numpy as np
from scipy import io as sp_io


class TrackingDump:
    def __init__(self):
        self._rows: list[dict] = []

    def append(self, p) -> None:
        """Record one PeriodOutput."""
        corr = np.asarray(p.corr)
        prompt_idx = corr.shape[0] // 2
        self._rows.append(dict(
            PRN=p.prn,
            abs_E=abs(corr[prompt_idx - 1]) if corr.shape[0] >= 3 else 0.0,
            abs_P=abs(p.prompt),
            abs_L=abs(corr[prompt_idx + 1]) if corr.shape[0] >= 3 else 0.0,
            Prompt_I=p.prompt.real,
            Prompt_Q=p.prompt.imag,
            carrier_doppler_hz=p.carrier_doppler_hz,
            code_freq_chips=p.code_freq_chips,
            acc_carrier_phase_rad=p.acc_carrier_phase_rad,
            rem_code_phase_samples=p.rem_code_phase_samples,
            CN0_SNV_dB_Hz=p.cn0_db_hz,
            carrier_lock_test=p.carrier_lock_test,
            EVM=p.evm,
            PRN_start_sample_count=p.sample_start,
        ))

    def arrays(self) -> dict[str, np.ndarray]:
        if not self._rows:
            return {}
        keys = self._rows[0].keys()
        return {k: np.array([r[k] for r in self._rows]) for k in keys}

    def save_npz(self, path) -> None:
        np.savez(path, **self.arrays())

    def save_mat(self, path) -> None:
        sp_io.savemat(path, self.arrays())
