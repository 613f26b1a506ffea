"""Front-end calibration utility.

Counterpart of the reference's ``front-end-cal`` tool
(/root/reference/src/utils/front-end-cal/front_end_cal.{h,cc} + main.cc):
given assistance (ephemeris + coarse position/time — from the SUPL client
or the XML store), predict each visible satellite's Doppler, acquire the
satellites from a capture, and fit the receiver front-end's oscillator
error from measured-vs-predicted Doppler:

- :func:`estimate_doppler_from_eph` — predicted L1 Doppler from the
  orbital model at a coarse position/TOW (reference
  ``estimate_doppler_from_eph``).
- :func:`gps_l1_front_end_model_e4000` — the reference's Elonics
  E4000 + RTL2832 PLL model mapping a measured baseband frequency error
  to (estimated fs, IF bias, oscillator ppm).
- :func:`fit_front_end` — generic LS fit over several satellites:
  measured_doppler = predicted_doppler * (1 + ppm*1e-6) + f_if_bias,
  solving for the common IF bias and clock ppm (what the per-satellite
  E4000 model does, generalized to any front-end).
"""

from __future__ import annotations

import numpy as np

from gnss_sdr_tpu.constants.general import SPEED_OF_LIGHT_M_S
from gnss_sdr_tpu.pvt.geodesy import geodetic_to_ecef
from gnss_sdr_tpu.simulate.scenario import true_range_and_rate

GPS_L1_HZ = 1575.42e6


def estimate_doppler_from_eph(eph, tow_s: float, lat_deg: float,
                              lon_deg: float, height_m: float) -> float:
    """Predicted L1 Doppler [Hz] at a coarse position/time."""
    rx = geodetic_to_ecef(np.radians(lat_deg), np.radians(lon_deg),
                          height_m)
    _, rate, _ = true_range_and_rate(eph, np.asarray(rx, float), tow_s)
    return -rate / SPEED_OF_LIGHT_M_S * GPS_L1_HZ


def gps_l1_front_end_model_e4000(f_bb_true_hz: float, f_bb_meas_hz: float,
                                 fs_nominal_hz: float
                                 ) -> tuple[float, float, float]:
    """(estimated_fs_hz, estimated_f_if_hz, f_osc_err_ppm) — the
    reference's E4000+RTL2832 PLL model (front_end_cal.cc)."""
    f_osc_n = 28.8e6
    n, y, x, r = 109.0, 65536.0, 26487.0, 2.0
    f_rf_pll = (f_osc_n * (n + x / y)) / r
    f_bb_err_pll = GPS_L1_HZ - f_rf_pll
    f_rf_err = (f_bb_meas_hz - f_bb_true_hz) - f_bb_err_pll
    f_osc_err_hz = -((f_rf_err * r) / (n + x / y))
    f_osc_err_ppm = f_osc_err_hz / (f_osc_n / 1e6)
    frac = fs_nominal_hz / f_osc_n
    return (frac * (f_osc_n + f_osc_err_hz), f_rf_err, f_osc_err_ppm)


def fit_front_end(predicted_hz, measured_hz) -> tuple[float, float]:
    """(common IF bias [Hz], implied oscillator error [ppm]) from
    several satellites' predicted vs acquired Doppler.

    An oscillator error of x ppm shifts EVERY satellite's baseband
    frequency by ~x*1e-6*f_L1 (the downconversion LO rides the same
    TCXO); the per-satellite Doppler-scaling term x*1e-6*f_d is mHz and
    unobservable at acquisition resolution. So the estimator is the
    robust common offset (median of measured - predicted, rejecting any
    mis-acquired outlier), attributed to the oscillator exactly like the
    reference's E4000 model attributes its PLL-corrected RF error."""
    p = np.asarray(predicted_hz, float)
    m = np.asarray(measured_hz, float)
    bias = float(np.median(m - p))
    return bias, bias / (GPS_L1_HZ * 1e-6)
