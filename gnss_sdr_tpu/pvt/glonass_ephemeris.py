"""GLONASS state-vector ephemeris propagation.

Counterpart of RTKLIB's geph2pos/glorbit
(/root/reference/src/algorithms/libs/rtklib/rtklib_ephemeris.cc): the
broadcast message gives ECEF (PZ-90) position/velocity/lunisolar
acceleration at epoch t_b; positions at other times come from 4th-order
Runge-Kutta integration of the equations of motion with the J2 term.
PZ-90.02 and WGS-84 agree to centimeters, so no datum transform is
applied (same practice as RTKLIB).
"""

from __future__ import annotations

import dataclasses

import numpy as np

GM = 3.9860044e14        # PZ-90 [m^3/s^2]
J2 = 1.0826257e-3
AE = 6378136.0           # [m]
OMEGA_E = 7.292115e-5    # [rad/s]
TSTEP = 60.0


def _deriv(x: np.ndarray, acc: np.ndarray) -> np.ndarray:
    """State derivative (rtklib deq): x = [r(3), v(3)]."""
    r2 = float(np.dot(x[:3], x[:3]))
    r = np.sqrt(r2)
    if r2 <= 0:
        return np.zeros(6)
    r3 = r2 * r
    omg2 = OMEGA_E * OMEGA_E
    a = 1.5 * J2 * GM * AE * AE / r2 / r3
    b = 5.0 * x[2] * x[2] / r2
    c = -GM / r3 - a * (1.0 - b)
    out = np.empty(6)
    out[:3] = x[3:]
    out[3] = (c + omg2) * x[0] + 2.0 * OMEGA_E * x[4] + acc[0]
    out[4] = (c + omg2) * x[1] - 2.0 * OMEGA_E * x[3] + acc[1]
    out[5] = (c - 2.0 * a) * x[2] + acc[2]
    return out


def _rk4(x: np.ndarray, acc: np.ndarray, h: float) -> np.ndarray:
    k1 = _deriv(x, acc)
    k2 = _deriv(x + k1 * h / 2, acc)
    k3 = _deriv(x + k2 * h / 2, acc)
    k4 = _deriv(x + k3 * h, acc)
    return x + (k1 + 2 * k2 + 2 * k3 + k4) * h / 6


@dataclasses.dataclass
class GlonassEphemeris:
    """Broadcast state-vector ephemeris (SI units)."""

    slot: int = 0
    freq_slot: int = 0          # FDMA channel k in -7..6
    tb_s: float = 0.0           # epoch within day [s]
    pos_m: tuple = (0.0, 0.0, 0.0)
    vel_m_s: tuple = (0.0, 0.0, 0.0)
    acc_m_s2: tuple = (0.0, 0.0, 0.0)
    gamma_n: float = 0.0        # relative frequency bias
    tau_n_s: float = 0.0        # clock bias [s]

    @classmethod
    def from_fields(cls, slot: int, f: dict) -> "GlonassEphemeris":
        """Build from accumulated GNAV string fields (km -> m)."""
        return cls(
            slot=slot,
            tb_s=f.get("tb_min", 0) * 60.0,
            pos_m=(f["x_km"] * 1e3, f["y_km"] * 1e3, f["z_km"] * 1e3),
            vel_m_s=(f["vx_km_s"] * 1e3, f["vy_km_s"] * 1e3,
                     f["vz_km_s"] * 1e3),
            acc_m_s2=(f.get("ax_km_s2", 0.0) * 1e3,
                      f.get("ay_km_s2", 0.0) * 1e3,
                      f.get("az_km_s2", 0.0) * 1e3),
            gamma_n=f.get("gamma_n", 0.0),
            tau_n_s=f.get("tau_n_s", 0.0),
        )

    def clock_bias_s(self, t: float) -> float:
        """-tau_n + gamma_n*(t - tb) (GLONASS ICD sign convention)."""
        return -self.tau_n_s + self.gamma_n * (t - self.tb_s)

    def sat_pos(self, t: float):
        """ECEF position at time t via RK4 from tb (rtklib glorbit)."""
        x = np.concatenate([np.asarray(self.pos_m, dtype=float),
                            np.asarray(self.vel_m_s, dtype=float)])
        acc = np.asarray(self.acc_m_s2, dtype=float)
        dt = t - self.tb_s
        step = TSTEP if dt >= 0 else -TSTEP
        while abs(dt) > 1e-9:
            h = step if abs(dt) > TSTEP else dt
            x = _rk4(x, acc, h)
            dt -= h
        return tuple(x[:3])

    def sat_vel(self, t: float, dt: float = 1.0):
        p1 = np.array(self.sat_pos(t - dt))
        p2 = np.array(self.sat_pos(t + dt))
        return tuple((p2 - p1) / (2 * dt))
