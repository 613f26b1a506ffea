"""PVT math engine (reference layer L7).

Scope-controlled port of the reference's solver needs: Kepler ephemeris
evaluation + satellite clock (rtklib_ephemeris.cc eph2pos/eph2clk
equivalents), atmospheric corrections, and iterative least-squares
single-point positioning (rtklib_pntpos.cc:1073 scope) — deliberately NOT
the 28.6k-LoC RTK/PPP engine (SURVEY.md section 7 "hard parts").
"""

from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris
from gnss_sdr_tpu.pvt.solver import PvtSolution, solve_pvt

__all__ = ["GpsEphemeris", "PvtSolution", "solve_pvt"]
