"""RTK: double-differenced carrier-phase positioning with ambiguity fixing.

Counterpart of the reference's RTKLIB kinematic engine
(reference: src/algorithms/libs/rtklib/rtklib_rtkpos.cc — ``rtkpos`` /
``relpos`` double-difference EKF — and rtklib_lambda.cc — the LAMBDA
integer least-squares ambiguity search). Scope: single-baseline,
single-frequency GPS L1 float EKF + LAMBDA fix with ratio-test
validation, which is the kinematic-positioning capability the reference
exposes through ``PVT.positioning_mode=PPP-/RTK-kinematic``.

Model. Between-receiver single differences cancel satellite clocks and
(short baseline) atmosphere; differencing against a reference satellite
cancels receiver clocks:

  DD pseudorange:  P_rb^ij = e_i . x  - e_j . x + dd_noise
  DD carrier:      L_rb^ij = (geometry) + lambda * N^ij + dd_noise

EKF state: [dx dy dz, N^1j .. N^mj] with the rover position random-walk
and ambiguities constant. The float ambiguity vector and its covariance
feed the LAMBDA search (decorrelating Z-transform + depth-first integer
search); a ratio test >= ``ratio_threshold`` accepts the fixed solution
and the position is re-conditioned on the integers.
"""

from __future__ import annotations

import dataclasses

import numpy as np

SPEED_OF_LIGHT = 299792458.0
L1_WAVELENGTH = SPEED_OF_LIGHT / 1575.42e6


# ---------------------------------------------------------------------------
# LAMBDA (integer least squares with decorrelation)
# ---------------------------------------------------------------------------


def _ldl(q: np.ndarray):
    """Q = L^T D L with unit lower-triangular L (rtklib LD factorization)."""
    n = q.shape[0]
    a = q.copy().astype(np.float64)
    l_mat = np.zeros((n, n))
    d = np.zeros(n)
    for i in range(n - 1, -1, -1):
        d[i] = a[i, i]
        if d[i] <= 0:
            raise np.linalg.LinAlgError("Q not positive definite")
        l_mat[i, : i + 1] = a[i, : i + 1] / np.sqrt(d[i])
        for j in range(i):
            a[j, : j + 1] -= l_mat[i, : j + 1] * l_mat[i, j]
        l_mat[i, : i + 1] /= l_mat[i, i]
    return l_mat, d


def _reduction(l_mat: np.ndarray, d: np.ndarray):
    """LAMBDA decorrelation (integer Gauss transforms + permutations),
    rtklib_lambda.cc ``reduction``. Returns (L, D, Z)."""
    n = d.shape[0]
    l_mat = l_mat.copy()
    d = d.copy()
    z = np.eye(n)
    j = n - 2
    k = n - 2
    while j >= 0:
        if j <= k:
            # integer Gauss elimination on column j
            for i in range(j + 1, n):
                mu = round(l_mat[i, j])
                if mu != 0:
                    l_mat[i:, j] -= mu * l_mat[i:, i]
                    z[:, j] -= mu * z[:, i]
        delta = d[j] + l_mat[j + 1, j] ** 2 * d[j + 1]
        if delta + 1e-6 < d[j + 1]:
            # permute j, j+1
            eta = d[j] / delta
            lam = d[j + 1] * l_mat[j + 1, j] / delta
            d[j] = eta * d[j + 1]
            d[j + 1] = delta
            a0 = l_mat[j, : j].copy()
            a1 = l_mat[j + 1, : j].copy()
            l_mat[j, : j] = -l_mat[j + 1, j] * a0 + a1
            l_mat[j + 1, : j] = eta * a0 + lam * a1
            l_mat[j + 1, j] = lam
            l_mat[j + 2:, [j, j + 1]] = l_mat[j + 2:, [j + 1, j]]
            z[:, [j, j + 1]] = z[:, [j + 1, j]]
            k = j
            j = n - 2
        else:
            j -= 1
    return l_mat, d, z


def _search(l_mat: np.ndarray, d: np.ndarray, zs: np.ndarray, m: int = 2):
    """Depth-first integer search (rtklib_lambda.cc ``search``):
    returns (candidates [m, n], squared norms [m])."""
    n = d.shape[0]
    maxdist = np.inf
    found: list[tuple[float, np.ndarray]] = []
    dist = np.zeros(n + 1)
    zb = np.zeros(n)
    z = np.zeros(n)
    step = np.zeros(n)
    k = n - 1
    zb[k] = zs[k]
    z[k] = round(zb[k])
    y = zb[k] - z[k]
    step[k] = np.sign(y) if y != 0 else 1.0
    for _ in range(20000):
        newdist = dist[k + 1] + y * y / d[k]
        if newdist < maxdist:
            if k != 0:
                k -= 1
                dist[k + 1] = newdist
                zb[k] = zs[k] + (z[k + 1:] - zb[k + 1:]) @ l_mat[k + 1:, k]
                z[k] = round(zb[k])
                y = zb[k] - z[k]
                step[k] = np.sign(y) if y != 0 else 1.0
            else:
                found.append((float(newdist), z.copy()))
                found.sort(key=lambda t: t[0])
                if len(found) > m:
                    found = found[:m]
                if len(found) == m:
                    maxdist = found[-1][0]
                z[0] += step[0]
                y = zb[0] - z[0]
                step[0] = -step[0] - np.sign(step[0])
        else:
            if k == n - 1:
                break
            k += 1
            z[k] += step[k]
            y = zb[k] - z[k]
            step[k] = -step[k] - np.sign(step[k])
    if not found:
        return np.zeros((0, n)), np.zeros(0)
    dists = np.array([t[0] for t in found])
    cands = np.stack([t[1] for t in found])
    return cands, dists


def lambda_fix(a_float: np.ndarray, q_a: np.ndarray,
               n_candidates: int = 2):
    """LAMBDA: float ambiguities + covariance -> (best integer vector,
    squared-norm ratio second/best). rtklib ``lambda_reduction``+search."""
    n = a_float.shape[0]
    if n == 0:
        return np.zeros(0), np.inf
    l_mat, d = _ldl(q_a)
    l_red, d_red, z = _reduction(l_mat, d)
    zs = z.T @ a_float
    cands, dists = _search(l_red, d_red, zs, m=max(2, n_candidates))
    if cands.shape[0] == 0:
        return None, 0.0
    zinv = np.linalg.inv(z.T)
    best = zinv @ cands[0]
    ratio = (dists[1] / max(dists[0], 1e-12)) if cands.shape[0] > 1 \
        else np.inf
    return np.round(best), float(ratio)


# ---------------------------------------------------------------------------
# DD EKF engine
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RtkConfig:
    wavelength_m: float = L1_WAVELENGTH
    code_sigma_m: float = 0.5          # zero-baseline single-diff sigma
    phase_sigma_m: float = 0.005
    pos_process_noise_m: float = 1.0   # per sqrt(epoch) random walk
    amb_process_noise_cycles: float = 1e-4
    ratio_threshold: float = 3.0       # AR validation (rtklib default)
    min_sats: int = 4


@dataclasses.dataclass
class RtkSolution:
    pos_ecef: np.ndarray
    float_pos_ecef: np.ndarray
    fixed: bool
    ratio: float
    n_sats: int
    ambiguities: dict


class RtkEngine:
    """Single-baseline DD EKF with LAMBDA ambiguity resolution."""

    def __init__(self, cfg: RtkConfig, base_pos_ecef):
        self.cfg = cfg
        self.base_pos = np.asarray(base_pos_ecef, dtype=np.float64)
        self.x: np.ndarray | None = None       # [3 + m]
        self.p: np.ndarray | None = None
        self.sats: list[int] = []              # ambiguity order (non-ref)
        self.ref_sat: int | None = None

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _unit_vectors(sat_pos: dict, rx: np.ndarray):
        out = {}
        for prn, sp in sat_pos.items():
            d = np.asarray(sp) - rx
            out[prn] = -d / np.linalg.norm(d)   # d(range)/d(rx)
        return out

    def _reorganize(self, prns: list[int], ref: int,
                    amb_init: dict) -> None:
        """Grow/shrink the state for the current satellite set.

        New ambiguities are seeded from (DD phase - DD code)/lambda
        (reference: rtklib_rtkpos.cc ``udbias``) with a code-noise-level
        variance — a zero prior would force the position states to
        absorb million-cycle phase innovations."""
        amb_var = (3.0 * self.cfg.code_sigma_m / self.cfg.wavelength_m) ** 2
        others = [p for p in prns if p != ref]
        if self.x is None or ref != self.ref_sat:
            # (re)start the filter: new reference invalidates ambiguities
            self.x = np.zeros(3 + len(others))
            self.x[:3] = self.base_pos  # initial rover guess = base
            self.x[3:] = [amb_init[s] for s in others]
            self.p = np.zeros((3 + len(others),) * 2)
            self.p[:3, :3] = np.eye(3) * 1e4
            self.p[3:, 3:] = np.eye(len(others)) * amb_var
            self.sats = others
            self.ref_sat = ref
            return
        # drop vanished, add new
        keep = [i for i, s in enumerate(self.sats) if s in others]
        new = [s for s in others if s not in self.sats]
        idx = list(range(3)) + [3 + i for i in keep]
        self.x = self.x[idx]
        self.p = self.p[np.ix_(idx, idx)]
        self.sats = [self.sats[i] for i in keep]
        for s in new:
            self.x = np.append(self.x, amb_init[s])
            pnew = np.zeros((self.x.size, self.x.size))
            pnew[:-1, :-1] = self.p
            pnew[-1, -1] = amb_var
            self.p = pnew
            self.sats.append(s)

    # -- epoch --------------------------------------------------------------

    def process_epoch(self, rover: dict, base: dict,
                      sat_pos: dict,
                      sat_pos_base: dict | None = None) -> RtkSolution | None:
        """rover/base: prn -> (pseudorange_m, carrier_phase_cycles);
        sat_pos: prn -> ECEF position at the ROVER measurement's transmit
        time. ``sat_pos_base`` optionally gives positions at the BASE
        measurement's transmit time: real receiver pairs sample at
        different true times (their clock biases differ by up to ms), and
        the differential range-rate across satellites turns that offset
        into meters of DD bias unless each leg uses its own geometry
        (rtklib satposs evaluates per-measurement transmit times).
        Returns the epoch solution."""
        cfg = self.cfg
        if sat_pos_base is None:
            sat_pos_base = sat_pos
        common = sorted(set(rover) & set(base) & set(sat_pos)
                        & set(sat_pos_base))
        if len(common) < cfg.min_sats:
            return None
        # reference satellite: highest elevation proxy = largest Z in ENU?
        # use max norm of unit-vector dot with up at base (cheap, stable)
        up = self.base_pos / np.linalg.norm(self.base_pos)
        elev = {p: float(np.dot(
            (np.asarray(sat_pos[p]) - self.base_pos)
            / np.linalg.norm(np.asarray(sat_pos[p]) - self.base_pos), up))
            for p in common}
        ref = max(common, key=lambda p: elev[p])
        lam0 = cfg.wavelength_m
        amb_init = {
            p: (((rover[p][1] - base[p][1]) - (rover[ref][1] - base[ref][1]))
                - ((rover[p][0] - base[p][0])
                   - (rover[ref][0] - base[ref][0])) / lam0)
            for p in common}
        self._reorganize(common, ref, amb_init)
        m = len(self.sats)
        nx = 3 + m

        # time update
        f_q = np.zeros((nx, nx))
        f_q[:3, :3] = np.eye(3) * cfg.pos_process_noise_m ** 2
        f_q[3:, 3:] = np.eye(m) * cfg.amb_process_noise_cycles ** 2
        self.p = self.p + f_q

        lam = cfg.wavelength_m
        # single differences rover-base
        sd_p = {p: rover[p][0] - base[p][0] for p in common}
        sd_l = {p: (rover[p][1] - base[p][1]) * lam for p in common}

        for _ in range(1):
            rx = self.x[:3]
            e_r = self._unit_vectors(sat_pos, rx)
            rho_r = {p: np.linalg.norm(np.asarray(sat_pos[p]) - rx)
                     for p in common}
            rho_b = {p: np.linalg.norm(
                np.asarray(sat_pos_base[p]) - self.base_pos)
                for p in common}
            # predicted SD geometry
            sd_geo = {p: rho_r[p] - rho_b[p] for p in common}
            z = []
            h_rows = []
            is_phase = []
            for p in self.sats:
                dd_p = (sd_p[p] - sd_p[ref]) - (sd_geo[p] - sd_geo[ref])
                row = np.zeros(nx)
                row[:3] = e_r[p] - e_r[ref]
                z.append(dd_p)
                h_rows.append(row)
                is_phase.append(False)
            for i, p in enumerate(self.sats):
                dd_l = (sd_l[p] - sd_l[ref]) - (sd_geo[p] - sd_geo[ref]) \
                    - lam * self.x[3 + i]
                row = np.zeros(nx)
                row[:3] = e_r[p] - e_r[ref]
                row[3 + i] = lam
                z.append(dd_l)
                h_rows.append(row)
                is_phase.append(True)
            z = np.asarray(z)
            h = np.asarray(h_rows)
            # DD noise: correlated through the reference satellite
            #   R = 2*sigma^2 * (I + 1) structure
            def dd_cov(sigma):
                return 2 * sigma * sigma * (np.eye(m) + np.ones((m, m)))
            r = np.zeros((2 * m, 2 * m))
            r[:m, :m] = dd_cov(cfg.code_sigma_m)
            r[m:, m:] = dd_cov(cfg.phase_sigma_m)
            s_mat = h @ self.p @ h.T + r
            k = np.linalg.solve(s_mat.T, (self.p @ h.T).T).T
            self.x = self.x + k @ z
            self.p = (np.eye(nx) - k @ h) @ self.p

        float_pos = self.x[:3].copy()
        # ambiguity resolution
        a_float = self.x[3:]
        q_a = self.p[3:, 3:]
        fixed = False
        ratio = 0.0
        pos = float_pos
        a_report = a_float
        if m >= 2:
            try:
                a_fix, ratio = lambda_fix(a_float, q_a)
            except np.linalg.LinAlgError:
                a_fix = None
            if a_fix is not None and ratio >= cfg.ratio_threshold:
                # condition position on the fixed integers:
                # x_f = x - P_xa Q_a^-1 (a - a_fix)
                p_xa = self.p[:3, 3:]
                da = a_float - a_fix
                pos = float_pos - p_xa @ np.linalg.solve(q_a, da)
                fixed = True
                a_report = a_fix
        return RtkSolution(
            pos_ecef=pos, float_pos_ecef=float_pos, fixed=fixed,
            ratio=ratio, n_sats=len(common),
            ambiguities={s: float(a_report[i])
                         for i, s in enumerate(self.sats)})
