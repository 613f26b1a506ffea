"""obsdiff: compare two RINEX observation files.

Counterpart of the reference's rinex-tools utility
(/root/reference/src/utils/rinex-tools/obsdiff.cc): aligns the epochs
of two observation files (e.g. this receiver vs a reference receiver
over the same capture), single-differences each common satellite's
observables per epoch, and reports per-observable statistics. The
reference's full tool also supports double differencing against a
remote receiver; here the single-receiver/single-difference workflow
(its default ``dupl_sat``-less mode) is implemented.

Usage: ``python -m gnss_sdr_tpu.utils.obsdiff <ref.obs> <test.obs>``
"""

from __future__ import annotations

import sys

import numpy as np


def parse_rinex_obs(path: str) -> dict:
    """Parse a RINEX 3 observation file written by
    :class:`~gnss_sdr_tpu.monitor.rinex.RinexObsWriter` (or any v3 file
    with the same C/L/D/S quartet layout). Returns
    ``{"codes": {sys: [code,...]}, "epochs": [(tow_key, {sat: {code:
    value}})]}``."""
    codes: dict[str, list[str]] = {}
    epochs: list = []
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines):
        label = lines[i][60:80].strip()
        if label == "SYS / # / OBS TYPES":
            sysc = lines[i][0]
            if sysc != " ":
                codes[sysc] = lines[i][7:60].split()
            else:
                codes[list(codes)[-1]].extend(lines[i][7:60].split())
        if label == "END OF HEADER":
            break
        i += 1
    cur = None
    for ln in lines[i + 1:]:
        if ln.startswith(">"):
            cur = {}
            epochs.append((ln[2:29], cur))
        elif cur is not None and len(ln) > 3 and ln[1:3].strip().isdigit():
            sat = ln[:3]
            sysc = ln[0]
            vals = {}
            for k, code in enumerate(codes.get(sysc, [])):
                f = ln[3 + 16 * k: 3 + 16 * k + 14].strip()
                if f:
                    vals[code] = float(f)
            cur[sat] = vals
    return {"codes": codes, "epochs": epochs}


def diff_stats(ref: dict, test: dict) -> dict[str, dict[str, float]]:
    """Per-observable single-difference statistics over aligned epochs
    and common satellites (obsdiff.cc compute_single_diffs role)."""
    test_by_key = {k: v for k, v in test["epochs"]}
    diffs: dict[str, list[float]] = {}
    for key, ref_sats in ref["epochs"]:
        t_sats = test_by_key.get(key)
        if t_sats is None:
            continue
        for sat, ref_vals in ref_sats.items():
            t_vals = t_sats.get(sat)
            if t_vals is None:
                continue
            for code, rv in ref_vals.items():
                tv = t_vals.get(code)
                if tv is not None:
                    diffs.setdefault(code, []).append(tv - rv)
    out = {}
    for code, d in diffs.items():
        a = np.asarray(d)
        out[code] = {"n": int(a.size), "mean": float(a.mean()),
                     "std": float(a.std()),
                     "rms": float(np.sqrt(np.mean(a * a)))}
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print("usage: obsdiff <ref.obs> <test.obs>", file=sys.stderr)
        return 2
    stats = diff_stats(parse_rinex_obs(argv[0]), parse_rinex_obs(argv[1]))
    for code in sorted(stats):
        s = stats[code]
        print(f"{code}: n={s['n']} mean={s['mean']:.4f} "
              f"std={s['std']:.4f} rms={s['rms']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
