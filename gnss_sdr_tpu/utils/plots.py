"""Plot utilities for tracking/acquisition/PVT dumps.

Python counterpart of the reference's MATLAB/Octave plot scripts
(/root/reference/src/utils/matlab/: dll_pll_veml_plot_sample.m,
plot_acq_grid.m, gps_l1_ca_pvt_raw_plot_sample.m,
plot_tracking_quality_indicators.m). Each function reads the dump
artifacts this framework writes (TrackingDump .npz/.mat, acquisition
grid arrays, PvtSolution lists) and renders the same panels.

matplotlib is optional at import time; functions raise a clear error if
it is unavailable. All figures use the non-interactive Agg backend so
they work headless; pass ``out`` to save a PNG.
"""

from __future__ import annotations

import math

import numpy as np

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    _HAVE_MPL = True
except Exception:  # pragma: no cover - matplotlib present in CI image
    _HAVE_MPL = False


def _require_mpl():
    if not _HAVE_MPL:
        raise RuntimeError(
            "matplotlib is required for plotting; install it or use the "
            "raw dump arrays directly")


def _load_tracking(dump) -> dict[str, np.ndarray]:
    """Accept a TrackingDump, a dict of arrays, or an .npz path."""
    if hasattr(dump, "arrays"):
        return dump.arrays()
    if isinstance(dump, dict):
        return {k: np.asarray(v) for k, v in dump.items()}
    with np.load(dump) as z:
        return {k: z[k] for k in z.files}


def plot_tracking(dump, *, period_ms: float = 1.0, title: str | None = None,
                  out=None):
    """The dll_pll_veml_plot_sample.m panel set: E/P/L magnitudes,
    prompt I/Q scatter + time series, C/N0, carrier Doppler, and the
    carrier lock test, over tracking time."""
    _require_mpl()
    a = _load_tracking(dump)
    n = len(a["abs_P"])
    t = np.arange(n) * period_ms * 1e-3
    fig, axes = plt.subplots(3, 2, figsize=(12, 9))
    ax = axes[0][0]
    ax.plot(t, a["abs_E"], label="|E|", lw=0.7)
    ax.plot(t, a["abs_P"], label="|P|", lw=0.7)
    ax.plot(t, a["abs_L"], label="|L|", lw=0.7)
    ax.set_title("Correlator magnitudes")
    ax.set_xlabel("s")
    ax.legend()
    ax = axes[0][1]
    ax.plot(a["Prompt_I"], a["Prompt_Q"], ".", ms=1.5)
    ax.set_title("Prompt constellation")
    ax.set_xlabel("I")
    ax.set_ylabel("Q")
    ax.axhline(0.0, color="k", lw=0.3)
    ax.axvline(0.0, color="k", lw=0.3)
    ax = axes[1][0]
    ax.plot(t, a["Prompt_I"], lw=0.6, label="I_P")
    ax.plot(t, a["Prompt_Q"], lw=0.6, label="Q_P")
    ax.set_title("Prompt I/Q (nav bits on I after lock)")
    ax.set_xlabel("s")
    ax.legend()
    ax = axes[1][1]
    ax.plot(t, a["CN0_SNV_dB_Hz"], lw=0.8)
    ax.set_title("C/N0 (SNV) [dB-Hz]")
    ax.set_xlabel("s")
    ax = axes[2][0]
    ax.plot(t, a["carrier_doppler_hz"], lw=0.8)
    ax.set_title("Carrier Doppler [Hz]")
    ax.set_xlabel("s")
    ax = axes[2][1]
    ax.plot(t, a["carrier_lock_test"], lw=0.8)
    ax.axhline(0.85, color="r", lw=0.5, ls="--")
    ax.set_ylim(-1.05, 1.05)
    ax.set_title("Carrier lock test (cos 2φ)")
    ax.set_xlabel("s")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if out is not None:
        fig.savefig(out, dpi=110)
        plt.close(fig)
        return out
    return fig


def plot_acq_grid(grid, dopplers_hz, fs_sps: float, chip_rate: float, *,
                  prn: int | None = None, out=None):
    """plot_acq_grid.m: the (code delay × Doppler) search surface with
    the peak marked — takes the magnitude grid straight out of
    PcpsAcquisition (``AcqResult.grid`` or any [n_doppler, n_samples]
    array)."""
    _require_mpl()
    g = np.asarray(grid)
    dop = np.asarray(dopplers_hz, dtype=np.float64)
    delay_chips = np.arange(g.shape[1]) * chip_rate / fs_sps
    fig = plt.figure(figsize=(9, 6))
    ax = fig.add_subplot(111, projection="3d")
    step = max(1, g.shape[1] // 512)  # decimate delay axis for drawing
    x, y = np.meshgrid(delay_chips[::step], dop)
    ax.plot_surface(x, y, g[:, ::step], cmap="viridis",
                    rstride=1, cstride=1, linewidth=0)
    k = np.unravel_index(int(np.argmax(g)), g.shape)
    ax.set_title(
        ("PRN %s — " % prn if prn is not None else "")
        + f"peak @ {delay_chips[k[1]]:.1f} chips, {dop[k[0]]:.0f} Hz")
    ax.set_xlabel("code delay [chips]")
    ax.set_ylabel("Doppler [Hz]")
    ax.set_zlabel("|corr|^2")
    if out is not None:
        fig.savefig(out, dpi=110)
        plt.close(fig)
        return out
    return fig


def _enu_series(solutions):
    """ENU offsets of each fix from the mean position, plus (lat, lon)."""
    lats = np.array([s.lat_rad for s in solutions])
    lons = np.array([s.lon_rad for s in solutions])
    hts = np.array([s.height_m for s in solutions])
    lat0, lon0, h0 = lats.mean(), lons.mean(), hts.mean()
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2 - f)
    rn = a / math.sqrt(1 - e2 * math.sin(lat0) ** 2)
    east = (lons - lon0) * (rn + h0) * math.cos(lat0)
    north = (lats - lat0) * (rn * (1 - e2) / (1 - e2 * math.sin(lat0) ** 2) + h0)
    up = hts - h0
    return east, north, up


def plot_pvt(solutions, *, title: str | None = None, out=None):
    """gps_l1_ca_pvt_raw_plot_sample.m: EN scatter with CEP/2DRMS
    circles, ENU time series, and DOPs, from a list of PvtSolution."""
    _require_mpl()
    sols = [s for s in solutions if getattr(s, "valid", True)]
    if not sols:
        raise ValueError("no valid PVT solutions to plot")
    east, north, up = _enu_series(sols)
    fig, axes = plt.subplots(2, 2, figsize=(11, 9))
    ax = axes[0][0]
    ax.plot(east, north, ".", ms=3)
    r = np.hypot(east, north)
    cep = float(np.percentile(r, 50))
    drms2 = 2.0 * float(np.sqrt(np.mean(east**2) + np.mean(north**2)))
    for rad, lbl, c in ((cep, f"CEP {cep:.2f} m", "tab:orange"),
                        (drms2, f"2DRMS {drms2:.2f} m", "tab:red")):
        ax.add_patch(plt.Circle((0, 0), rad, fill=False, color=c, label=lbl))
    ax.set_aspect("equal")
    ax.set_title("EN scatter (about mean)")
    ax.set_xlabel("East [m]")
    ax.set_ylabel("North [m]")
    ax.legend()
    ax = axes[0][1]
    ax.plot(east, lw=0.8, label="E")
    ax.plot(north, lw=0.8, label="N")
    ax.plot(up, lw=0.8, label="U")
    ax.set_title("ENU vs epoch")
    ax.set_xlabel("epoch")
    ax.set_ylabel("m")
    ax.legend()
    ax = axes[1][0]
    for key in ("gdop", "pdop", "hdop", "vdop"):
        ax.plot([getattr(s, key) for s in sols], lw=0.8, label=key.upper())
    ax.set_title("DOPs")
    ax.set_xlabel("epoch")
    ax.legend()
    ax = axes[1][1]
    ax.plot([s.n_sats for s in sols], lw=0.8)
    ax.set_title("Satellites used")
    ax.set_xlabel("epoch")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if out is not None:
        fig.savefig(out, dpi=110)
        plt.close(fig)
        return out
    return fig


def main(argv=None):  # pragma: no cover - thin CLI
    """CLI: ``python -m gnss_sdr_tpu.utils.plots tracking dump.npz out.png``"""
    import argparse
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("kind", choices=["tracking"])
    p.add_argument("dump")
    p.add_argument("out")
    p.add_argument("--period-ms", type=float, default=1.0)
    args = p.parse_args(argv)
    plot_tracking(args.dump, period_ms=args.period_ms, out=args.out)
    print(args.out)


if __name__ == "__main__":  # pragma: no cover
    main()
