"""Per-period decoder facades: GNAV meander-chip layer and D1 NH20 layer
driven with encoder-built symbol streams at one prompt per 1 ms period."""

import numpy as np
import pytest

from gnss_sdr_tpu.telemetry.beidou_d1 import build_subframe, subframe_to_symbols
from gnss_sdr_tpu.telemetry.glonass_gnav import build_string, string_to_symbols
from gnss_sdr_tpu.telemetry.period_decoders import (
    BEIDOU_NH20,
    BeidouD1PeriodDecoder,
    GlonassGnavPeriodDecoder,
)

EPH_GLO = dict(
    x_km=11987.0, y_km=-15002.5, z_km=18234.0,
    vx_km_s=1.25, vy_km_s=2.5, vz_km_s=-0.75,
    ax_km_s2=0.0, ay_km_s2=0.0, az_km_s2=0.0,
    gamma_n=1.8e-9, tau_n_s=-5.2e-6, tb_min=1350,
)


def _gnav_period_stream(frame_t0_s: float, n_strings: int) -> np.ndarray:
    """+-1 prompts at 1 ms: strings 1..n cycling ids 1..15, 10 periods
    per meander chip."""
    chips = []
    for i in range(n_strings):
        sid = (i % 15) + 1
        fields = {"string_id": sid}
        if sid == 1:
            fields.update(t_k_s=frame_t0_s - 30.0 * (i // 15) * 0
                          + 30.0 * (i // 15),
                          vx_km_s=EPH_GLO["vx_km_s"],
                          ax_km_s2=EPH_GLO["ax_km_s2"],
                          x_km=EPH_GLO["x_km"])
        elif sid == 2:
            fields.update(tb_min=EPH_GLO["tb_min"],
                          vy_km_s=EPH_GLO["vy_km_s"],
                          ay_km_s2=EPH_GLO["ay_km_s2"],
                          y_km=EPH_GLO["y_km"])
        elif sid == 3:
            fields.update(gamma_n=EPH_GLO["gamma_n"],
                          vz_km_s=EPH_GLO["vz_km_s"],
                          az_km_s2=EPH_GLO["az_km_s2"],
                          z_km=EPH_GLO["z_km"])
        elif sid == 4:
            fields.update(tau_n_s=EPH_GLO["tau_n_s"], n_t=803)
        chips.append(string_to_symbols(build_string(fields)))
    chips = np.concatenate(chips)
    return np.repeat(chips, 10)


@pytest.mark.parametrize("offset", [0, 7])
def test_gnav_period_decoder_ephemeris_and_tow(offset):
    t0 = 41400.0  # frame start, multiple of 30 s
    stream = _gnav_period_stream(t0, 17)[offset:]
    dec = GlonassGnavPeriodDecoder()
    tow_checks = []
    for i, p in enumerate(stream):
        dec.feed(p * 1000.0, sample_stamp=i)
        if dec.tow_at_last_symbol_ms is not None:
            # period i ends at stream time (offset + i + 1) ms; GNAV time
            # = t0 + stream time
            expected = t0 * 1e3 + (offset + i + 1)
            tow_checks.append(dec.tow_at_last_symbol_ms - expected)
    assert dec.has_full_ephemeris()
    f = dec.ephemeris_fields
    assert f["x_km"] == pytest.approx(EPH_GLO["x_km"], abs=2e-3)
    assert f["tb_min"] == EPH_GLO["tb_min"]
    assert f["tau_n_s"] == pytest.approx(EPH_GLO["tau_n_s"], abs=2e-9)
    assert tow_checks, "TOW never anchored"
    assert max(abs(t) for t in tow_checks) < 0.5  # sub-ms consistency


EPH_BDS = dict(
    sow=249000.0, wn=810, toc=252000.0, tgd1=4e-9,
    a0=2.5e-5, a1=1.1e-11, a2=0.0,
    delta_n=4.2e-9, cuc=1.1e-6, m0=0.8, e=0.004, cus=-2e-6,
    crc=210.0, crs=-35.0, sqrt_a=5282.6, toe=252000.0,
    i0=0.96, cic=4e-8, omega_dot=-6.6e-9, cis=-3e-8,
    idot=2.4e-10, omega_0=1.2, omega=-2.2,
)


def _d1_period_stream(n_frames: int, start_sow: float) -> np.ndarray:
    """D1 symbol stream x NH20 at 1 ms periods: subframes 1..3 cycling."""
    nh = np.array([1.0 if c == "0" else -1.0 for c in BEIDOU_NH20])
    syms = []
    for i in range(n_frames):
        fid = (i % 3) + 1
        fields = dict(EPH_BDS)
        fields["sow"] = start_sow + 6.0 * i
        bits = build_subframe(fid, fields)
        tx = subframe_to_symbols(bits)
        syms.append(np.where(tx == 1, -1.0, 1.0))  # bit 1 -> -1 BPSK
    syms = np.concatenate(syms)
    # each 20 ms symbol spreads over 20 NH periods
    return (syms[:, None] * nh[None, :]).reshape(-1)


@pytest.mark.parametrize("offset", [0, 13])
def test_d1_period_decoder_ephemeris_and_tow(offset):
    start_sow = 249000.0
    stream = _d1_period_stream(4, start_sow)[offset:]
    dec = BeidouD1PeriodDecoder()
    tow_errs = []
    for i, p in enumerate(stream):
        dec.feed(p * 800.0, sample_stamp=i)
        if dec.tow_at_last_symbol_ms is not None:
            # period i ends at BDS time start_sow*1e3 + offset + i + 1 ms
            expected = start_sow * 1e3 + (offset + i + 1)
            tow_errs.append(dec.tow_at_last_symbol_ms - expected)
    assert dec.has_full_ephemeris()
    f = dec.ephemeris_fields
    assert f["sqrt_a"] == pytest.approx(EPH_BDS["sqrt_a"], rel=1e-9)
    assert f["toe_s"] == pytest.approx(EPH_BDS["toe"])
    assert f["af0"] == pytest.approx(EPH_BDS["a0"], rel=1e-3)
    assert tow_errs, "TOW never anchored"
    assert max(abs(t) for t in tow_errs) < 0.5
