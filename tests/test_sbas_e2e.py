"""SBAS end-to-end: an SBAS L1 channel decodes DO-229 messages in-band
and the corrections are applied inside positioning — corrected fixes
beat uncorrected ones (sbas_l1_telemetry_decoder_gs + rtklib_sbas.cc
application roles)."""

import dataclasses

import numpy as np

from gnss_sdr_tpu.constants.general import SPEED_OF_LIGHT_M_S as C
from gnss_sdr_tpu.receiver.multiband import (
    BandConfig,
    MultiBandConfig,
    MultiBandReceiver,
)
from gnss_sdr_tpu.simulate.scenario import (
    make_constellation,
    rx_position,
    visible_sats,
)
from gnss_sdr_tpu.telemetry.sbas_corrections import encode_mt1, encode_mt2
from gnss_sdr_tpu.telemetry.sbas_l1 import build_block

FS = 2.5e6


def test_sbas_channel_corrects_broadcast_clock_errors():
    from gnss_sdr_tpu.simulate.rf_scene import (generate_sbas_l1_signal,
                                                generate_scene)

    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 5.0
    duration = 8.4
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:5]
    assert len(prns) >= 5
    # the signals fly with the TRUE clocks; the receiver's assistance
    # carries degraded broadcast clocks (the situation SBAS exists for)
    rng = np.random.default_rng(5)
    clock_err_s = {p: float(rng.uniform(-25e-9, 25e-9)) for p in prns}
    degraded = {p: dataclasses.replace(ephs[p],
                                       af0=ephs[p].af0 + clock_err_s[p])
                for p in prns}
    x = generate_scene(ephs, prns, rx, t_start, duration, FS,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=61)

    # SBAS stream: MT1 PRN mask + MT2 fast corrections cancelling the
    # broadcast clock errors (PRC = -c * daf0, DO-229 A.4.4.3)
    iodp = 2
    mask_prns = sorted(prns)
    prcs = [0.0] * 13
    udreis = [2] * 13
    for i, p in enumerate(mask_prns):
        prcs[i] = -C * clock_err_s[p]
    blocks = []
    for k in range(10):
        blocks.append(build_block(1, encode_mt1(mask_prns, iodp)[14:226]))
        blocks.append(build_block(2, encode_mt2(
            2, iodp, k % 4, prcs, udreis)[14:226]))
    sbas_sig = generate_sbas_l1_signal(
        120, np.concatenate([b for b in blocks]), FS, duration,
        delay_samples=733.0, doppler_hz=96.0)
    x = x + 0.9 * sbas_sig

    def build(with_sbas: bool):
        bands = [BandConfig(suffix="1C", satellites=list(prns),
                            n_channels=5, doppler_max=5000.0,
                            doppler_step=250.0, acq_pfa=0.001,
                            acq_dwells=2, pull_in_time_s=0.4)]
        if with_sbas:
            bands.append(BandConfig(suffix="S1", satellites=[120],
                                    n_channels=1, doppler_max=2000.0,
                                    doppler_step=250.0, acq_pfa=0.001,
                                    acq_dwells=2, pull_in_time_s=0.4))
        rec = MultiBandReceiver(
            MultiBandConfig(fs=FS, output_rate_ms=100),
            bands,
            assisted_ephemeris={("G", p): degraded[p] for p in prns})
        rec.run(x)
        return rec

    rec_plain = build(with_sbas=False)
    rec_sbas = build(with_sbas=True)
    assert rec_sbas.sbas is not None and rec_sbas.sbas.fast, \
        "no fast corrections decoded from the SBAS channel"
    sols_p = rec_plain.solutions
    sols_s = rec_sbas.solutions
    assert len(sols_p) >= 3 and len(sols_s) >= 3, (len(sols_p), len(sols_s))
    err_p = float(np.mean(
        [np.linalg.norm(s.pos_ecef - rx) for s in sols_p[1:]]))
    err_s = float(np.mean(
        [np.linalg.norm(s.pos_ecef - rx) for s in sols_s[1:]]))
    # the degraded clocks cost meters; SBAS recovers most of it
    assert err_p > 3.0, f"uncorrected error only {err_p} m"
    assert err_s < 0.6 * err_p, f"SBAS {err_s} m vs plain {err_p} m"
    assert err_s < 5.0, f"corrected error {err_s} m"
