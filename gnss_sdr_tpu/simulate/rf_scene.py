"""Geometry-accurate multi-satellite IF scene synthesis.

Unlike :mod:`generator` (fixed delay/Doppler), this models the full
time-varying light-time per satellite — delay tau(t) from the ephemeris via
the light-time equation, satellite clock bias, carrier phase = -2*pi*fc*tau
— so pseudoranges, Doppler trajectories and nav-data timing are mutually
consistent and a full receiver run can be scored against the truth
position (the reference's position_test methodology,
src/tests/system-tests/position_test.cc).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.constants.general import SPEED_OF_LIGHT_M_S
from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris
from gnss_sdr_tpu.simulate.lnav import build_lnav_bits
from gnss_sdr_tpu.simulate.scenario import true_range_and_rate

CHIP_RATE = 1.023e6
CODE_LEN = 1023
CARRIER_HZ = 1575.42e6
CHIPS_PER_BIT = CODE_LEN * 20


def generate_scene(
    ephs: dict[int, GpsEphemeris],
    prns: list[int],
    rx_ecef: np.ndarray,
    t_start: float,
    duration_s: float,
    fs: float,
    bits_start_tow_s: float,
    n_subframes: int = 5,
    cn0_db_hz: float = 48.0,
    seed: int = 0,
    tau_grid_hz: float = 10.0,
    bandlimit: bool = True,
) -> np.ndarray:
    """Received complex baseband at GPS times t_start .. t_start+duration.

    ``bits_start_tow_s`` must be a subframe boundary (multiple of 6 s);
    each satellite transmits its LNAV stream from that boundary. The
    receiver clock is ideal (sample n at GPS time t_start + n/fs).

    ``rx_ecef`` is a fixed [3] ECEF position, or a callable
    ``t_gps_s -> [3]`` for a moving receiver (dynamic scenarios — the
    reference's position_test with a Spirent motion file); the antenna
    position is evaluated at each *reception* time on the tau grid.
    """
    n = int(round(fs * duration_s))
    t_rel = np.arange(n) / fs
    out = None
    rng = np.random.default_rng(seed)
    rx_of = rx_ecef if callable(rx_ecef) else (lambda t: rx_ecef)

    # light-time grid (tau is smooth; quadratic error of linear interp over
    # 1/tau_grid_hz is sub-mm)
    n_grid = int(duration_s * tau_grid_hz) + 3
    t_grid = t_start + np.arange(n_grid) / tau_grid_hz

    for prn in prns:
        eph = ephs[prn]
        taus = np.empty(n_grid)
        for i, tg in enumerate(t_grid):
            rho, _, _ = true_range_and_rate(
                eph, np.asarray(rx_of(tg), dtype=float), tg)
            taus[i] = rho / SPEED_OF_LIGHT_M_S
        tau_t = np.interp(t_start + t_rel, t_grid, taus)
        # satellite clock (as observable on L1: clock minus TGD)
        t_tx0 = t_start - float(taus[0])
        dts = eph.clock_bias_s(t_tx0) - eph.tgd_s

        # transmit-time chip phase relative to the bit-stream origin
        chips = (t_start - bits_start_tow_s + t_rel - tau_t + dts) * CHIP_RATE
        chip_idx = np.floor(chips).astype(np.int64)
        code = gps_l1ca_code(prn).astype(np.float64)
        spread = code[chip_idx % CODE_LEN]
        bits = build_lnav_bits(eph, int(round(bits_start_tow_s / 6.0)),
                               n_subframes)
        bit_idx = np.clip(chip_idx // CHIPS_PER_BIT, 0, len(bits) - 1)
        spread = spread * bits[bit_idx]

        phase = -2.0 * np.pi * CARRIER_HZ * tau_t
        sig = spread * np.exp(1j * phase)
        out = sig if out is None else out + sig

    if bandlimit:
        # front-end anti-alias filter: ideal rectangular chips sampled
        # instantaneously bias the sampled E-L discriminator by a few
        # meters per satellite; a real RF front end bandlimits the chips
        # (smooth edges), which removes the quantization bias.
        from scipy import signal as sp_signal

        taps = sp_signal.firwin(65, 0.9)  # cutoff at 0.45*fs
        out = sp_signal.fftconvolve(out, taps, mode="same")

    sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
    out = out + sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def _inav_symbol_stream(eph: GpsEphemeris, start_tow_s: float,
                        n_pages: int,
                        cycle=(5, 1, 5, 2, 5, 3, 5, 4)) -> np.ndarray:
    """+-1 I/NAV symbol stream at 250 sps cycling the given word types.

    Page pair k (2 s) starts at GST start_tow_s + 2k; its word-5 GST
    stamps the time at the end of the odd part (= start of the next even
    part), matching the decoder's TOW anchoring. The default cycle
    interleaves word 5 (GST time) so a receiver gets TOW within ~4 s.
    """
    from gnss_sdr_tpu.telemetry.galileo_inav import (
        build_inav_word,
        build_page_pair,
        encode_page_part,
    )

    parts = []
    for k in range(n_pages):
        wtype = cycle[k % len(cycle)]
        fields = dict(word_type=wtype)
        if wtype == 1:
            fields.update(iod_nav=101, toe_s=eph.toe_s, m0_rad=eph.m0_rad,
                          ecc=eph.ecc, sqrt_a=eph.sqrt_a)
        elif wtype == 2:
            fields.update(iod_nav=101, omega0_rad=eph.omega0_rad,
                          i0_rad=eph.i0_rad, omega_rad=eph.omega_rad,
                          idot_rad_s=eph.idot_rad_s)
        elif wtype == 3:
            fields.update(iod_nav=101, omega_dot_rad_s=eph.omega_dot_rad_s,
                          delta_n_rad_s=eph.delta_n_rad_s,
                          cuc_rad=eph.cuc_rad, cus_rad=eph.cus_rad,
                          crc_m=eph.crc_m, crs_m=eph.crs_m)
        elif wtype == 4:
            fields.update(iod_nav=101, svid=eph.prn, cic_rad=eph.cic_rad,
                          cis_rad=eph.cis_rad, toc_s=eph.toc_s,
                          af0=eph.af0, af1=eph.af1, af2=eph.af2)
        elif wtype == 5:
            fields.update(week_number=eph.week_number,
                          tow_s=int(start_tow_s + 2 * k + 2),
                          bgd_e1e5b_s=eph.tgd_s)
        even, odd = build_page_pair(build_inav_word(fields))
        parts.append(encode_page_part(even))
        parts.append(encode_page_part(odd))
    return np.concatenate(parts)


def generate_galileo_scene(
    ephs: dict[int, GpsEphemeris],
    prns: list[int],
    rx_ecef: np.ndarray,
    t_start: float,
    duration_s: float,
    fs: float,
    bits_start_tow_s: float,
    cn0_db_hz: float = 48.0,
    seed: int = 1,
    tau_grid_hz: float = 10.0,
    noise: bool = True,
    bandlimit: bool = True,
    pilot: bool = False,
) -> np.ndarray:
    """Geometry-accurate Galileo E1-B scene with live I/NAV data.

    ``bits_start_tow_s`` must be even (a page boundary). Ephemerides use
    the same Kepler parameterization as GPS (GST time base == simulation
    time base; BGD carried in eph.tgd_s). With ``pilot=True`` the full
    composite e(t) = (e_B d_B - e_C c_CS25)/sqrt(2) is emitted (Galileo
    OS SIS ICD eq. 3; CS25 aligned to the 100 ms grid of the page
    structure) and ``cn0_db_hz`` refers to TOTAL power.
    """
    from gnss_sdr_tpu.codes.galileo_e1 import (E1C_SECONDARY,
                                               galileo_e1_subchips)

    e1_chip_rate = 1.023e6
    sub_per_code = 4092 * 12
    symbol_s = 0.004

    n = int(round(fs * duration_s))
    t_rel = np.arange(n) / fs
    out = None
    rng = np.random.default_rng(seed)
    n_grid = int(duration_s * tau_grid_hz) + 3
    t_grid = t_start + np.arange(n_grid) / tau_grid_hz

    n_pages = int(np.ceil((t_start + duration_s - bits_start_tow_s) / 2.0)) + 1
    for prn in prns:
        eph = ephs[prn]
        taus = np.empty(n_grid)
        for i, tg in enumerate(t_grid):
            rho, _, _ = true_range_and_rate(eph, rx_ecef, tg)
            taus[i] = rho / SPEED_OF_LIGHT_M_S
        tau_t = np.interp(t_start + t_rel, t_grid, taus)
        dts = eph.clock_bias_s(t_start - float(taus[0])) - eph.tgd_s

        t_tx = t_start - bits_start_tow_s + t_rel - tau_t + dts
        sub = galileo_e1_subchips(prn, "B", cboc=True).astype(np.float64)
        sub_idx = np.floor(t_tx * e1_chip_rate * 12.0).astype(np.int64)
        spread = sub[sub_idx % sub_per_code]
        symbols = _inav_symbol_stream(eph, bits_start_tow_s, n_pages)
        sym_idx = np.clip(np.floor(t_tx / symbol_s).astype(np.int64),
                          0, len(symbols) - 1)
        spread = spread * symbols[sym_idx]
        if pilot:
            sub_c = galileo_e1_subchips(prn, "C", cboc=True) \
                .astype(np.float64)
            cs25 = np.array([1.0 if c == "0" else -1.0
                             for c in E1C_SECONDARY])
            per_idx = np.floor(t_tx / symbol_s).astype(np.int64)
            pilot_spread = sub_c[sub_idx % sub_per_code] \
                * cs25[per_idx % 25]
            spread = (spread - pilot_spread) / np.sqrt(2.0)
        phase = -2.0 * np.pi * CARRIER_HZ * tau_t
        sig = spread * np.exp(1j * phase)
        out = sig if out is None else out + sig

    if bandlimit:
        # same front-end anti-alias smoothing rationale as generate_scene:
        # instantaneously-sampled rectangular (sub)chips bias the sampled
        # E-L discriminator by meters
        from scipy import signal as sp_signal

        taps = sp_signal.firwin(65, 0.9)
        out = sp_signal.fftconvolve(out, taps, mode="same")

    if noise:
        sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
        out = out + sigma * (rng.standard_normal(n)
                             + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def _light_time_grid(eph, rx_of, t_start, duration_s, tau_grid_hz):
    n_grid = int(duration_s * tau_grid_hz) + 3
    t_grid = t_start + np.arange(n_grid) / tau_grid_hz
    taus = np.empty(n_grid)
    for i, tg in enumerate(t_grid):
        rho, _, _ = true_range_and_rate(
            eph, np.asarray(rx_of(tg), dtype=float), tg)
        taus[i] = rho / SPEED_OF_LIGHT_M_S
    return t_grid, taus


def _bandlimit(x: np.ndarray) -> np.ndarray:
    # front-end anti-alias smoothing (see generate_scene)
    from scipy import signal as sp_signal

    taps = sp_signal.firwin(65, 0.9)
    return sp_signal.fftconvolve(x, taps, mode="same")


def generate_glonass_scene(
    ephs: dict,
    slots: dict,
    prns: list[int],
    rx_ecef: np.ndarray,
    t_start: float,
    duration_s: float,
    fs: float,
    frame_start_tow_s: float,
    cn0_db_hz: float = 48.0,
    seed: int = 2,
    tau_grid_hz: float = 10.0,
    noise: bool = True,
    bandlimit: bool = True,
    band: str = "L1",
) -> np.ndarray:
    """Geometry-accurate GLONASS L1/L2 C/A FDMA scene with live GNAV data.

    ``ephs``: slot number -> :class:`GlonassEphemeris` (state-vector, SI);
    ``slots``: slot number -> FDMA frequency channel k in -7..6. Baseband
    is centered on the band center (1602 MHz L1 / 1246 MHz L2), so slot k
    rides at +k*562.5 kHz (L1) or +k*437.5 kHz (L2)
    (GLONASS_L1_L2_CA.h:76-79). ``frame_start_tow_s`` must be a multiple
    of 30 s (GNAV frame grid, ICD 4.2); strings cycle ids 1..15 with the
    ephemeris in strings 1-4 and valid-KX filler elsewhere, each string =
    1.7 s bi-binary data + 0.3 s time mark (glonass_gnav string layout).
    The ephemeris is quantized to ICD scales before signal synthesis so
    the decoded state matches the transmitted geometry exactly.
    """
    from gnss_sdr_tpu.codes.glonass_l1ca import glonass_l1ca_code
    from gnss_sdr_tpu.telemetry.glonass_gnav import (build_string,
                                                     string_to_symbols)

    chip_rate = 0.511e6
    code_len = 511
    f_center, slot_step = ((1602.0e6, 562_500.0) if band == "L1"
                           else (1246.0e6, 437_500.0))
    n = int(round(fs * duration_s))
    t_rel = np.arange(n) / fs
    out = None
    rng = np.random.default_rng(seed)
    rx_of = rx_ecef if callable(rx_ecef) else (lambda t: rx_ecef)
    code = glonass_l1ca_code().astype(np.float64)

    n_strings = int(np.ceil(
        (t_start + duration_s - frame_start_tow_s) / 2.0)) + 1
    day_s = frame_start_tow_s % 86400.0

    for prn in prns:
        eph = ephs[prn]
        k = slots.get(prn, 0)
        # quantize the broadcast state to ICD scales (what the receiver
        # will decode), then synthesize geometry FROM the quantized state
        f_ice = dict(
            x_km=eph.pos_m[0] / 1e3, y_km=eph.pos_m[1] / 1e3,
            z_km=eph.pos_m[2] / 1e3,
            vx_km_s=eph.vel_m_s[0] / 1e3, vy_km_s=eph.vel_m_s[1] / 1e3,
            vz_km_s=eph.vel_m_s[2] / 1e3,
            ax_km_s2=eph.acc_m_s2[0] / 1e3, ay_km_s2=eph.acc_m_s2[1] / 1e3,
            az_km_s2=eph.acc_m_s2[2] / 1e3,
            gamma_n=eph.gamma_n, tau_n_s=eph.tau_n_s,
            tb_min=int(round(eph.tb_s / 60.0)),
        )

        def q(v, scale):
            return round(v / scale) * scale

        f_q = dict(f_ice)
        for key, scale in (("x_km", 2.0**-11), ("y_km", 2.0**-11),
                           ("z_km", 2.0**-11),
                           ("vx_km_s", 2.0**-20), ("vy_km_s", 2.0**-20),
                           ("vz_km_s", 2.0**-20),
                           ("ax_km_s2", 2.0**-30), ("ay_km_s2", 2.0**-30),
                           ("az_km_s2", 2.0**-30),
                           ("gamma_n", 2.0**-40), ("tau_n_s", 2.0**-30)):
            f_q[key] = q(f_q[key], scale)
        from gnss_sdr_tpu.pvt.glonass_ephemeris import GlonassEphemeris

        eph_q = GlonassEphemeris.from_fields(prn, f_q)
        eph_q = dataclasses.replace(eph_q, freq_slot=k)

        t_grid, taus = _light_time_grid(eph_q, rx_of, t_start,
                                        duration_s, tau_grid_hz)
        tau_t = np.interp(t_start + t_rel, t_grid, taus)
        dts = eph_q.clock_bias_s(t_start - float(taus[0]))

        # GNAV string chips (10 ms each). Two trailing strings of the
        # PREVIOUS frame are prepended so a receiver starting shortly
        # before the frame boundary sees a real time mark ahead of
        # string 1 (without them the pre-frame stream is a clipped
        # constant chip and the decoder can only sync one string late,
        # missing string 1's t_k anchor).
        chips10 = []
        for i in range(-2, n_strings):
            sid = (i % 15) + 1
            fields = {"string_id": sid}
            if sid == 1:
                fields.update(t_k_s=day_s + 30.0 * (i // 15),
                              vx_km_s=f_q["vx_km_s"],
                              ax_km_s2=f_q["ax_km_s2"], x_km=f_q["x_km"])
            elif sid == 2:
                fields.update(tb_min=f_q["tb_min"],
                              vy_km_s=f_q["vy_km_s"],
                              ay_km_s2=f_q["ay_km_s2"], y_km=f_q["y_km"])
            elif sid == 3:
                fields.update(gamma_n=f_q["gamma_n"],
                              vz_km_s=f_q["vz_km_s"],
                              az_km_s2=f_q["az_km_s2"], z_km=f_q["z_km"])
            elif sid == 4:
                fields.update(tau_n_s=f_q["tau_n_s"], n_t=803)
            chips10.append(string_to_symbols(build_string(fields)))
        chips10 = np.concatenate(chips10)

        # transmit-time (seconds since frame origin), code + data layers
        t_tx = (t_start - frame_start_tow_s) + t_rel - tau_t + dts
        chip_idx = np.floor(t_tx * chip_rate).astype(np.int64)
        spread = code[chip_idx % code_len]
        # +4 s: chips10 starts two strings before the frame origin
        d_idx = np.clip(np.floor((t_tx + 4.0) / 0.01).astype(np.int64),
                        0, len(chips10) - 1)
        spread = spread * chips10[d_idx]

        f_slot = f_center + k * slot_step
        phase = -2.0 * np.pi * f_slot * tau_t \
            + 2.0 * np.pi * (k * slot_step) * t_rel
        sig = spread * np.exp(1j * phase)
        out = sig if out is None else out + sig

    if bandlimit:
        out = _bandlimit(out)
    if noise:
        sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
        out = out + sigma * (rng.standard_normal(n)
                             + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def generate_gps_l5_scene(
    ephs: dict[int, GpsEphemeris],
    prns: list[int],
    rx_ecef: np.ndarray,
    t_start: float,
    duration_s: float,
    fs: float,
    bits_start_tow_s: float,
    cn0_db_hz: float = 48.0,
    seed: int = 5,
    tau_grid_hz: float = 10.0,
    noise: bool = True,
    bandlimit: bool = True,
) -> np.ndarray:
    """Geometry-accurate GPS L5 scene: data (I, NH10-spread CNAV at
    100 sps) + pilot (Q, NH20), QPSK components at equal power
    (GPS_L5.h:33-39; dll_pll_veml_tracking.cc:211-246 pilot setup).

    ``bits_start_tow_s`` must be a CNAV message boundary (multiple of
    6 s); messages cycle types 10/11/30 with live TOW, continuously
    rate-1/2 encoded (gps_l2c/l5_telemetry_decoder_gs.cc CNAV framing).
    The satellite clock applies (clock - TGD) on both components, i.e.
    ISC_L5 = 0 in this simulation, keeping the solver's L1 TGD
    convention consistent across bands.
    """
    from gnss_sdr_tpu.codes.gps_l5 import (NH10, NH20, gps_l5i_code,
                                           gps_l5q_code)
    from gnss_sdr_tpu.telemetry.gps_cnav import build_message
    from gnss_sdr_tpu.telemetry.viterbi import encode_conv

    chip_rate = 10.23e6
    code_len = 10230
    carrier = 1176.45e6
    n = int(round(fs * duration_s))
    t_rel = np.arange(n) / fs
    out = None
    rng = np.random.default_rng(seed)
    rx_of = rx_ecef if callable(rx_ecef) else (lambda t: rx_ecef)
    nh10 = np.array([1.0 if c == "0" else -1.0 for c in NH10])
    nh20 = np.array([1.0 if c == "0" else -1.0 for c in NH20])
    amp = 1.0 / np.sqrt(2.0)

    n_msgs = int(np.ceil((t_start + duration_s - bits_start_tow_s) / 6.0)) + 1
    type_cycle = (10, 11, 30)
    for prn in prns:
        eph = ephs[prn]
        t_grid, taus = _light_time_grid(eph, rx_of, t_start,
                                        duration_s, tau_grid_hz)
        tau_t = np.interp(t_start + t_rel, t_grid, taus)
        dts = eph.clock_bias_s(t_start - float(taus[0])) - eph.tgd_s

        # continuous CNAV bit stream: one 300-bit message per 6 s, TOW =
        # GPS time at the START of the NEXT message (IS-GPS-200 20.3.3.1)
        bits = []
        for i in range(n_msgs):
            fields = dict(
                prn=prn, msg_type=type_cycle[i % 3],
                tow_s=bits_start_tow_s + 6.0 * (i + 1),
                week_number=eph.week_number, toe_s=eph.toe_s,
                delta_a_m=eph.sqrt_a**2 - 26_559_710.0,
                delta_n_rad_s=eph.delta_n_rad_s, m0_rad=eph.m0_rad,
                ecc=eph.ecc, omega_rad=eph.omega_rad,
                omega0_rad=eph.omega0_rad, i0_rad=eph.i0_rad,
                delta_omega_dot_rad_s=eph.omega_dot_rad_s
                - (-2.6e-9) * np.pi,
                idot_rad_s=eph.idot_rad_s, cis_rad=eph.cis_rad,
                cic_rad=eph.cic_rad, crs_m=eph.crs_m, crc_m=eph.crc_m,
                cus_rad=eph.cus_rad, cuc_rad=eph.cuc_rad,
                toc_s=eph.toc_s, af0=eph.af0, af1=eph.af1, af2=eph.af2,
                tgd_s=eph.tgd_s,
            )
            bits.append(build_message(fields))
        symbols = encode_conv(np.concatenate(bits), kk=7, g=(0o171, 0o133))
        symbols = np.where(symbols == 1, -1.0, 1.0)

        cq = gps_l5q_code(prn).astype(np.float64)
        ci = gps_l5i_code(prn).astype(np.float64)
        t_tx = (t_start - bits_start_tow_s) + t_rel - tau_t + dts
        chip_idx = np.floor(t_tx * chip_rate).astype(np.int64)
        ms_idx = np.floor(t_tx * 1000.0).astype(np.int64)
        pilot = cq[chip_idx % code_len] * nh20[ms_idx % 20]
        sym_idx = np.clip(ms_idx // 10, 0, len(symbols) - 1)
        data = ci[chip_idx % code_len] * nh10[ms_idx % 10] \
            * symbols[sym_idx]

        phase = -2.0 * np.pi * carrier * tau_t
        sig = amp * (data + 1j * pilot) * np.exp(1j * phase)
        out = sig if out is None else out + sig

    if bandlimit:
        out = _bandlimit(out)
    if noise:
        sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
        out = out + sigma * (rng.standard_normal(n)
                             + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def generate_galileo_e5a_scene(
    ephs: dict[int, GpsEphemeris],
    prns: list[int],
    rx_ecef: np.ndarray,
    t_start: float,
    duration_s: float,
    fs: float,
    bits_start_tow_s: float,
    cn0_db_hz: float = 48.0,
    seed: int = 6,
    tau_grid_hz: float = 10.0,
    noise: bool = True,
    bandlimit: bool = True,
) -> np.ndarray:
    """Geometry-accurate Galileo E5a scene: data (I, CS20 + F/NAV 50 sps)
    + pilot (Q, CS100), QPSK components at equal power (Galileo_E5a.h;
    galileo_e5a_signal_replica).

    ``bits_start_tow_s`` must be an F/NAV page boundary (multiple of
    10 s); pages cycle types 1-4 with live GST (TOW field = page-start
    GST, matching GalileoFnavDecoder's convention). The satellite clock
    applies (clock - BGD) on both components.
    """
    from gnss_sdr_tpu.codes.galileo_e5a import (galileo_e5a_code,
                                                galileo_e5a_secondary)
    from gnss_sdr_tpu.telemetry.galileo_fnav import (build_fnav_fields,
                                                     build_page,
                                                     encode_page_symbols)

    chip_rate = 10.23e6
    code_len = 10230
    carrier = 1176.45e6
    n = int(round(fs * duration_s))
    t_rel = np.arange(n) / fs
    out = None
    rng = np.random.default_rng(seed)
    rx_of = rx_ecef if callable(rx_ecef) else (lambda t: rx_ecef)
    amp = 1.0 / np.sqrt(2.0)

    n_pages = int(np.ceil(
        (t_start + duration_s - bits_start_tow_s) / 10.0)) + 1
    type_cycle = (1, 2, 3, 4)
    for prn in prns:
        eph = ephs[prn]
        t_grid, taus = _light_time_grid(eph, rx_of, t_start,
                                        duration_s, tau_grid_hz)
        tau_t = np.interp(t_start + t_rel, t_grid, taus)
        dts = eph.clock_bias_s(t_start - float(taus[0])) - eph.tgd_s

        syms = []
        for i in range(n_pages):
            pt = type_cycle[i % 4]
            fields = dict(tow_s=bits_start_tow_s + 10.0 * i,
                          week_number=eph.week_number, iod_nav=101)
            if pt == 1:
                fields.update(svid=prn, toc_s=eph.toc_s, af0=eph.af0,
                              af1=eph.af1, af2=eph.af2,
                              bgd_e1e5a_s=eph.tgd_s)
            elif pt == 2:
                fields.update(m0_rad=eph.m0_rad,
                              omega_dot_rad_s=eph.omega_dot_rad_s,
                              ecc=eph.ecc, sqrt_a=eph.sqrt_a,
                              omega0_rad=eph.omega0_rad,
                              idot_rad_s=eph.idot_rad_s)
            elif pt == 3:
                fields.update(i0_rad=eph.i0_rad, omega_rad=eph.omega_rad,
                              delta_n_rad_s=eph.delta_n_rad_s,
                              cuc_rad=eph.cuc_rad, cus_rad=eph.cus_rad,
                              crc_m=eph.crc_m, crs_m=eph.crs_m,
                              toe_s=eph.toe_s)
            else:
                fields.update(cic_rad=eph.cic_rad, cis_rad=eph.cis_rad)
            syms.append(encode_page_symbols(
                build_page(pt, build_fnav_fields(pt, fields))))
        syms = np.concatenate(syms)

        cs20 = np.array([1.0 if c == "0" else -1.0
                         for c in galileo_e5a_secondary(prn, "I")])
        cs100 = np.array([1.0 if c == "0" else -1.0
                          for c in galileo_e5a_secondary(prn, "Q")])
        ci = galileo_e5a_code(prn, "I").astype(np.float64)
        cq = galileo_e5a_code(prn, "Q").astype(np.float64)

        t_tx = (t_start - bits_start_tow_s) + t_rel - tau_t + dts
        chip_idx = np.floor(t_tx * chip_rate).astype(np.int64)
        ms_idx = np.floor(t_tx * 1000.0).astype(np.int64)
        pilot = cq[chip_idx % code_len] * cs100[ms_idx % 100]
        sym_idx = np.clip(ms_idx // 20, 0, len(syms) - 1)
        data = ci[chip_idx % code_len] * cs20[ms_idx % 20] * syms[sym_idx]

        phase = -2.0 * np.pi * carrier * tau_t
        sig = amp * (data + 1j * pilot) * np.exp(1j * phase)
        out = sig if out is None else out + sig

    if bandlimit:
        out = _bandlimit(out)
    if noise:
        sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
        out = out + sigma * (rng.standard_normal(n)
                             + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def generate_beidou_scene(
    ephs: dict[int, GpsEphemeris],
    prns: list[int],
    rx_ecef: np.ndarray,
    t_start: float,
    duration_s: float,
    fs: float,
    sow_start_s: float,
    cn0_db_hz: float = 48.0,
    seed: int = 4,
    tau_grid_hz: float = 10.0,
    noise: bool = True,
    bandlimit: bool = True,
    band: str = "B1",
) -> np.ndarray:
    """Geometry-accurate BeiDou B1I/B3I scene with live D1 data + NH20.

    ``band``: "B1" (1561.098 MHz, 2.046 Mcps) or "B3" (1268.52 MHz,
    10.23 Mcps, Beidou_B3I.h:32-33) — same D1/NH20 data layers.

    ``ephs``: Kepler containers (BDS D1 uses the same parameterization;
    CGCS2000 == WGS-84 to 1e-9 here). ``sow_start_s`` must be a multiple
    of 6 s (subframe grid); subframes cycle 1-2-3. Each 20 ms data symbol
    is spread by the NH20 secondary, one NH chip per 1 ms code period
    (BEIDOU_B1I.h, beidou_b1i_telemetry_decoder_gs.cc:208-260).
    """
    from gnss_sdr_tpu.codes.beidou_b1i import beidou_b1i_code
    from gnss_sdr_tpu.codes.beidou_b3i import beidou_b3i_code
    from gnss_sdr_tpu.telemetry.beidou_d1 import (build_subframe,
                                                  subframe_to_symbols)
    from gnss_sdr_tpu.telemetry.period_decoders import BEIDOU_NH20

    if band == "B3":
        chip_rate, code_len, carrier = 10.23e6, 10230, 1268.52e6
        code_of = beidou_b3i_code
    else:
        chip_rate, code_len, carrier = 2.046e6, 2046, 1561.098e6
        code_of = beidou_b1i_code
    n = int(round(fs * duration_s))
    t_rel = np.arange(n) / fs
    out = None
    rng = np.random.default_rng(seed)
    rx_of = rx_ecef if callable(rx_ecef) else (lambda t: rx_ecef)
    nh = np.array([1.0 if c == "0" else -1.0 for c in BEIDOU_NH20])

    n_sf = int(np.ceil((t_start + duration_s - sow_start_s) / 6.0)) + 1
    for prn in prns:
        eph = ephs[prn]
        t_grid, taus = _light_time_grid(eph, rx_of, t_start,
                                        duration_s, tau_grid_hz)
        tau_t = np.interp(t_start + t_rel, t_grid, taus)
        dts = eph.clock_bias_s(t_start - float(taus[0])) - eph.tgd_s

        syms = []
        for i in range(n_sf):
            fid = (i % 3) + 1
            fields = dict(
                sow=sow_start_s + 6.0 * i, wn=eph.week_number,
                toc=eph.toc_s, tgd1=eph.tgd_s,
                a0=eph.af0, a1=eph.af1, a2=eph.af2,
                delta_n=eph.delta_n_rad_s, cuc=eph.cuc_rad,
                m0=eph.m0_rad, e=eph.ecc, cus=eph.cus_rad,
                crc=eph.crc_m, crs=eph.crs_m, sqrt_a=eph.sqrt_a,
                toe=eph.toe_s, i0=eph.i0_rad, cic=eph.cic_rad,
                omega_dot=eph.omega_dot_rad_s, cis=eph.cis_rad,
                idot=eph.idot_rad_s, omega_0=eph.omega0_rad,
                omega=eph.omega_rad,
            )
            tx = subframe_to_symbols(build_subframe(fid, fields))
            syms.append(np.where(tx == 1, -1.0, 1.0))
        syms = np.concatenate(syms)

        code = code_of(prn).astype(np.float64)
        t_tx = (t_start - sow_start_s) + t_rel - tau_t + dts
        chip_idx = np.floor(t_tx * chip_rate).astype(np.int64)
        spread = code[chip_idx % code_len]
        ms_idx = np.floor(t_tx * 1000.0).astype(np.int64)  # 1 ms periods
        spread = spread * nh[ms_idx % 20]
        sym_idx = np.clip(ms_idx // 20, 0, len(syms) - 1)
        spread = spread * syms[sym_idx]

        phase = -2.0 * np.pi * carrier * tau_t
        sig = spread * np.exp(1j * phase)
        out = sig if out is None else out + sig

    if bandlimit:
        out = _bandlimit(out)
    if noise:
        sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
        out = out + sigma * (rng.standard_normal(n)
                             + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def generate_gps_l2c_scene(
    ephs: dict[int, GpsEphemeris],
    prns: list[int],
    rx_ecef: np.ndarray,
    t_start: float,
    duration_s: float,
    fs: float,
    bits_start_tow_s: float,
    cn0_db_hz: float = 48.0,
    seed: int = 7,
    tau_grid_hz: float = 10.0,
    noise: bool = True,
    bandlimit: bool = True,
) -> np.ndarray:
    """Geometry-accurate GPS L2C scene: CM code BPSK carrying CNAV at
    50 sps (one symbol per 20 ms code period; GPS_L2C.h:37-40,
    gps_l2c_telemetry_decoder_gs.cc framing).

    ``bits_start_tow_s`` must be a CNAV-on-L2 message boundary (multiple
    of 12 s). The CL time-multiplex carries no data and is not modeled
    (the receiver tracks CM-only, matching the simulation).
    """
    from gnss_sdr_tpu.codes.gps_l2c import gps_l2cm_code
    from gnss_sdr_tpu.telemetry.gps_cnav import build_message
    from gnss_sdr_tpu.telemetry.viterbi import encode_conv

    chip_rate = 0.5115e6
    code_len = 10230
    carrier = 1227.60e6
    n = int(round(fs * duration_s))
    t_rel = np.arange(n) / fs
    out = None
    rng = np.random.default_rng(seed)
    rx_of = rx_ecef if callable(rx_ecef) else (lambda t: rx_ecef)

    n_msgs = int(np.ceil(
        (t_start + duration_s - bits_start_tow_s) / 12.0)) + 1
    type_cycle = (10, 11, 30)
    for prn in prns:
        eph = ephs[prn]
        t_grid, taus = _light_time_grid(eph, rx_of, t_start,
                                        duration_s, tau_grid_hz)
        tau_t = np.interp(t_start + t_rel, t_grid, taus)
        dts = eph.clock_bias_s(t_start - float(taus[0])) - eph.tgd_s

        bits = []
        for i in range(n_msgs):
            fields = dict(
                prn=prn, msg_type=type_cycle[i % 3],
                tow_s=bits_start_tow_s + 12.0 * (i + 1),
                week_number=eph.week_number, toe_s=eph.toe_s,
                delta_a_m=eph.sqrt_a**2 - 26_559_710.0,
                delta_n_rad_s=eph.delta_n_rad_s, m0_rad=eph.m0_rad,
                ecc=eph.ecc, omega_rad=eph.omega_rad,
                omega0_rad=eph.omega0_rad, i0_rad=eph.i0_rad,
                delta_omega_dot_rad_s=eph.omega_dot_rad_s
                - (-2.6e-9) * np.pi,
                idot_rad_s=eph.idot_rad_s, cis_rad=eph.cis_rad,
                cic_rad=eph.cic_rad, crs_m=eph.crs_m, crc_m=eph.crc_m,
                cus_rad=eph.cus_rad, cuc_rad=eph.cuc_rad,
                toc_s=eph.toc_s, af0=eph.af0, af1=eph.af1, af2=eph.af2,
                tgd_s=eph.tgd_s,
            )
            bits.append(build_message(fields))
        symbols = encode_conv(np.concatenate(bits), kk=7, g=(0o171, 0o133))
        symbols = np.where(symbols == 1, -1.0, 1.0)

        cm = gps_l2cm_code(prn).astype(np.float64)
        t_tx = (t_start - bits_start_tow_s) + t_rel - tau_t + dts
        chip_idx = np.floor(t_tx * chip_rate).astype(np.int64)
        sym_idx = np.clip(np.floor(t_tx / 0.02).astype(np.int64),
                          0, len(symbols) - 1)
        data = cm[chip_idx % code_len] * symbols[sym_idx]

        phase = -2.0 * np.pi * carrier * tau_t
        sig = data * np.exp(1j * phase)
        out = sig if out is None else out + sig

    if bandlimit:
        out = _bandlimit(out)
    if noise:
        sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
        out = out + sigma * (rng.standard_normal(n)
                             + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def generate_galileo_e5b_scene(
    ephs: dict[int, GpsEphemeris],
    prns: list[int],
    rx_ecef: np.ndarray,
    t_start: float,
    duration_s: float,
    fs: float,
    bits_start_tow_s: float,
    cn0_db_hz: float = 48.0,
    seed: int = 8,
    tau_grid_hz: float = 10.0,
    noise: bool = True,
    bandlimit: bool = True,
) -> np.ndarray:
    """Geometry-accurate Galileo E5b scene: data (I, CS4 + I/NAV at
    250 sps) + pilot (Q, CS100), QPSK at equal power (Galileo_E5b.h;
    dll_pll_veml_tracking.cc:326-348).

    ``bits_start_tow_s`` must be an even second (I/NAV page boundary);
    the I/NAV stream matches generate_galileo_scene's E1 stream layout
    (E5b carries the same message family).
    """
    from gnss_sdr_tpu.codes.galileo_e5b_e6 import (galileo_e5b_code,
                                                   galileo_e5b_secondary)

    chip_rate = 10.23e6
    code_len = 10230
    carrier = 1207.14e6
    symbol_s = 0.004
    n = int(round(fs * duration_s))
    t_rel = np.arange(n) / fs
    out = None
    rng = np.random.default_rng(seed)
    rx_of = rx_ecef if callable(rx_ecef) else (lambda t: rx_ecef)
    amp = 1.0 / np.sqrt(2.0)

    n_pages = int(np.ceil(
        (t_start + duration_s - bits_start_tow_s) / 2.0)) + 1
    for prn in prns:
        eph = ephs[prn]
        t_grid, taus = _light_time_grid(eph, rx_of, t_start,
                                        duration_s, tau_grid_hz)
        tau_t = np.interp(t_start + t_rel, t_grid, taus)
        dts = eph.clock_bias_s(t_start - float(taus[0])) - eph.tgd_s

        symbols = _inav_symbol_stream(eph, bits_start_tow_s, n_pages)
        cs4 = np.array([1.0 if c == "0" else -1.0
                        for c in galileo_e5b_secondary(prn, "I")])
        cs100 = np.array([1.0 if c == "0" else -1.0
                          for c in galileo_e5b_secondary(prn, "Q")])
        ci = galileo_e5b_code(prn, "I").astype(np.float64)
        cq = galileo_e5b_code(prn, "Q").astype(np.float64)

        t_tx = (t_start - bits_start_tow_s) + t_rel - tau_t + dts
        chip_idx = np.floor(t_tx * chip_rate).astype(np.int64)
        ms_idx = np.floor(t_tx * 1000.0).astype(np.int64)
        pilot = cq[chip_idx % code_len] * cs100[ms_idx % 100]
        sym_idx = np.clip(np.floor(t_tx / symbol_s).astype(np.int64),
                          0, len(symbols) - 1)
        data = ci[chip_idx % code_len] * cs4[ms_idx % 4] * symbols[sym_idx]

        phase = -2.0 * np.pi * carrier * tau_t
        sig = amp * (data + 1j * pilot) * np.exp(1j * phase)
        out = sig if out is None else out + sig

    if bandlimit:
        out = _bandlimit(out)
    if noise:
        sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
        out = out + sigma * (rng.standard_normal(n)
                             + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def generate_galileo_e6_scene(
    ephs: dict[int, GpsEphemeris],
    prns: list[int],
    rx_ecef: np.ndarray,
    t_start: float,
    duration_s: float,
    fs: float,
    page_start_tow_s: float,
    has_pages: dict[int, np.ndarray] | None = None,
    cn0_db_hz: float = 48.0,
    seed: int = 9,
    tau_grid_hz: float = 10.0,
    noise: bool = True,
    bandlimit: bool = True,
) -> np.ndarray:
    """Geometry-accurate Galileo E6 B/C scene: data (B, C/NAV HAS pages
    at 1000 sym/s) + pilot (C, CS100), QPSK at equal power
    (Galileo_E6.h:35; galileo_telemetry_decoder_gs.cc E6 branches).

    ``has_pages``: optional per-PRN array of +-1 C/NAV page symbol
    streams (concatenated 1000-symbol pages); idle-pattern pages are
    synthesized when absent. ``page_start_tow_s`` must be a whole second
    (C/NAV page grid).
    """
    from gnss_sdr_tpu.codes.galileo_e5b_e6 import (galileo_e6_code,
                                                   galileo_e6c_secondary)
    from gnss_sdr_tpu.telemetry.galileo_cnav import encode_has_page

    chip_rate = 5.115e6
    code_len = 5115
    carrier = 1278.75e6
    n = int(round(fs * duration_s))
    t_rel = np.arange(n) / fs
    out = None
    rng = np.random.default_rng(seed)
    rx_of = rx_ecef if callable(rx_ecef) else (lambda t: rx_ecef)
    amp = 1.0 / np.sqrt(2.0)

    n_pages = int(np.ceil(
        (t_start + duration_s - page_start_tow_s))) + 1
    for prn in prns:
        eph = ephs[prn]
        t_grid, taus = _light_time_grid(eph, rx_of, t_start,
                                        duration_s, tau_grid_hz)
        tau_t = np.interp(t_start + t_rel, t_grid, taus)
        dts = eph.clock_bias_s(t_start - float(taus[0])) - eph.tgd_s

        if has_pages is not None and prn in has_pages:
            symbols = np.asarray(has_pages[prn], dtype=np.float64)
        else:
            # operational-status filler pages with valid CRC (the decoder
            # sees real framing; HAS message content is a separate
            # concern — dummy/test status pages are rejected by the page
            # decoder, like the reference's HAS receiver)
            content = rng.integers(0, 2, 424)
            symbols = np.tile(
                encode_has_page(content, status=1).astype(np.float64),
                n_pages)

        cs100 = np.array([1.0 if c == "0" else -1.0
                          for c in galileo_e6c_secondary(prn)])
        cb = galileo_e6_code(prn, "B").astype(np.float64)
        cc = galileo_e6_code(prn, "C").astype(np.float64)

        t_tx = (t_start - page_start_tow_s) + t_rel - tau_t + dts
        chip_idx = np.floor(t_tx * chip_rate).astype(np.int64)
        ms_idx = np.floor(t_tx * 1000.0).astype(np.int64)
        pilot = cc[chip_idx % code_len] * cs100[ms_idx % 100]
        sym_idx = np.clip(ms_idx, 0, len(symbols) - 1)
        data = cb[chip_idx % code_len] * symbols[sym_idx]

        phase = -2.0 * np.pi * carrier * tau_t
        sig = amp * (data + 1j * pilot) * np.exp(1j * phase)
        out = sig if out is None else out + sig

    if bandlimit:
        out = _bandlimit(out)
    if noise:
        sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
        out = out + sigma * (rng.standard_normal(n)
                             + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)


def generate_sbas_l1_signal(
    prn: int,
    block_bits: "np.ndarray",
    fs: float,
    duration_s: float,
    delay_samples: float = 300.0,
    doppler_hz: float = 120.0,
    cn0_db_hz: float = 48.0,
    seed: int = 13,
    noise: bool = False,
) -> np.ndarray:
    """SBAS L1 signal: GPS-family C/A code (PRN 120-138) carrying
    rate-1/2 coded 500 sps symbols (one symbol per two code periods;
    sbas_l1_telemetry_decoder_gs framing). ``block_bits`` is the
    concatenated 250-bit message stream (sbas_l1.build_block output).
    Fixed delay/Doppler: SBAS GEO ranging is not modeled — corrections
    content is the payload of interest."""
    from gnss_sdr_tpu.codes import gps_l1ca_code
    from gnss_sdr_tpu.telemetry.viterbi import encode_conv

    code = np.asarray(gps_l1ca_code(prn), dtype=np.float64)
    coded = encode_conv(np.asarray(block_bits, dtype=np.int64),
                        kk=7, g=(0o171, 0o133))
    symbols = 1.0 - 2.0 * coded
    n = int(round(fs * duration_s))
    t = np.arange(n)
    chip_idx = np.floor((t - delay_samples) * 1.023e6 / fs).astype(np.int64)
    ms_idx = np.floor((t - delay_samples) * 1000.0 / fs).astype(np.int64)
    sym_idx = np.clip(ms_idx // 2, 0, len(symbols) - 1)
    sig = code[chip_idx % 1023] * symbols[sym_idx] \
        * np.exp(2j * np.pi * doppler_hz * t / fs)
    if noise:
        rng = np.random.default_rng(seed)
        sigma = np.sqrt(fs / (2.0 * 10.0 ** (cn0_db_hz / 10.0)))
        sig = sig + sigma * (rng.standard_normal(n)
                             + 1j * rng.standard_normal(n))
    return sig.astype(np.complex64)
