"""Production receiver: pull in on the scan engine, cruise on the fast one.

The deployment topology for real-time serving (README "performance"):

- Phase A (cold start / transients): the per-period scan engine — exact
  reference semantics for acquisition handoff, FLL/PLL pull-in and
  bit synchronization.
- Handoff: when every tracking channel is bit-synced and past pull-in,
  each channel's stream position is advanced to its next data-bit
  boundary (<= 19 PRN periods) and the state is adopted by the
  group-batched fast engine.
- Phase B (steady state): 20 ms coherent groups, loops at 50 Hz, the
  segmented-sum correlator — 1.33x real time for 12 channels per chip.

Telemetry, observables and PVT run identically in both phases (the fast
engine still emits per-period prompts and code-boundary anchors).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.pvt.solver import Observation
from gnss_sdr_tpu.pvt import GpsEphemeris, solve_pvt
from gnss_sdr_tpu.receiver.fsm import ChannelState
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.tracking.fast_engine import FastTrackingEngine

TWO_PI = 2.0 * math.pi


class ProductionReceiver:
    def __init__(self, cfg: ReceiverConfig, satellites, assisted_ephemeris=None,
                 groups_per_block: int = 5):
        if cfg.extend_correlation_symbols <= 1:
            raise ValueError(
                "ProductionReceiver needs extend_correlation_symbols > 1")
        self.cfg = cfg
        self.receiver = Receiver(cfg, satellites, assisted_ephemeris)
        self.groups_per_block = groups_per_block
        self.fast: FastTrackingEngine | None = None
        self.fast_state = None
        self._fast_codes = None
        self.handoff_sample: int | None = None
        self.solutions = self.receiver.solutions

    # -- phase A ----------------------------------------------------------
    def _ready_for_handoff(self) -> bool:
        rec = self.receiver
        tracking = [f for f in rec.fsms if f.state is ChannelState.TRACKING]
        if len(tracking) < min(4, rec.cfg.n_channels):
            return False
        for f in tracking:
            ch = f.channel_id
            if not rec._bit_sync[ch].synced:
                return False
            if rec._period_count[ch] < rec.cfg.pull_in_time_s * 1000 + 100:
                return False
        return True

    def _handoff(self) -> None:
        rec = self.receiver
        trk_cfg = rec.tracking.cfg
        self.fast = FastTrackingEngine(
            trk_cfg, rec.cfg.n_channels, self.groups_per_block)
        state = self.fast.from_track_state(rec.tracking.state)
        # align every channel's next group to its data-bit boundary
        k = trk_cfg.extend_correlation_symbols
        offs = np.asarray(state.offset).copy()
        rems = np.asarray(state.rem_code_phase_samples).copy()
        rcarr = np.asarray(state.rem_carr_phase_rad).copy()
        steps = TWO_PI * np.asarray(state.carrier_doppler_hz) / trk_cfg.fs
        code_freq = trk_cfg.chip_rate_cps \
            + np.asarray(state.code_doppler_chips, dtype=np.float64)
        for f in rec.fsms:
            ch = f.channel_id
            if f.state is not ChannelState.TRACKING:
                continue
            into = rec._bit_sync[ch].periods_into_bit(rec._period_count[ch])
            skip = (k - into) % k
            t_prn = trk_cfg.fs * trk_cfg.code_length_chips / code_freq[ch]
            old_boundary = offs[ch] + rems[ch]
            boundary = old_boundary + skip * t_prn
            offs[ch] = math.floor(boundary)
            rems[ch] = boundary - offs[ch]
            rcarr[ch] = math.fmod(
                rcarr[ch] + steps[ch] * (boundary - old_boundary), TWO_PI)
            # The skipped periods are real transmitted symbols: leaving a
            # gap in the decoder's symbol stream breaks the 6000-symbol
            # preamble periodicity, subframe parity windows and per-symbol
            # TOW propagation (gps_l1_ca_telemetry_decoder_gs.cc counts
            # every symbol). They all belong to the current data bit, so
            # feed placeholders with the current bit's sign.
            dec = rec.decoders[ch]
            if skip and dec.history:
                last = dec.history[-1]
                stamp = dec.stamps[-1] if dec.stamps else 0
                for j in range(1, skip + 1):
                    dec.feed(last, stamp + int(round(j * t_prn)))
                rec._period_count[ch] += skip
        self.fast_state = state._replace(
            offset=jnp.asarray(offs.astype(np.int32)),
            rem_code_phase_samples=jnp.asarray(rems.astype(np.float32)),
            rem_carr_phase_rad=jnp.asarray(rcarr.astype(np.float32)),
        )
        self._fast_codes = rec.tracking._code_tables_dev
        self.handoff_sample = rec.tracking.abs_block_start

    # -- phase B ----------------------------------------------------------
    def _fast_block(self, samples: np.ndarray, base: int) -> None:
        """``samples`` is the full capture (absolute origin 0); ``base``
        the absolute sample index of this fast block."""
        rec = self.receiver
        fast = self.fast
        seg = samples[base: base + fast.block_samples + fast.overlap]
        re = jnp.asarray(np.ascontiguousarray(seg.real, np.float32))
        im = jnp.asarray(np.ascontiguousarray(seg.imag, np.float32))
        self.fast_state, out = fast.process_block(
            self.fast_state, re, im, self._fast_codes)
        out = {k: np.asarray(v) for k, v in out.items()}
        g_count, n_ch, kk = out["period_prompt_re"].shape
        for g in range(g_count):
            for f in rec.fsms:
                ch = f.channel_id
                if f.state is not ChannelState.TRACKING \
                        or not out["valid"][g, ch]:
                    continue
                dec = rec.decoders[ch]
                dopp = float(out["carrier_doppler_hz"][g, ch])
                cn0 = float(out["cn0_db_hz"][g, ch])
                t_prn_s = rec.tracking.cfg.code_period_s
                for j in range(kk):
                    start = base + int(out["period_starts"][g, ch, j])
                    rem = float(out["period_rems"][g, ch, j])
                    prompt_i = float(out["period_prompt_re"][g, ch, j])
                    dec.feed(prompt_i, start)
                    rec._period_count[ch] += 1
                    # accumulated carrier phase (64-bit, host), same
                    # convention as the scan path: acc -= 2*pi*f_d*T
                    rec.tracking.acc_carrier_phase_rad[ch] -= \
                        TWO_PI * dopp * t_prn_s
                    if dec.tow_at_last_symbol_ms is not None:
                        rec.observables.add_anchor(
                            ch, start + rem,
                            dec.tow_at_last_symbol_ms - 1.0,
                            dopp,
                            float(rec.tracking.acc_carrier_phase_rad[ch]),
                            cn0)
                if dec.has_full_ephemeris() and f.prn not in rec.ephemerides:
                    rec.ephemerides[f.prn] = GpsEphemeris.from_fields(
                        f.prn, dec.ephemeris_fields)
                if rec.iono is None \
                        and any(dec.utc_iono_fields.get("iono_alpha", ())):
                    rec.iono = (dec.utc_iono_fields["iono_alpha"],
                                dec.utc_iono_fields["iono_beta"])
                if out["loss_of_lock"][g, ch]:
                    f.loss_of_lock()
                    rec.observables.reset_channel(ch)

    def _pvt(self, limit: int) -> None:
        rec = self.receiver
        for rows in rec.observables.epochs_until(limit):
            for row in rows:
                row.prn = rec.fsms[row.channel].prn
            rx_tow_ms = rows[0].rx_tow_ms
            if rec._last_solve_tow_ms is not None and \
                    rx_tow_ms - rec._last_solve_tow_ms < rec.cfg.output_rate_ms:
                continue
            obs = [Observation(prn=row.prn, pseudorange_m=row.pseudorange_m,
                               eph=rec.ephemerides[row.prn],
                               doppler_hz=row.doppler_hz,
                               cn0_db_hz=row.cn0_db_hz)
                   for row in rows
                   if row.prn in rec.ephemerides and row.prn != 0]
            if len(obs) < 4:
                continue
            iono = rec.iono if rec.cfg.apply_iono else None
            sol = solve_pvt(obs, rx_tow_ms * 1e-3,
                            apply_tropo=rec.cfg.apply_tropo,
                            iono_alpha=iono[0] if iono else None,
                            iono_beta=iono[1] if iono else None)
            if sol.valid:
                rec._last_solve_tow_ms = rx_tow_ms
                rec.solutions.append(sol)

    # -- driver ------------------------------------------------------------
    def run(self, samples: np.ndarray):
        rec = self.receiver
        block = rec.block_samples
        pos = 0
        # phase A
        while self.fast is None and \
                pos + block + rec.overlap <= len(samples):
            rec.process_block(samples[pos: pos + block + rec.overlap])
            pos += block
            if self._ready_for_handoff():
                self._handoff()
        # phase B (phase-A observables anchors remain valid: same
        # absolute sample basis)
        if self.fast is not None:
            fb = self.fast.block_samples
            base = self.handoff_sample
            while base + fb + self.fast.overlap <= len(samples):
                self._fast_block(samples, base)
                base += fb
                self._pvt(base - 2 * self.fast.max_period)
        return rec.solutions

    @property
    def in_fast_mode(self) -> bool:
        return self.fast is not None
