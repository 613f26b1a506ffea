"""Multi-band production receiver: scan-engine pull-in per band, then
group-batched fast engines for EVERY band in steady state.

Generalizes :class:`~gnss_sdr_tpu.receiver.production.ProductionReceiver`
beyond GPS L1 (the reference's one universal engine handles all signals,
dll_pll_veml_tracking.cc:83-600): each band gets its own
:class:`FastTrackingEngine` parameterized per signal —

============ ======== ===============================================
suffix       K        group alignment / secondary wipe-off
============ ======== ===============================================
1C           20       data-bit aligned (BitSync), Costas
1B           1        none (E1-B symbol = one 4 ms period)
L5           20       pilot NH20 wipe-off, four-quadrant PLL
5X, 7X, E6   20       pilot CS100 wipe-off, four-quadrant PLL
B1, B3       20       NH20 wipe-off ON data: bit-aligned + Costas
1G, 2G       10       meander-chip aligned (GNAV bi-binary halves are
                      sign-constant over 10 ms), Costas
============ ======== ===============================================

Deployment shape mirrors the single-band production receiver: per-band
device-resident int8 ingest rings, ~100 ms fast blocks, superblocks of
``blocks_per_call`` blocks per device call, software pipelining
(dispatch window N+1, then consume window N's packed records on the
host), bulk observables anchors, one fused PVT.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.native import complex_to_quantized_i8
from gnss_sdr_tpu.receiver.fsm import ChannelState
from gnss_sdr_tpu.receiver.multiband import (
    BandConfig,
    MultiBandConfig,
    MultiBandReceiver,
    _Band,
)
from gnss_sdr_tpu.tracking.bit_sync import BitSync, SecondaryCodeSync
from gnss_sdr_tpu.tracking.fast_engine import FastTrackingEngine

TWO_PI = 2.0 * math.pi

#: fast-engine group length per suffix (PRN periods per loop closure)
_K_BY_SUFFIX = {"1C": 20, "1B": 1, "L5": 20, "5X": 20, "7X": 20,
                "E6": 20, "B1": 20, "B3": 20, "1G": 10, "2G": 10}
#: secondary-wipe table length the engine must carry
_SECLEN_BY_SUFFIX = {"L5": 20, "5X": 100, "7X": 100, "E6": 100,
                     "B1": 20, "B3": 20}
#: common fast-block duration [s] across bands (block = g*K*T_prn)
_BLOCK_S = 0.1


def _pilot_secondary(band: _Band, prn: int) -> str | None:
    """Pilot-component secondary code for pilot-tracked bands."""
    sx = band.cfg.suffix
    if sx == "1B":
        if band.tracking.cfg.track_pilot:
            from gnss_sdr_tpu.codes.galileo_e1 import E1C_SECONDARY

            return E1C_SECONDARY
        return None
    if sx == "L5":
        from gnss_sdr_tpu.codes.gps_l5 import NH20

        return NH20
    if sx == "5X":
        from gnss_sdr_tpu.codes.galileo_e5a import galileo_e5a_secondary

        return galileo_e5a_secondary(prn, "Q")
    if sx == "7X":
        from gnss_sdr_tpu.codes.galileo_e5b_e6 import galileo_e5b_secondary

        return galileo_e5b_secondary(prn, "Q")
    if sx == "E6":
        from gnss_sdr_tpu.codes.galileo_e5b_e6 import galileo_e6c_secondary

        return galileo_e6c_secondary(prn)
    return None


class _FastBandCtx:
    """Per-band fast-engine context built at handoff."""

    def __init__(self, band: _Band, groups_per_block: int):
        import dataclasses

        sx = band.cfg.suffix
        self.band = band
        self.k = _K_BY_SUFFIX.get(sx, 1)
        self.sec_len = _SECLEN_BY_SUFFIX.get(sx, 1)
        extra = {}
        if sx == "1B" and band.tracking.cfg.track_pilot:
            # E1-C pilot: extend coherent integration over the full CS25
            # secondary (100 ms loop closure), the reference's
            # post-secondary-sync extension
            # (dll_pll_veml_tracking.cc:1989-2028). At a 10 Hz loop
            # closure rate the bandwidths must keep B_L*T well under
            # 0.5 or the loops go unstable.
            self.k = 25
            self.sec_len = 25
            extra = dict(pll_bw_narrow_hz=min(
                band.tracking.cfg.pll_bw_narrow_hz, 2.0))
        # the engine reads K from the config (the scan configs track
        # per-period, extend_correlation_symbols=1)
        trk_cfg = dataclasses.replace(
            band.tracking.cfg, extend_correlation_symbols=self.k, **extra)
        # groups per block so every band's fast block spans _BLOCK_S
        t_group = trk_cfg.code_period_s * self.k
        self.g = max(1, int(round(_BLOCK_S / t_group)))
        self.fast = FastTrackingEngine(
            trk_cfg, band.cfg.n_channels, groups_per_block=self.g,
            sec_max_len=self.sec_len)
        self.state = None
        self.codes = band.tracking._code_tables_dev
        self.data_codes = band.tracking._data_code_tables_dev
        self.ring = None
        self.base = 0            # absolute (band-fs) sample of next block


class ProductionMultiBandReceiver:
    """Phase A on the scan engines, phase B on per-band fast engines."""

    def __init__(self, cfg: MultiBandConfig, bands: list[BandConfig],
                 assisted_ephemeris=None, blocks_per_call: int = 10):
        self.receiver = MultiBandReceiver(cfg, bands, assisted_ephemeris)
        self.blocks_per_call = blocks_per_call
        self.solutions = self.receiver.solutions
        rec = self.receiver
        # per-channel sync trackers driven during phase A
        self._period_count = {b.cfg.suffix: [0] * b.cfg.n_channels
                              for b in rec.bands}
        self._bit_sync: dict[tuple[str, int], BitSync] = {}
        self._sec_sync: dict[tuple[str, int], SecondaryCodeSync] = {}
        self._ctx: dict[str, _FastBandCtx] | None = None
        self.handoff_sample: int | None = None   # common-fs units

    # -- phase A ----------------------------------------------------------
    def _reset_channel_sync(self, band: _Band, local_ch: int,
                            prn: int) -> None:
        sx = band.cfg.suffix
        self._period_count[sx][local_ch] = 0
        key = (sx, local_ch)
        if sx in ("1C",):
            self._bit_sync[key] = BitSync(
                symbols_per_bit=band.tracking.cfg.symbols_per_bit)
        sec = _pilot_secondary(band, prn)
        if sec is not None:
            self._sec_sync[key] = SecondaryCodeSync(sec)

    def _observe_phase_a(self, band: _Band, per_channel) -> None:
        sx = band.cfg.suffix
        for local_ch, periods in enumerate(per_channel):
            fsm = band.fsms[local_ch]
            if fsm.state is not ChannelState.TRACKING:
                continue
            key = (sx, local_ch)
            for p in periods:
                self._period_count[sx][local_ch] += 1
                bs = self._bit_sync.get(key)
                if bs is not None and not bs.synced:
                    bs.feed(p.prompt.real)
                ss = self._sec_sync.get(key)
                if ss is not None and not ss.synced:
                    ss.feed(p.prompt.real)

    def _channel_ready(self, band: _Band, local_ch: int) -> bool:
        sx = band.cfg.suffix
        cfg = band.cfg
        min_periods = (cfg.pull_in_time_s * 1000.0
                       / band.tracking.cfg.code_period_s / 1000.0) + 100
        if self._period_count[sx][local_ch] < min_periods:
            return False
        key = (sx, local_ch)
        bs = self._bit_sync.get(key)
        if bs is not None and not bs.synced:
            return False
        ss = self._sec_sync.get(key)
        if ss is not None and not ss.synced:
            return False
        if sx in ("B1", "B3"):
            dec = band.decoders[local_ch]
            if not dec._nh.synced:
                return False
        if sx in ("1G", "2G"):
            dec = band.decoders[local_ch]
            if not dec._chip_sync.synced:
                return False
        return True

    def _ready_for_handoff(self) -> bool:
        rec = self.receiver
        total_tracking = 0
        for band in rec.bands:
            for f in band.fsms:
                if f.state is not ChannelState.TRACKING:
                    continue
                total_tracking += 1
                if not self._channel_ready(band, f.channel_id
                                           - band.ch_offset):
                    return False
        return total_tracking >= min(
            4, sum(b.cfg.n_channels for b in rec.bands))

    def _handoff(self, streams: dict[str, np.ndarray]) -> None:
        rec = self.receiver
        self._ctx = {}
        self.handoff_sample = int(
            rec.bands[0].tracking.abs_block_start
            * rec.cfg.fs / rec.bands[0].fs)
        for band in rec.bands:
            sx = band.cfg.suffix
            ctx = _FastBandCtx(band, self.blocks_per_call)
            trk_cfg = band.tracking.cfg
            state = ctx.fast.from_track_state(band.tracking.state)
            k = ctx.k
            offs = np.asarray(state.offset).copy()
            rems = np.asarray(state.rem_code_phase_samples).copy()
            rcarr = np.asarray(state.rem_carr_phase_rad).copy()
            steps = TWO_PI * (np.asarray(state.carrier_doppler_hz)
                              + np.asarray(state.if_freq_hz)) / trk_cfg.fs
            code_freq = trk_cfg.chip_rate_cps + np.asarray(
                state.code_doppler_chips, dtype=np.float64)
            for f in band.fsms:
                local_ch = f.channel_id - band.ch_offset
                if f.state is not ChannelState.TRACKING:
                    continue
                key = (sx, local_ch)
                count = self._period_count[sx][local_ch]
                # bit/NH-frame alignment: skip to the next group boundary
                skip = 0
                if sx == "1C":
                    into = self._bit_sync[key].periods_into_bit(count)
                    skip = (k - into) % k
                elif sx in ("B1", "B3"):
                    dec = band.decoders[local_ch]
                    into = dec._nh.periods_into_code(count)
                    skip = (k - into) % k
                elif sx in ("1G", "2G"):
                    dec = band.decoders[local_ch]
                    into = (count - dec._chip_sync.bit_phase) % k
                    skip = (k - into) % k
                if skip:
                    t_prn = trk_cfg.fs * trk_cfg.code_length_chips \
                        / code_freq[local_ch]
                    old_b = offs[local_ch] + rems[local_ch]
                    new_b = old_b + skip * t_prn
                    offs[local_ch] = math.floor(new_b)
                    rems[local_ch] = new_b - offs[local_ch]
                    rcarr[local_ch] = math.fmod(
                        rcarr[local_ch] + steps[local_ch] * (new_b - old_b),
                        TWO_PI)
                    dec = band.decoders[local_ch]
                    if sx == "1C" and dec.history:
                        # LNAV counts every symbol: placeholder feeds with
                        # the current bit's sign (production.py rationale)
                        last = dec.history[-1]
                        stamp = dec.stamps[-1] if dec.stamps else 0
                        for j in range(1, skip + 1):
                            dec.feed(last, stamp + int(round(j * t_prn)))
                    elif hasattr(dec, "skip_periods"):
                        dec.skip_periods(skip)
                    self._period_count[sx][local_ch] = count + skip
            state = state._replace(
                offset=jnp.asarray(offs.astype(np.int32)),
                rem_code_phase_samples=jnp.asarray(rems.astype(np.float32)),
                rem_carr_phase_rad=jnp.asarray(rcarr.astype(np.float32)),
            )
            # secondary wipe-off phases
            for f in band.fsms:
                local_ch = f.channel_id - band.ch_offset
                if f.state is not ChannelState.TRACKING:
                    continue
                key = (sx, local_ch)
                count = self._period_count[sx][local_ch]
                ss = self._sec_sync.get(key)
                if ss is not None and ss.synced:
                    state = ctx.fast.set_secondary(
                        state, local_ch, "".join(
                            "0" if v > 0 else "1" for v in ss.signs),
                        ss.periods_into_code(count), pure_pilot=True)
                elif sx in ("B1", "B3"):
                    from gnss_sdr_tpu.telemetry.period_decoders import (
                        BEIDOU_NH20)

                    state = ctx.fast.set_secondary(
                        state, local_ch, BEIDOU_NH20, 0, pure_pilot=False)
            ctx.state = state
            # band ingest ring (device-resident int8, uploaded once)
            x = streams[sx] if isinstance(streams, dict) else streams
            head = np.ascontiguousarray(x[:1 << 18].real, np.float32)
            rms = float(np.sqrt(np.mean(head * head))) * np.sqrt(2.0) or 1.0
            cap8 = complex_to_quantized_i8(x, 16.0 / rms)
            ctx.ring = jax.device_put(np.stack(cap8))
            ctx.base = band.tracking.abs_block_start
            self._ctx[sx] = ctx

    # -- phase B ----------------------------------------------------------
    def _dispatch_band(self, ctx: _FastBandCtx, nb: int):
        fast = ctx.fast
        codes = fast._get_bank(ctx.codes) if fast.correlator == "bank" \
            else ctx.codes
        args = [ctx.state, ctx.ring, jnp.int32(ctx.base), int(nb), codes]
        if fast.track_pilot:
            dbank = fast._get_data_bank(ctx.data_codes) \
                if fast.correlator == "bank" else ctx.data_codes
            args.append(dbank)
        ctx.state, out = fast._superblock_ring_i8(*args)
        return out

    def _consume_band(self, ctx: _FastBandCtx, out, base: int,
                      nb: int) -> None:
        rec = self.receiver
        band = ctx.band
        sx = band.cfg.suffix
        fast = ctx.fast
        kk = fast.k
        fb = fast.block_samples
        scale = rec.cfg.fs / band.fs
        t_prn_s = band.tracking.cfg.code_period_s
        packed = np.asarray(out["packed"])
        bb, gg, n_ch, _ = packed.shape
        p2 = packed.reshape(bb * gg, n_ch, 5 * kk + 4)
        block_base = base + np.arange(bb, dtype=np.int64)[:, None] * fb
        flat_base = np.repeat(block_base.reshape(-1), gg)
        valid = p2[:, :, 5 * kk + 2] > 0.5
        dopp = p2[:, :, 5 * kk]
        cn0 = p2[:, :, 5 * kk + 1]
        loss_any = (p2[:, :, 5 * kk + 3] > 0.5).any(axis=0)
        use_imag = band.symbol_axis == "imag"
        symcol = (4 * kk, 5 * kk) if use_imag else (3 * kk, 4 * kk)

        for f in band.fsms:
            local_ch = f.channel_id - band.ch_offset
            if f.state is not ChannelState.TRACKING:
                continue
            gch = f.channel_id
            rows = np.nonzero(valid[:, local_ch])[0]
            if rows.size:
                starts = (flat_base[rows, None]
                          + p2[rows, local_ch, :kk].astype(np.int64)
                          ).reshape(-1)
                rems = p2[rows, local_ch, kk:2 * kk].reshape(-1)
                symbols = p2[rows, local_ch,
                             symcol[0]:symcol[1]].reshape(-1)
                ch_dopp = np.repeat(dopp[rows, local_ch], kk)
                ch_cn0 = np.repeat(cn0[rows, local_ch], kk)
                dec = band.decoders[local_ch]
                t_int = int(round(t_prn_s * band.fs))
                stamps = starts + t_int
                n_p = starts.size
                self._period_count[sx][local_ch] += n_p
                if hasattr(dec, "feed_array"):
                    tows = dec.feed_array(symbols, stamps)
                else:
                    tows = np.full(n_p, np.nan)
                    for j in range(n_p):
                        dec.feed(float(symbols[j]), int(stamps[j]))
                        if dec.tow_at_last_symbol_ms is not None:
                            tows[j] = dec.tow_at_last_symbol_ms
                acc0 = band.tracking.acc_carrier_phase_rad[local_ch]
                acc = acc0 - TWO_PI * t_prn_s * np.cumsum(ch_dopp)
                band.tracking.acc_carrier_phase_rad[local_ch] = acc[-1]
                known = ~np.isnan(tows)
                if known.any():
                    rec.observables.add_anchors(
                        gch, (starts[known] + rems[known]) * scale,
                        tows[known] - band.period_ms,
                        ch_dopp[known], acc[known], ch_cn0[known])
                key = (band.system, f.prn)
                if dec.has_full_ephemeris() \
                        and key not in rec.ephemerides:
                    rec.ephemerides[key] = band.make_ephemeris(f.prn, dec)
            if loss_any[local_ch]:
                prn = f.loss_of_lock()
                if prn:
                    band.sat_pool.append(prn)
                rec.observables.reset_channel(gch)
                rec._chan_sat.pop(gch, None)
        if band.system == "S":
            # DO-229 PRCs have short validity: deliver freshly decoded
            # SBAS messages every consumed window, not just in phase A
            rec._drain_sbas(band)

    # -- driver ------------------------------------------------------------
    def run(self, streams) -> list:
        import time as _time

        rec = self.receiver
        t0 = _time.perf_counter()
        if isinstance(streams, dict):
            n_blocks = min(
                (len(streams[b.cfg.suffix]) - b.tracking.overlap)
                // b.block_samples for b in rec.bands)
        else:
            n_blocks = min(
                (len(streams) - b.tracking.overlap) // b.block_samples
                for b in rec.bands)

        # wrap acquisition bookkeeping so fresh channels get sync trackers
        orig_manage = rec._manage_acquisition

        def manage(band, block):
            before = {f.channel_id: f.state for f in band.fsms}
            orig_manage(band, block)
            for f in band.fsms:
                if f.state is ChannelState.TRACKING \
                        and before.get(f.channel_id) \
                        is not ChannelState.TRACKING:
                    self._reset_channel_sync(
                        band, f.channel_id - band.ch_offset, f.prn)
        rec._manage_acquisition = manage

        # phase A: per-block scan pipeline with sync observation
        k = 0
        while self._ctx is None and k < n_blocks:
            blk = {}
            for b in rec.bands:
                x = streams[b.cfg.suffix] if isinstance(streams, dict) \
                    else streams
                lo = k * b.block_samples
                blk[b.cfg.suffix] = x[lo: lo + b.block_samples
                                      + b.tracking.overlap]
            for band in rec.bands:
                bx = blk[band.cfg.suffix]
                rec._manage_acquisition(band, bx)
                per_channel = band.tracking.process_block(
                    bx[: band.block_samples + band.tracking.overlap])
                self._observe_phase_a(band, per_channel)
                rec._feed_band(band, per_channel)
            rec._share_coarse_time()
            rec._run_pvt()
            k += 1
            if self._ready_for_handoff():
                self._handoff(streams)
        t_split = _time.perf_counter()

        # phase B: pipelined per-band ring superblocks
        phase_b_samples = 0
        if self._ctx is not None:
            ctxs = list(self._ctx.values())
            stream_len = {c.band.cfg.suffix: (
                len(streams[c.band.cfg.suffix]) if isinstance(streams, dict)
                else len(streams)) for c in ctxs}
            pending = None
            while True:
                nb = None
                for c in ctxs:
                    avail = (stream_len[c.band.cfg.suffix]
                             - c.fast.overlap - c.base) \
                        // c.fast.block_samples
                    nbc = self.blocks_per_call \
                        if avail >= self.blocks_per_call \
                        else (5 if avail >= 5 else (1 if avail >= 1 else 0))
                    nb = nbc if nb is None else min(nb, nbc)
                if not nb:
                    break
                outs = []
                for c in ctxs:
                    outs.append((c, self._dispatch_band(c, nb), c.base, nb))
                    c.base += nb * c.fast.block_samples
                if pending is not None:
                    for c, out, base, pnb in pending:
                        self._consume_band(c, out, base, pnb)
                    rec._share_coarse_time()
                    # epochs may only advance over CONSUMED spans: the
                    # just-dispatched window has no anchors yet, and an
                    # epoch index never moves backwards
                    limit = min(
                        (base + pnb * c.fast.block_samples
                         - 2 * c.fast.max_period) * rec.cfg.fs / c.band.fs
                        for c, out, base, pnb in pending)
                    rec._run_pvt(limit)
                pending = outs
            if pending is not None:
                for c, out, base, pnb in pending:
                    self._consume_band(c, out, base, pnb)
                rec._share_coarse_time()
                limit = min(
                    (base + pnb * c.fast.block_samples
                     - 2 * c.fast.max_period) * rec.cfg.fs / c.band.fs
                    for c, out, base, pnb in pending)
                rec._run_pvt(limit)
            phase_b_samples = int(
                (ctxs[0].base - ctxs[0].band.tracking.abs_block_start)
                * rec.cfg.fs / ctxs[0].band.fs)
        t_end = _time.perf_counter()
        self.timings = {
            "phase_a_s": t_split - t0,
            "phase_a_samples": int(self.handoff_sample or 0),
            "phase_b_s": t_end - t_split,
            "phase_b_samples": phase_b_samples,
        }
        return rec.solutions

    @property
    def in_fast_mode(self) -> bool:
        return self._ctx is not None

    def channel_states(self):
        return self.receiver.channel_states()

    def apply_command(self, verb: str, args: list[str] | None = None) -> str:
        return self.receiver.apply_command(verb, args)

    @property
    def ephemerides(self):
        return self.receiver.ephemerides

    def set_rtk_base(self, *args, **kwargs):
        return self.receiver.set_rtk_base(*args, **kwargs)

    def write_rinex(self, *args, **kwargs):
        return self.receiver.write_rinex(*args, **kwargs)
