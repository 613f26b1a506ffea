"""Per-PRN-period decoder facades for non-GPS-L1 telemetry layers.

The receiver's telemetry interface feeds decoders one prompt per code
period (1 ms for L1-class signals) — the convention GpsLnavDecoder and
GalileoInavDecoder implement natively. GLONASS GNAV and BeiDou D1 carry
extra sub-layers between the PRN period and the navigation symbol:

- GNAV: 10 ms bi-binary (meander) chips = 10 PRN periods each, with the
  chip boundary unknown at tracking start
  (/root/reference/src/algorithms/telemetry_decoder/gnuradio_blocks/
  glonass_l1_ca_telemetry_decoder_gs.cc:160-210 does the same
  accumulation in its d_symbol history);
- D1: the NH20 secondary code at one NH chip per PRN period, wiped off
  to form 20 ms data symbols
  (beidou_b1i_telemetry_decoder_gs.cc:208-260).

These facades synchronize the sub-layer (meander chip phase / NH20
phase), accumulate periods coherently, drive the string/subframe decoder
underneath, and maintain a per-period ``tow_at_last_symbol_ms`` so the
observables engine can anchor pseudoranges at any period boundary —
exactly the interface GpsLnavDecoder exposes.
"""

from __future__ import annotations

from gnss_sdr_tpu.telemetry.beidou_d1 import BeidouD1Decoder, D1SubframeUpdate
from gnss_sdr_tpu.telemetry.glonass_gnav import (
    GlonassGnavDecoder,
    GnavStringUpdate,
)
from gnss_sdr_tpu.tracking.bit_sync import BitSync

#: BeiDou NH20 secondary code (BEIDOU_B1I.h NH code), one chip per PRN period
BEIDOU_NH20 = "00000100110101001110"


class _Nh20Sync:
    """Data-agnostic NH20 phase search.

    SecondaryCodeSync (pilot channels) correlates coherently across its
    whole window — correct for a data-free pilot, but B1I's NH code rides
    ON the 50 bps data, so window-level coherence cancels at bit flips.
    Here each candidate phase scores one |correlation| per complete NH
    frame (20 periods = one data bit, constant sign inside), summed over
    several frames; the data sign drops out per-frame.
    """

    def __init__(self, signs: list[float], frames: int = 4):
        self.signs = signs
        self.k = len(signs)
        self.frames = frames
        self.history: list[float] = []
        self.phase: int | None = None  # period index mod k of NH start

    @property
    def synced(self) -> bool:
        return self.phase is not None

    def feed(self, prompt_i: float, period_idx: int) -> bool:
        self.history.append(1.0 if prompt_i >= 0 else -1.0)
        need = (self.frames + 1) * self.k
        # sliding window: score only the most recent frames, so pre-lock
        # transients (FLL pull-in) age out instead of poisoning the search
        if len(self.history) > need:
            del self.history[:len(self.history) - need]
        if self.synced or len(self.history) < need:
            return False
        base = period_idx + 1 - len(self.history)  # abs idx of history[0]
        best, best_phase, second = 0.0, 0, 0.0
        for c in range(self.k):
            # first NH-frame start at or after base for this candidate
            start = base + (c - base) % self.k
            score = 0.0
            for w in range(self.frames):
                lo = start + w * self.k - base
                corr = sum(self.history[lo + i] * self.signs[i]
                           for i in range(self.k))
                score += abs(corr)
            if score > best:
                second = best
                best, best_phase = score, c
            elif score > second:
                second = score
        # perfect score on every frame + margin (NH20 cyclic-autocorrelation
        # sidelobes are <= 4/20 per frame, so 0.7 is a wide guard band)
        if best == self.frames * self.k and second <= 0.7 * best:
            self.phase = best_phase
            return True
        return False

    def periods_into_code(self, period_idx: int) -> int:
        assert self.phase is not None
        return (period_idx - self.phase) % self.k


class GlonassGnavPeriodDecoder:
    """GNAV over 1 ms prompts: meander-chip sync + 10x accumulation.

    TOW anchoring: string s's trailing time mark ends at frame-relative
    time 2s seconds; string 1 carries t_k (frame start within the
    GLONASS day), so its decode sets tow = (t_k + 2) s and later strings
    re-anchor at (t_k + 2s). Between decodes TOW advances one
    millisecond per period, like the reference's per-symbol TOW
    propagation.

    Coarse-time aiding: GNAV frames start on the 30 s grid of the
    GLONASS day (ICD 4.2), so the end of string s is congruent to
    2s mod 30 s. With a coarse external time (another constellation's
    TOW, accurate to well under 15 s) set via :attr:`coarse_tow_ms`,
    any decoded string resolves absolute time without waiting up to
    30 s for the next string 1 — the GLONASS analogue of Z-count
    recovery from handover.
    """

    PERIODS_PER_CHIP = 10

    def __init__(self):
        self.dec = GlonassGnavDecoder()
        self._chip_sync = BitSync(symbols_per_bit=self.PERIODS_PER_CHIP)
        self._period_idx = 0
        self._acc = 0.0
        self._acc_n = 0
        self.tow_at_last_symbol_ms: float | None = None
        #: coarse receiver time (ms, same day base as GNAV), settable by
        #: the receiver from another constellation's TOW
        self.coarse_tow_ms: float | None = None

    def feed(self, prompt_i: float, sample_stamp: int) -> GnavStringUpdate | None:
        idx = self._period_idx
        self._period_idx += 1
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += 1.0
        if not self._chip_sync.synced:
            self._chip_sync.feed(prompt_i)
            return None
        into = (idx - self._chip_sync.bit_phase) % self.PERIODS_PER_CHIP
        if into == 0:
            self._acc = 0.0
            self._acc_n = 0
        self._acc += float(prompt_i)
        self._acc_n += 1
        if into != self.PERIODS_PER_CHIP - 1 \
                or self._acc_n != self.PERIODS_PER_CHIP:
            return None
        update = self.dec.feed(self._acc, sample_stamp)
        if update is not None:
            sid = update.string_id
            if sid == 1 and "t_k_s" in update.fields:
                # exact anchor: string 1's time mark ends at t_k + 2 s
                self.tow_at_last_symbol_ms = \
                    (float(update.fields["t_k_s"]) + 2.0) * 1e3
            else:
                # 30 s frame grid (ICD 4.2): end of string s is = 2s mod
                # 30; the propagated TOW (sub-ms) or external coarse time
                # (< 15 s error) resolves the frame index
                ref = self.tow_at_last_symbol_ms \
                    if self.tow_at_last_symbol_ms is not None \
                    else self.coarse_tow_ms
                if ref is not None and 1 <= sid <= 15:
                    mod = 2.0 * sid % 30.0
                    frame = round((ref * 1e-3 - mod) / 30.0) * 30.0
                    self.tow_at_last_symbol_ms = (frame + mod) * 1e3
        return update

    def skip_periods(self, n: int) -> None:
        """Advance the period index without samples (fast-engine handoff
        chip alignment): the partial meander chip is dropped and the
        string layer re-syncs on its next time mark."""
        self._period_idx += int(n)
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += float(n)
        self._acc = 0.0
        self._acc_n = 0

    @property
    def ephemeris_fields(self) -> dict:
        return self.dec.ephemeris_fields

    def has_full_ephemeris(self) -> bool:
        return self.dec.has_full_ephemeris()

    # GPS-decoder interface parity (no broadcast iono in GNAV strings 1-4)
    utc_iono_fields: dict = {}


class GpsL5PeriodDecoder:
    """L5 over 1 ms data prompts: NH10 sync + wipe-off + 10x accumulation
    + streaming CNAV (the gps_l5_telemetry_decoder_gs role,
    /root/reference/src/algorithms/telemetry_decoder/gnuradio_blocks/
    gps_l5_telemetry_decoder_gs.cc:150-260).

    The tracking engine tracks the L5Q pilot; the fed value is the
    data-component prompt (``PeriodOutput.data_prompt``) on whichever
    axis the pilot-locked PLL leaves it (the reference's interchange_iq
    role) — NH/CNAV polarity searches absorb the sign.

    Time aiding: CNAV needs a full 6 s message + Viterbi history before
    its first TOW (~13 s of stream). Data-symbol boundaries sit on the
    10 ms SV-time grid, so an exact same-SV TOW from another band
    (:attr:`time_aid` = ``(t_rx_s, tow_ms)``, e.g. GPS L1 LNAV) resolves
    the absolute symbol TOW immediately — the receiver's cross-band time
    transfer (same-SV L1/L5 transmit clocks are synchronized to well
    under the 5 ms guard band).
    """

    PERIODS_PER_SYMBOL = 10

    def __init__(self, fs: float | None = None):
        from gnss_sdr_tpu.codes.gps_l5 import NH10
        from gnss_sdr_tpu.telemetry.gps_cnav import GpsCnavDecoder

        self.dec = GpsCnavDecoder(symbol_ms=10.0)
        self._signs = [1.0 if c == "0" else -1.0 for c in NH10]
        self._nh = _Nh20Sync(self._signs, frames=6)
        self._period_idx = 0
        self._acc = 0.0
        self._acc_n = 0
        self.fs = fs
        #: same-SV cross-band aid ``(t_rx_s, tow_ms)`` (receiver-time of a
        #: symbol end on the aiding band, and its exact TOW)
        self.time_aid: tuple[float, float] | None = None
        self.tow_at_last_symbol_ms: float | None = None

    def feed(self, prompt: float, sample_stamp: int):
        idx = self._period_idx
        self._period_idx += 1
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += 1.0
        if not self._nh.synced:
            self._nh.feed(prompt, idx)
            return None
        into = self._nh.periods_into_code(idx)
        if into == 0:
            self._acc = 0.0
            self._acc_n = 0
        self._acc += float(prompt) * self._signs[into]
        self._acc_n += 1
        if into != self.PERIODS_PER_SYMBOL - 1 \
                or self._acc_n != self.PERIODS_PER_SYMBOL:
            return None
        update = self.dec.feed(self._acc, sample_stamp)
        if self.dec.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms = self.dec.tow_at_last_symbol_ms
        elif self.time_aid is not None and self.fs:
            t_aid, tow_aid = self.time_aid
            pred = tow_aid + (sample_stamp / self.fs - t_aid) * 1e3
            self.tow_at_last_symbol_ms = round(pred / 10.0) * 10.0
        return update

    @property
    def ephemeris_fields(self) -> dict:
        return self.dec.ephemeris_fields

    def has_full_ephemeris(self) -> bool:
        return self.dec.has_full_ephemeris()

    utc_iono_fields: dict = {}


class GalileoE5aPeriodDecoder:
    """E5a over 1 ms data prompts: per-PRN CS20 secondary sync + wipe-off
    + 20x accumulation + streaming F/NAV (galileo_telemetry_decoder_gs.cc
    d_band=='5' branches).

    Mirrors :class:`GpsL5PeriodDecoder`: pilot (E5a-Q) drives the loops,
    the fed value is the data-component prompt; cross-band same-SV time
    aiding (Galileo E1 I/NAV TOW) snaps the 20 ms symbol grid before the
    first autonomous F/NAV page (10 s pages) lands.
    """

    PERIODS_PER_SYMBOL = 20

    def __init__(self, prn: int, fs: float | None = None):
        from gnss_sdr_tpu.codes.galileo_e5a import galileo_e5a_secondary
        from gnss_sdr_tpu.telemetry.galileo_fnav import GalileoFnavDecoder

        self.prn = prn
        sec = galileo_e5a_secondary(prn, "I")
        self._signs = [1.0 if c == "0" else -1.0 for c in sec]
        self._nh = _Nh20Sync(self._signs, frames=4)
        self.dec = GalileoFnavDecoder()
        self._period_idx = 0
        self._acc = 0.0
        self._acc_n = 0
        self.fs = fs
        self.time_aid: tuple[float, float] | None = None
        self.tow_at_last_symbol_ms: float | None = None

    def feed(self, prompt: float, sample_stamp: int):
        idx = self._period_idx
        self._period_idx += 1
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += 1.0
        if not self._nh.synced:
            self._nh.feed(prompt, idx)
            return None
        into = self._nh.periods_into_code(idx)
        if into == 0:
            self._acc = 0.0
            self._acc_n = 0
        self._acc += float(prompt) * self._signs[into]
        self._acc_n += 1
        if into != self.PERIODS_PER_SYMBOL - 1 \
                or self._acc_n != self.PERIODS_PER_SYMBOL:
            return None
        update = self.dec.feed(self._acc, sample_stamp)
        if self.dec.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms = self.dec.tow_at_last_symbol_ms
        elif self.time_aid is not None and self.fs:
            t_aid, tow_aid = self.time_aid
            pred = tow_aid + (sample_stamp / self.fs - t_aid) * 1e3
            self.tow_at_last_symbol_ms = round(pred / 20.0) * 20.0
        return update

    @property
    def ephemeris_fields(self) -> dict:
        return self.dec.ephemeris_fields

    def has_full_ephemeris(self) -> bool:
        return self.dec.has_full_ephemeris()

    utc_iono_fields: dict = {}


class BeidouD1PeriodDecoder:
    """D1 over 1 ms prompts: NH20 sync + wipe-off + 20x accumulation.

    The NH20 phase search reuses SecondaryCodeSync (the same engine the
    pilot-tracking path uses); once locked, each NH frame of 20 periods
    collapses to one 20 ms data symbol for BeidouD1Decoder. TOW advances
    per period between subframe decodes.
    """

    PERIODS_PER_SYMBOL = 20

    def __init__(self):
        self.dec = BeidouD1Decoder()
        self._signs = [1.0 if c == "0" else -1.0 for c in BEIDOU_NH20]
        self._nh = _Nh20Sync(self._signs)
        self._period_idx = 0
        self._acc = 0.0
        self._acc_n = 0
        self.tow_at_last_symbol_ms: float | None = None

    def feed(self, prompt_i: float, sample_stamp: int) -> D1SubframeUpdate | None:
        idx = self._period_idx
        self._period_idx += 1
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += 1.0
        if not self._nh.synced:
            self._nh.feed(prompt_i, idx)
            return None
        into = self._nh.periods_into_code(idx)
        if into == 0:
            self._acc = 0.0
            self._acc_n = 0
        self._acc += float(prompt_i) * self._signs[into]
        self._acc_n += 1
        if into != self.PERIODS_PER_SYMBOL - 1 \
                or self._acc_n != self.PERIODS_PER_SYMBOL:
            return None
        # sign ambiguity (Costas half-cycle x NH polarity) is resolved by
        # the D1 decoder's preamble inversion detection
        update = self.dec.feed(self._acc, sample_stamp)
        if self.dec.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms = self.dec.tow_at_last_symbol_ms
        return update

    def skip_periods(self, n: int) -> None:
        """Advance the period index without samples (fast-engine handoff
        group alignment): the partially-accumulated symbol is dropped and
        the subframe layer re-syncs on its next preamble."""
        self._period_idx += int(n)
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += float(n)
        self._acc = 0.0
        self._acc_n = 0

    @property
    def ephemeris_fields(self) -> dict:
        return self.dec.ephemeris_fields

    def has_full_ephemeris(self) -> bool:
        return self.dec.has_full_ephemeris()

    @property
    def subframes(self) -> dict:
        return self.dec.subframes

    utc_iono_fields: dict = {}


class GpsL2cPeriodDecoder:
    """L2C CM over 20 ms prompts: one CNAV symbol per PRN period.

    The L2 CM code period (10230 chips at 511.5 kcps = 20 ms) equals the
    CNAV symbol period at L2's 25 bps / 50 sps rate, so each prompt IS a
    symbol and feeds the streaming Viterbi directly
    (gps_l2c_telemetry_decoder_gs.cc:150-210 does the same without any
    sub-layer). TOW advances 20 ms per period between message decodes.
    """

    def __init__(self, fs: float | None = None):
        from gnss_sdr_tpu.telemetry.gps_cnav import GpsCnavDecoder

        self.dec = GpsCnavDecoder(symbol_ms=20.0)
        self.fs = fs
        self.time_aid: tuple[float, float] | None = None
        self.tow_at_last_symbol_ms: float | None = None

    def feed(self, prompt: float, sample_stamp: int):
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += 20.0
        update = self.dec.feed(float(prompt), sample_stamp)
        if self.dec.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms = self.dec.tow_at_last_symbol_ms
        elif self.time_aid is not None and self.fs:
            # same-SV cross-band snap to the 20 ms symbol grid (the
            # galileo_tow_map/time-transfer role) before the first full
            # 12 s CNAV message + Viterbi history resolves autonomously
            t_aid, tow_aid = self.time_aid
            pred = tow_aid + (sample_stamp / self.fs - t_aid) * 1e3
            self.tow_at_last_symbol_ms = round(pred / 20.0) * 20.0
        return update

    @property
    def ephemeris_fields(self) -> dict:
        return self.dec.ephemeris_fields

    def has_full_ephemeris(self) -> bool:
        return self.dec.has_full_ephemeris()

    utc_iono_fields: dict = {}


class GalileoE5bPeriodDecoder:
    """E5b over 1 ms data prompts: CS4 secondary sync + wipe-off + 4x
    accumulation + streaming I/NAV (galileo_telemetry_decoder_gs.cc
    d_band=='7' branches: E5b carries the same I/NAV as E1 at
    250 sym/s).

    Pilot (E5b-Q, CS100) drives the loops; the fed value is the
    data-component (E5b-I) prompt. Cross-band same-SV aiding snaps the
    4 ms symbol grid before the first autonomous I/NAV page.
    """

    PERIODS_PER_SYMBOL = 4

    def __init__(self, prn: int, fs: float | None = None):
        from gnss_sdr_tpu.codes.galileo_e5b_e6 import galileo_e5b_secondary
        from gnss_sdr_tpu.telemetry.galileo_inav import GalileoInavDecoder

        self.prn = prn
        sec = galileo_e5b_secondary(prn, "I")
        self._signs = [1.0 if c == "0" else -1.0 for c in sec]
        self._nh = _Nh20Sync(self._signs, frames=8)
        self.dec = GalileoInavDecoder()
        self._period_idx = 0
        self._acc = 0.0
        self._acc_n = 0
        self.fs = fs
        self.time_aid: tuple[float, float] | None = None
        self.tow_at_last_symbol_ms: float | None = None

    def feed(self, prompt: float, sample_stamp: int):
        idx = self._period_idx
        self._period_idx += 1
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += 1.0
        if not self._nh.synced:
            self._nh.feed(prompt, idx)
            return None
        into = self._nh.periods_into_code(idx)
        if into == 0:
            self._acc = 0.0
            self._acc_n = 0
        self._acc += float(prompt) * self._signs[into]
        self._acc_n += 1
        if into != self.PERIODS_PER_SYMBOL - 1 \
                or self._acc_n != self.PERIODS_PER_SYMBOL:
            return None
        update = self.dec.feed(self._acc, sample_stamp)
        if self.dec.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms = self.dec.tow_at_last_symbol_ms
        elif self.time_aid is not None and self.fs:
            t_aid, tow_aid = self.time_aid
            pred = tow_aid + (sample_stamp / self.fs - t_aid) * 1e3
            self.tow_at_last_symbol_ms = round(pred / 4.0) * 4.0
        return update

    @property
    def ephemeris_fields(self) -> dict:
        return self.dec.ephemeris_fields

    def has_full_ephemeris(self) -> bool:
        return self.dec.has_full_ephemeris()

    utc_iono_fields: dict = {}


class GalileoE6PeriodDecoder:
    """E6-B over 1 ms data prompts: one C/NAV symbol per PRN period.

    The E6-B symbol rate is 1000 sym/s = one symbol per 1 ms code period
    (galileo_telemetry_decoder_gs.cc d_band=='6' branches); prompts feed
    the HAS C/NAV page decoder directly. C/NAV carries no TOW field —
    the reference resolves E6 observables time through its receiver-wide
    galileo_tow_map (core/libs/galileo_tow_map.cc); here the same-SV
    cross-band aid plays that role, snapping to the 1 ms period grid.
    """

    def __init__(self, prn: int = 0, fs: float | None = None):
        from gnss_sdr_tpu.telemetry.galileo_cnav import GalileoCnavDecoder

        self.prn = prn
        self.dec = GalileoCnavDecoder()
        self.fs = fs
        self.time_aid: tuple[float, float] | None = None
        self.tow_at_last_symbol_ms: float | None = None
        self.pages = []

    def feed(self, prompt: float, sample_stamp: int):
        if self.tow_at_last_symbol_ms is not None:
            self.tow_at_last_symbol_ms += 1.0
        page = self.dec.feed(float(prompt), sample_stamp)
        if page is not None:
            self.pages.append(page)
        if self.time_aid is not None and self.fs:
            t_aid, tow_aid = self.time_aid
            self.tow_at_last_symbol_ms = \
                tow_aid + (sample_stamp / self.fs - t_aid) * 1e3
        return page

    ephemeris_fields: dict = {}

    def has_full_ephemeris(self) -> bool:
        return False

    utc_iono_fields: dict = {}


class SbasL1PeriodDecoder:
    """SBAS L1 over 1 ms prompts: 2-period symbol folding + streaming
    rate-1/2 Viterbi message decode (sbas_l1_telemetry_decoder_gs role:
    500 sps coded symbols ride the GPS-family C/A code, one symbol per
    two code periods). Symbol-boundary phase is resolved from prompt
    sign transitions (they only occur on symbol edges); polarity is the
    block decoder's job. SBAS channels contribute corrections, not
    pseudoranges: ``tow_at_last_symbol_ms`` stays None.
    """

    def __init__(self, prn: int = 120, fs: float | None = None):
        from gnss_sdr_tpu.telemetry.sbas_l1 import SbasL1Decoder
        from gnss_sdr_tpu.tracking.bit_sync import BitSync

        self.prn = prn
        self.fs = fs
        # rate-1/2 convolutional pair phase is unknowable at an arbitrary
        # stream entry point: run both hypotheses (decoder B skips one
        # symbol) until one produces CRC-valid messages, then keep it
        # (the reference resolves the same ambiguity through its
        # d_channel history alignment)
        self.dec = SbasL1Decoder()
        self._dec_b: SbasL1Decoder | None = SbasL1Decoder()
        self._b_skipped = False
        self._sync = BitSync(symbols_per_bit=2, required=8)
        self._period_idx = 0
        self._acc = 0.0
        self._acc_n = 0
        self.tow_at_last_symbol_ms: float | None = None
        self._n_consumed = 0

    def feed(self, prompt: float, sample_stamp: int):
        idx = self._period_idx
        self._period_idx += 1
        if not self._sync.synced:
            self._sync.feed(prompt)
            return None
        into = (idx - self._sync.bit_phase) % 2
        if into == 0:
            self._acc = 0.0
            self._acc_n = 0
        self._acc += float(prompt)
        self._acc_n += 1
        if into != 1 or self._acc_n != 2:
            return None
        out = self.dec.feed(self._acc, sample_stamp)
        if self._dec_b is not None:
            if not self._b_skipped:
                self._b_skipped = True      # offset hypothesis by 1 symbol
            else:
                self._dec_b.feed(self._acc, sample_stamp)
            # first CRC-valid message settles the pair phase
            if self.dec.messages:
                self._dec_b = None
            elif self._dec_b is not None and self._dec_b.messages:
                self.dec = self._dec_b
                self._dec_b = None
                out = self.dec.messages[-1]
        return out

    def new_messages(self) -> list:
        """Messages decoded since the previous call (the receiver drains
        these into its SbasCorrections store)."""
        out = self.dec.messages[self._n_consumed:]
        self._n_consumed = len(self.dec.messages)
        return out

    ephemeris_fields: dict = {}

    def has_full_ephemeris(self) -> bool:
        return False

    utc_iono_fields: dict = {}
