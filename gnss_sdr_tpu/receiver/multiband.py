"""Multi-constellation (multi-band) receiver.

The hybrid-receiver capability of the reference (GNSSFlowgraph wiring N
channels of several signals into one observables/PVT chain — BASELINE
config 4): each band (GPS L1 C/A "1C", Galileo E1-B "1B", GLONASS L1
C/A "1G", BeiDou B1I "B1", GPS L5 "L5") gets its own batched
acquisition engine, tracking-channel engine and telemetry decoders; a
single common-reception-time observables engine and one PVT solver fuse
all bands' measurements. Each band may ride its own RF stream (the
reference's SignalSource.RF_channels concept,
gnss_flowgraph.cc:1007-1117): pass ``run``/``process_block`` a
``{suffix: samples}`` dict, or one array shared by all bands.

Time bases: GST and GPS time are taken as aligned; GLONASS day time is
taken aligned for simulation scenes (the constant UTC+3h/leap offset of
real data is absorbed by the solver's GLO inter-system state); BeiDou
BDT likewise (real BDT = GPST - 14 s).
"""

from __future__ import annotations

import collections
import dataclasses
import math

import numpy as np

from gnss_sdr_tpu.acquisition.adapters import (
    make_acquisition,
    make_galileo_e1_acquisition,
    make_gps_l1ca_acquisition,
)
from gnss_sdr_tpu.codes import gps_l1ca_code
from gnss_sdr_tpu.codes.galileo_e1 import galileo_e1_subchips
from gnss_sdr_tpu.observables import ObservablesEngine
from gnss_sdr_tpu.pvt import GpsEphemeris, PvtSolution, solve_pvt
from gnss_sdr_tpu.pvt.solver import Observation
from gnss_sdr_tpu.receiver.fsm import ChannelFsm, ChannelState
from gnss_sdr_tpu.telemetry import GpsLnavDecoder
from gnss_sdr_tpu.telemetry.galileo_inav import (
    GalileoInavDecoder,
    galileo_ephemeris_from_inav,
)
from gnss_sdr_tpu.tracking import TrackingConfig
from gnss_sdr_tpu.tracking.channels import TrackingChannels


class _SlotAcquisition:
    """FDMA acquisition front: one PCPS engine per frequency slot.

    GLONASS satellites share the single m-sequence but sit on per-slot
    carriers k * 562.5 kHz from band center; each distinct slot gets a
    PCPS engine whose Doppler grid is centered on its slot offset
    (GLONASS_L1_CA_PCPS_Acquisition adapter + the doppler_center
    mechanism of acq_conf.h). ``search`` fans out and merges."""

    def __init__(self, engines: list):
        self._engines = engines
        self.cfg = engines[0].cfg

    def search(self, samples, samplestamp=0):
        out = {}
        for eng in self._engines:
            out.update(eng.search(samples, samplestamp=samplestamp))
        return out


@dataclasses.dataclass
class BandConfig:
    suffix: str                  # "1C", "1B", "1G", "B1", "L5"
    #: per-band sample rate (RF_channels may run different front-end
    #: rates); None inherits MultiBandConfig.fs. Anchors are rescaled to
    #: the common timebase before the observables engine.
    fs: float | None = None
    satellites: list[int] = dataclasses.field(default_factory=list)
    n_channels: int = 4
    doppler_max: float = 5000.0
    doppler_step: float = 250.0
    acq_pfa: float = 0.001
    acq_dwells: int = 2
    pll_bw_hz: float = 35.0
    dll_bw_hz: float = 2.0
    enable_fll_pull_in: bool = True
    fll_bw_hz: float = 35.0
    pull_in_time_s: float = 0.5
    early_late_space_chips: float = 0.5
    #: close the loops on the pilot component where the signal has one
    #: (Tracking_XX.track_pilot; E1-C CS25 — pure-pilot bands like
    #: L5/E5a/E5b/E6 always track pilot regardless)
    track_pilot: bool = False
    # GLONASS FDMA: satellite slot number -> frequency channel k (-7..6)
    freq_slots: dict[int, int] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class MultiBandConfig:
    fs: float = 5.0e6
    block_ms: int = 20
    interval_ms: int = 20
    output_rate_ms: int = 100
    apply_tropo: bool = False
    enable_carrier_smoothing: bool = False
    smoothing_factor: int = 200
    #: collapse same-satellite dual-band rows into the first-order
    #: ionosphere-free combination (rtklib IONOOPT_IFLC role)
    iono_free: bool = False
    #: "Single" (pntpos LS) or "RTK_Kinematic" (single-baseline DD EKF +
    #: LAMBDA against base observables, rtklib_pvt_gs positioning-mode
    #: plumbing / rtklib_rtkpos.cc). RTK also needs
    #: :meth:`MultiBandReceiver.set_rtk_base`.
    positioning_mode: str = "Single"
    #: record this receiver's own epoch observables (prn ->
    #: (pseudorange, phase cycles)) so it can serve as an RTK base
    log_base_obs: bool = False
    #: log every observable epoch for RINEX obs/nav output
    #: (PVT.rinex_output_enabled, rinex_printer.cc role)
    rinex_output: bool = False


class _Band:
    def __init__(self, cfg: BandConfig, fs: float, block_ms: int,
                 ch_offset: int):
        self.cfg = cfg
        self.fs = fs
        self.block_samples = int(round(fs * block_ms * 1e-3))
        block_samples = self.block_samples
        self.ch_offset = ch_offset
        self.sat_pool = collections.deque(cfg.satellites)
        self.fsms = [ChannelFsm(ch_offset + i) for i in range(cfg.n_channels)]
        self.data_code_table = None      # dual-component bands only
        self.symbol_axis = "real"        # decoder symbol source axis
        sx = cfg.suffix
        if sx == "1C":
            self.system = "G"
            self.period_ms = 1.0
            self.acq = make_gps_l1ca_acquisition(
                sorted(cfg.satellites), fs, doppler_max=cfg.doppler_max,
                doppler_step=cfg.doppler_step, pfa=cfg.acq_pfa,
                max_dwells=cfg.acq_dwells)
            trk = TrackingConfig(
                fs=fs, pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=cfg.early_late_space_chips)
            self.code_table = lambda prn: np.asarray(
                gps_l1ca_code(prn), dtype=np.float32)
            self.new_decoder = GpsLnavDecoder
        elif sx == "1B":
            self.system = "E"
            self.period_ms = 4.0
            self.acq = make_galileo_e1_acquisition(
                sorted(cfg.satellites), fs, doppler_max=cfg.doppler_max,
                doppler_step=min(cfg.doppler_step, 125.0), pfa=cfg.acq_pfa,
                max_dwells=cfg.acq_dwells)
            trk = TrackingConfig(
                fs=fs, code_length_chips=4092, chip_rate_cps=1.023e6,
                code_samples_per_chip=12, veml=True, symbols_per_bit=1,
                pll_bw_hz=min(cfg.pll_bw_hz, 20.0), dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=0.15,
                very_early_late_space_chips=0.6,
                track_pilot=cfg.track_pilot)
            if cfg.track_pilot:
                # E1-C pilot tracking (Tracking_1B.track_pilot=true, the
                # reference's default E1 configuration,
                # dll_pll_veml_tracking.cc:211-246): loops close on the
                # CS25-wiped pilot, I/NAV symbols come from the E1-B
                # data-bank correlation on the SAME phase (both
                # components ride the in-phase carrier, unlike L5)
                self.code_table = lambda prn: galileo_e1_subchips(
                    prn, "C", True)
                self.data_code_table = lambda prn: galileo_e1_subchips(
                    prn, "B", True)
                self.symbol_axis = "data_real"
            else:
                self.code_table = lambda prn: galileo_e1_subchips(
                    prn, "B", True)
            self.new_decoder = GalileoInavDecoder
        elif sx == "1G":
            # GLONASS L1 C/A FDMA: shared 511-chip m-sequence, per-slot
            # carrier offsets handled as per-channel IF in tracking
            # (glonass_l1_ca_dll_pll_tracking.cc role) and as Doppler
            # centers in acquisition
            from gnss_sdr_tpu.codes.glonass_l1ca import glonass_l1ca_code
            from gnss_sdr_tpu.telemetry.period_decoders import (
                GlonassGnavPeriodDecoder)

            self.system = "R"
            self.period_ms = 1.0
            engines = []
            for k in sorted({cfg.freq_slots.get(s, 0)
                             for s in cfg.satellites}):
                prns_k = [s for s in sorted(cfg.satellites)
                          if cfg.freq_slots.get(s, 0) == k]
                engines.append(make_acquisition(
                    "GLONASS_L1_CA_PCPS_Acquisition", prns_k, fs,
                    doppler_center=k * 562_500.0,
                    doppler_max=cfg.doppler_max,
                    doppler_step=cfg.doppler_step, pfa=cfg.acq_pfa,
                    max_dwells=cfg.acq_dwells))
            self.acq = _SlotAcquisition(engines)
            trk = TrackingConfig(
                fs=fs, code_length_chips=511, chip_rate_cps=0.511e6,
                carrier_hz=1602.0e6, symbols_per_bit=10,
                pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=cfg.early_late_space_chips)
            self.code_table = lambda prn: np.asarray(
                glonass_l1ca_code(), dtype=np.float32)
            self.new_decoder = GlonassGnavPeriodDecoder
        elif sx == "L5":
            # GPS L5: QPSK data (I, NH10+CNAV) / pilot (Q, NH20). Loops
            # track the L5Q pilot code; a data-prompt correlator feeds the
            # CNAV decoder (dll_pll_veml_tracking.cc:211-246 track_pilot
            # setup; GPS_L5.h:33-39).
            from gnss_sdr_tpu.codes.gps_l5 import (gps_l5i_code,
                                                   gps_l5q_code)
            from gnss_sdr_tpu.telemetry.period_decoders import (
                GpsL5PeriodDecoder)

            self.system = "G"
            self.period_ms = 1.0
            # bit_transition mode: the NH10/NH20 secondaries flip sign at
            # every code boundary, which nulls plain 1 ms dwells whose
            # circular peak sits mid-buffer; the doubled-buffer straddling
            # correlation is transition-proof (pcps_acquisition.cc:622,669)
            self.acq = make_acquisition(
                "GPS_L5i_PCPS_Acquisition", sorted(cfg.satellites), fs,
                doppler_max=cfg.doppler_max, doppler_step=cfg.doppler_step,
                pfa=cfg.acq_pfa, max_dwells=cfg.acq_dwells,
                bit_transition_flag=True)
            trk = TrackingConfig(
                fs=fs, code_length_chips=10230, chip_rate_cps=10.23e6,
                carrier_hz=1176.45e6, symbols_per_bit=10, track_pilot=True,
                pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                # acquisition delivers the delay centered (the replica's
                # AUX_CEIL one-sample bias is corrected at the source,
                # acquisition/pcps.py), so the configured spacing holds
                # even at ~1.17 samples/chip
                early_late_space_chips=cfg.early_late_space_chips)
            self.code_table = lambda prn: np.asarray(
                gps_l5q_code(prn), dtype=np.float32)
            self.data_code_table = lambda prn: np.asarray(
                gps_l5i_code(prn), dtype=np.float32)
            # pilot-locked PLL leaves the data component on the imag axis
            # (the reference's interchange_iq role)
            self.symbol_axis = "imag"
            self.new_decoder = lambda: GpsL5PeriodDecoder(fs=fs)
        elif sx == "5X":
            # Galileo E5a: QPSK data (I, CS20 + F/NAV) / pilot (Q, CS100).
            # Same dual-component topology as GPS L5 (Galileo_E5a.h;
            # dll_pll_veml_tracking.cc:291-325 pilot setup).
            from gnss_sdr_tpu.codes.galileo_e5a import galileo_e5a_code
            from gnss_sdr_tpu.telemetry.period_decoders import (
                GalileoE5aPeriodDecoder)

            self.system = "E"
            self.period_ms = 1.0
            self.acq = make_acquisition(
                "Galileo_E5a_Pcps_Acquisition", sorted(cfg.satellites), fs,
                doppler_max=cfg.doppler_max, doppler_step=cfg.doppler_step,
                pfa=cfg.acq_pfa, max_dwells=cfg.acq_dwells,
                bit_transition_flag=True)
            trk = TrackingConfig(
                fs=fs, code_length_chips=10230, chip_rate_cps=10.23e6,
                carrier_hz=1176.45e6, symbols_per_bit=20, track_pilot=True,
                pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=cfg.early_late_space_chips)
            self.code_table = lambda prn: np.asarray(
                galileo_e5a_code(prn, "Q"), dtype=np.float32)
            self.data_code_table = lambda prn: np.asarray(
                galileo_e5a_code(prn, "I"), dtype=np.float32)
            self.symbol_axis = "imag"
            self.new_decoder = lambda prn=1: GalileoE5aPeriodDecoder(
                prn, fs=fs)
            self.decoder_takes_prn = True
        elif sx == "2S":
            # GPS L2C CM: 10230 chips at 511.5 kcps = 20 ms periods; one
            # CNAV symbol per period (GPS_L2_M_DLL_PLL_Tracking /
            # gps_l2c_telemetry_decoder_gs roles; GPS_L2C.h:37-40).
            # Simulated/tracked as CM-only BPSK (the CL time-multiplex
            # carries no data and is not modeled).
            from gnss_sdr_tpu.codes.gps_l2c import gps_l2cm_code
            from gnss_sdr_tpu.telemetry.period_decoders import (
                GpsL2cPeriodDecoder)

            self.system = "G"
            self.period_ms = 20.0
            self.acq = make_acquisition(
                "GPS_L2_M_PCPS_Acquisition", sorted(cfg.satellites), fs,
                doppler_max=cfg.doppler_max,
                # 20 ms coherent: keep the Doppler residual well inside
                # the pull-in FLL's +-1/(4T) = +-12.5 Hz basin; CNAV
                # symbols flip at every code boundary, so straddle them
                doppler_step=min(cfg.doppler_step, 60.0), pfa=cfg.acq_pfa,
                max_dwells=cfg.acq_dwells, make_2_steps=True,
                doppler_step2=8.0, num_doppler_bins_step2=8,
                bit_transition_flag=True)
            trk = TrackingConfig(
                fs=fs, code_length_chips=10230, chip_rate_cps=0.5115e6,
                carrier_hz=1227.60e6, symbols_per_bit=1,
                pll_bw_hz=min(cfg.pll_bw_hz, 10.0),
                dll_bw_hz=min(cfg.dll_bw_hz, 1.0),
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=min(cfg.fll_bw_hz, 10.0),
                pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=min(
                    cfg.early_late_space_chips, 0.5))
            self.code_table = lambda prn: np.asarray(
                gps_l2cm_code(prn), dtype=np.float32)
            self.new_decoder = lambda prn=1: GpsL2cPeriodDecoder(fs=fs)
            self.decoder_takes_prn = True
        elif sx == "7X":
            # Galileo E5b: QPSK data (I, CS4 + I/NAV at 250 sym/s) /
            # pilot (Q, CS100) — dll_pll_veml_tracking.cc:326-348 setup,
            # Galileo_E5b.h:34-39.
            from gnss_sdr_tpu.codes.galileo_e5b_e6 import galileo_e5b_code
            from gnss_sdr_tpu.telemetry.period_decoders import (
                GalileoE5bPeriodDecoder)

            self.system = "E"
            self.period_ms = 1.0
            self.acq = make_acquisition(
                "Galileo_E5b_PCPS_Acquisition", sorted(cfg.satellites), fs,
                doppler_max=cfg.doppler_max, doppler_step=cfg.doppler_step,
                pfa=cfg.acq_pfa, max_dwells=cfg.acq_dwells,
                bit_transition_flag=True)
            trk = TrackingConfig(
                fs=fs, code_length_chips=10230, chip_rate_cps=10.23e6,
                carrier_hz=1207.14e6, symbols_per_bit=4, track_pilot=True,
                pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=cfg.early_late_space_chips)
            self.code_table = lambda prn: np.asarray(
                galileo_e5b_code(prn, "Q"), dtype=np.float32)
            self.data_code_table = lambda prn: np.asarray(
                galileo_e5b_code(prn, "I"), dtype=np.float32)
            self.symbol_axis = "imag"
            self.new_decoder = lambda prn=1: GalileoE5bPeriodDecoder(
                prn, fs=fs)
            self.decoder_takes_prn = True
        elif sx == "E6":
            # Galileo E6 B/C: data (B, C/NAV HAS at 1000 sym/s) / pilot
            # (C, CS100) — dll_pll_veml_tracking.cc:352-372,
            # Galileo_E6.h:35.
            from gnss_sdr_tpu.codes.galileo_e5b_e6 import galileo_e6_code
            from gnss_sdr_tpu.telemetry.period_decoders import (
                GalileoE6PeriodDecoder)

            self.system = "E"
            self.period_ms = 1.0
            self.acq = make_acquisition(
                "Galileo_E6_PCPS_Acquisition", sorted(cfg.satellites), fs,
                doppler_max=cfg.doppler_max, doppler_step=cfg.doppler_step,
                pfa=cfg.acq_pfa, max_dwells=cfg.acq_dwells,
                bit_transition_flag=True)
            trk = TrackingConfig(
                fs=fs, code_length_chips=5115, chip_rate_cps=5.115e6,
                carrier_hz=1278.75e6, symbols_per_bit=1, track_pilot=True,
                pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=min(
                    cfg.early_late_space_chips, 0.5))
            self.code_table = lambda prn: np.asarray(
                galileo_e6_code(prn, "C"), dtype=np.float32)
            self.data_code_table = lambda prn: np.asarray(
                galileo_e6_code(prn, "B"), dtype=np.float32)
            self.symbol_axis = "imag"
            self.new_decoder = lambda prn=1: GalileoE6PeriodDecoder(
                prn, fs=fs)
            self.decoder_takes_prn = True
        elif sx == "2G":
            # GLONASS L2 C/A: same m-sequence/GNAV as L1, slot carriers
            # 1246 MHz + k*437.5 kHz (GLONASS_L1_L2_CA.h:76-79;
            # glonass_l2_ca_dll_pll_tracking.cc role)
            from gnss_sdr_tpu.codes.glonass_l1ca import glonass_l1ca_code
            from gnss_sdr_tpu.telemetry.period_decoders import (
                GlonassGnavPeriodDecoder)

            self.system = "R"
            self.period_ms = 1.0
            engines = []
            for k in sorted({cfg.freq_slots.get(s, 0)
                             for s in cfg.satellites}):
                prns_k = [s for s in sorted(cfg.satellites)
                          if cfg.freq_slots.get(s, 0) == k]
                engines.append(make_acquisition(
                    "GLONASS_L2_CA_PCPS_Acquisition", prns_k, fs,
                    doppler_center=k * 437_500.0,
                    doppler_max=cfg.doppler_max,
                    doppler_step=cfg.doppler_step, pfa=cfg.acq_pfa,
                    max_dwells=cfg.acq_dwells))
            self.acq = _SlotAcquisition(engines)
            trk = TrackingConfig(
                fs=fs, code_length_chips=511, chip_rate_cps=0.511e6,
                carrier_hz=1246.0e6, symbols_per_bit=10,
                pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=cfg.early_late_space_chips)
            self.code_table = lambda prn: np.asarray(
                glonass_l1ca_code(), dtype=np.float32)
            self.new_decoder = GlonassGnavPeriodDecoder
        elif sx == "B3":
            # BeiDou B3I: 10230 chips at 10.23 Mcps, NH20 + D1 like B1I
            # (beidou_b3i adapters; Beidou_B3I.h:32-33)
            from gnss_sdr_tpu.codes.beidou_b3i import beidou_b3i_code
            from gnss_sdr_tpu.telemetry.period_decoders import (
                BeidouD1PeriodDecoder)

            self.system = "C"
            self.period_ms = 1.0
            self.acq = make_acquisition(
                "BEIDOU_B3I_PCPS_Acquisition", sorted(cfg.satellites), fs,
                doppler_max=cfg.doppler_max, doppler_step=cfg.doppler_step,
                pfa=cfg.acq_pfa, max_dwells=cfg.acq_dwells,
                bit_transition_flag=True)
            trk = TrackingConfig(
                fs=fs, code_length_chips=10230, chip_rate_cps=10.23e6,
                carrier_hz=1268.52e6, symbols_per_bit=20,
                pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=cfg.early_late_space_chips)
            self.code_table = lambda prn: np.asarray(
                beidou_b3i_code(prn), dtype=np.float32)
            self.new_decoder = BeidouD1PeriodDecoder
        elif sx == "S1":
            # SBAS L1: GPS-family C/A codes (PRN 120-138) carrying 500 sps
            # rate-1/2 coded messages (sbas_l1_telemetry_decoder_gs +
            # rtklib_sbas.cc roles). Channels feed the corrections store,
            # not the observables (no TOW/pseudorange contribution).
            from gnss_sdr_tpu.telemetry.period_decoders import (
                SbasL1PeriodDecoder)

            self.system = "S"
            self.period_ms = 1.0
            self.acq = make_gps_l1ca_acquisition(
                sorted(cfg.satellites), fs, doppler_max=cfg.doppler_max,
                doppler_step=cfg.doppler_step, pfa=cfg.acq_pfa,
                max_dwells=cfg.acq_dwells)
            trk = TrackingConfig(
                fs=fs, pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=cfg.early_late_space_chips)
            self.code_table = lambda prn: np.asarray(
                gps_l1ca_code(prn), dtype=np.float32)
            self.new_decoder = lambda prn=120: SbasL1PeriodDecoder(
                prn, fs=fs)
            self.decoder_takes_prn = True
        elif sx == "B1":
            from gnss_sdr_tpu.codes.beidou_b1i import beidou_b1i_code
            from gnss_sdr_tpu.telemetry.period_decoders import (
                BeidouD1PeriodDecoder)

            self.system = "C"
            self.period_ms = 1.0
            # B1I's NH20 secondary flips sign at code boundaries (one NH
            # chip per 1 ms period): like L5/E5a, plain dwells with a
            # mid-buffer peak lose most of their energy and smear across
            # Doppler bins; bit-transition straddling is transition-proof
            self.acq = make_acquisition(
                "BEIDOU_B1I_PCPS_Acquisition", sorted(cfg.satellites), fs,
                doppler_max=cfg.doppler_max, doppler_step=cfg.doppler_step,
                pfa=cfg.acq_pfa, max_dwells=cfg.acq_dwells,
                bit_transition_flag=True)
            trk = TrackingConfig(
                fs=fs, code_length_chips=2046, chip_rate_cps=2.046e6,
                carrier_hz=1561.098e6, symbols_per_bit=20,
                pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
                enable_fll_pull_in=cfg.enable_fll_pull_in,
                fll_bw_hz=cfg.fll_bw_hz, pull_in_time_s=cfg.pull_in_time_s,
                early_late_space_chips=min(
                    cfg.early_late_space_chips, 0.5))
            self.code_table = lambda prn: np.asarray(
                beidou_b1i_code(prn), dtype=np.float32)
            self.new_decoder = BeidouD1PeriodDecoder
        else:
            raise ValueError(f"unsupported band suffix {sx!r}")
        self.tracking = TrackingChannels(trk, cfg.n_channels, block_samples)
        self.decoders = [self.make_decoder() for _ in range(cfg.n_channels)]

    def make_decoder(self, prn: int = 1):
        """Fresh per-channel decoder; per-PRN where the telemetry layer
        needs it (E5a's CS20 secondary is satellite-specific)."""
        if getattr(self, "decoder_takes_prn", False):
            return self.new_decoder(prn)
        return self.new_decoder()

    def if_freq(self, prn: int) -> float:
        """Per-satellite IF offset (GLONASS FDMA slot; 0 elsewhere)."""
        if self.cfg.suffix == "1G":
            return self.cfg.freq_slots.get(prn, 0) * 562_500.0
        if self.cfg.suffix == "2G":
            return self.cfg.freq_slots.get(prn, 0) * 437_500.0
        return 0.0

    def carrier_hz(self, prn: int) -> float:
        """Per-satellite carrier (FDMA slot frequency; band carrier else)."""
        return self.tracking.cfg.carrier_hz + self.if_freq(prn)

    def make_ephemeris(self, prn: int, decoder):
        if self.system == "G" or self.cfg.suffix == "5X":
            # GPS LNAV/CNAV and Galileo F/NAV all deliver the shared
            # Kepler container keys (F/NAV BGD(E1,E5a) rides in tgd_s)
            return GpsEphemeris.from_fields(prn, decoder.ephemeris_fields)
        if self.system == "R":
            from gnss_sdr_tpu.pvt.glonass_ephemeris import GlonassEphemeris

            return GlonassEphemeris.from_fields(prn, decoder.ephemeris_fields)
        if self.system == "C":
            # BDS Kepler containers reuse the GPS evaluator (CGCS2000 and
            # WGS-84 GM/omega_e agree to 1e-9; note for real data)
            return GpsEphemeris.from_fields(prn, decoder.ephemeris_fields)
        return galileo_ephemeris_from_inav(prn, decoder.ephemeris_fields)


class MultiBandReceiver:
    def __init__(self, cfg: MultiBandConfig, bands: list[BandConfig],
                 assisted_ephemeris: dict[tuple[str, int], GpsEphemeris]
                 | None = None):
        self.cfg = cfg
        self.block_samples = int(round(cfg.fs * cfg.block_ms * 1e-3))
        self.bands: list[_Band] = []
        offset = 0
        for b in bands:
            band = _Band(b, b.fs or cfg.fs, cfg.block_ms, offset)
            self.bands.append(band)
            offset += b.n_channels
        self.total_channels = offset
        self.observables = ObservablesEngine(
            cfg.fs, cfg.interval_ms, self.total_channels,
            enable_carrier_smoothing=cfg.enable_carrier_smoothing,
            smoothing_factor=cfg.smoothing_factor)
        self.ephemerides: dict[tuple[str, int], GpsEphemeris] = dict(
            assisted_ephemeris or {})
        self.solutions: list[PvtSolution] = []
        self._last_solve_tow_ms: float | None = None
        self._chan_sat: dict[int, tuple[str, int]] = {}
        #: rx_tow_ms -> {prn: (pseudorange_m, phase_cycles)} when
        #: cfg.log_base_obs (base-station role)
        self.base_obs_log: dict[float, dict[int, tuple[float, float]]] = {}
        self._rtk = None
        self._rtk_base_obs: dict[float, dict] | None = None
        #: precise products: ("G", prn) -> PreciseEphemeris overriding the
        #: broadcast store (PVT.sp3_file), IONEX TEC map (PVT.ionex)
        self.precise_ephemerides: dict[tuple[str, int], object] = {}
        self.ionex = None
        self._ppp = None
        #: DO-229 corrections store, created when an S1 band decodes
        self.sbas = None
        #: optional monitor.wiring.ConfigMonitors set by the factory —
        #: UDP streaming taps (gnss_flowgraph.cc:190-275 counterpart)
        self.monitors = None
        #: (rx_tow_ms, [obs dict, ...]) epochs when cfg.rinex_output
        self.rinex_log: list[tuple[float, list[dict]]] = []
        self._chan_band: dict[int, _Band] = {
            band.ch_offset + i: band
            for band in self.bands for i in range(band.cfg.n_channels)}

    @property
    def overlap(self) -> int:
        """Overlap of the (common-rate) band with the largest carryover,
        expressed in common-fs samples (run() slicing margin)."""
        return max(
            int(np.ceil(b.tracking.overlap * self.cfg.fs / b.fs))
            for b in self.bands)

    def channel_states(self):
        return [f.state for band in self.bands for f in band.fsms]

    def run(self, samples) -> list[PvtSolution]:
        """``samples``: one array shared by all bands (common fs), or a
        ``{band suffix: array}`` dict of per-RF-channel streams, each at
        its band's sample rate and starting at the same instant."""
        if isinstance(samples, dict):
            n_blocks = min(
                (len(samples[b.cfg.suffix]) - b.tracking.overlap)
                // b.block_samples for b in self.bands)
        else:
            n_blocks = min(
                (len(samples) - b.tracking.overlap) // b.block_samples
                for b in self.bands)
        for k in range(n_blocks):
            if isinstance(samples, dict):
                blk = {}
                for b in self.bands:
                    lo = k * b.block_samples
                    hi = lo + b.block_samples + b.tracking.overlap
                    blk[b.cfg.suffix] = samples[b.cfg.suffix][lo:hi]
                self.process_block(blk)
            else:
                blk = {}
                for b in self.bands:
                    lo = k * b.block_samples
                    hi = lo + b.block_samples + b.tracking.overlap
                    blk[b.cfg.suffix] = samples[lo:hi]
                self.process_block(blk)
        return self.solutions

    def process_block(self, block) -> list[PvtSolution]:
        for band in self.bands:
            b = block[band.cfg.suffix] if isinstance(block, dict) else block
            self._manage_acquisition(band, b)
            per_channel = band.tracking.process_block(
                b[: band.block_samples + band.tracking.overlap])
            self._feed_band(band, per_channel)
        self._share_coarse_time()
        return self._run_pvt()

    # -- SBAS corrections (rtklib_sbas.cc / DO-229 application) ----------
    def _drain_sbas(self, band: _Band) -> None:
        """Feed newly decoded SBAS messages into the corrections store."""
        from gnss_sdr_tpu.telemetry.sbas_l1 import build_block

        if self.sbas is None:
            from gnss_sdr_tpu.telemetry.sbas_corrections import (
                SbasCorrections)

            self.sbas = SbasCorrections()
        for dec in band.decoders:
            for msg in dec.new_messages():
                self.sbas.update(
                    build_block(msg.msg_type, msg.payload),
                    t_s=msg.sample_stamp / band.fs)

    def _apply_sbas(self, obs: list[Observation], rx_tow_s: float,
                    t_stream_s: float) -> list[Observation]:
        """Apply DO-229 corrections to GPS rows: fast PRC on the
        pseudorange, long-term satellite position/clock deltas via an
        ephemeris wrapper, slant iono from the IGP grid at the pierce
        point (needs a prior position — the previous fix)
        (sbsfastcorr/sbssatcorr/sbsioncorr, rtklib_sbas.cc)."""
        from gnss_sdr_tpu.pvt import geodesy

        t = t_stream_s
        prev = self.solutions[-1] if self.solutions else None
        out = []
        for o in obs:
            if o.system != "G":
                out.append(o)
                continue
            pr = o.pseudorange_m
            eph = o.eph
            prc = self.sbas.pseudorange_correction(o.prn, t_s=t)
            if prc is not None:
                pr = pr + prc
            sc = self.sbas.satellite_correction(o.prn, t)
            if sc is not None:
                eph = _SbasCorrectedEphemeris(eph, sc[0], sc[1])
            if prev is not None and prev.valid:
                az, el = geodesy.azimuth_elevation(
                    prev.pos_ecef, np.asarray(eph.sat_pos(rx_tow_s)))
                iono = self.sbas.iono_delay(prev.lat_rad, prev.lon_rad,
                                            el, az)
                if iono is not None:
                    pr = pr - iono
            out.append(dataclasses.replace(o, pseudorange_m=pr, eph=eph))
        return out

    def _ppp_epoch(self, rows, rx_tow_ms: float) -> PvtSolution | None:
        """One PPP float-EKF epoch (pppos role, rtklib_ppp.cc:1769):
        bands of the same satellite pair into dual-frequency iono-free
        observations; single-band falls back to the TEC-map-corrected
        single-frequency mode (PVT.ionex)."""
        from gnss_sdr_tpu.constants.general import SPEED_OF_LIGHT_M_S
        from gnss_sdr_tpu.pvt import geodesy
        from gnss_sdr_tpu.pvt.ppp import PppConfig, PppEngine, PppObservation

        if self._ppp is None:
            x0 = self.solutions[-1].pos_ecef if self.solutions else None
            self._ppp = PppEngine(
                PppConfig(tec=self.ionex,
                          pos_process_m=0.0
                          if self.cfg.positioning_mode.endswith("Static")
                          else 1.0),
                x0_ecef=x0)
        by_sat: dict[tuple[str, int], list] = {}
        for row in rows:
            key = self._chan_sat.get(row.channel)
            if key is None:
                continue
            eph = self.precise_ephemerides.get(key) \
                or self.ephemerides.get(key)
            if eph is None:
                continue
            by_sat.setdefault(key, []).append(
                (self._chan_band[row.channel], row, eph))
        obs = []
        for key, lst in by_sat.items():
            # highest carrier first = the L1/E1 leg of the combination
            lst.sort(key=lambda e: -e[0].carrier_hz(key[1]))
            band1, row1, eph = lst[0]
            o = PppObservation(
                prn=key, eph=eph, p1_m=row1.pseudorange_m,
                l1_cycles=row1.carrier_phase_rad / (2.0 * math.pi),
                f1_hz=band1.carrier_hz(key[1]),
                cn0_db_hz=row1.cn0_db_hz)
            if len(lst) > 1:
                band2, row2, _ = lst[1]
                o.p2_m = row2.pseudorange_m
                o.l2_cycles = row2.carrier_phase_rad / (2.0 * math.pi)
                o.f2_hz = band2.carrier_hz(key[1])
            obs.append(o)
        if len(obs) < 4:
            return None
        sol = self._ppp.process_epoch(rx_tow_ms * 1e-3, obs)
        if not sol.valid:
            return None
        lat, lon, hgt = geodesy.ecef_to_geodetic(sol.pos_ecef)
        # DOPs from the code-row geometry (solver convention)
        los = []
        for o in obs:
            t_tx = rx_tow_ms * 1e-3 - o.p1_m / SPEED_OF_LIGHT_M_S
            sat = np.asarray(o.eph.sat_pos(t_tx))
            d = sat - sol.pos_ecef
            los.append(np.append(-d / np.linalg.norm(d), 1.0))
        h = np.asarray(los)
        try:
            q = np.linalg.inv(h.T @ h)
            gdop = float(np.sqrt(np.trace(q)))
            pdop = float(np.sqrt(np.trace(q[:3, :3])))
            enu = geodesy.enu_matrix(lat, lon)
            qenu = enu @ q[:3, :3] @ enu.T
            hdop = float(np.sqrt(qenu[0, 0] + qenu[1, 1]))
            vdop = float(np.sqrt(qenu[2, 2]))
        except np.linalg.LinAlgError:
            gdop = pdop = hdop = vdop = 99.9
        return PvtSolution(
            valid=True, pos_ecef=sol.pos_ecef,
            clock_bias_s=sol.clock_bias_m / SPEED_OF_LIGHT_M_S,
            vel_ecef=None, clock_drift_s_s=None, gdop=gdop, pdop=pdop,
            hdop=hdop, vdop=vdop, n_sats=sol.n_sats,
            residuals_m=sol.residuals_m, lat_rad=lat, lon_rad=lon,
            height_m=hgt, rx_tow_s=rx_tow_ms * 1e-3)

    def write_rinex(self, obs_path, nav_path) -> tuple[str, str]:
        """Write the logged observable epochs and collected ephemerides
        as RINEX 3.02 obs + mixed nav files (rinex_printer.cc role); the
        obs header carries one C/L/D/S quartet per configured band."""
        from gnss_sdr_tpu.monitor.rinex import RinexNavWriter, RinexObsWriter

        week = 0
        for eph in self.ephemerides.values():
            week = getattr(eph, "week_number", 0)
            break
        approx = tuple(self.solutions[-1].pos_ecef) if self.solutions \
            else (0.0, 0.0, 0.0)
        obs = RinexObsWriter(obs_path, approx_pos=approx,
                             bands=[b.cfg.suffix for b in self.bands])
        for tow_ms, rows in self.rinex_log:
            obs.add_epoch(week, tow_ms * 1e-3, rows)
        obs.close()
        nav = RinexNavWriter(nav_path)
        for (sysc, _prn), eph in self.ephemerides.items():
            nav.add_ephemeris(eph, system=sysc)
        nav.close()
        return str(obs_path), str(nav_path)

    def set_rtk_base(self, base_pos_ecef, base_obs: dict,
                     code_sigma_m: float = 0.5) -> None:
        """Arm RTK positioning: ``base_obs`` maps rx_tow_ms ->
        {prn: (pseudorange_m, carrier_phase_cycles)} from a base
        receiver at the known ``base_pos_ecef`` (the rtklib_pvt_gs base
        RTCM-input role; a second receiver's ``base_obs_log`` serves
        directly)."""
        from gnss_sdr_tpu.pvt.rtk import RtkConfig, RtkEngine

        self._rtk = RtkEngine(RtkConfig(code_sigma_m=code_sigma_m),
                              base_pos_ecef)
        self._rtk_base_obs = base_obs

    def _rtk_epoch(self, rows, rx_tow_ms: float) -> PvtSolution | None:
        """One DD-EKF epoch against the base observables (GPS L1 rows)."""
        base_rec = self._rtk_base_obs.get(rx_tow_ms)
        if base_rec is None and self._rtk_base_obs:
            # file-sourced base epochs carry text-precision timestamps
            # (RINEX 1e-7 s fields): accept the nearest within 0.5 ms
            key = min(self._rtk_base_obs, key=lambda k: abs(k - rx_tow_ms))
            if abs(key - rx_tow_ms) <= 0.5:
                base_rec = self._rtk_base_obs[key]
        if base_rec is None:
            return None
        rover = {}
        sat_pos = {}
        sat_pos_base = {}
        base = {}
        for row in rows:
            key = self._chan_sat.get(row.channel)
            if key is None or key[0] != "G" or key not in self.ephemerides:
                continue
            prn = key[1]
            if prn not in base_rec:
                continue
            rover[prn] = (row.pseudorange_m,
                          row.carrier_phase_rad / (2.0 * math.pi))
            sat_pos[prn] = self.ephemerides[key].sat_pos(row.tow_ms / 1e3)
            b = base_rec[prn]
            base[prn] = (b[0], b[1])
            # base leg geometry at the BASE measurement's transmit time
            # (the receivers' clock biases differ; see RtkEngine)
            b_tow = b[2] if len(b) > 2 else row.tow_ms
            sat_pos_base[prn] = self.ephemerides[key].sat_pos(b_tow / 1e3)
        sol = self._rtk.process_epoch(rover, base, sat_pos, sat_pos_base)
        if sol is None:
            return None
        from gnss_sdr_tpu.pvt.geodesy import ecef_to_geodetic

        lat, lon, h = ecef_to_geodetic(sol.pos_ecef)
        return PvtSolution(
            valid=True, pos_ecef=np.asarray(sol.pos_ecef),
            clock_bias_s=0.0, vel_ecef=None, clock_drift_s_s=None,
            gdop=0.0, pdop=0.0, hdop=0.0, vdop=0.0, n_sats=sol.n_sats,
            residuals_m=np.zeros(0), lat_rad=lat, lon_rad=lon,
            height_m=h, rx_tow_s=rx_tow_ms * 1e-3)

    # -- receiver management (tcp_cmd_interface.cc verb semantics,
    #    gnss_flowgraph.cc:1986-2005) --------------------------------------
    def apply_command(self, verb: str, args: list[str] | None = None) -> str:
        args = args or []
        verb = verb.lower()
        if verb == "status":
            lines = []
            for band in self.bands:
                for f in band.fsms:
                    lines.append(f"ch {f.channel_id} [{band.cfg.suffix}]: "
                                 f"{f.state.name} PRN {f.prn}")
            lines.append(f"fixes: {len(self.solutions)}")
            return "; ".join(lines)
        if verb in ("standby", "coldstart", "warmstart", "hotstart"):
            for band in self.bands:
                for local_ch, f in enumerate(band.fsms):
                    prn = f.stop()
                    if prn:
                        band.sat_pool.append(prn)
                    band.tracking.stop_channel(local_ch)
                    self.observables.reset_channel(f.channel_id)
                    self._chan_sat.pop(f.channel_id, None)
            if verb == "coldstart":
                self.ephemerides.clear()
                self._last_solve_tow_ms = None
            return f"OK {verb}"
        if verb == "set_ch_satellite":
            gch, prn = int(args[0]), int(args[1])
            band = self._chan_band.get(gch)
            if band is None:
                return f"ERROR channel {gch} out of range"
            f = band.fsms[gch - band.ch_offset]
            old = f.stop()
            if old:
                band.sat_pool.append(old)
            band.tracking.stop_channel(gch - band.ch_offset)
            self.observables.reset_channel(gch)
            self._chan_sat.pop(gch, None)
            if prn in band.sat_pool:
                band.sat_pool.remove(prn)
            f.start_acquisition(prn)
            return f"OK ch {gch} -> PRN {prn}"
        if verb == "reset":
            return "OK reset requested"
        return f"ERROR unknown command {verb}"

    def _share_coarse_time(self) -> None:
        """Cross-band time transfer.

        (a) Coarse: give time-poor decoders (GLONASS GNAV between
        string-1s) the best TOW any band has, so their 30 s frame-grid
        anchor resolves (GlonassGnavPeriodDecoder.coarse_tow_ms).
        (b) Exact same-SV aiding: decoders with autonomous TOW (LNAV)
        publish ``(t_rx_s, tow_ms)`` pairs; same-satellite channels on
        other bands (L5 CNAV before its first full message) snap their
        symbol grid to it (GpsL5PeriodDecoder.time_aid)."""
        tows = []
        aids: dict[tuple[str, int], tuple[float, float]] = {}
        for band in self.bands:
            for i, d in enumerate(band.decoders):
                if d.tow_at_last_symbol_ms is None:
                    continue
                tows.append(d.tow_at_last_symbol_ms)
                fsm = band.fsms[i]
                stamps = getattr(d, "stamps", None)
                if not hasattr(d, "time_aid") and stamps:
                    aids[(band.system, fsm.prn)] = (
                        stamps[-1] / band.fs, d.tow_at_last_symbol_ms)
        if not tows:
            return
        coarse = max(tows)
        for band in self.bands:
            for i, d in enumerate(band.decoders):
                if hasattr(d, "coarse_tow_ms"):
                    d.coarse_tow_ms = coarse
                if hasattr(d, "time_aid"):
                    aid = aids.get((band.system, band.fsms[i].prn))
                    if aid is not None:
                        d.time_aid = aid

    # -- per-band control (mirrors Receiver) ------------------------------
    def _manage_acquisition(self, band: _Band, block: np.ndarray) -> None:
        for fsm in band.fsms:
            if fsm.state is ChannelState.STANDBY and band.sat_pool:
                fsm.start_acquisition(band.sat_pool.popleft())
            elif fsm.state is ChannelState.ACQUISITION and fsm.prn == 0 \
                    and band.sat_pool:
                fsm.prn = band.sat_pool.popleft()
        searching = {f.prn: f for f in band.fsms
                     if f.state is ChannelState.ACQUISITION and f.prn != 0}
        if not searching:
            return
        needed = band.acq.cfg.consumed_samples * band.acq.cfg.max_dwells
        stamp = band.tracking.abs_block_start
        results = band.acq.search(np.asarray(block[:needed]),
                                  samplestamp=stamp)
        for prn, fsm in searching.items():
            res = results.get(prn)
            if res is None:
                continue
            if res.positive:
                fsm.valid_acquisition()
                local_ch = fsm.channel_id - band.ch_offset
                if_hz = band.if_freq(prn)
                # FDMA: the acquisition Doppler grid is centered on the
                # slot offset, so the loop Doppler is the residual
                band.tracking.start_channel(
                    local_ch, prn, band.code_table(prn),
                    res.delay_samples, res.doppler_hz - if_hz,
                    res.samplestamp_samples, if_freq_hz=if_hz,
                    data_code_table=(band.data_code_table(prn)
                                     if band.data_code_table else None))
                band.decoders[local_ch] = band.make_decoder(prn)
                self.observables.reset_channel(fsm.channel_id)
                self.observables.set_channel_carrier(
                    fsm.channel_id, band.carrier_hz(prn))
                self._chan_sat[fsm.channel_id] = (band.system, prn)
                if self.monitors is not None \
                        and self.monitors.acquisition is not None:
                    from gnss_sdr_tpu.core_types import GnssSynchro
                    self.monitors.acq(GnssSynchro(
                        system=band.system, signal=band.cfg.suffix,
                        prn=prn, channel_id=fsm.channel_id, fs=band.fs,
                        acq_delay_samples=res.delay_samples,
                        acq_doppler_hz=res.doppler_hz,
                        acq_samplestamp_samples=res.samplestamp_samples,
                        flag_valid_acquisition=True))
            elif band.sat_pool:
                # rotate the pool on a negative search (flowgraph
                # push_back_signal semantics, gnss_flowgraph.cc:1924-1940)
                band.sat_pool.append(prn)
                fsm.prn = band.sat_pool.popleft()

    def _feed_band(self, band: _Band, per_channel) -> None:
        # anchors go to the observables engine in common-fs sample units
        scale = self.cfg.fs / band.fs
        if self.monitors is not None and self.monitors.tracking is not None:
            self.monitors.period([
                p for ch, periods in enumerate(per_channel)
                if band.fsms[ch].state is ChannelState.TRACKING
                for p in periods])
        for local_ch, periods in enumerate(per_channel):
            fsm = band.fsms[local_ch]
            if fsm.state is not ChannelState.TRACKING:
                continue
            gch = fsm.channel_id
            dec = band.decoders[local_ch]
            for p in periods:
                if p.loss_of_lock:
                    prn = fsm.loss_of_lock()
                    if prn:
                        band.sat_pool.append(prn)
                    band.tracking.stop_channel(local_ch)
                    self.observables.reset_channel(gch)
                    self._chan_sat.pop(gch, None)
                    break
                symbol = (p.data_prompt.imag if band.symbol_axis == "imag"
                          else p.data_prompt.real
                          if band.symbol_axis == "data_real"
                          else p.prompt.real)
                dec.feed(symbol, p.sample_start + p.length)
                if dec.tow_at_last_symbol_ms is not None:
                    boundary = p.sample_start + p.rem_code_phase_samples
                    tow = dec.tow_at_last_symbol_ms - band.period_ms
                    self.observables.add_anchor(
                        gch, boundary * scale, tow, p.carrier_doppler_hz,
                        p.acc_carrier_phase_rad, p.cn0_db_hz)
            # telemetry watchdog (gps_l1_ca_telemetry_decoder_gs.cc:459
            # parity): no valid frame in the window -> requeue the SV
            if getattr(dec, "telemetry_failed", False):
                prn = fsm.loss_of_lock()
                if prn:
                    band.sat_pool.append(prn)
                band.tracking.stop_channel(local_ch)
                self.observables.reset_channel(gch)
                self._chan_sat.pop(gch, None)
                band.decoders[local_ch] = band.make_decoder(fsm.prn or 1)
                continue
            key = (band.system, fsm.prn)
            if dec.has_full_ephemeris() and key not in self.ephemerides:
                self.ephemerides[key] = band.make_ephemeris(fsm.prn, dec)
                if self.monitors is not None:
                    self.monitors.ephemeris(band.system,
                                            self.ephemerides[key])
        if band.system == "S":
            self._drain_sbas(band)

    def _stream_epoch(self, rows) -> None:
        """Map one aligned observables epoch onto GnssSynchro rows for
        the ``Monitor`` group tap (gnss_synchro_monitor on the
        observables stream, gnss_flowgraph.cc:190-216)."""
        from gnss_sdr_tpu.core_types import GnssSynchro

        out = []
        for row in rows:
            key = self._chan_sat.get(row.channel)
            band = self._chan_band.get(row.channel)
            out.append(GnssSynchro(
                system=key[0] if key else "",
                signal=band.cfg.suffix if band is not None else "",
                prn=row.prn, channel_id=row.channel,
                fs=self.cfg.fs,
                cn0_db_hz=row.cn0_db_hz,
                carrier_doppler_hz=row.doppler_hz,
                carrier_phase_rads=row.carrier_phase_rad,
                flag_valid_symbol_output=True,
                pseudorange_m=row.pseudorange_m,
                rx_time=row.rx_tow_ms * 1e-3,
                flag_valid_pseudorange=True,
                interp_tow_ms=row.tow_ms))
        self.monitors.epoch(out)

    def _run_pvt(self, limit: float | None = None) -> list[PvtSolution]:
        if limit is None:
            limit = min(
                (b.tracking.abs_block_start
                 - 2 * b.tracking.engine.max_period) * self.cfg.fs / b.fs
                for b in self.bands)
        new = []
        for rows in self.observables.epochs_until(limit):
            rx_tow_ms = rows[0].rx_tow_ms
            if self.monitors is not None \
                    and self.monitors.observables is not None:
                self._stream_epoch(rows)
            if self.cfg.rinex_output:
                ep = []
                for row in rows:
                    key = self._chan_sat.get(row.channel)
                    if key is None:
                        continue
                    band = self._chan_band[row.channel]
                    ep.append(dict(
                        system=key[0], band=band.cfg.suffix, prn=key[1],
                        pseudorange_m=row.pseudorange_m,
                        carrier_phase_cycles=row.carrier_phase_rad
                        / (2.0 * math.pi),
                        doppler_hz=row.doppler_hz,
                        cn0_db_hz=row.cn0_db_hz))
                if ep:
                    self.rinex_log.append((rx_tow_ms, ep))
            if self.cfg.log_base_obs:
                rec = {}
                for row in rows:
                    key = self._chan_sat.get(row.channel)
                    if key is not None and key[0] == "G":
                        rec[key[1]] = (row.pseudorange_m,
                                       row.carrier_phase_rad
                                       / (2.0 * math.pi), row.tow_ms)
                if rec:
                    self.base_obs_log[rx_tow_ms] = rec
            if self._last_solve_tow_ms is not None and \
                    rx_tow_ms - self._last_solve_tow_ms \
                    < self.cfg.output_rate_ms:
                continue
            if self.cfg.positioning_mode.startswith("PPP"):
                sol = self._ppp_epoch(rows, rx_tow_ms)
                if sol is not None:
                    self._last_solve_tow_ms = rx_tow_ms
                    self.solutions.append(sol)
                    new.append(sol)
                continue
            if self.cfg.positioning_mode.startswith("RTK") \
                    and self._rtk is not None:
                sol = self._rtk_epoch(rows, rx_tow_ms)
                if sol is not None:
                    self._last_solve_tow_ms = rx_tow_ms
                    self.solutions.append(sol)
                    new.append(sol)
                    continue
                # no matching base epoch / too few common satellites:
                # degrade to the standalone solution like rtkpos
                # (rtklib_rtkpos.cc pntpos fallback), don't drop the epoch
            obs = []
            for row in rows:
                key = self._chan_sat.get(row.channel)
                if key is None:
                    continue
                # SP3 precise orbits/clocks substitute for broadcast when
                # loaded (PVT.sp3_file, rtklib precise-eph option)
                eph = self.precise_ephemerides.get(key) \
                    or self.ephemerides.get(key)
                if eph is None:
                    continue
                row.prn = key[1]
                band = self._chan_band[row.channel]
                obs.append(Observation(
                    prn=key[1], pseudorange_m=row.pseudorange_m,
                    eph=eph, doppler_hz=row.doppler_hz,
                    carrier_hz=band.carrier_hz(key[1]),
                    cn0_db_hz=row.cn0_db_hz, system=key[0]))
            # dual-band rows duplicate satellites; the geometry needs >= 4
            # DISTINCT satellites or the LS normal matrix is rank-deficient
            if len({(o.system, o.prn) for o in obs}) < 4:
                continue
            if self.sbas is not None:
                # correction ages run on the receiver sample clock (the
                # SBAS decoder stamps messages in stream samples)
                obs = self._apply_sbas(obs, rx_tow_ms * 1e-3,
                                       rows[0].sample / self.cfg.fs)
            if self.cfg.iono_free:
                from gnss_sdr_tpu.pvt.dual_freq import combine_dual_freq

                obs = combine_dual_freq(obs)
            sol = solve_pvt(obs, rx_tow_ms * 1e-3,
                            apply_tropo=self.cfg.apply_tropo)
            if sol.valid:
                self._last_solve_tow_ms = rx_tow_ms
                self.solutions.append(sol)
                new.append(sol)
        if self.monitors is not None:
            for sol in new:
                self.monitors.pvt(sol)
        return new


class _SbasCorrectedEphemeris:
    """Broadcast ephemeris + DO-229 long-term deltas (sbssatcorr role):
    satellite position shifted by dpos(t), clock by dclk(t)."""

    def __init__(self, eph, dpos_m, dclk_s):
        self._eph = eph
        self._dpos = np.asarray(dpos_m, dtype=np.float64)
        self._dclk = float(dclk_s)
        self.tgd_s = getattr(eph, "tgd_s", 0.0)
        self.prn = getattr(eph, "prn", 0)

    def sat_pos(self, t_sv: float):
        p = np.asarray(self._eph.sat_pos(t_sv)) + self._dpos
        return tuple(p)

    def sat_vel(self, t_sv: float, dt: float = 1e-3):
        return self._eph.sat_vel(t_sv)

    def clock_bias_s(self, t_sv: float) -> float:
        return self._eph.clock_bias_s(t_sv) + self._dclk
