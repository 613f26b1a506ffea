"""Configuration-driven receiver assembly.

Counterpart of the reference's GNSSBlockFactory + flowgraph wiring
(/root/reference/src/core/receiver/gnss_block_factory.cc:637-1330): a
reference-style INI configuration names implementations per role
(``SignalSource.implementation=File_Signal_Source``,
``Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition``, ...) and this
factory instantiates the matching pieces. Only names whose capability
exists here are accepted; unknown names raise with a hint, like the
reference's config sanity checks (gnss_flowgraph.cc:660-700).
"""

from __future__ import annotations

import numpy as np

from gnss_sdr_tpu.config import Configuration
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.sources import FileSignalSource

SUPPORTED_SOURCES = {
    "File_Signal_Source",
    "File_Timestamp_Signal_Source",
    "Fifo_Signal_Source",
    "Custom_UDP_Signal_Source",
    "Labsat_Signal_Source",
}
# every name in the acquisition registry instantiates standalone via
# acquisition.adapters.make_acquisition
from gnss_sdr_tpu.acquisition.adapters import (  # noqa: E402
    ACQ_IMPLEMENTATIONS as SUPPORTED_ACQ_STANDALONE)

SUPPORTED_ACQ = {"GPS_L1_CA_PCPS_Acquisition",
                 "GPS_L1_CA_PCPS_Assisted_Acquisition",
                 "GPS_L1_CA_PCPS_Acquisition_Fine_Doppler"}
#: the reference has ONE configured path and it is its real-time path
#: (gnss_block_factory.cc:637); ours defaults to the production (fast)
#: engine with ``GNSS-SDR.engine=scan`` as the per-period escape hatch
SUPPORTED_ENGINES = {"production", "scan"}
SUPPORTED_TRK = {"GPS_L1_CA_DLL_PLL_Tracking"}
SUPPORTED_TLM = {"GPS_L1_CA_Telemetry_Decoder"}
SUPPORTED_OBS = {"Hybrid_Observables"}
SUPPORTED_PVT = {"RTKLIB_PVT"}

# Per-signal-suffix implementation names the multi-band receiver chain
# accepts end-to-end (reference factory registry,
# gnss_block_factory.cc:637-1330): suffix -> (acquisition names,
# tracking names, telemetry names, default satellite list).
_GLONASS_SATS = list(range(1, 25))
BAND_REGISTRY: dict[str, tuple[set, set, set, list[int]]] = {
    "1C": ({"GPS_L1_CA_PCPS_Acquisition",
            "GPS_L1_CA_PCPS_Assisted_Acquisition",
            "GPS_L1_CA_PCPS_Acquisition_Fine_Doppler"},
           {"GPS_L1_CA_DLL_PLL_Tracking", "GPS_L1_CA_KF_Tracking",
            "GPS_L1_CA_Gaussian_Tracking"},
           {"GPS_L1_CA_Telemetry_Decoder"}, list(range(1, 33))),
    "2S": ({"GPS_L2_M_PCPS_Acquisition"},
           {"GPS_L2_M_DLL_PLL_Tracking"},
           {"GPS_L2C_Telemetry_Decoder"}, list(range(1, 33))),
    "L5": ({"GPS_L5i_PCPS_Acquisition"},
           {"GPS_L5_DLL_PLL_Tracking"},
           {"GPS_L5_Telemetry_Decoder"}, list(range(1, 33))),
    "1B": ({"Galileo_E1_PCPS_Ambiguous_Acquisition"},
           {"Galileo_E1_DLL_PLL_VEML_Tracking"},
           {"Galileo_E1B_Telemetry_Decoder"}, list(range(1, 37))),
    "5X": ({"Galileo_E5a_Pcps_Acquisition",
            "Galileo_E5a_Noncoherent_IQ_Acquisition_CAF"},
           {"Galileo_E5a_DLL_PLL_Tracking"},
           {"Galileo_E5a_Telemetry_Decoder"}, list(range(1, 37))),
    "7X": ({"Galileo_E5b_PCPS_Acquisition"},
           {"Galileo_E5b_DLL_PLL_Tracking"},
           {"Galileo_E5b_Telemetry_Decoder"}, list(range(1, 37))),
    "E6": ({"Galileo_E6_PCPS_Acquisition"},
           {"Galileo_E6_DLL_PLL_Tracking"},
           {"Galileo_E6_Telemetry_Decoder"}, list(range(1, 37))),
    "1G": ({"GLONASS_L1_CA_PCPS_Acquisition"},
           {"GLONASS_L1_CA_DLL_PLL_Tracking",
            "GLONASS_L1_CA_DLL_PLL_C_Aid_Tracking"},
           {"GLONASS_L1_CA_Telemetry_Decoder"}, _GLONASS_SATS),
    "2G": ({"GLONASS_L2_CA_PCPS_Acquisition"},
           {"GLONASS_L2_CA_DLL_PLL_Tracking",
            "GLONASS_L2_CA_DLL_PLL_C_Aid_Tracking"},
           {"GLONASS_L2_CA_Telemetry_Decoder"}, _GLONASS_SATS),
    "B1": ({"BEIDOU_B1I_PCPS_Acquisition"},
           {"BEIDOU_B1I_DLL_PLL_Tracking"},
           {"BEIDOU_B1I_Telemetry_Decoder"}, list(range(1, 38))),
    "B3": ({"BEIDOU_B3I_PCPS_Acquisition"},
           {"BEIDOU_B3I_DLL_PLL_Tracking"},
           {"BEIDOU_B3I_Telemetry_Decoder"}, list(range(1, 38))),
    # SBAS corrections channels (PRN 120-138 on GPS-family C/A codes);
    # the reference has no per-suffix SBAS group, so the GPS L1 names
    # are accepted here
    "S1": ({"GPS_L1_CA_PCPS_Acquisition"},
           {"GPS_L1_CA_DLL_PLL_Tracking"},
           {"SBAS_L1_Telemetry_Decoder"}, list(range(120, 139))),
}


def _check(name: str, value: str, supported: set[str]) -> None:
    if value and value not in supported:
        raise ValueError(
            f"{name}.implementation={value!r} is not available; "
            f"supported: {sorted(supported)}")


def make_signal_conditioner(config: Configuration):
    """SignalConditioner / DataTypeAdapter / InputFilter / Resampler
    groups assembled into a :class:`SignalConditionerChain`
    (signal_conditioner.cc:37-85); ``None`` when the conf runs the
    source straight into the receiver (Pass_Through)."""
    impl = config.property("SignalConditioner.implementation", "")
    if not impl or impl == "Pass_Through":
        return None
    if impl != "Signal_Conditioner":
        raise ValueError(
            f"SignalConditioner.implementation={impl!r} is not available; "
            f"supported: ['Pass_Through', 'Signal_Conditioner']")
    from gnss_sdr_tpu.conditioner.chain import (SUPPORTED_ADAPTERS,
                                                SignalConditionerChain)

    _check("DataTypeAdapter",
           config.property("DataTypeAdapter.implementation", ""),
           SUPPORTED_ADAPTERS)
    fs_in = float(config.property("SignalSource.sampling_frequency",
                                  4_000_000))
    fs_internal = float(config.property("GNSS-SDR.internal_fs_sps", fs_in))
    cutoff = config.property("InputFilter.cutoff_hz", None)
    trans = config.property("InputFilter.transition_hz", None)
    chain = SignalConditionerChain(
        fs_in=fs_in,
        input_filter=config.property("InputFilter.implementation",
                                     "Pass_Through") or "Pass_Through",
        if_freq_hz=float(config.property("InputFilter.IF", 0.0)),
        decimation=int(config.property("InputFilter.decimation_factor", 1)),
        ntaps=int(config.property("InputFilter.number_of_taps",
                                  config.property("InputFilter.taps", 65))),
        cutoff_hz=float(cutoff) if cutoff is not None else None,
        transition_hz=float(trans) if trans is not None else None,
        resampler=config.property("Resampler.implementation",
                                  "Pass_Through") or "Pass_Through",
        resample_fs_out=float(config.property("Resampler.sample_freq_out",
                                              fs_internal)),
        pb_threshold_sigma=float(config.property(
            "InputFilter.pb_threshold_sigma", 4.0)),
    )
    if abs(chain.fs_out - fs_internal) > 1.0:
        raise ValueError(
            f"conditioner output rate {chain.fs_out} sps does not match "
            f"GNSS-SDR.internal_fs_sps={fs_internal}; fix the "
            "InputFilter.decimation_factor / Resampler.sample_freq_out "
            "keys (the reference flowgraph has the same invariant)")
    return chain


def make_signal_source(config: Configuration):
    impl = config.property("SignalSource.implementation", "")
    if not impl:
        return None
    _check("SignalSource", impl, SUPPORTED_SOURCES)
    if config.property("SignalConditioner.implementation", "") \
            == "Signal_Conditioner":
        # with a conditioner configured the source runs at the raw
        # front-end rate; the chain delivers internal_fs_sps
        fs = float(config.property("SignalSource.sampling_frequency",
                                   4_000_000))
    else:
        fs = float(config.property(
            "GNSS-SDR.internal_fs_sps",
            config.property("SignalSource.sampling_frequency", 4_000_000)))
    item_type = config.property("SignalSource.item_type", "gr_complex")
    if impl == "Fifo_Signal_Source":
        from gnss_sdr_tpu.sources import FifoSignalSource

        return FifoSignalSource(
            config.property("SignalSource.filename", ""), fs,
            item_type=config.property("SignalSource.sample_type", item_type))
    if impl == "Custom_UDP_Signal_Source":
        from gnss_sdr_tpu.sources import UdpSignalSource

        return UdpSignalSource(
            port=config.property("SignalSource.port", 1234),
            sampling_frequency=fs,
            sample_type=config.property("SignalSource.sample_type", "cbyte"),
            iq_swap=config.property("SignalSource.IQ_swap", False),
            address=config.property("SignalSource.origin_address",
                                    "127.0.0.1"))
    if impl == "Labsat_Signal_Source":
        from gnss_sdr_tpu.sources import LabsatSignalSource

        return LabsatSignalSource(
            config.property("SignalSource.filename", ""),
            sampling_frequency=fs)
    if impl == "File_Timestamp_Signal_Source":
        from gnss_sdr_tpu.sources import FileTimestampSignalSource

        return FileTimestampSignalSource(
            config.property("SignalSource.filename", ""),
            config.property("SignalSource.timestamp_filename", ""),
            sampling_frequency=fs, item_type=item_type,
            timestamp_clock_offset_ms=config.property(
                "SignalSource.timestamp_clock_offset_ms", 0.0),
            samples=config.property("SignalSource.samples", 0))
    return FileSignalSource(
        config.property("SignalSource.filename", ""),
        sampling_frequency=fs,
        item_type=item_type,
        samples=config.property("SignalSource.samples", 0),
        repeat=config.property("SignalSource.repeat", False),
    )


def _configured_suffixes(config: Configuration) -> list[str]:
    """Signal suffixes with ``Channels_XX.count > 0`` (the reference's
    channel-group convention, gnss_block_factory.cc:183-210)."""
    out = []
    for sx in BAND_REGISTRY:
        if int(config.property(f"Channels_{sx}.count", 0)) > 0:
            out.append(sx)
    return out


def _parse_freq_slots(text: str) -> dict[int, int]:
    """``"1:-4,2:5"``-style satellite->FDMA-channel map."""
    slots: dict[int, int] = {}
    for part in text.replace(";", ",").split(","):
        part = part.strip()
        if not part:
            continue
        prn, k = part.split(":")
        slots[int(prn)] = int(k)
    return slots


def make_band_config(config: Configuration, sx: str):
    """One band's :class:`BandConfig` from ``Acquisition_XX`` /
    ``Tracking_XX`` / ``Channels_XX`` keys."""
    from gnss_sdr_tpu.receiver.multiband import BandConfig

    acqs, trks, tlms, default_sats = BAND_REGISTRY[sx]
    _check(f"Acquisition_{sx}",
           config.property(f"Acquisition_{sx}.implementation", ""), acqs)
    _check(f"Tracking_{sx}",
           config.property(f"Tracking_{sx}.implementation", ""), trks)
    _check(f"TelemetryDecoder_{sx}",
           config.property(f"TelemetryDecoder_{sx}.implementation", ""),
           tlms)
    sats_text = config.property(f"Channels_{sx}.satellites", "")
    satellites = ([int(s) for s in sats_text.replace(";", ",").split(",")]
                  if sats_text else list(default_sats))
    fs = config.property(f"SignalSource_{sx}.sampling_frequency", None)
    return BandConfig(
        suffix=sx,
        fs=float(fs) if fs is not None else None,
        satellites=satellites,
        n_channels=int(config.property(f"Channels_{sx}.count", 4)),
        doppler_max=float(config.property(
            f"Acquisition_{sx}.doppler_max", 5000)),
        doppler_step=float(config.property(
            f"Acquisition_{sx}.doppler_step", 250)),
        acq_pfa=config.property(f"Acquisition_{sx}.pfa", 0.001),
        acq_dwells=config.property(f"Acquisition_{sx}.max_dwells", 2),
        pll_bw_hz=config.property(f"Tracking_{sx}.pll_bw_hz", 35.0),
        dll_bw_hz=config.property(f"Tracking_{sx}.dll_bw_hz", 2.0),
        enable_fll_pull_in=config.property(
            f"Tracking_{sx}.enable_fll_pull_in", True),
        fll_bw_hz=config.property(f"Tracking_{sx}.fll_bw_hz", 35.0),
        pull_in_time_s=float(config.property(
            f"Tracking_{sx}.pull_in_time_s", 0.5)),
        early_late_space_chips=config.property(
            f"Tracking_{sx}.early_late_space_chips", 0.5),
        track_pilot=config.property(f"Tracking_{sx}.track_pilot", False),
        freq_slots=_parse_freq_slots(
            config.property(f"Channels_{sx}.freq_slots", "")),
    )


def make_multiband_receiver(config: Configuration, suffixes: list[str],
                            engine: str = "production"):
    """Assemble the multi-band receiver for the configured signal
    suffix groups — the reference's hybrid-flowgraph assembly
    (gnss_flowgraph.cc:2156 set_signals_list + factory channel loop).

    ``engine="production"`` (default) returns the fast-engine
    :class:`ProductionMultiBandReceiver`; ``"scan"`` the per-period
    :class:`MultiBandReceiver`."""
    from gnss_sdr_tpu.receiver.multiband import (MultiBandConfig,
                                                 MultiBandReceiver)

    _check("Observables",
           config.property("Observables.implementation", ""), SUPPORTED_OBS)
    _check("PVT", config.property("PVT.implementation", ""), SUPPORTED_PVT)
    fs = float(config.property("GNSS-SDR.internal_fs_sps", 4_000_000))
    cfg = MultiBandConfig(
        fs=fs,
        interval_ms=config.property("GNSS-SDR.observable_interval_ms", 20),
        output_rate_ms=config.property("PVT.output_rate_ms", 100),
        enable_carrier_smoothing=config.property(
            "Observables.enable_carrier_smoothing", False),
        smoothing_factor=config.property(
            "Observables.smoothing_factor", 200),
        iono_free=config.property("PVT.iono_model", "") == "IFLC",
        positioning_mode=config.property("PVT.positioning_mode", "Single"),
        log_base_obs=config.property("PVT.log_base_obs", False),
        rinex_output=config.property("PVT.rinex_output_enabled", False),
    )
    bands = [make_band_config(config, sx) for sx in suffixes]
    agnss = _load_agnss(config)
    assisted = ({("G", p): e for p, e in agnss.items()} if agnss else None)
    from gnss_sdr_tpu.monitor.wiring import ConfigMonitors

    monitors = ConfigMonitors.from_config(config)
    if engine == "production":
        from gnss_sdr_tpu.receiver.production_multiband import (
            ProductionMultiBandReceiver)

        rec = ProductionMultiBandReceiver(cfg, bands,
                                          assisted_ephemeris=assisted)
        _load_precise_products(config, rec.receiver)
        _arm_rtk_base(config, rec.receiver)
        rec.receiver.monitors = monitors
        return rec
    rec = MultiBandReceiver(cfg, bands, assisted_ephemeris=assisted)
    _load_precise_products(config, rec)
    _arm_rtk_base(config, rec)
    rec.monitors = monitors
    return rec


def _arm_rtk_base(config: Configuration, rec) -> None:
    """File-based base-station input for the "configure and run" RTK
    workflow (the rtklib_pvt_gs base RTCM/RINEX-input role):
    ``PVT.rtk_base_position`` (ECEF meters) + ``PVT.rtk_base_obs_file``
    (a RINEX obs file, e.g. the base receiver's own
    PVT.rinex_output_enabled product)."""
    if not config.property("PVT.positioning_mode",
                           "Single").startswith("RTK"):
        return
    path = config.property("PVT.rtk_base_obs_file", "")
    pos_text = config.property("PVT.rtk_base_position", "")
    if not path or not pos_text:
        return
    from gnss_sdr_tpu.pvt.rtk_io import base_obs_from_rinex

    pos = np.array([float(v) for v in
                    pos_text.replace(",", " ").split()])
    rec.set_rtk_base(pos, base_obs_from_rinex(path))


def _load_precise_products(config: Configuration, rec) -> None:
    """Precise-products config surface: ``PVT.sp3_file`` substitutes
    SP3-c orbits/clocks for broadcast (rtklib precise-eph option) and
    ``PVT.ionex`` supplies the TEC maps PPP's single-frequency mode and
    iono corrections read (rtklib_ionex.cc readtec)."""
    sp3 = config.property("PVT.sp3_file", "")
    if sp3:
        from gnss_sdr_tpu.pvt.precise import read_sp3

        rec.precise_ephemerides.update(read_sp3(sp3))
    ionex = config.property("PVT.ionex", "")
    if ionex:
        from gnss_sdr_tpu.pvt.ionex import read_ionex

        rec.ionex = read_ionex(ionex)


def make_receiver(config: Configuration, satellites=None,
                  engine: str | None = None):
    """Build a receiver from reference-style configuration keys.

    A single ``Channels_1C`` group assembles the GPS L1 receiver; any
    other combination of ``Channels_XX.count`` groups assembles the
    multi-band receiver over one common-rate stream. By default the
    production (fast-engine) receiver is returned — the reference's one
    configured path IS its real-time path (gnss_block_factory.cc:637,
    README.md real-time claim) — unless ``GNSS-SDR.engine=scan``
    selects the per-period scan pipeline (or the caller overrides via
    ``engine``, e.g. for unbounded live sources)."""
    if engine is None:
        engine = config.property("GNSS-SDR.engine", "production")
    _check("GNSS-SDR.engine", engine, SUPPORTED_ENGINES)
    suffixes = _configured_suffixes(config)
    # PPP/RTK estimators, the RINEX printer and the UDP monitor taps
    # live in the multi-band receiver's PVT block, so those options
    # route a single-1C conf through it as well
    mode = config.property("PVT.positioning_mode", "Single")
    monitored = any(config.property(k, False) for k in (
        "Monitor.enable_monitor", "TrackingMonitor.enable_monitor",
        "AcquisitionMonitor.enable_monitor",
        "NavDataMonitor.enable_monitor", "PVT.enable_monitor",
        "PVT.enable_monitor_ephemeris"))
    if suffixes and (suffixes != ["1C"] or mode != "Single" or monitored
                     or config.property("PVT.rinex_output_enabled", False)):
        return make_multiband_receiver(config, suffixes, engine)
    return _make_l1_receiver(config, satellites, engine)


def _load_agnss(config: Configuration):
    """Assisted GPS ephemerides from the reference's AGNSS XML surface
    (control_thread.cc assist_GNSS: gps_ephemeris.xml read at startup
    when configured)."""
    path = config.property("GNSS-SDR.AGNSS_gps_ephemeris_xml", "")
    if not path:
        return None
    from gnss_sdr_tpu.receiver.assistance import load_ephemeris_xml

    return load_ephemeris_xml(path)


def _make_l1_receiver(config: Configuration, satellites=None,
                      engine: str = "production"):
    """Build a GPS L1 C/A receiver from reference-style configuration keys."""
    _check("Acquisition_1C",
           config.property("Acquisition_1C.implementation", ""),
           SUPPORTED_ACQ)
    _check("Tracking_1C",
           config.property("Tracking_1C.implementation", ""), SUPPORTED_TRK)
    _check("TelemetryDecoder_1C",
           config.property("TelemetryDecoder_1C.implementation", ""),
           SUPPORTED_TLM)
    _check("Observables",
           config.property("Observables.implementation", ""), SUPPORTED_OBS)
    _check("PVT", config.property("PVT.implementation", ""), SUPPORTED_PVT)

    fs = float(config.property("GNSS-SDR.internal_fs_sps", 4_000_000))
    # extended coherent integration after bit sync: the production engine
    # closes its loops once per K-symbol group (reference states 3/4,
    # dll_pll_veml_tracking.cc:1989-2028); an explicit K=1 keeps the
    # per-period scan engine (production requires K>1)
    ext_k = int(config.property(
        "Tracking_1C.extend_correlation_symbols",
        20 if engine == "production" else 1))
    if ext_k <= 1:
        engine = "scan"
    cfg = ReceiverConfig(
        fs=fs,
        n_channels=config.property("Channels_1C.count", 8),
        extend_correlation_symbols=ext_k,
        pll_bw_narrow_hz=config.property("Tracking_1C.pll_bw_narrow_hz", 5.0),
        dll_bw_narrow_hz=config.property(
            "Tracking_1C.dll_bw_narrow_hz", 0.75),
        doppler_max=float(config.property("Acquisition_1C.doppler_max", 5000)),
        doppler_step=float(config.property("Acquisition_1C.doppler_step", 250)),
        acq_pfa=config.property("Acquisition_1C.pfa", 0.001),
        acq_dwells=config.property("Acquisition_1C.max_dwells", 2),
        pll_bw_hz=config.property("Tracking_1C.pll_bw_hz", 35.0),
        dll_bw_hz=config.property("Tracking_1C.dll_bw_hz", 2.0),
        enable_fll_pull_in=config.property(
            "Tracking_1C.enable_fll_pull_in", True),
        fll_bw_hz=config.property("Tracking_1C.fll_bw_hz", 35.0),
        pull_in_time_s=float(config.property(
            "Tracking_1C.pull_in_time_s", 0.5)),
        early_late_space_chips=config.property(
            "Tracking_1C.early_late_space_chips", 0.5),
        interval_ms=config.property("GNSS-SDR.observable_interval_ms", 20),
        output_rate_ms=config.property("PVT.output_rate_ms", 100),
        enable_carrier_smoothing=config.property(
            "Observables.enable_carrier_smoothing", False),
        smoothing_factor=config.property(
            "Observables.smoothing_factor", 200),
    )
    if satellites is None:
        sats_text = config.property("Channels_1C.satellites", "")
        satellites = ([int(s) for s in sats_text.replace(";", ",").split(",")]
                      if sats_text else list(range(1, 33)))
    agnss = _load_agnss(config)
    if engine == "production":
        from gnss_sdr_tpu.receiver.production import ProductionReceiver

        return ProductionReceiver(cfg, satellites=satellites,
                                  assisted_ephemeris=agnss)
    return Receiver(cfg, satellites=satellites, assisted_ephemeris=agnss)
