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
}
# every name in the acquisition registry instantiates standalone via
# acquisition.adapters.make_acquisition; the full-receiver chain is GPS L1
# this round (the _check below gates what `make_receiver` wires end-to-end)
from gnss_sdr_tpu.acquisition.adapters import (  # noqa: E402
    ACQ_IMPLEMENTATIONS as SUPPORTED_ACQ_STANDALONE)

SUPPORTED_ACQ = {"GPS_L1_CA_PCPS_Acquisition",
                 "GPS_L1_CA_PCPS_Assisted_Acquisition",
                 "GPS_L1_CA_PCPS_Acquisition_Fine_Doppler"}
SUPPORTED_TRK = {"GPS_L1_CA_DLL_PLL_Tracking"}
SUPPORTED_TLM = {"GPS_L1_CA_Telemetry_Decoder"}
SUPPORTED_OBS = {"Hybrid_Observables"}
SUPPORTED_PVT = {"RTKLIB_PVT"}


def _check(name: str, value: str, supported: set[str]) -> None:
    if value and value not in supported:
        raise ValueError(
            f"{name}.implementation={value!r} is not available; "
            f"supported: {sorted(supported)}")


def make_signal_source(config: Configuration):
    impl = config.property("SignalSource.implementation", "")
    if not impl:
        return None
    _check("SignalSource", impl, SUPPORTED_SOURCES)
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


def make_receiver(config: Configuration,
                  satellites=None) -> Receiver:
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
    cfg = ReceiverConfig(
        fs=fs,
        n_channels=config.property("Channels_1C.count", 8),
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
        satellites = list(range(1, 33))
    return Receiver(cfg, satellites=satellites)
