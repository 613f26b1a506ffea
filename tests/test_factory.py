"""Configuration-driven assembly tests (gnss_block_factory_test.cc
analogue): every supported implementation name instantiates; unknown
names fail with a hint."""

import textwrap

import numpy as np
import pytest

from gnss_sdr_tpu.config import FileConfiguration, InMemoryConfiguration
from gnss_sdr_tpu.receiver.factory import make_receiver, make_signal_source

CONF = """
GNSS-SDR.internal_fs_sps=2500000
SignalSource.implementation=File_Signal_Source
SignalSource.filename={filename}
SignalSource.item_type=ishort
Channels_1C.count=6
Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition
Acquisition_1C.doppler_max=4000
Acquisition_1C.doppler_step=200
Acquisition_1C.pfa=0.002
Tracking_1C.implementation=GPS_L1_CA_DLL_PLL_Tracking
Tracking_1C.pll_bw_hz=30.0
Tracking_1C.dll_bw_hz=1.5
Tracking_1C.early_late_space_chips=0.4
TelemetryDecoder_1C.implementation=GPS_L1_CA_Telemetry_Decoder
Observables.implementation=Hybrid_Observables
Observables.enable_carrier_smoothing=true
PVT.implementation=RTKLIB_PVT
PVT.output_rate_ms=500
"""


def test_receiver_from_reference_style_conf(tmp_path):
    data = np.zeros(1000, dtype=np.int16)
    cap = tmp_path / "cap.dat"
    data.tofile(cap)
    conf_file = tmp_path / "rx.conf"
    conf_file.write_text(textwrap.dedent(CONF.format(filename=cap)))
    config = FileConfiguration(conf_file)

    src = make_signal_source(config)
    assert src is not None and src.fs == 2_500_000.0
    assert src.item_type == "ishort"

    rec = make_receiver(config, satellites=[1, 2, 3, 4, 5, 6, 7])
    assert rec.cfg.n_channels == 6
    assert rec.cfg.doppler_max == 4000.0
    assert rec.cfg.pll_bw_hz == 30.0
    assert rec.cfg.enable_carrier_smoothing is True
    assert rec.cfg.output_rate_ms == 500
    assert rec.acq.cfg.pfa == 0.002
    assert len(rec.fsms) == 6


def test_unknown_implementation_rejected():
    config = InMemoryConfiguration()
    config.set_property("Acquisition_1C.implementation",
                        "GPS_L1_CA_PCPS_QuickSync_Acquisition")
    with pytest.raises(ValueError, match="not available"):
        make_receiver(config)
