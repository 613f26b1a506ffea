"""CLI entry point smoke tests (main.cc:66-204 analogue): config load,
gflags-style overrides, streaming loop, NMEA/KML sinks."""

import textwrap

import numpy as np

from gnss_sdr_tpu.__main__ import build_parser, main

CONF = """
GNSS-SDR.internal_fs_sps=2500000
SignalSource.implementation=File_Signal_Source
SignalSource.filename={filename}
SignalSource.item_type=gr_complex
Channels_1C.count=4
Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition
Acquisition_1C.doppler_max=4000
Acquisition_1C.doppler_step=250
Tracking_1C.implementation=GPS_L1_CA_DLL_PLL_Tracking
TelemetryDecoder_1C.implementation=GPS_L1_CA_Telemetry_Decoder
Observables.implementation=Hybrid_Observables
PVT.implementation=RTKLIB_PVT
"""


def _write_fixture(tmp_path, seconds=0.25, fs=2.5e6):
    rng = np.random.default_rng(7)
    n = int(seconds * fs)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    cap = tmp_path / "cap.dat"
    x.tofile(cap)
    conf = tmp_path / "rx.conf"
    conf.write_text(textwrap.dedent(CONF.format(filename=cap)))
    return conf


def test_parser_flags():
    args = build_parser().parse_args(
        ["-c", "rx.conf", "--doppler_max", "6000", "--pll_bw_hz", "25"])
    assert args.config_file == "rx.conf"
    assert args.doppler_max == 6000.0 and args.pll_bw_hz == 25.0


def test_cli_runs_noise_capture(tmp_path, capsys):
    conf = _write_fixture(tmp_path)
    kml = tmp_path / "track.kml"
    rc = main(["-c", str(conf), "--doppler_max", "3000", "--kml", str(kml)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "processed" in err
    # KML closed even with zero fixes
    assert kml.exists() and b"</kml>" in kml.read_bytes()


def test_cli_missing_source_is_an_error(tmp_path):
    conf = tmp_path / "bad.conf"
    conf.write_text("GNSS-SDR.internal_fs_sps=2500000\n")
    assert main(["-c", str(conf)]) == 2
