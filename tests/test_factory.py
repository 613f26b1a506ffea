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

    # the default assembled receiver is the production (fast) engine —
    # the reference's one configured path is its real-time path
    # (gnss_block_factory.cc:637)
    from gnss_sdr_tpu.receiver.production import ProductionReceiver

    rec = make_receiver(config, satellites=[1, 2, 3, 4, 5, 6, 7])
    assert isinstance(rec, ProductionReceiver)
    assert rec.cfg.n_channels == 6
    assert rec.cfg.doppler_max == 4000.0
    assert rec.cfg.pll_bw_hz == 30.0
    assert rec.cfg.enable_carrier_smoothing is True
    assert rec.cfg.output_rate_ms == 500
    assert rec.cfg.extend_correlation_symbols == 20
    assert rec.receiver.acq.cfg.pfa == 0.002
    assert len(rec.receiver.fsms) == 6

    # GNSS-SDR.engine=scan selects the per-period pipeline
    config.set_property("GNSS-SDR.engine", "scan")
    scan = make_receiver(config, satellites=[1, 2, 3])
    assert not isinstance(scan, ProductionReceiver)
    assert scan.acq.cfg.pfa == 0.002

    config.set_property("GNSS-SDR.engine", "warp9")
    with pytest.raises(ValueError, match="not available"):
        make_receiver(config)


def test_unknown_implementation_rejected():
    config = InMemoryConfiguration()
    config.set_property("Acquisition_1C.implementation",
                        "GPS_L1_CA_PCPS_QuickSync_Acquisition")
    with pytest.raises(ValueError, match="not available"):
        make_receiver(config)


MIXED_CONF = """
GNSS-SDR.internal_fs_sps=4000000
GNSS-SDR.engine=scan
SignalSource.implementation=File_Signal_Source
SignalSource.filename={filename}
SignalSource.item_type=gr_complex
Channels_1C.count=3
Channels_1B.count=3
Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition
Acquisition_1C.doppler_max=5000
Acquisition_1B.implementation=Galileo_E1_PCPS_Ambiguous_Acquisition
Acquisition_1B.doppler_max=5000
Acquisition_1B.doppler_step=125
Tracking_1C.implementation=GPS_L1_CA_DLL_PLL_Tracking
Tracking_1C.pull_in_time_s=0.4
Tracking_1B.implementation=Galileo_E1_DLL_PLL_VEML_Tracking
Tracking_1B.pll_bw_hz=20.0
Tracking_1B.pull_in_time_s=0.4
TelemetryDecoder_1C.implementation=GPS_L1_CA_Telemetry_Decoder
TelemetryDecoder_1B.implementation=Galileo_E1B_Telemetry_Decoder
Observables.implementation=Hybrid_Observables
PVT.implementation=RTKLIB_PVT
PVT.output_rate_ms=200
"""


def test_mixed_gps_galileo_conf_assembles_and_fixes(tmp_path):
    """The central reference architecture (SURVEY section 1): one INI
    names per-suffix implementations and the factory wires a mixed
    GPS L1 + Galileo E1 receiver over ONE front-end stream (both ride
    the 1575.42 MHz band) — gnss_block_factory.cc:183-210 channel
    groups, gnss_flowgraph.cc:2156 signal lists."""
    from gnss_sdr_tpu.receiver.multiband import MultiBandReceiver
    from gnss_sdr_tpu.simulate.rf_scene import (generate_galileo_scene,
                                                generate_scene)
    from gnss_sdr_tpu.simulate.scenario import (make_constellation,
                                                rx_position, visible_sats)

    fs = 4.0e6
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0       # common 6 s LNAV subframe grid
    gal_bits_start = 7200.0 + 359 * 10.0  # 10 s F/NAV-aligned page grid
    t_start = bits_start + 5.0
    duration = 8.4
    rx = rx_position()
    gps_ephs = make_constellation(range(1, 13), toe_s=toe)
    gal_ephs = make_constellation(range(1, 13), toe_s=toe, spread_seed=7)
    gps_prns = visible_sats(gps_ephs, rx, t_start)[:3]
    gal_prns = visible_sats(gal_ephs, rx, t_start)[:3]
    x = generate_scene(gps_ephs, gps_prns, rx, t_start, duration, fs,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=81)
    x = x + generate_galileo_scene(gal_ephs, gal_prns, rx, t_start,
                                   duration, fs,
                                   bits_start_tow_s=gal_bits_start,
                                   cn0_db_hz=48.0, seed=82)

    cap = tmp_path / "mixed.dat"
    x.astype(np.complex64).tofile(cap)
    conf_file = tmp_path / "rx.conf"
    conf_file.write_text(textwrap.dedent(
        MIXED_CONF.format(filename=cap)))
    config = FileConfiguration(conf_file)
    rec = make_receiver(config)
    assert isinstance(rec, MultiBandReceiver)
    assert [b.cfg.suffix for b in rec.bands] == ["1C", "1B"]
    # narrow the search pools to the simulated satellites and provide
    # assistance (the 8 s capture is shorter than an ephemeris readout)
    rec.bands[0].sat_pool.clear()
    rec.bands[0].sat_pool.extend(gps_prns)
    rec.bands[1].sat_pool.clear()
    rec.bands[1].sat_pool.extend(gal_prns)
    rec.ephemerides.update({("G", p): gps_ephs[p] for p in gps_prns})
    rec.ephemerides.update({("E", p): gal_ephs[p] for p in gal_prns})

    src = make_signal_source(config)
    block = rec.block_samples
    pos = 0
    while pos + block + rec.overlap <= src.n_samples:
        rec.process_block(src.read(pos, block + rec.overlap))
        pos += block
    sols = rec.solutions
    assert len(sols) >= 3, (
        f"expected >=3 mixed fixes, got {len(sols)}; "
        f"states={rec.channel_states()}")
    errs = [np.linalg.norm(s.pos_ecef - rx) for s in sols[1:]]
    assert float(np.mean(errs)) < 5.0
    # both constellations contribute measurements
    assert sols[-1].n_sats >= 5


def test_precise_products_config_surface(tmp_path):
    """PVT.sp3_file / PVT.ionex / PVT.positioning_mode=PPP_Static load
    precise orbits, TEC maps and arm the PPP estimator from the INI
    surface (rtklib precise-eph + readtec + pppos options)."""
    from gnss_sdr_tpu.pvt.ionex import IonexTec, write_ionex
    from gnss_sdr_tpu.pvt.precise import sp3_from_ephemerides
    from gnss_sdr_tpu.simulate.scenario import make_constellation

    ephs = make_constellation(range(1, 5), toe_s=7200.0)
    sp3 = tmp_path / "orbits.sp3"
    sp3.write_text(sp3_from_ephemerides(ephs, 6000.0, 4000.0, step_s=900.0))
    ionex = tmp_path / "maps.inx"
    write_ionex(IonexTec(
        epochs_s=np.array([0.0, 86400.0]),
        lats_deg=np.arange(87.5, -87.6, -2.5),
        lons_deg=np.arange(-180.0, 180.1, 5.0),
        height_km=450.0,
        tec=np.full((2, 71, 73), 15.0)), ionex)
    config = InMemoryConfiguration()
    config.set_property("GNSS-SDR.internal_fs_sps", "2500000")
    config.set_property("Channels_1C.count", "4")
    config.set_property("PVT.positioning_mode", "PPP_Static")
    config.set_property("PVT.sp3_file", str(sp3))
    config.set_property("PVT.ionex", str(ionex))
    # multiband assembly path (1C + S1 keeps it off the L1-only branch)
    config.set_property("Channels_S1.count", "1")
    rec = make_receiver(config)
    inner = rec.receiver
    assert inner.cfg.positioning_mode == "PPP_Static"
    assert len(inner.precise_ephemerides) >= 4
    assert inner.ionex is not None and inner.ionex.height_km == 450.0
