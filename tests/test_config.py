import textwrap

from gnss_sdr_tpu.config import FileConfiguration, InMemoryConfiguration


def test_in_memory_typed_properties():
    conf = InMemoryConfiguration()
    conf.set_property("GNSS-SDR.internal_fs_sps", "4000000")
    conf.set_property("Acquisition_1C.doppler_max", "5000")
    conf.set_property("Acquisition_1C.pfa", "0.01")
    conf.set_property("Acquisition_1C.blocking", "true")
    conf.set_property("Tracking_1C.dump", False)

    assert conf.property("GNSS-SDR.internal_fs_sps", 0) == 4_000_000
    assert conf.property("Acquisition_1C.doppler_max", 0) == 5000
    assert conf.property("Acquisition_1C.pfa", 0.0) == 0.01
    assert conf.property("Acquisition_1C.blocking", False) is True
    assert conf.property("Tracking_1C.dump", True) is False
    # missing key -> default
    assert conf.property("Tracking_1C.pll_bw_hz", 35.0) == 35.0
    # bad value -> default
    conf.set_property("Channels_1C.count", "not-a-number")
    assert conf.property("Channels_1C.count", 8) == 8


def test_file_configuration(tmp_path):
    conf_text = textwrap.dedent(
        """
        ; GNSS-SDR configuration
        GNSS-SDR.internal_fs_sps=2000000
        SignalSource.implementation=File_Signal_Source
        SignalSource.filename=/data/capture.dat ; inline comment
        Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition
        Acquisition_1C.doppler_max=5000
        Acquisition_1C.doppler_step=250
        # hash comment
        Tracking_1C.pll_bw_hz=35.0
        """
    )
    path = tmp_path / "rx.conf"
    path.write_text(conf_text)
    conf = FileConfiguration(path)
    assert conf.property("GNSS-SDR.internal_fs_sps", 0) == 2_000_000
    assert conf.property("SignalSource.implementation", "") == "File_Signal_Source"
    assert conf.property("SignalSource.filename", "") == "/data/capture.dat"
    assert conf.property("Acquisition_1C.doppler_step", 0) == 250
    assert conf.property("Tracking_1C.pll_bw_hz", 0.0) == 35.0
    assert conf.role_properties("Acquisition_1C") == {
        "implementation": "GPS_L1_CA_PCPS_Acquisition",
        "doppler_max": "5000",
        "doppler_step": "250",
    }


def test_overrides():
    conf = InMemoryConfiguration()
    conf.set_property("Acquisition_1C.doppler_max", "5000")
    conf.apply_overrides({"Acquisition_1C.doppler_max": "10000"})
    assert conf.property("Acquisition_1C.doppler_max", 0) == 10000


def test_flag_validators():
    """gflags-style range validation (gnss_sdr_flags.cc DEFINE_validator)."""
    import pytest
    from gnss_sdr_tpu.config import InMemoryConfiguration

    c = InMemoryConfiguration()
    c.apply_overrides({"Acquisition_1C.doppler_max": "8000"})
    assert c.property("Acquisition_1C.doppler_max", 0) == 8000
    with pytest.raises(ValueError, match="Allowed range"):
        c.apply_overrides({"Acquisition_1C.doppler_max": "2000000"})
    with pytest.raises(ValueError, match="carrier_lock_th"):
        c.apply_overrides({"Tracking_1C.carrier_lock_th": "2.0"})
    with pytest.raises(ValueError, match="not a number"):
        c.apply_overrides({"Tracking_1C.pll_bw_hz": "fast"})
    # non-validated keys pass through untouched
    c.apply_overrides({"PVT.output_rate_ms": "100"})
