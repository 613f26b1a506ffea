import numpy as np
import pytest

from gnss_sdr_tpu.conditioner import (
    design_lowpass_taps,
    fir_filter,
    freq_xlating_fir_filter,
    direct_resample_indices,
)
from gnss_sdr_tpu.ops.cplx import from_complex, to_complex


def test_lowpass_rejects_out_of_band():
    fs = 4e6
    taps = design_lowpass_taps(fs, 1.2e6, 0.4e6, ntaps=97)
    n = 4096
    t = np.arange(n) / fs
    inband = np.exp(2j * np.pi * 0.5e6 * t).astype(np.complex64)
    outband = np.exp(2j * np.pi * 1.9e6 * t).astype(np.complex64)
    y_in = to_complex(fir_filter(from_complex(inband), taps))
    y_out = to_complex(fir_filter(from_complex(outband), taps))
    # compare steady-state power (skip the transient)
    p_in = np.mean(np.abs(y_in[200:]) ** 2)
    p_out = np.mean(np.abs(y_out[200:]) ** 2)
    assert p_in > 0.9
    assert p_out < 1e-3 * p_in


def test_fir_matches_numpy_convolution():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype(
        np.complex64)
    taps = rng.standard_normal(31).astype(np.float32)
    got = to_complex(fir_filter(from_complex(x), taps))
    ref = np.convolve(x, taps, mode="full")[:500]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_freq_xlating_decimator():
    fs = 8e6
    f0 = 2e6
    n = 8192
    t = np.arange(n) / fs
    # IF carrier at f0 + 10 kHz -> baseband 10 kHz after translation
    x = np.exp(2j * np.pi * (f0 + 1e4) * t).astype(np.complex64)
    taps = design_lowpass_taps(fs, 1.5e6, 0.5e6, ntaps=97)
    y = to_complex(freq_xlating_fir_filter(from_complex(x), taps, f0, fs,
                                           decimation=4))
    assert y.shape[0] == n // 4
    # instantaneous frequency of the decimated output ~ 10 kHz
    ph = np.unwrap(np.angle(y[100:]))
    freq = np.mean(np.diff(ph)) * (fs / 4) / (2 * np.pi)
    assert abs(freq - 1e4) < 200.0


def test_direct_resampler_indices():
    idx = direct_resample_indices(100, 10.0, 4.0)
    assert idx.shape[0] == 40
    assert idx[0] == 0 and idx[1] == 2 and idx[-1] <= 99
    # identity when rates match
    idx2 = direct_resample_indices(50, 5.0, 5.0)
    np.testing.assert_array_equal(idx2, np.arange(50))


def test_pulse_blanking_removes_pulses():
    from gnss_sdr_tpu.conditioner.interference import pulse_blanking

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
        np.complex64)
    x[100:110] += 100.0  # strong pulse
    re, im = pulse_blanking(from_complex(x), threshold_sigma=5.0)
    out = np.asarray(re) + 1j * np.asarray(im)
    assert np.all(np.abs(out[100:110]) == 0)
    # untouched elsewhere (allow a few statistical false blanks)
    untouched = np.mean(out[200:] == x[200:])
    assert untouched > 0.99


def test_notch_excision_removes_cw():
    from gnss_sdr_tpu.conditioner.interference import notch_filter_block

    rng = np.random.default_rng(1)
    n = 4000
    t = np.arange(n)
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    cw = 30.0 * np.exp(2j * np.pi * 0.12 * t)  # strong CW jammer
    x = (noise + cw).astype(np.complex64)
    re, im = notch_filter_block(from_complex(x), excision_factor=8.0)
    out = np.asarray(re) + 1j * np.asarray(im)
    # jammer suppressed: residual power near noise level
    p_out = np.mean(np.abs(out) ** 2)
    p_in = np.mean(np.abs(x) ** 2)
    assert p_out < 0.02 * p_in
    assert abs(p_out - np.mean(np.abs(noise) ** 2)) < 0.5 * np.mean(
        np.abs(noise) ** 2)


def test_beamformer_gain_and_null():
    """Steered array gains M in the look direction and attenuates
    off-axis interference (Beamformer_Filter counterpart)."""
    import numpy as np
    from gnss_sdr_tpu.conditioner.beamformer import (
        BeamformerFilter, array_response, steering_weights)

    rng = np.random.default_rng(0)
    m_ant, n = 8, 4096
    sig = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    jam = 10 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    a_sig = array_response(m_ant, 0.5, 10.0)
    a_jam = array_response(m_ant, 0.5, 55.0)
    x = a_sig[:, None] * sig[None, :] + a_jam[:, None] * jam[None, :]
    bf = BeamformerFilter(steering_weights(m_ant, 0.5, 10.0))
    y = bf.apply(x)
    # signal passes at unity gain (weights normalized by M)
    corr = np.vdot(sig, y) / np.vdot(sig, sig)
    assert abs(abs(corr) - 1.0) < 0.05
    # interference suppressed relative to a single antenna
    jam_res = y - corr * sig
    jam_single = x[0] - a_sig[0] * sig
    assert np.mean(np.abs(jam_res) ** 2) < 0.2 * np.mean(
        np.abs(jam_single) ** 2)
    # wrong channel count rejected
    import pytest
    with pytest.raises(ValueError, match="antenna channels"):
        bf.apply(x[:5])


# --------------------------------------------------------------------------
# SignalConditioner config chain (signal_conditioner.cc:37-85)
# --------------------------------------------------------------------------

def test_chain_stream_matches_oneshot():
    """apply_stream chunks concatenate to the one-shot apply() result
    (GNU Radio history semantics across buffer boundaries)."""
    from gnss_sdr_tpu.conditioner.chain import SignalConditionerChain

    rng = np.random.default_rng(3)
    fs = 4.0e6
    x = (rng.standard_normal(40_000)
         + 1j * rng.standard_normal(40_000)).astype(np.complex64)
    mk = lambda: SignalConditionerChain(
        fs_in=fs, input_filter="Freq_Xlating_Fir_Filter",
        if_freq_hz=1.0e6, decimation=2, ntaps=33)
    one = mk().apply(x)
    ch = mk()
    parts = [ch.apply_stream(x[a:b])
             for a, b in [(0, 7_001), (7_001, 20_000), (20_000, 40_000)]]
    streamed = np.concatenate(parts)
    n = min(len(one), len(streamed))
    np.testing.assert_allclose(streamed[:n].real, one[:n].real,
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(streamed[:n].imag, one[:n].imag,
                               rtol=0, atol=2e-4)


def test_conditioner_config_rejects_unknown_filter():
    from gnss_sdr_tpu.config import InMemoryConfiguration
    from gnss_sdr_tpu.receiver.factory import make_signal_conditioner

    config = InMemoryConfiguration()
    config.set_property("SignalConditioner.implementation",
                        "Signal_Conditioner")
    config.set_property("InputFilter.implementation", "Warp_Filter")
    with pytest.raises(ValueError, match="not available"):
        make_signal_conditioner(config)

    config.set_property("InputFilter.implementation",
                        "Freq_Xlating_Fir_Filter")
    config.set_property("SignalSource.sampling_frequency", "5000000")
    config.set_property("InputFilter.decimation_factor", "2")
    config.set_property("GNSS-SDR.internal_fs_sps", "2000000")
    with pytest.raises(ValueError, match="internal_fs_sps"):
        make_signal_conditioner(config)   # 5M/2 != 2M


def test_cli_freq_xlating_chain_produces_fixes(tmp_path, capsys):
    """A reference-style conf with Freq_Xlating_Fir_Filter + decimation
    over an IF-centered capture produces fixes through the CLI — the
    conditioner INI groups are wired, not silently ignored
    (freq_xlating_fir_filter.cc role)."""
    import textwrap

    from gnss_sdr_tpu.__main__ import main
    from gnss_sdr_tpu.receiver.assistance import save_ephemeris_xml
    from gnss_sdr_tpu.simulate.rf_scene import generate_scene
    from gnss_sdr_tpu.simulate.scenario import (make_constellation,
                                                rx_position, visible_sats)

    fs_raw = 5.0e6
    if_hz = 1.25e6
    toe = 7200.0
    bits_start = 7200.0 + 598 * 6.0
    t_start = bits_start + 4.5
    rx = rx_position()
    ephs = make_constellation(range(1, 13), toe_s=toe)
    prns = visible_sats(ephs, rx, t_start)[:5]
    x = generate_scene(ephs, prns, rx, t_start, 8.4, fs_raw,
                       bits_start_tow_s=bits_start, n_subframes=4,
                       cn0_db_hz=48.0, seed=31)
    # shift the baseband scene up to a front-end IF
    n = np.arange(len(x), dtype=np.float64)
    x = (x * np.exp(2j * np.pi * if_hz / fs_raw * n)).astype(np.complex64)
    cap = tmp_path / "if_capture.dat"
    x.tofile(cap)
    agnss = tmp_path / "eph.xml"
    save_ephemeris_xml({p: ephs[p] for p in prns}, agnss)
    conf = tmp_path / "rx.conf"
    conf.write_text(textwrap.dedent(f"""
        GNSS-SDR.internal_fs_sps=2500000
        GNSS-SDR.AGNSS_gps_ephemeris_xml={agnss}
        SignalSource.implementation=File_Signal_Source
        SignalSource.filename={cap}
        SignalSource.sampling_frequency=5000000
        SignalSource.item_type=gr_complex
        SignalConditioner.implementation=Signal_Conditioner
        DataTypeAdapter.implementation=Pass_Through
        InputFilter.implementation=Freq_Xlating_Fir_Filter
        InputFilter.IF={if_hz}
        InputFilter.decimation_factor=2
        InputFilter.number_of_taps=33
        Channels_1C.count=5
        Channels_1C.satellites={",".join(str(p) for p in prns)}
        Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition
        Acquisition_1C.doppler_max=4000
        Tracking_1C.implementation=GPS_L1_CA_DLL_PLL_Tracking
        Tracking_1C.pull_in_time_s=0.4
        TelemetryDecoder_1C.implementation=GPS_L1_CA_Telemetry_Decoder
        Observables.implementation=Hybrid_Observables
        PVT.implementation=RTKLIB_PVT
        """))
    rc = main(["-c", str(conf)])
    captured = capsys.readouterr()
    assert rc == 0
    fixes = [ln for ln in captured.out.splitlines()
             if ln.startswith("$GPGGA")]
    assert len(fixes) >= 4, captured.err
    assert "fast_mode=True" in captured.err
