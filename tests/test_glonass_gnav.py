"""GLONASS GNAV codec + state-vector ephemeris tests."""

import pytest
import numpy as np

from gnss_sdr_tpu.pvt.glonass_ephemeris import GlonassEphemeris
from gnss_sdr_tpu.telemetry.glonass_gnav import (
    GlonassGnavDecoder,
    build_string,
    check_string,
    encode_checks,
    parse_string,
    string_to_symbols,
)


def test_hamming_roundtrip_and_error_detection():
    rng = np.random.default_rng(0)
    for _ in range(20):
        data = rng.integers(0, 2, 77)
        s = encode_checks(data)
        assert check_string(s)
        # double-bit errors must be rejected (single errors may be
        # accepted by rule a-ii, which is correctable)
        bad = s.copy()
        bad[20] ^= 1
        bad[40] ^= 1
        assert not check_string(bad)


def ref_strings():
    return [
        dict(string_id=1, t_k_s=11730, x_km=12317.934, vx_km_s=-1.23456,
             ax_km_s2=0.0),
        dict(string_id=2, tb_min=1350, y_km=-15002.5, vy_km_s=2.5,
             ay_km_s2=0.0),
        dict(string_id=3, z_km=17000.125, vz_km_s=-0.5, az_km_s2=0.0,
             gamma_n=1e-9),
        dict(string_id=4, tau_n_s=-5.2e-5, n_t=512),
    ]


def test_string_field_roundtrip():
    for f in ref_strings():
        bits = build_string(f)
        parsed = parse_string(bits)
        assert parsed is not None
        assert parsed["string_id"] == f["string_id"]
        for k, v in f.items():
            if k == "string_id":
                continue
            got = parsed[k]
            if isinstance(v, int):
                assert got == v, k
            else:
                assert abs(got - v) <= max(abs(v) * 1e-5, 1e-3), (k, v, got)


def test_symbol_stream_decoder():
    rng = np.random.default_rng(1)
    chips = []
    for rep in range(2):
        for f in ref_strings():
            chips.append(string_to_symbols(build_string(f)))
    soft = np.concatenate(chips) * 800.0
    soft += rng.normal(0, 120.0, soft.shape)
    soft = -soft[37:]  # polarity flip + partial start
    dec = GlonassGnavDecoder()
    for i, c in enumerate(soft):
        dec.feed(c, sample_stamp=5110 * i)
    ids = [s.string_id for s in dec.strings]
    assert {1, 2, 3, 4} <= set(ids)
    assert dec.has_full_ephemeris()
    eph = GlonassEphemeris.from_fields(5, dec.ephemeris_fields)
    assert abs(eph.pos_m[0] - 12317934.0) < 1.0
    assert abs(eph.tb_s - 1350 * 60) < 1e-9


def test_glonass_orbit_propagation():
    # circular-ish GLONASS orbit: r=25508 km, v=orbital speed in ECEF
    r = 25_508_000.0
    v_inertial = np.sqrt(3.9860044e14 / r)
    eph = GlonassEphemeris(
        slot=3, tb_s=40_000.0, pos_m=(r, 0.0, 0.0),
        vel_m_s=(0.0, v_inertial - 7.292115e-5 * r, 100.0),
        acc_m_s2=(0.0, 0.0, 0.0))
    p0 = np.array(eph.sat_pos(40_000.0))
    np.testing.assert_allclose(p0, [r, 0, 0])
    p1 = np.array(eph.sat_pos(40_000.0 + 600.0))
    # moved a few thousand km but radius roughly conserved
    assert 1e6 < np.linalg.norm(p1 - p0) < 3e6
    assert abs(np.linalg.norm(p1) - r) < 5e4
    # backward integration consistent
    p_back = np.array(GlonassEphemeris(
        slot=3, tb_s=40_600.0, pos_m=tuple(p1),
        vel_m_s=tuple(eph.sat_vel(40_600.0)),
    ).sat_pos(40_000.0))
    assert np.linalg.norm(p_back - p0) < 2e3


def test_gnav_string5_and_almanac_roundtrip():
    """Strings 5 (UTC/system time) and 6+7 (almanac pair) encode/decode
    at ICD quantization and accumulate in the streaming decoder
    (glonass_gnav_navigation_message.cc cases 5-15)."""
    import numpy as np

    from gnss_sdr_tpu.telemetry.glonass_gnav import (
        GlonassGnavDecoder,
        build_string,
        parse_string,
        string_to_symbols,
    )

    s5 = dict(string_id=5, n_a_day=803, tau_c_s=-1.2e-8, n_4=7,
              tau_gps_s=3.1e-9, l_n=0)
    s6 = dict(string_id=6, c_n=1, m_n_a=1, slot=9, tau_n_a_s=1.9e-4,
              lambda_n_a_rad=-1.04, delta_i_n_a_rad=0.021,
              epsilon_n_a=0.0012)
    s7 = dict(string_id=7, omega_n_a_rad=0.51, t_lambda_n_a_s=11471.5,
              delta_t_n_a_s=-2655.76, delta_t_dot_n_a=6.1e-4, h_n_a=5,
              l_n=0)
    scales = {"tau_c_s": 2.0**-31, "tau_gps_s": 2.0**-30,
              "tau_n_a_s": 2.0**-18,
              "lambda_n_a_rad": 2.0**-20 * np.pi,
              "delta_i_n_a_rad": 2.0**-20 * np.pi,
              "epsilon_n_a": 2.0**-20, "omega_n_a_rad": 2.0**-15 * np.pi,
              "t_lambda_n_a_s": 2.0**-5, "delta_t_n_a_s": 2.0**-9,
              "delta_t_dot_n_a": 2.0**-14}
    for f in (s5, s6, s7):
        parsed = parse_string(build_string(f))
        assert parsed is not None and parsed["string_id"] == f["string_id"]
        for k, v in f.items():
            if k == "string_id":
                continue
            assert parsed[k] == pytest.approx(
                v, abs=0.51 * scales.get(k, 1e-9) + 1e-12), k

    dec = GlonassGnavDecoder()
    rng = np.random.default_rng(2)
    # lead-in time mark so the decoder syncs before string 5
    from gnss_sdr_tpu.telemetry.glonass_gnav import TIME_MARK

    lead = np.where(TIME_MARK == 1, -1.0, 1.0)
    stream = [lead]
    for f in (s5, s6, s7):
        stream.append(string_to_symbols(build_string(f)))
    chips = np.concatenate(stream)
    for i, c in enumerate(chips):
        dec.feed(c * (900.0 + rng.normal(0, 100)), i)
    assert dec.utc_model.get("n_4") == 7
    assert 9 in dec.almanacs
    alm = dec.almanacs[9]
    assert alm["h_n_a"] == 5
    assert alm["lambda_n_a_rad"] == pytest.approx(-1.04, abs=1e-5)
    assert alm["delta_t_n_a_s"] == pytest.approx(-2655.76, abs=2.0**-9)
