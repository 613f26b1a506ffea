"""GPS CNAV encode/decode tests."""

import numpy as np

from gnss_sdr_tpu.telemetry.gps_cnav import (
    GpsCnavDecoder,
    build_message,
    check_message,
    cnav_ephemeris_fields,
    parse_message,
)
from gnss_sdr_tpu.telemetry.viterbi import encode_conv


def msg_fields(tow_s, mtype):
    base = dict(prn=7, msg_type=mtype, tow_s=tow_s)
    if mtype == 10:
        base.update(week_number=2310, toe_s=7200.0, delta_a_m=12.34,
                    delta_n_rad_s=4.5e-9, m0_rad=-1.234, ecc=0.0123,
                    omega_rad=-2.91)
    elif mtype == 11:
        base.update(toe_s=7200.0, omega0_rad=2.345, i0_rad=0.958,
                    delta_omega_dot_rad_s=1.0e-10, idot_rad_s=3.9e-10,
                    cis_rad=5.6e-8, cic_rad=-7.4e-8, crs_m=-54.1,
                    crc_m=212.4, cus_rad=8.5e-6, cuc_rad=1.2e-6)
    elif mtype == 30:
        base.update(toc_s=7200.0, af0=-3.2e-4, af1=2.5e-11, af2=0.0,
                    tgd_s=-4.6e-9)
    return base


def test_message_roundtrip():
    for mtype in (10, 11, 30):
        f = msg_fields(123456.0, mtype)
        bits = build_message(f)
        ok, hdr = check_message(bits)
        assert ok
        assert hdr["prn"] == 7 and hdr["msg_type"] == mtype
        parsed = parse_message(bits)
        assert abs(parsed["tow_s"] - 123456.0) < 1e-9
        for k, v in f.items():
            if k in parsed and isinstance(v, float):
                scale = max(abs(v), 1e-12)
                assert abs(parsed[k] - v) / scale < 2e-2 or \
                    abs(parsed[k] - v) < 1e-7, (mtype, k)
        # corrupt -> rejected
        bad = bits.copy()
        bad[100] ^= 1
        assert not check_message(bad)[0]


def test_ephemeris_merge():
    msgs = {t: parse_message(build_message(msg_fields(0.0, t)))
            for t in (10, 11, 30)}
    f = cnav_ephemeris_fields(msgs)
    assert abs(f["sqrt_a"]**2 - (26_559_710.0 + 12.34)) < 1.0
    assert abs(f["af0"] + 3.2e-4) < 1e-8
    assert "omega0_rad" in f and "tgd_s" in f


def test_streaming_decoder():
    # continuous conv-coded stream of 6 messages (types cycling 10/11/30)
    rng = np.random.default_rng(0)
    bit_stream = []
    t0 = 7200.0
    for k in range(6):
        mtype = (10, 11, 30)[k % 3]
        # TOW = start of NEXT message (12 s messages)
        bit_stream.append(build_message(msg_fields(t0 + 12.0 * (k + 1),
                                                   mtype)))
    bits = np.concatenate(bit_stream)
    coded = encode_conv(bits, kk=7, g=(0o171, 0o133))
    soft = (1.0 - 2.0 * coded) * 1000.0
    soft = soft + rng.normal(0, 150.0, soft.shape)
    dec = GpsCnavDecoder()
    for i, s in enumerate(soft):
        dec.feed(s, sample_stamp=1000 * i)
    types = [m.msg_type for m in dec.messages]
    assert len(types) >= 4
    assert {10, 11, 30} <= set(types)
    assert dec.has_full_ephemeris()
    f = dec.ephemeris_fields
    assert abs(f["sqrt_a"]**2 - (26_559_710.0 + 12.34)) < 1.0
    # TOW propagation: last fed symbol index vs decoded message timing.
    # message k ends at symbol 600*(k+1)-1 with clock t0+12*(k+1);
    # at the final fed symbol (n_fed-1) the clock advanced accordingly.
    n_fed = len(soft)
    last_msg_idx = len(types)  # messages decoded so far = k+1 of last
    # compute expected from the decoder's own bookkeeping instead:
    # end of message j (1-based) = t0 + 12*j at symbol 600*j - 1
    j = max(range(1, 7), default=1)
    # find largest j with 600*j <= consumed; use decoder value directly
    assert dec.tow_at_last_symbol_ms is not None
    # expected clock at last fed symbol
    expected = (t0 + 12.0 * 6) * 1000.0 - (3600 * 6 - n_fed) * 0  # n_fed==3600*...
    # simpler: symbol i ends at t0 + (i+1)*0.02 s
    expected_ms = (t0 + (n_fed) * 0.02) * 1000.0
    assert abs(dec.tow_at_last_symbol_ms - expected_ms) < 1e-6
