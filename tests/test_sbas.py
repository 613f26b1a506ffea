"""SBAS L1 transport-layer tests."""

import numpy as np

from gnss_sdr_tpu.telemetry.sbas_l1 import (
    SbasL1Decoder,
    build_block,
    check_block,
)
from gnss_sdr_tpu.telemetry.viterbi import encode_conv


def test_block_roundtrip():
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, 212)
    for pre in range(3):
        b = build_block(2, payload, preamble_index=pre)
        ok, fields = check_block(b)
        assert ok and fields["msg_type"] == 2
        np.testing.assert_array_equal(fields["payload"], payload)
    bad = build_block(2, payload)
    bad[50] ^= 1
    assert not check_block(bad)[0]


def test_streaming_decoder():
    rng = np.random.default_rng(1)
    blocks = []
    for k in range(6):
        payload = rng.integers(0, 2, 212)
        blocks.append(build_block((k % 5) + 1, payload, preamble_index=k))
    bits = np.concatenate(blocks)
    coded = encode_conv(bits, kk=7, g=(0o171, 0o133))
    soft = (1.0 - 2.0 * coded) * 900.0 + rng.normal(0, 200.0, coded.shape)
    dec = SbasL1Decoder()
    for i, s in enumerate(soft):
        dec.feed(s, sample_stamp=250 * i)
    types = [m.msg_type for m in dec.messages]
    assert len(types) >= 4
    assert types[0] == 1
