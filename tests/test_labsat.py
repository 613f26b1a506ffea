"""LabSat 2/3 container source (labsat23_source.cc parity): header
parsing, 2-bit and 4-bit payload decode, factory registration."""

import numpy as np
import pytest

from gnss_sdr_tpu.sources.labsat import (
    LabsatSignalSource,
    decode_labsat_payload,
    parse_labsat_header,
    write_labsat_file,
)


def _reference_decode(word: int, bits: int) -> list[complex]:
    """Literal transcription of decode_samples_one_channel
    (labsat23_source.cc:360-433) for one int16."""
    bs = [((word & 0xFFFF) >> i) & 1 for i in range(16)]
    out = []
    if bits == 2:
        for i in range(8):
            c = complex(float(bs[15 - 2 * i]), float(bs[14 - 2 * i]))
            out.append(c * 2 - complex(1, 1))
    else:
        for i in range(4):
            if bs[15 - 4 * i]:
                re = -1.0 if bs[13 - 4 * i] else -2.0
            else:
                re = 2.0 if bs[13 - 4 * i] else 1.0
            if bs[14 - 4 * i]:
                im = -1.0 if bs[12 - 4 * i] else -2.0
            else:
                im = 2.0 if bs[12 - 4 * i] else 1.0
            out.append(complex(re, im))
    return out


@pytest.mark.parametrize("bits", [2, 4])
def test_payload_decode_matches_reference_mapping(bits):
    rng = np.random.default_rng(3)
    words = rng.integers(-32768, 32768, 64, dtype=np.int64).astype(np.int16)
    got = decode_labsat_payload(words, bits)
    ref = np.concatenate(
        [_reference_decode(int(w), bits) for w in words])
    np.testing.assert_allclose(got, ref)


@pytest.mark.parametrize("bits", [2, 4])
def test_container_roundtrip(tmp_path, bits):
    rng = np.random.default_rng(5)
    n = 4096
    x = (rng.choice([-2.0, -1.0, 1.0, 2.0], n)
         + 1j * rng.choice([-2.0, -1.0, 1.0, 2.0], n))
    path = tmp_path / "cap.ls3"
    write_labsat_file(str(path), x, bits_per_sample=bits)
    src = LabsatSignalSource(str(path), sampling_frequency=16.368e6)
    assert src.header.version == 3
    assert src.header.bits_per_sample == bits
    assert src.n_samples == n
    got = src.read(0, n)
    if bits == 2:
        np.testing.assert_allclose(np.sign(got.real), np.sign(x.real))
        np.testing.assert_allclose(np.sign(got.imag), np.sign(x.imag))
    else:
        np.testing.assert_allclose(got.real, x.real)
        np.testing.assert_allclose(got.imag, x.imag)
    # windowed reads hit the same samples
    np.testing.assert_allclose(src.read(13, 100), got[13:113])


def test_header_rejections(tmp_path):
    bad = tmp_path / "bad.ls3"
    bad.write_bytes(b"\x01" * 64)
    with pytest.raises(ValueError, match="preamble"):
        parse_labsat_header(bad.read_bytes())
    # dual-channel rejected like the reference's non-FPGA path
    rng = np.random.default_rng(0)
    x = rng.choice([-1.0, 1.0], 64) + 1j * rng.choice([-1.0, 1.0], 64)
    p = tmp_path / "dual.ls3"
    write_labsat_file(str(p), x, channel_selector=0)
    with pytest.raises(ValueError, match="dual-channel"):
        LabsatSignalSource(str(p))


def test_factory_accepts_labsat(tmp_path):
    from gnss_sdr_tpu.config import InMemoryConfiguration
    from gnss_sdr_tpu.receiver.factory import make_signal_source

    rng = np.random.default_rng(1)
    x = rng.choice([-1.0, 1.0], 256) + 1j * rng.choice([-1.0, 1.0], 256)
    path = tmp_path / "cap.ls3"
    write_labsat_file(str(path), x)
    config = InMemoryConfiguration()
    config.set_property("SignalSource.implementation",
                        "Labsat_Signal_Source")
    config.set_property("SignalSource.filename", str(path))
    config.set_property("GNSS-SDR.internal_fs_sps", "16368000")
    src = make_signal_source(config)
    assert isinstance(src, LabsatSignalSource)
    assert src.n_samples == 256
