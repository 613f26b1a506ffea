import numpy as np
import pytest

from gnss_sdr_tpu.sources import (
    FileSignalSource,
    unpack_2bit_samples,
    unpack_byte_2bit_cpx_samples,
)
from tests.conftest import reference_sample_file


def _write(tmp_path, name, arr):
    path = tmp_path / name
    arr.tofile(path)
    return path


def test_gr_complex_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=100) + 1j * rng.normal(size=100)).astype(np.complex64)
    interleaved = np.empty(200, dtype=np.float32)
    interleaved[0::2] = x.real
    interleaved[1::2] = x.imag
    path = _write(tmp_path, "c64.dat", interleaved)
    src = FileSignalSource(path, 4e6, "gr_complex")
    assert src.n_samples == 100
    np.testing.assert_allclose(src.read(), x)


def test_ishort_conversion(tmp_path):
    raw = np.array([100, -200, 300, -400], dtype=np.int16)
    path = _write(tmp_path, "is.dat", raw)
    src = FileSignalSource(path, 4e6, "ishort")
    out = src.read()
    np.testing.assert_allclose(out, [100 - 200j, 300 - 400j])


def test_ibyte_and_limits(tmp_path):
    raw = np.arange(-8, 8, dtype=np.int8)  # 8 complex samples
    path = _write(tmp_path, "ib.dat", raw)
    src = FileSignalSource(path, 4e6, "ibyte", samples=5)
    assert src.n_samples == 5
    out = src.read()
    assert out.shape == (5,)
    np.testing.assert_allclose(out[0], -8 - 7j)


def test_real_short(tmp_path):
    raw = np.array([1, -2, 3], dtype=np.int16)
    path = _write(tmp_path, "s.dat", raw)
    src = FileSignalSource(path, 4e6, "short")
    np.testing.assert_allclose(src.read(), [1 + 0j, -2 + 0j, 3 + 0j])


def test_blocks_overlap_and_padding(tmp_path):
    x = np.arange(10, dtype=np.float32)
    path = _write(tmp_path, "f.dat", x)
    src = FileSignalSource(path, 1e6, "float")
    blocks = list(src.blocks(block_samples=4, overlap=2))
    assert len(blocks) == 3
    np.testing.assert_allclose(blocks[0].real, [0, 1, 2, 3, 4, 5])
    np.testing.assert_allclose(blocks[1].real, [4, 5, 6, 7, 8, 9])
    np.testing.assert_allclose(blocks[2].real, [8, 9, 0, 0, 0, 0])  # padded


def test_skip_seconds(tmp_path):
    x = np.arange(10, dtype=np.float32)
    path = _write(tmp_path, "f2.dat", x)
    src = FileSignalSource(path, 2.0, "float", seconds_to_skip=2.0)
    assert src.n_samples == 6
    assert src.read()[0] == 4.0


def test_unknown_item_type(tmp_path):
    path = _write(tmp_path, "x.dat", np.zeros(4, dtype=np.int8))
    with pytest.raises(ValueError):
        FileSignalSource(path, 1e6, "int4")


def test_unpack_2bit():
    # byte 0b01_11_00_10 -> fields lsb-first: 2(-2), 0, 3(-1), 1
    out = unpack_2bit_samples(np.array([0b01110010], dtype=np.uint8))
    np.testing.assert_array_equal(out, [-2, 0, -1, 1])


def test_unpack_2bit_cpx():
    out = unpack_byte_2bit_cpx_samples(np.array([0b01110010], dtype=np.uint8))
    np.testing.assert_allclose(out, [-2 + 0j, -1 + 1j])
    out_rev = unpack_byte_2bit_cpx_samples(
        np.array([0b01110010], dtype=np.uint8), reverse_interleaving=True
    )
    np.testing.assert_allclose(out_rev, [0 - 2j, 1 - 1j])


def test_reference_fixture_loads_if_available():
    path = reference_sample_file("GPS_L1_CA_ID_1_Fs_4Msps_2ms.dat")
    if path is None:
        pytest.skip("reference fixtures not mounted")
    src = FileSignalSource(path, 4e6, "gr_complex")
    assert src.n_samples == 8000  # 2 ms at 4 Msps
    x = src.read()
    assert np.isfinite(x).all() and np.abs(x).max() > 0
