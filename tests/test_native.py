"""Native ingest kernels vs NumPy fallback equivalence."""

import numpy as np

from gnss_sdr_tpu import native


def test_native_builds():
    assert native.native_available(), "g++ build of native kernels failed"


def test_ishort_planar():
    raw = np.array([100, -200, 300, -400, 32767, -32768], dtype=np.int16)
    re, im = native.interleaved_to_planar(raw)
    np.testing.assert_allclose(re, [100, 300, 32767])
    np.testing.assert_allclose(im, [-200, -400, -32768])


def test_ibyte_planar():
    raw = np.arange(-6, 6, dtype=np.int8)
    re, im = native.interleaved_to_planar(raw)
    np.testing.assert_allclose(re, raw[0::2].astype(np.float32))
    np.testing.assert_allclose(im, raw[1::2].astype(np.float32))


def test_cfloat_planar():
    rng = np.random.default_rng(0)
    raw = rng.standard_normal(64).astype(np.float32)
    re, im = native.interleaved_to_planar(raw)
    np.testing.assert_allclose(re, raw[0::2])
    np.testing.assert_allclose(im, raw[1::2])


def test_real_short_planar():
    raw = np.array([5, -7, 9], dtype=np.int16)
    re, im = native.real_to_planar(raw)
    np.testing.assert_allclose(re, [5, -7, 9])
    np.testing.assert_allclose(im, 0)


def test_unpack_2bit_matches_python():
    from gnss_sdr_tpu.sources.unpack import unpack_byte_2bit_cpx_samples

    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 257, dtype=np.uint8)
    for rev in (False, True):
        re, im = native.unpack_2bit_cpx_planar(data, reverse_iq=rev)
        ref = unpack_byte_2bit_cpx_samples(data, reverse_interleaving=rev)
        np.testing.assert_allclose(re, ref.real)
        np.testing.assert_allclose(im, ref.imag)


def test_file_source_read_planar(tmp_path):
    from gnss_sdr_tpu.sources import FileSignalSource

    raw = np.array([1, -2, 3, -4], dtype=np.int16)
    path = tmp_path / "x.dat"
    raw.tofile(path)
    src = FileSignalSource(path, 1e6, "ishort")
    re, im = src.read_planar()
    np.testing.assert_allclose(re, [1, 3])
    np.testing.assert_allclose(im, [-2, -4])
