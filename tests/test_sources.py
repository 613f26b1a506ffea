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


def test_vendor_unpackers_match_reference_bit_semantics():
    """Nsr 2-bit, 4-bit, SPIR 1-bit and SPIR GSS6450 unpackers against
    direct transliterations of the reference work() loops
    (unpack_byte_2bit_samples.cc, unpack_byte_4bit_samples.cc,
    unpack_intspir_1bit_samples.cc, unpack_spir_gss6450_samples.cc)."""
    import numpy as np

    from gnss_sdr_tpu.sources.unpack import (
        unpack_byte_2bit_real,
        unpack_byte_4bit,
        unpack_intspir_1bit,
        unpack_spir_gss6450,
    )

    def ref_2bit(bts):
        out = []
        for c in bts:
            c = int(c)
            for sh in (0, 2, 4, 6):
                v = (c >> sh) & 3
                out.append(v - 4 if v >= 2 else v)
        return np.array(out, np.float32)

    def ref_4bit(bts):
        out = []
        for c in bts:
            c = int(c)
            for v in (c & 0x0F, (c >> 4) & 0x0F):
                out.append(2 * (v - 16) + 1 if v >= 8 else 2 * v + 1)
        return np.array(out, np.int8)

    def ref_spir(ws, ch):
        out = []
        for val in ws:
            val = int(val)
            out.append(32767.0 if ((val >> ((ch - 1) * 2)) & 1)
                       else -32767.0)
            out.append(32767.0 if ((val >> (2 * ch - 1)) & 1)
                       else -32767.0)
        return np.array(out, np.float32)

    def ref_gss(ws, bits):
        res = []
        per = 8 if bits == 2 else 4
        m = 3 if bits == 2 else 0xF
        lim = 2 if bits == 2 else 8
        for u in ws:
            u = int(u) & 0xFFFFFFFF
            buf = [None] * per
            for i in range(per):
                I = u & m
                I = I - 2 * lim if I >= lim else I
                u >>= bits
                Q = u & m
                Q = Q - 2 * lim if Q >= lim else Q
                u >>= bits
                buf[per - 1 - i] = complex(I, Q)
            res.extend(buf)
        return np.array(res, np.complex64)

    rng = np.random.default_rng(0)
    b = rng.integers(0, 256, 64, dtype=np.uint8)
    assert np.array_equal(unpack_byte_2bit_real(b), ref_2bit(b))
    assert np.array_equal(unpack_byte_4bit(b), ref_4bit(b))
    w = rng.integers(-2**31, 2**31, 32, dtype=np.int64)
    for ch in (1, 2):
        assert np.array_equal(unpack_intspir_1bit(w, ch), ref_spir(w, ch))
    u = rng.integers(0, 2**32, 16, dtype=np.uint64)
    for bits in (2, 4):
        assert np.array_equal(unpack_spir_gss6450(u, bits),
                              ref_gss(u, bits))


def test_zmq_signal_source_stream():
    """ZMQ PUSH->PULL sample streaming (ZMQ_Signal_Source role)."""
    import numpy as np
    import zmq

    from gnss_sdr_tpu.sources.live import ZmqSignalSource

    ctx = zmq.Context.instance()
    push = ctx.socket(zmq.PUSH)
    port = push.bind_to_random_port("tcp://127.0.0.1")
    src = ZmqSignalSource(f"tcp://127.0.0.1:{port}", 4e6, pull=True)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
         ).astype(np.complex64)
    push.send(x[:3000].tobytes())
    push.send(x[3000:].tobytes())
    got = src.read_block(4096)
    np.testing.assert_array_equal(got, x[:4096])
    got2 = src.read_block(904)
    np.testing.assert_array_equal(got2, x[4096:])
    src.close()
    push.close(0)
