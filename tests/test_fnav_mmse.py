"""F/NAV transport + MMSE resampler tests."""

import numpy as np

from gnss_sdr_tpu.telemetry.galileo_fnav import (
    GalileoFnavDecoder,
    build_page,
    check_page,
    encode_page_symbols,
)


def test_fnav_page_roundtrip_and_streaming():
    rng = np.random.default_rng(0)
    pages = [build_page((k % 6) + 1, rng.integers(0, 2, 208))
             for k in range(5)]
    ok, f = check_page(pages[0])
    assert ok and f["page_type"] == 1
    bad = pages[0].copy()
    bad[60] ^= 1
    assert not check_page(bad)[0]

    sym = np.concatenate([encode_page_symbols(p) for p in pages]) * 700.0
    sym = sym + rng.normal(0, 150.0, sym.shape)
    sym = -sym[9:]
    dec = GalileoFnavDecoder()
    for i, s in enumerate(sym):
        dec.feed(s, sample_stamp=16368 * i)
    types = [p.page_type for p in dec.pages]
    assert len(types) >= 3
    assert types[0] in (1, 2)


def test_mmse_resampler_fractional_rate():
    from gnss_sdr_tpu.conditioner.resampler import mmse_resample
    from gnss_sdr_tpu.ops.cplx import from_complex, to_complex

    fs_in, fs_out = 4.0e6, 2.5e6
    n = 8000
    t = np.arange(n) / fs_in
    x = np.exp(2j * np.pi * 123e3 * t).astype(np.complex64)
    y = to_complex(mmse_resample(from_complex(x), fs_in, fs_out))
    assert abs(y.shape[0] - int(n * fs_out / fs_in)) <= 1
    ph = np.unwrap(np.angle(y[50:-50]))
    freq = np.mean(np.diff(ph)) * fs_out / (2 * np.pi)
    assert abs(freq - 123e3) < 300.0
    # linear interpolation beats nearest-sample: small residual error
    t_out = np.arange(y.shape[0]) / fs_out
    ref = np.exp(2j * np.pi * 123e3 * t_out)
    err = np.mean(np.abs(y[50:-50] - ref[50:-50]) ** 2)
    assert err < 1e-2
