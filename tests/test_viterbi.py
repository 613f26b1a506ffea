"""Viterbi decoder tests: encode -> (noisy) soft symbols -> decode."""

import numpy as np

from gnss_sdr_tpu.telemetry.viterbi import ViterbiDecoder, encode_conv


def _roundtrip(nbits, seed, noise_sigma=0.0, g=(121, 91)):
    rng = np.random.default_rng(seed)
    info = rng.integers(0, 2, nbits)
    tail = np.zeros(6, dtype=np.int64)
    coded = encode_conv(np.concatenate([info, tail]), kk=7, g=g)
    soft = 1.0 - 2.0 * coded.astype(np.float64)
    if noise_sigma > 0:
        soft = soft + rng.normal(0, noise_sigma, soft.shape)
    dec = ViterbiDecoder(kk=7, nn=2, g=g)
    out = dec.decode(soft, terminated=True)
    return info, out[:nbits]


def test_noiseless_roundtrip():
    info, out = _roundtrip(120, seed=0)
    np.testing.assert_array_equal(info, out)


def test_noisy_roundtrip():
    # sigma=0.6 on +-1 symbols ~ 4.4 dB Eb/N0 at rate 1/2: K=7 Viterbi
    # decodes error-free with very high probability for short blocks
    errors = 0
    for seed in range(5):
        info, out = _roundtrip(120, seed=seed, noise_sigma=0.6)
        errors += np.count_nonzero(info != out)
    assert errors == 0


def test_galileo_polynomials():
    # (121, 91) decimal == (171, 133) octal, the CCSDS pair used by
    # Galileo I/NAV (galileo_telemetry_decoder_gs.cc:147-149)
    assert 121 == 0o171 and 91 == 0o133
    info, out = _roundtrip(240, seed=3, noise_sigma=0.4)
    np.testing.assert_array_equal(info, out)


def test_unterminated_decode():
    rng = np.random.default_rng(9)
    info = rng.integers(0, 2, 100)
    coded = encode_conv(info)
    soft = 1.0 - 2.0 * coded.astype(np.float64)
    dec = ViterbiDecoder()
    out = dec.decode(soft, terminated=False)
    # all but the last few constrained bits must match
    np.testing.assert_array_equal(info[:-7], out[:-7])
