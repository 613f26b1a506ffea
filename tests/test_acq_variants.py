"""Acquisition implementation-name registry + QuickSync/CCCWSR variants.

Mirrors the reference's per-adapter acquisition tests: every registered
implementation name must instantiate and acquire a synthetic satellite of
its own signal with correct delay/Doppler
(gnss_block_factory.cc:1345-1500 name catalogue).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.acquisition.adapters import (
    ACQ_IMPLEMENTATIONS, make_acquisition, signal_replicas)
from gnss_sdr_tpu.constants import get_signal


def synth_from_replica(replica: np.ndarray, delay: int, doppler: float,
                       fs: float, cn0_db: float = 50.0, seed: int = 3,
                       n_copies: int = 3) -> np.ndarray:
    """Delay+Doppler+AWGN applied to a tiled replica."""
    rng = np.random.default_rng(seed)
    sig = np.roll(np.tile(replica, n_copies), delay)
    n = sig.shape[0]
    t = np.arange(n) / fs
    sigma = np.sqrt(fs / (2 * 10 ** (cn0_db / 10)))
    noise = sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return (sig * np.exp(2j * np.pi * doppler * t) + noise).astype(np.complex64)


# ~2.5x the real-time sample rates keep CPU test time low
_TEST_FS = {
    "1C": 2.048e6, "2S": 1.2e6, "L5": 12.5e6, "1B": 4.092e6,
    "5X": 12.5e6, "7X": 12.5e6, "E6": 10.24e6, "1G": 1.022e6,
    "2G": 1.022e6, "B1": 4.092e6, "B3": 12.5e6,
}

# one representative implementation per (signal, engine) pair; the rest
# share the same construction path and are covered by the registry test
_ACQ_CASES = [
    ("GPS_L1_CA_PCPS_Acquisition", 7),
    ("GPS_L2_M_PCPS_Acquisition", 5),
    ("GPS_L5i_PCPS_Acquisition", 3),
    ("Galileo_E5a_Pcps_Acquisition", 11),
    ("Galileo_E5b_PCPS_Acquisition", 14),
    ("Galileo_E6_PCPS_Acquisition", 2),
    ("GLONASS_L1_CA_PCPS_Acquisition", 4),
    ("BEIDOU_B1I_PCPS_Acquisition", 9),
    ("BEIDOU_B3I_PCPS_Acquisition", 21),
]


def test_registry_instantiates_every_name():
    for name in ACQ_IMPLEMENTATIONS:
        suffix = ACQ_IMPLEMENTATIONS[name][0]
        engine = make_acquisition(name, [1, 2], _TEST_FS[suffix])
        assert engine.prns == [1, 2], name


def test_unknown_name_rejected_with_hint():
    with pytest.raises(ValueError, match="GPS_L1_CA_PCPS_Acquisition"):
        make_acquisition("GPS_L1_CA_PCPS_Acquisitionn", [1], 2.048e6)


@pytest.mark.parametrize("name,prn", _ACQ_CASES)
def test_named_adapter_acquires(name, prn):
    suffix = ACQ_IMPLEMENTATIONS[name][0]
    fs = _TEST_FS[suffix]
    sig = get_signal(suffix)
    engine = make_acquisition(name, [prn], fs, pfa=0.001,
                              doppler_max=3000.0, doppler_step=250.0)
    replica = signal_replicas(suffix, [prn], fs,
                              engine.cfg.sampled_ms)[prn]
    delay = replica.shape[0] // 3
    doppler = 1250.0
    x = synth_from_replica(replica, delay, doppler, fs)
    res = engine.search(x)[prn]
    assert res.positive, f"{name}: no detection (stat {res.test_statistic})"
    spc = fs / sig.chip_rate_cps
    delay_err = abs(res.delay_samples - delay % engine.cfg.samples_per_code)
    delay_err = min(delay_err, engine.cfg.samples_per_code - delay_err)
    assert delay_err < 0.5 * spc, f"{name}: delay error {delay_err}"
    # reference tolerance: 2/(3T) with T the coherent time
    tol = 2.0 / (3.0 * engine.cfg.sampled_ms * 1e-3)
    assert abs(res.doppler_hz - doppler) <= tol + engine.cfg.doppler_step


class TestQuickSync:
    def test_folded_acquisition_resolves_full_delay(self):
        fs = 2.048e6
        engine = make_acquisition("GPS_L1_CA_PCPS_QuickSync_Acquisition",
                                  [17], fs, pfa=0.001, doppler_max=3000.0,
                                  doppler_step=250.0, folding_factor=2)
        assert engine.n_folded == engine.cfg.coherent_samples // 2
        replica = signal_replicas("1C", [17], fs, 1)[17]
        # delay in the SECOND fold half: only resolvable via disambiguation
        delay = engine.n_folded + 137
        x = synth_from_replica(replica, delay, 750.0, fs, cn0_db=55.0)
        res = engine.search(x)[17]
        assert res.positive
        assert abs(res.delay_samples - delay) < 0.5 * fs / 1.023e6

    def test_bad_folding_factor(self):
        with pytest.raises(ValueError, match="divide"):
            make_acquisition("GPS_L1_CA_PCPS_QuickSync_Acquisition",
                             [1], 2.048e6, folding_factor=3)


class TestCccwsr:
    def test_e1_data_plus_pilot_combining(self):
        fs = 4.092e6
        engine = make_acquisition(
            "Galileo_E1_PCPS_CCCWSR_Ambiguous_Acquisition", [19], fs,
            pfa=0.001, doppler_max=3000.0, doppler_step=125.0)
        # received signal: data - pilot combination (opposite sign),
        # the sign-recovery branch must still find the full coherent gain
        data = signal_replicas("1B", [19], fs, 4, "B")[19]
        pilot = signal_replicas("1B", [19], fs, 4, "C")[19]
        combined = (data - pilot) / np.sqrt(2)
        delay = 1234
        x = synth_from_replica(combined, delay, -500.0, fs, cn0_db=50.0)
        res = engine.search(x)[19]
        assert res.positive
        err = abs(res.delay_samples - delay)
        assert min(err, engine.cfg.samples_per_code - err) < 0.5 * fs / 1.023e6
        assert abs(res.doppler_hz - (-500.0)) <= 250.0


def test_e5a_noncoherent_iq_caf_acquisition():
    """Noncoherent I+Q acquisition with CAF Doppler refinement
    (galileo_e5a_noncoherent_iq_acquisition_caf_cc role): acquires an
    E5a QPSK scene and the CAF-refined Doppler is at least as accurate
    as the raw bin."""
    import numpy as np

    from gnss_sdr_tpu.acquisition.adapters import make_acquisition
    from gnss_sdr_tpu.codes.galileo_e5a import galileo_e5a_code

    fs = 12.0e6
    prn = 4
    rng = np.random.default_rng(5)
    ci = galileo_e5a_code(prn, "I").astype(np.float64)
    cq = galileo_e5a_code(prn, "Q").astype(np.float64)
    n = int(fs * 0.004)
    t = np.arange(n) / fs
    delay = 5321
    dopp = 1570.0
    chips = np.floor((np.arange(n) - delay) * 10.23e6 / fs).astype(np.int64)
    x = ((ci[chips % 10230] + 1j * cq[chips % 10230]) / np.sqrt(2.0)
         * np.exp(2j * np.pi * dopp * t))
    x = (x + 0.9 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)

    acq = make_acquisition(
        "Galileo_E5a_Noncoherent_IQ_Acquisition_CAF", [prn], fs,
        doppler_max=4000.0, doppler_step=250.0, pfa=0.001, max_dwells=2,
        caf_window_hz=1000.0)
    res = acq.search(x)[prn]
    assert res.positive, (res.test_statistic, res.threshold)
    assert abs(res.delay_samples - delay) < 2.0, res.delay_samples
    assert abs(res.doppler_hz - dopp) <= 250.0, res.doppler_hz
