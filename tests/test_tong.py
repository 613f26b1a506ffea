"""Tong sequential-detection acquisition tests
(pcps_tong_acquisition_cc.cc counterpart)."""

import numpy as np

from gnss_sdr_tpu.acquisition import AcqConfig, TongAcquisition
from gnss_sdr_tpu.acquisition.adapters import gps_l1ca_replicas
from gnss_sdr_tpu.codes import gps_l1ca_code, sample_code

FS = 4.0e6
SAMPLES_PER_CODE = 4000


def _cfg(**kw):
    base = dict(fs=FS, samples_per_code=SAMPLES_PER_CODE,
                code_length_chips=1023, ms_per_code=1,
                doppler_max=5000.0, doppler_step=250.0)
    base.update(kw)
    return AcqConfig(**base)


def _signal(prn, delay, doppler, n_ms, cn0_db=45.0, seed=3):
    rng = np.random.default_rng(seed)
    n = int(FS * n_ms * 1e-3)
    code = sample_code(gps_l1ca_code(prn), FS, 1.023e6)
    chips = np.roll(np.tile(code, n_ms + 1), delay)[:n]
    t = np.arange(n) / FS
    sig = chips * np.exp(2j * np.pi * doppler * t)
    sigma = np.sqrt(FS / (2 * 10 ** (cn0_db / 10)))
    return (sig + sigma * (rng.standard_normal(n)
                           + 1j * rng.standard_normal(n))
            ).astype(np.complex64)


def _threshold_between(present_stat, absent_stat):
    return 0.5 * (present_stat + absent_stat)


def test_tong_counts_up_to_positive_and_down_to_negative():
    prn_in, prn_out = 5, 11
    delay, doppler = 812, -1750.0
    x = _signal(prn_in, delay, doppler, n_ms=8)

    codes = gps_l1ca_replicas([prn_in, prn_out], FS, 1)
    cfg = _cfg()
    # calibrate the absolute threshold between the one-dwell peaks of the
    # present and absent PRN (the reference leaves .threshold as a knob)
    probe = TongAcquisition(cfg, codes, threshold=np.inf,
                            tong_max_dwells=100)
    probe.process_dwell(x[:cfg.consumed_samples])
    import jax.numpy as jnp
    peaks = np.asarray(jnp.max(probe._grid_acc.reshape(2, -1), axis=-1))
    row_in = probe.prns.index(prn_in)
    thr = _threshold_between(peaks[row_in], peaks[1 - row_in])

    acq = TongAcquisition(cfg, codes, tong_init_val=1, tong_max_val=2,
                          tong_max_dwells=10, threshold=thr)
    results = acq.search(x)
    assert results[prn_in].positive
    assert not results[prn_out].positive
    # positive after one up-count from init=1 -> 2 dwells minimum
    assert acq.dwell_count <= 4
    err_delay = abs(results[prn_in].delay_samples - delay)
    assert min(err_delay, SAMPLES_PER_CODE - err_delay) < 2.0
    assert abs(results[prn_in].doppler_hz - doppler) <= cfg.doppler_step


def test_tong_max_dwells_forces_negative():
    # near-threshold noise flips the counter around init: the max-dwell
    # cap must terminate with a negative verdict
    codes = gps_l1ca_replicas([7], FS, 1)
    cfg = _cfg()
    rng = np.random.default_rng(9)
    n = cfg.consumed_samples * 6
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
    acq = TongAcquisition(cfg, codes, tong_init_val=2, tong_max_val=1000,
                          tong_max_dwells=3, threshold=0.0)
    results = acq.search(noise)
    # threshold 0 -> every dwell counts up, but tong_max_val unreachable
    # before the dwell cap -> forced negative at dwell 3
    assert acq.dwell_count == 3
    assert 7 in results and not results[7].positive


def test_tong_reset_restores_initial_state():
    codes = gps_l1ca_replicas([3], FS, 1)
    cfg = _cfg()
    acq = TongAcquisition(cfg, codes, threshold=1e12, tong_max_dwells=5)
    x = _signal(3, 100, 500.0, n_ms=2)
    acq.process_dwell(x[:cfg.consumed_samples])
    assert acq.dwell_count == 1 and acq.tong_count[3] == 0
    acq.reset()
    assert acq.dwell_count == 0
    assert acq.tong_count[3] == acq.tong_init_val
    assert acq._grid_acc is None and not acq.decided
