"""Per-signal acquisition factories.

Counterparts of the reference's acquisition adapters
(/root/reference/src/algorithms/acquisition/adapters/
gps_l1_ca_pcps_acquisition.cc:145-165 etc.): generate the sampled PRN
replicas for a signal and configure the shared PCPS engine from a
``Configuration`` role section (Acq_Conf::SetFromConfiguration semantics,
acq_conf.cc).
"""

from __future__ import annotations

import numpy as np

from gnss_sdr_tpu.acquisition.pcps import AcqConfig, PcpsAcquisition
from gnss_sdr_tpu.codes import gps_l1ca_code, sample_code
from gnss_sdr_tpu.config import Configuration
from gnss_sdr_tpu.constants import get_signal


def acq_config_from(
    config: Configuration, role: str, fs: float, signal_suffix: str
) -> AcqConfig:
    """Read ``role.*`` keys into an AcqConfig (acq_conf.cc defaults)."""
    sig = get_signal(signal_suffix)
    samples_per_code = sig.samples_per_code(fs)
    return AcqConfig(
        fs=fs,
        samples_per_code=samples_per_code,
        code_length_chips=sig.code_length_chips,
        ms_per_code=int(round(sig.code_period_ms)),
        doppler_max=float(config.property(f"{role}.doppler_max", 5000)),
        doppler_step=float(config.property(f"{role}.doppler_step", 500)),
        doppler_center=float(config.property(f"{role}.doppler_center", 0)),
        sampled_ms=config.property(
            f"{role}.coherent_integration_time_ms", int(round(sig.code_period_ms))
        ),
        max_dwells=config.property(f"{role}.max_dwells", 1),
        pfa=config.property(f"{role}.pfa", 0.0),
        threshold=config.property(f"{role}.threshold", 0.0),
        bit_transition_flag=config.property(f"{role}.bit_transition_flag", False),
        use_cfar=config.property(f"{role}.use_CFAR_algorithm", True),
        make_2_steps=config.property(f"{role}.make_two_steps", False),
        doppler_step2=float(config.property(f"{role}.second_doppler_step", 125)),
        num_doppler_bins_step2=config.property(f"{role}.second_nbins", 4),
        pfa2=config.property(f"{role}.pfa_second_step", 0.0),
        repeat_steps=config.property(f"{role}.make_repeat_steps", False),
    )


def gps_l1ca_replicas(prns, fs: float, sampled_ms: int = 1) -> dict[int, np.ndarray]:
    """Sampled complex C/A replicas, tiled to the coherent length.

    The reference adapter calls gps_l1_ca_code_gen_complex_sampled and tiles
    it over sampled_ms code periods
    (gps_l1_ca_pcps_acquisition.cc:145-165). The reference stores chips in
    the imaginary part (gps_sdr_signal_replica.cc:117-127); we keep them
    real — only a fixed 90-degree rotation of the correlator output, with
    identical magnitudes.
    """
    out = {}
    for prn in prns:
        one = sample_code(gps_l1ca_code(prn), fs, 1.023e6).astype(np.complex64)
        out[prn] = np.tile(one, sampled_ms)
    return out


def galileo_e1_replicas(
    prns, fs: float, component: str = "B", cboc: bool = True,
) -> dict[int, np.ndarray]:
    """Sampled CBOC/sinBOC E1 replicas over one 4 ms code period
    (Galileo_E1_PCPS_Ambiguous_Acquisition adapter semantics,
    /root/reference/src/algorithms/acquisition/adapters/
    galileo_e1_pcps_ambiguous_acquisition.cc)."""
    from gnss_sdr_tpu.codes.galileo_e1 import galileo_e1_sampled

    return {
        prn: galileo_e1_sampled(prn, fs, component, cboc).astype(np.complex64)
        for prn in prns
    }


def make_galileo_e1_acquisition(
    prns,
    fs: float,
    config: Configuration | None = None,
    role: str = "Acquisition_1B",
    component: str = "B",
    cboc: bool = True,
    **overrides,
) -> PcpsAcquisition:
    """Galileo E1 PCPS acquisition (4 ms coherent by default)."""
    if config is not None:
        cfg = acq_config_from(config, role, fs, "1B")
    else:
        sig = get_signal("1B")
        cfg = AcqConfig(
            fs=fs,
            samples_per_code=sig.samples_per_code(fs),
            code_length_chips=sig.code_length_chips,
            ms_per_code=4,
            sampled_ms=4,
            doppler_step=125.0,
        )
    for key, value in overrides.items():
        setattr(cfg, key, value)
    codes = galileo_e1_replicas(prns, fs, component, cboc)
    return PcpsAcquisition(cfg, codes)


def make_gps_l1ca_acquisition(
    prns,
    fs: float,
    config: Configuration | None = None,
    role: str = "Acquisition_1C",
    **overrides,
) -> PcpsAcquisition:
    """GPS L1 C/A PCPS acquisition for a set of PRNs."""
    if config is not None:
        cfg = acq_config_from(config, role, fs, "1C")
    else:
        sig = get_signal("1C")
        cfg = AcqConfig(
            fs=fs,
            samples_per_code=sig.samples_per_code(fs),
            code_length_chips=sig.code_length_chips,
            ms_per_code=1,
        )
    for key, value in overrides.items():
        setattr(cfg, key, value)
    codes = gps_l1ca_replicas(prns, fs, cfg.sampled_ms)
    return PcpsAcquisition(cfg, codes)
