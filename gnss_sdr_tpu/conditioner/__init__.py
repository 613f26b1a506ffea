"""Signal conditioner (reference layer L4, conditioner role).

DataTypeAdapter -> InputFilter -> Resampler chain
(/root/reference/src/algorithms/conditioner/adapters/signal_conditioner.cc).
Type adaptation happens at ingest (gnss_sdr_tpu.sources); the filter and
resampler stages are planar-complex device ops here.
"""

from gnss_sdr_tpu.conditioner.fir import (
    design_lowpass_taps,
    fir_filter,
    freq_xlating_fir_filter,
)
from gnss_sdr_tpu.conditioner.resampler import direct_resample_indices, mmse_resample

__all__ = [
    "design_lowpass_taps",
    "fir_filter",
    "freq_xlating_fir_filter",
    "direct_resample_indices",
    "mmse_resample",
]
