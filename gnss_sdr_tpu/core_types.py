"""Inter-stage data records.

:class:`GnssSynchro` mirrors the reference's inter-block sample struct
(/root/reference/src/core/system_parameters/gnss_synchro.h:38-90), including
the fork-added ``EVM`` indicator field (gnss_synchro.h:84). Host-side
scalar record; the device pipeline carries the same quantities as arrays.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class GnssSynchro:
    # Satellite and signal info
    system: str = ""          # "G", "E", "R", "C", "S"
    signal: str = ""          # two-char signal suffix, e.g. "1C"
    prn: int = 0
    channel_id: int = -1

    # Acquisition
    acq_delay_samples: float = 0.0
    acq_doppler_hz: float = 0.0
    acq_samplestamp_samples: int = 0
    acq_doppler_step: float = 0.0
    flag_valid_acquisition: bool = False

    # Tracking
    fs: float = 0.0
    prompt_i: float = 0.0
    prompt_q: float = 0.0
    cn0_db_hz: float = 0.0
    carrier_doppler_hz: float = 0.0
    carrier_phase_rads: float = 0.0
    code_phase_samples: float = 0.0
    tracking_sample_counter: int = 0
    flag_valid_symbol_output: bool = False
    correlation_length_ms: int = 1
    evm: float = 0.0          # fork addition: error-vector-magnitude indicator

    # Telemetry decoder
    flag_valid_word: bool = False
    tow_at_current_symbol_ms: int = 0

    # Observables
    pseudorange_m: float = 0.0
    rx_time: float = 0.0
    flag_valid_pseudorange: bool = False
    interp_tow_ms: float = 0.0
