"""Telemetry decoders (reference layer L4 telemetry_decoder + L6 parsers).

Nav-message decoding is branchy bit logic at ~50 bit/s per channel —
negligible compute — so it runs host-side in NumPy while symbol integration
stays on device (SURVEY.md section 7 "hard parts").
"""

from gnss_sdr_tpu.telemetry.gps_lnav import (
    GpsLnavDecoder,
    check_word,
    encode_word,
    parse_subframe,
)
from gnss_sdr_tpu.telemetry.reed_solomon import ReedSolomon
from gnss_sdr_tpu.telemetry.galileo_cnav import GalileoCnavDecoder, HasPage
from gnss_sdr_tpu.telemetry.galileo_has import HasData, HasMessageReceiver
from gnss_sdr_tpu.telemetry.tlm_crc_stats import TlmCrcStats

__all__ = [
    "GpsLnavDecoder", "check_word", "encode_word", "parse_subframe",
    "ReedSolomon", "GalileoCnavDecoder", "HasPage", "HasData",
    "HasMessageReceiver", "TlmCrcStats",
]
