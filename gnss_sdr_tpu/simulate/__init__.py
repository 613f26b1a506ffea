"""Synthetic GNSS IF signal generation (test oracle).

Counterpart of the reference's in-graph simulator
(/root/reference/src/algorithms/signal_generator/gnuradio_blocks/
signal_generator_c.h:53-130): per-PRN code + Doppler + delay + C/N0 with
BPSK modulation and AWGN, used as ground truth for acquisition/tracking/
telemetry tests.
"""

from gnss_sdr_tpu.simulate.generator import SatelliteParams, generate_gps_l1ca

__all__ = ["SatelliteParams", "generate_gps_l1ca"]
