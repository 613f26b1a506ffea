"""Observables computation (reference layer L4, observables role)."""

from gnss_sdr_tpu.observables.observables import (
    ChannelEpoch,
    ObservablesEngine,
)

__all__ = ["ChannelEpoch", "ObservablesEngine"]
