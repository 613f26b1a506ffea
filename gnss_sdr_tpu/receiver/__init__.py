"""Receiver control plane (reference layers L1/L2).

Host-side state machines and scheduling that replace the reference's
ControlThread + GNSSFlowgraph + pmt event queues
(/root/reference/src/core/receiver/control_thread.cc, gnss_flowgraph.cc):
decisions happen between device block-steps as plain function calls.
"""

from gnss_sdr_tpu.receiver.fsm import ChannelState
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

__all__ = ["ChannelState", "Receiver", "ReceiverConfig"]
