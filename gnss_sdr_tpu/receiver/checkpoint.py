"""Receiver checkpoint / resume.

Extends the reference's persistence model (assistance XML only,
SURVEY.md section 5.4) to the full receiver: channel assignments, device
tracking state, decoder-independent navigation context (ephemerides) and
the stream position — enough to stop a receiver and resume it on the same
stream (or hot-start on a new one) without re-acquisition.
"""

from __future__ import annotations

import json
import os

import numpy as np

from gnss_sdr_tpu.receiver.assistance import (
    load_ephemeris_xml,
    save_ephemeris_xml,
)
from gnss_sdr_tpu.receiver.fsm import ChannelState


def save_receiver(receiver, directory: str | os.PathLike) -> str:
    """Snapshot a Receiver into a directory (npz + xml + json)."""
    directory = str(directory)
    os.makedirs(directory, exist_ok=True)
    state = receiver.tracking.state
    arrays = {f"trk_{name}": np.asarray(v)
              for name, v in zip(state._fields, state)}
    arrays["acc_carrier_phase_rad"] = receiver.tracking.acc_carrier_phase_rad
    arrays["code_tables"] = receiver.tracking._code_tables
    np.savez(os.path.join(directory, "tracking_state.npz"), **arrays)
    save_ephemeris_xml(receiver.ephemerides,
                       os.path.join(directory, "gps_ephemeris.xml"))
    meta = dict(
        abs_block_start=receiver.tracking.abs_block_start,
        prn=list(receiver.tracking.prn),
        channel_states=[f.state.name for f in receiver.fsms],
        channel_prns=[f.prn for f in receiver.fsms],
        sat_pool=list(receiver.sat_pool),
        n_solutions=len(receiver.solutions),
    )
    with open(os.path.join(directory, "receiver.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    return directory


def load_receiver(receiver, directory: str | os.PathLike) -> None:
    """Restore a snapshot into a freshly constructed, same-config
    Receiver."""
    import jax.numpy as jnp

    directory = str(directory)
    data = np.load(os.path.join(directory, "tracking_state.npz"))
    state = receiver.tracking.state
    fields = {}
    for name, old in zip(state._fields, state):
        arr = data[f"trk_{name}"]
        fields[name] = jnp.asarray(arr.astype(np.asarray(old).dtype))
    receiver.tracking.state = type(state)(**fields)
    receiver.tracking.acc_carrier_phase_rad = data["acc_carrier_phase_rad"]
    receiver.tracking._code_tables = data["code_tables"]
    receiver.tracking._code_tables_dev = jnp.asarray(data["code_tables"])
    receiver.ephemerides.update(load_ephemeris_xml(
        os.path.join(directory, "gps_ephemeris.xml")))
    with open(os.path.join(directory, "receiver.json")) as fh:
        meta = json.load(fh)
    receiver.tracking.abs_block_start = meta["abs_block_start"]
    receiver.tracking.prn = list(meta["prn"])
    import collections

    receiver.sat_pool = collections.deque(meta["sat_pool"])
    for fsm, st_name, prn in zip(receiver.fsms, meta["channel_states"],
                                 meta["channel_prns"]):
        fsm.state = ChannelState[st_name]
        fsm.prn = prn
