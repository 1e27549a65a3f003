"""Checkpoint / resume for solver state.

The reference's analogue is implicit warm starting (z/v living in the model
struct, ``models/spock.jl:242-248``).  Here solver state is explicit, so
checkpointing is just (de)serializing the (Primal, Dual) pytrees — useful
for long receding-horizon runs and for migrating warm starts across
processes/hosts.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..zv import Dual, Primal


def save_state(path: str, z: Primal, v: Dual, **extra):
    """Save solver state (and optional extras like x0 / step index) to .npz."""
    payload = {}
    for prefix, tree in [("z", z), ("v", v)]:
        for f in dataclasses.fields(type(tree)):
            val = getattr(tree, f.name)
            if val is not None:
                payload[f"{prefix}.{f.name}"] = np.asarray(val)
    for k, val in extra.items():
        payload[f"extra.{k}"] = np.asarray(val)
    np.savez(path, **payload)


def load_state(path: str):
    """Returns (z, v, extras dict).  Arrays come back as numpy; pass them to
    the solver as-is (jax will ingest them)."""
    data = np.load(path)
    zkw = {
        f.name: None for f in dataclasses.fields(Primal)
    }
    vkw = {f.name: None for f in dataclasses.fields(Dual)}
    extras = {}
    for k in data.files:
        prefix, _, name = k.partition(".")
        if prefix == "z":
            zkw[name] = data[k]
        elif prefix == "v":
            vkw[name] = data[k]
        else:
            extras[name] = data[k]
    return Primal(**zkw), Dual(**vkw), extras
