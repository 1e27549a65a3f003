"""Multi-chip / multi-host scaling of batched solves.

The reference is single-process single-thread (SURVEY.md §2.2); the TPU
build's distribution model is:

* **dp axis ("batch")** — independent MPC solves sharded across chips.  Each
  lane's solve state never leaves its shard; the only cross-chip traffic is
  the all-lanes-done reduction inside the termination while_loop, which XLA
  lowers to an ICI all-reduce automatically under jit-with-shardings.
* **node axis** — for single trees too large for one chip, the stage-major
  node dimension of every iterate can additionally be sharded (leaf-heavy
  stages dominate); parent/child reshapes then induce ICI collective
  permutes.  (Planned; the dp axis is the primary production path.)

Multi-host: call :func:`init_distributed` once per process, then build the
mesh over ``jax.devices()`` as usual — DCN-backed collectives are inserted by
XLA where the mesh spans hosts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize JAX's multi-host runtime (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Sharding that splits the leading (lane) dim of an array."""
    return NamedSharding(mesh, P(axis))


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place every leaf of a batched pytree with its lane dim sharded."""

    def place(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    """Replicate problem data on every device of the mesh."""

    def place(a):
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)
