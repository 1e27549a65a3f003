"""Anderson acceleration (type-II) direction for SuperMann.

Counterpart of ``anderson!`` (``/root/reference/src/model_algorithms/
qnewton_directions/anderson.jl``): window-m history of residual differences
``dR`` and ``dP = dZ - dR``; direction

    d = -r - dP^T gamma,   gamma = argmin || dR^T gamma - r ||_2.

TPU-motivated departures from the reference:

* **History = tuple of m pytree rows** (not a shifted [B, m, K] tensor):
  separate rows keep clean per-leaf layouts, the Gram/projection reductions
  fuse into single passes with no flatten/unflatten, and the ring update
  rebinds one row instead of copying the buffer.  Row order is irrelevant
  to the least-squares solve.
* **Normal equations, not incremental QR**: a tiny m x m system per lane
  with Tikhonov regularization; accuracy differences are absorbed by
  SuperMann's K1/K2 safeguards.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..zv import tmap


def direction_flat(MR, MP, r):
    """Flat-history Anderson direction.

    MR/MP: [B, m, K] histories (rows in arbitrary order); r: [B, K].
    Returns d = -r - gamma' MP with gamma from regularized normal equations
    — one einsum Gram instead of m^2 separate tree reductions, and the
    caller updates history rows with one dynamic_update_slice instead of a
    lax.switch over tuple rebinds (which XLA copies inside while-loop
    carries).
    """
    m = MR.shape[1]
    dtype = MR.dtype
    G = jnp.einsum("bmk,bnk->bmn", MR, MR)
    c = jnp.einsum("bmk,bk->bm", MR, r)
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = jnp.asarray(1e-10, dtype) * (tr[:, None, None] / m) + jnp.asarray(
        1e-30, dtype
    )
    gamma = jnp.linalg.solve(G + eps * jnp.eye(m, dtype=dtype), c[..., None])[
        ..., 0
    ]  # [B, m]
    return -r - jnp.einsum("bm,bmk->bk", gamma, MP)


def write_slot(rows: Tuple, col, slot):
    """Functionally replace ring slot ``slot`` (traced scalar) with ``col``.

    ``rows`` is a tuple of arbitrary (matching) pytrees; ``col`` a pytree of
    the same structure as each row."""
    m = len(rows)
    branches = [
        (lambda i: lambda ops: ops[1][:i] + (ops[0],) + ops[1][i + 1 :])(i)
        for i in range(m)
    ]
    return jax.lax.switch(slot, branches, (col, rows))


def direction_tree(MR: Tuple, MP: Tuple, r_tree, vdot_fn):
    """d = -r - sum_i gamma_i MP_i with gamma from regularized normal
    equations over the MR rows.

    MR/MP: tuples of pytree rows; r_tree: residual pytree;
    vdot_fn(a, b) -> [B] per-lane inner product over a row pytree.
    Returns the direction as a pytree of the row structure.
    """
    m = len(MR)
    G = jnp.stack(
        [
            jnp.stack([vdot_fn(MR[i], MR[j]) for j in range(m)], axis=-1)
            for i in range(m)
        ],
        axis=-2,
    )  # [B, m, m]
    c = jnp.stack([vdot_fn(MR[i], r_tree) for i in range(m)], axis=-1)
    dtype = G.dtype
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = jnp.asarray(1e-10, dtype) * (tr[:, None, None] / m) + jnp.asarray(
        1e-30, dtype
    )
    gamma = jnp.linalg.solve(G + eps * jnp.eye(m, dtype=dtype), c[..., None])[
        ..., 0
    ]  # [B, m]

    def combine(*leaves):
        # leaves: (r_leaf, MP_0_leaf, ..., MP_{m-1}_leaf)
        r_leaf = leaves[0]
        out = -r_leaf
        for i in range(m):
            g = gamma[:, i].reshape((-1,) + (1,) * (r_leaf.ndim - 1))
            out = out - g * leaves[1 + i]
        return out

    return tmap(combine, r_tree, *MP)
