"""Anderson acceleration (type-II) direction for SuperMann.

Counterpart of ``anderson!`` (``/root/reference/src/model_algorithms/
qnewton_directions/anderson.jl``): window-m history of residual differences
``dR`` and ``dP = dZ - dR``; direction

    d = -r - dP^T gamma,   gamma = argmin || dR^T gamma - r ||_2.

TPU-motivated departures from the reference:

* **History = tuple of m separate [B, K] rows** (not a [B, m, K] tensor and
  not shifted): [B, m, K] puts m = 3 in the sublane dim (padded to 8) and
  lowers the Gram computation to a degenerate batched matmul; separate rows
  keep clean [B, K] layouts, the Gram/projection reductions fuse into single
  passes, and the ring update rebinds one row instead of copying the buffer.
  Row order is irrelevant to the least-squares solve.
* **Normal equations, not incremental QR**: a tiny m x m system per lane
  with Tikhonov regularization; accuracy differences are absorbed by
  SuperMann's K1/K2 safeguards.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_rows(B: int, K: int, m: int, dtype) -> Tuple:
    return tuple(jnp.zeros((B, K), dtype) for _ in range(m))


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
    """Pytree-native variant of :func:`direction`: history rows and the
    residual are pytrees; no flatten/unflatten passes are materialized.

    vdot_fn(a, b) -> [B] per-lane inner product over a row pytree.
    Returns the direction as a pytree of the row structure.
    """
    import jax.numpy as jnp
    from ..zv import tmap

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


def direction(MR: Tuple, MP: Tuple, r_flat):
    """d_flat = -r - sum_i gamma_i MP_i with gamma from regularized normal
    equations over the MR rows.  MR/MP: tuples of [B, K]; r_flat: [B, K]."""
    m = len(MR)
    dtype = r_flat.dtype
    # Gram matrix + rhs — one fused pass over the rows
    G = jnp.stack(
        [
            jnp.stack(
                [jnp.sum(MR[i] * MR[j], axis=-1) for j in range(m)], axis=-1
            )
            for i in range(m)
        ],
        axis=-2,
    )  # [B, m, m]
    c = jnp.stack(
        [jnp.sum(MR[i] * r_flat, axis=-1) for i in range(m)], axis=-1
    )  # [B, m]
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = jnp.asarray(1e-10, dtype) * (tr[:, None, None] / m) + jnp.asarray(
        1e-30, dtype
    )
    Greg = G + eps * jnp.eye(m, dtype=dtype)
    gamma = jnp.linalg.solve(Greg, c[..., None])[..., 0]  # [B, m]
    d = -r_flat
    for i in range(m):
        d = d - gamma[:, i : i + 1] * MP[i]
    return d
