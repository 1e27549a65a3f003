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


def _solve3(A, b):
    """Closed-form batched 3x3 solve via the adjugate (Cramer).

    [B, 3, 3] systems: jnp.linalg.solve lowers to a multi-kernel LU chain on
    TPU; the explicit formula is a handful of fused elementwise ops on [B]
    scalars (measured ~5x cheaper inside the SuperMann body)."""
    a, bb, c = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    d, e, f = A[:, 1, 0], A[:, 1, 1], A[:, 1, 2]
    g, h, i = A[:, 2, 0], A[:, 2, 1], A[:, 2, 2]
    co00 = e * i - f * h
    co01 = f * g - d * i
    co02 = d * h - e * g
    det = a * co00 + bb * co01 + c * co02
    co10 = c * h - bb * i
    co11 = a * i - c * g
    co12 = bb * g - a * h
    co20 = bb * f - c * e
    co21 = c * d - a * f
    co22 = a * e - bb * d
    x0 = co00 * b[:, 0] + co10 * b[:, 1] + co20 * b[:, 2]
    x1 = co01 * b[:, 0] + co11 * b[:, 1] + co21 * b[:, 2]
    x2 = co02 * b[:, 0] + co12 * b[:, 1] + co22 * b[:, 2]
    inv = 1.0 / jnp.where(det != 0, det, 1.0)
    return jnp.stack([x0, x1, x2], axis=-1) * inv[:, None]


def direction_flat(MR, MP, r, valid=None):
    """Flat-history Anderson direction.

    MR/MP: [B, m, K] histories (rows in arbitrary order); r: [B, K].
    Returns d = -r - gamma' MP with gamma from regularized normal equations.

    valid: optional [B, m] bool — rows whose history is live for the lane's
    CURRENT solve.  Invalid rows are excluded *algebraically* (their Gram
    entries, projections, and gamma are zeroed — exactly what physically
    zeroed rows would contribute), so stale rows left over from a previous
    solve in the same buffer never need an O(B m K) zeroing pass.  This is
    what lets the async MPC farm refill a lane without touching the
    histories.

    Bandwidth notes (this is the hottest glue in the SuperMann body): the
    Gram and projection run as batched matmuls — einsum
    ``bmk,bnk->bmn`` materializes the broadcast product ([B, m, m, K]!)
    on TPU, which measured ~5x the bytes actually needed.
    """
    m = MR.shape[1]
    dtype = MR.dtype
    G = jnp.matmul(MR, MR.swapaxes(-1, -2))  # [B, m, m]
    c = jnp.matmul(MR, r[:, :, None])[..., 0]  # [B, m]
    if valid is not None:
        vm = valid.astype(dtype)  # [B, m]
        G = G * (vm[:, :, None] * vm[:, None, :])
        c = c * vm
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = jnp.asarray(1e-10, dtype) * (tr / m) + jnp.asarray(1e-30, dtype)
    Greg = G + eps[:, None, None] * jnp.eye(m, dtype=dtype)
    if m == 3:
        gamma = _solve3(Greg, c)
    else:
        gamma = jnp.linalg.solve(Greg, c[..., None])[..., 0]
    if valid is not None:
        gamma = gamma * vm
    return -r - jnp.matmul(gamma[:, None, :], MP)[:, 0]


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
