"""Anderson acceleration (type-II) direction for SuperMann.

Counterpart of ``anderson!`` (``/root/reference/src/model_algorithms/
qnewton_directions/anderson.jl``): window-m history of residual differences
``dR`` and ``dP = dZ - dR``; direction

    d = -r - dP^T gamma,   gamma = argmin || dR^T gamma - r ||_2.

The reference maintains an incrementally-updated (approximate) QR of the
history; with a small static window the least-squares solve is a tiny m x m
normal-equation system per lane, which we solve directly with Tikhonov
regularization — numerically equivalent at the tolerance the safeguarded
SuperMann scheme needs, and far friendlier to the TPU (one batched 3x3
solve instead of sequential Gram-Schmidt).

History layout: [B, m, K] with row 0 = newest (matching the reference's
shift-right-newest-first convention).
"""

from __future__ import annotations

import jax.numpy as jnp


def push(hist, col):
    """Shift history down and insert ``col`` ([B, K]) as row 0."""
    return jnp.concatenate([col[:, None, :], hist[:, :-1, :]], axis=1)


def direction(MR, MP, r_flat):
    """d_flat = -r - MP^T gamma with gamma from regularized normal equations.

    MR, MP: [B, m, K]; r_flat: [B, K].  Returns [B, K].
    """
    G = jnp.einsum("bmk,bnk->bmn", MR, MR)  # [B, m, m]
    c = jnp.einsum("bmk,bk->bm", MR, r_flat)
    m = G.shape[-1]
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = jnp.asarray(1e-10, G.dtype) * (tr[:, None, None] / m) + jnp.asarray(
        1e-30, G.dtype
    )
    Greg = G + eps * jnp.eye(m, dtype=G.dtype)
    gamma = jnp.linalg.solve(Greg, c[..., None])[..., 0]
    return -r_flat - jnp.einsum("bmk,bm->bk", MP, gamma)
