"""Anderson acceleration (type-II) direction for SuperMann.

Counterpart of ``anderson!`` (``/root/reference/src/model_algorithms/
qnewton_directions/anderson.jl``): window-m history of residual differences
``dR`` and ``dP = dZ - dR``; direction

    d = -r - dP^T gamma,   gamma = argmin || dR^T gamma - r ||_2.

Two deliberate departures from the reference, both TPU-motivated:

* **Circular buffer, not shift.**  The reference shifts its history matrices
  every iteration (newest first); on TPU that is a full read+write of the
  [B, m, K] buffers (K = nz + nv).  The least-squares solve is invariant to
  row order, so we overwrite one slot per iteration instead — O(K) instead
  of O(mK) traffic.
* **Normal equations, not incremental QR.**  The reference maintains an
  approximate shifted QR via sequential Gram-Schmidt; with a small static
  window the solve is a tiny m x m system per lane, which we form and solve
  batched with Tikhonov regularization.  Accuracy differences are absorbed
  by SuperMann's K1/K2 safeguards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def write_slot(hist, col, slot):
    """Overwrite ring slot ``slot`` (scalar int) with ``col`` [B, K]."""
    return jax.lax.dynamic_update_slice_in_dim(hist, col[:, None, :], slot, 1)


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
