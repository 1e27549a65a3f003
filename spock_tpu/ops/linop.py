"""The implicit linear operator L and its adjoint, as dense batched tensor ops.

Re-derivation of ``L!`` / ``L_transpose!``
(``/root/reference/src/model_dynamics/implicit_l.jl:177-449``) for the
feature-major, stage-major, sibling-major uniform tree layout (node axis
LAST — see :mod:`spock_tpu.zv` and :mod:`spock_tpu.tree`):

* "parent -> children" replication is a per-stage concat of d contiguous
  parent blocks — no gather, no tiny-minor-dim broadcast temps;
* "children -> parent" reduction is a per-stage contiguous [d, m] reshape
  + sublane-axis sum — no scatter, no strided lane access;
* per-node matrix applications contract the small feature (sublane) axis —
  einsums that broadcast a size-1 node dim for uniform problem data.

Everything accepts arbitrary leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import ProblemData, ProblemMeta
from ..zv import Dual, Primal, vdot


# ---------------------------------------------------------------------------
# layout helpers (node axis is always last)
# ---------------------------------------------------------------------------


def nmul(M, x):
    """Apply per-node matrices: M [K, a, b] (K in {1, n}), x [..., b, n] -> [..., a, n]."""
    if M.shape[0] == 1:
        return jnp.einsum("ab,...bn->...an", M[0], x)
    return jnp.einsum("nab,...bn->...an", M, x)


def nmul_t(M, x):
    """Adjoint application: M [K, a, b], x [..., a, n] -> [..., b, n]."""
    if M.shape[0] == 1:
        return jnp.einsum("ab,...an->...bn", M[0], x)
    return jnp.einsum("nab,...an->...bn", M, x)


def rep_children(a, tree):
    """[..., n_nonleaf] -> [..., n - 1]: each parent's value replicated to its
    children, in the sibling-major non-root order (see tree.py).

    Per parent stage, the children block is just d contiguous copies of the
    parent block — all concatenations of contiguous slices, no broadcasts
    with a tiny minor dim and no strided access.
    """
    parts = []
    for t in range(tree.N - 1):
        blk = a[..., tree.stage_slice(t)]
        parts.extend([blk] * tree.d)
    return jnp.concatenate(parts, axis=-1)


def sum_children(a, tree):
    """[..., n - 1] (non-root order) -> [..., n_nonleaf]: sum each parent's d
    children.  Sibling-major order makes this a contiguous [d, m] reshape
    and a sublane-axis reduction per stage."""
    d = tree.d
    parts = []
    for t in range(1, tree.N):
        m = tree.stage_size(t - 1)
        lo = tree.stage_offset(t) - 1
        blk = a[..., lo : lo + d * m]
        parts.append(
            blk.reshape(blk.shape[:-1] + (d, m)).sum(axis=-2)
        )
    return jnp.concatenate(parts, axis=-1)


def bdot(b, y):
    """b [K, ny] (K in {1, n}), y [..., ny, n] -> [..., n]."""
    if b.shape[0] == 1:
        return jnp.einsum("y,...yn->...n", b[0], y)
    return jnp.einsum("ny,...yn->...n", b, y)


# ---------------------------------------------------------------------------
# L and L'
# ---------------------------------------------------------------------------


def apply_L(data: ProblemData, meta: ProblemMeta, z: Primal) -> Dual:
    """v = L z (block map at ``implicit_l.jl:177-318``)."""
    t = meta.tree
    n_nl, ls, d = t.n_nonleaf, t.leaf_start, t.d

    x_nl = z.x[..., :n_nl]
    x_leaf = z.x[..., ls:]
    x_par = rep_children(x_nl, t)  # [..., nx, n-1]
    u_par = rep_children(z.u, t)  # [..., nu, n-1]

    half_tau = 0.5 * z.tau
    half_s_leaf = 0.5 * z.s[..., ls:]

    if meta.nc_nl > 0:
        pnl = jnp.einsum("cx,...xn->...cn", data.Gx, x_nl) + jnp.einsum(
            "cu,...un->...cn", data.Gu, z.u
        )
    else:
        pnl = None
    if meta.nc_lf > 0:
        plf = jnp.einsum("cx,...xn->...cn", data.GxN, x_leaf)
    else:
        plf = None

    return Dual(
        y=z.y,
        sby=z.s[..., :n_nl] - bdot(data.b, z.y),
        qx=nmul(data.sqrtQ, x_par),
        ru=nmul(data.sqrtR, u_par),
        t5=half_tau,
        t6=half_tau,
        cx=x_nl,
        cu=z.u,
        qNx=nmul(data.sqrtQN, x_leaf),
        s12=half_s_leaf,
        s13=half_s_leaf,
        cxN=x_leaf,
        pnl=pnl,
        plf=plf,
    )


def apply_LT(data: ProblemData, meta: ProblemMeta, v: Dual) -> Primal:
    """z = L' v (block map at ``implicit_l.jl:320-449``)."""
    t = meta.tree
    d, ls = t.d, t.leaf_start

    x_nl = v.cx + sum_children(nmul_t(data.sqrtQ, v.qx), t)
    x_leaf = v.cxN + nmul_t(data.sqrtQN, v.qNx)
    u = v.cu + sum_children(nmul_t(data.sqrtR, v.ru), t)

    if v.pnl is not None:
        x_nl = x_nl + jnp.einsum("cx,...cn->...xn", data.Gx, v.pnl)
        u = u + jnp.einsum("cu,...cn->...un", data.Gu, v.pnl)
    if v.plf is not None:
        x_leaf = x_leaf + jnp.einsum("cx,...cn->...xn", data.GxN, v.plf)

    if data.b.shape[0] == 1:
        y = v.y - data.b[0][:, None] * v.sby[..., None, :]
    else:
        y = v.y - jnp.swapaxes(data.b, -1, -2) * v.sby[..., None, :]

    s = jnp.concatenate([v.sby, 0.5 * (v.s12 + v.s13)], axis=-1)
    return Primal(
        x=jnp.concatenate([x_nl, x_leaf], axis=-1),
        u=u,
        s=s,
        tau=0.5 * (v.t5 + v.t6),
        y=y,
    )


# ---------------------------------------------------------------------------
# The SuperMann metric M = [[I, -gamma L'], [-sigma L, I]]
# (cf. spock_dot, implicit_l.jl:485-516)
# ---------------------------------------------------------------------------


def metric_apply(data, meta, z: Primal, v: Dual, gamma, sigma):
    """Return M @ (z, v) = (z - gamma L'v, v - sigma L z)."""
    Ltv = apply_LT(data, meta, v)
    Lz = apply_L(data, meta, z)
    mz = jax.tree_util.tree_map(lambda a, b: a - gamma * b, z, Ltv)
    mv = jax.tree_util.tree_map(lambda a, b: a - sigma * b, v, Lz)
    return mz, mv


def spock_dot(data, meta, az, av, bz, bv, gamma, sigma, batch_ndim: int = 0):
    """<(az, av), M (bz, bv)> — one L and one L' application."""
    mz, mv = metric_apply(data, meta, bz, bv, gamma, sigma)
    return vdot(az, mz, batch_ndim) + vdot(av, mv, batch_ndim)


def spock_norm_sq(data, meta, rz, rv, gamma, sigma, batch_ndim: int = 0):
    return spock_dot(data, meta, rz, rv, rz, rv, gamma, sigma, batch_ndim)


# ---------------------------------------------------------------------------
# ||L||^2 estimation (replaces the reference's hardcoded L_norm,
# models/spock.jl:63-64)
# ---------------------------------------------------------------------------


def estimate_L_sq(
    data: ProblemData, meta: ProblemMeta, iters: int = 50, rng=None
) -> float:
    """Power iteration on L'L; returns a slightly inflated ||L||^2 so the CP
    step sizes gamma = sigma = 0.99 / ||L|| satisfy gamma * sigma * ||L||^2 < 1."""
    rng = rng or np.random.default_rng(0)
    t = meta.tree
    dtype = data.A.dtype

    def rnd(shape):
        return jnp.asarray(rng.standard_normal(shape), dtype=dtype)

    z = Primal(
        x=rnd((meta.nx, t.n)),
        u=rnd((meta.nu, t.n_nonleaf)),
        s=rnd((t.n,)),
        tau=rnd((t.n - 1,)),
        y=rnd((meta.ny, t.n_nonleaf)),
    )

    @jax.jit
    def step(z, _):
        w = apply_LT(data, meta, apply_L(data, meta, z))
        lam = vdot(w, z) / jnp.maximum(vdot(z, z), 1e-30)
        nrm = jnp.sqrt(jnp.maximum(vdot(w, w), 1e-30))
        z = jax.tree_util.tree_map(lambda a: a / nrm, w)
        return z, lam

    _, lams = jax.lax.scan(step, z, None, length=iters)
    return float(lams[-1]) * 1.02
