"""Conversion between structured (feature-major) iterates and the reference's
flat layouts.

The reference packs the primal as z = [x; u; s; tau; y] node-major
(``implicit_l.jl:106-158``) and the dual as v = [v1; v2; v3; v4; v5; v6; v7;
v11; v12; v13; v14] with v7 interleaved as ((x_i, u_i))_i
(``models/spock.jl:47-61``, ``constraints.jl:111-128``).  These helpers exist
for cross-checking against reference semantics and external tooling; the
solver itself never flattens.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..problem import ProblemMeta
from ..zv import Dual, Primal


def _nm(a):
    """Feature-major [..., f, n] -> node-major flat [..., n * f]."""
    return jnp.swapaxes(a, -1, -2).reshape(a.shape[:-2] + (-1,))


def _fm(flat, n, f):
    """Node-major flat [..., n * f] -> feature-major [..., f, n]."""
    return jnp.swapaxes(flat.reshape(flat.shape[:-1] + (n, f)), -1, -2)


def primal_to_ref(z: Primal) -> np.ndarray:
    """[..., nz] in the reference's z layout."""
    return np.asarray(
        jnp.concatenate([_nm(z.x), _nm(z.u), z.s, z.tau, _nm(z.y)], axis=-1)
    )


def primal_from_ref(meta: ProblemMeta, zf) -> Primal:
    t = meta.tree
    zf = jnp.asarray(zf)
    sizes = [
        t.n * meta.nx,
        t.n_nonleaf * meta.nu,
        t.n,
        t.n - 1,
        t.n_nonleaf * meta.ny,
    ]
    offs = np.cumsum([0] + sizes)
    seg = lambda i: zf[..., offs[i] : offs[i + 1]]
    return Primal(
        x=_fm(seg(0), t.n, meta.nx),
        u=_fm(seg(1), t.n_nonleaf, meta.nu),
        s=seg(2),
        tau=seg(3),
        y=_fm(seg(4), t.n_nonleaf, meta.ny),
    )


def dual_to_ref(meta: ProblemMeta, v: Dual) -> np.ndarray:
    """[..., nv] in the reference's v layout (v7 interleaved per node).

    Polytope extension blocks (pnl/plf) have no reference counterpart and are
    appended at the end when present."""
    v7 = jnp.concatenate([v.cx, v.cu], axis=-2)  # [..., nx+nu, n_nl]
    parts = [
        _nm(v.y),
        v.sby,
        _nm(v.qx),
        _nm(v.ru),
        v.t5,
        v.t6,
        _nm(v7),
        _nm(v.qNx),
        v.s12,
        v.s13,
        _nm(v.cxN),
    ]
    if v.pnl is not None:
        parts.append(_nm(v.pnl))
    if v.plf is not None:
        parts.append(_nm(v.plf))
    return np.asarray(jnp.concatenate(parts, axis=-1))


def dual_from_ref(meta: ProblemMeta, vf) -> Dual:
    t = meta.tree
    vf = jnp.asarray(vf)
    nl, n, lf = t.n_nonleaf, t.n, t.n_leaf
    sizes = [
        nl * meta.ny,
        nl,
        (n - 1) * meta.nx,
        (n - 1) * meta.nu,
        n - 1,
        n - 1,
        nl * (meta.nx + meta.nu),
        lf * meta.nx,
        lf,
        lf,
        lf * meta.nx,
    ]
    offs = np.cumsum([0] + sizes)
    seg = lambda i: vf[..., offs[i] : offs[i + 1]]
    v7 = _fm(seg(6), nl, meta.nx + meta.nu)
    return Dual(
        y=_fm(seg(0), nl, meta.ny),
        sby=seg(1),
        qx=_fm(seg(2), n - 1, meta.nx),
        ru=_fm(seg(3), n - 1, meta.nu),
        t5=seg(4),
        t6=seg(5),
        cx=v7[..., : meta.nx, :],
        cu=v7[..., meta.nx :, :],
        qNx=_fm(seg(7), lf, meta.nx),
        s12=seg(8),
        s13=seg(9),
        cxN=_fm(seg(10), lf, meta.nx),
    )
