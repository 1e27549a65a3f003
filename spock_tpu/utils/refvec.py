"""Conversion between structured iterates and the reference's flat layouts.

The reference packs the primal as z = [x; u; s; tau; y]
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


def primal_to_ref(z: Primal) -> np.ndarray:
    """[..., nz] in the reference's z layout."""
    lead = z.s.shape[:-1]
    flat = lambda a: jnp.reshape(a, lead + (-1,))
    return np.asarray(
        jnp.concatenate(
            [flat(z.x), flat(z.u), z.s, z.tau, flat(z.y)], axis=-1
        )
    )


def primal_from_ref(meta: ProblemMeta, zf) -> Primal:
    t = meta.tree
    zf = jnp.asarray(zf)
    lead = zf.shape[:-1]
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
        x=seg(0).reshape(lead + (t.n, meta.nx)),
        u=seg(1).reshape(lead + (t.n_nonleaf, meta.nu)),
        s=seg(2),
        tau=seg(3),
        y=seg(4).reshape(lead + (t.n_nonleaf, meta.ny)),
    )


def dual_to_ref(meta: ProblemMeta, v: Dual) -> np.ndarray:
    """[..., nv] in the reference's v layout (v7 interleaved per node)."""
    lead = v.sby.shape[:-1]
    flat = lambda a: jnp.reshape(a, lead + (-1,))
    v7 = jnp.concatenate([v.cx, v.cu], axis=-1)  # [..., n_nl, nx+nu]
    return np.asarray(
        jnp.concatenate(
            [
                flat(v.y),
                v.sby,
                flat(v.qx),
                flat(v.ru),
                v.t5,
                v.t6,
                flat(v7),
                flat(v.qNx),
                v.s12,
                v.s13,
                flat(v.cxN),
            ],
            axis=-1,
        )
    )


def dual_from_ref(meta: ProblemMeta, vf) -> Dual:
    t = meta.tree
    vf = jnp.asarray(vf)
    lead = vf.shape[:-1]
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
    v7 = seg(6).reshape(lead + (nl, meta.nx + meta.nu))
    return Dual(
        y=seg(0).reshape(lead + (nl, meta.ny)),
        sby=seg(1),
        qx=seg(2).reshape(lead + (n - 1, meta.nx)),
        ru=seg(3).reshape(lead + (n - 1, meta.nu)),
        t5=seg(4),
        t6=seg(5),
        cx=v7[..., : meta.nx],
        cu=v7[..., meta.nx :],
        qNx=seg(7).reshape(lead + (lf, meta.nx)),
        s12=seg(8),
        s13=seg(9),
        cxN=seg(10).reshape(lead + (lf, meta.nx)),
    )
