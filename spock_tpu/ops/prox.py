"""The two proximal operators of the splitting.

prox_f  — cf. ``prox_f!`` (``implicit_l.jl:729-750``): shift s_root by -gamma,
          project (x, u) onto the dynamics subspace (S1, Riccati) and
          (s_{1:}, tau, y) onto the risk-epigraph kernels (S2).
prox_h* — cf. ``prox_h_conj!`` (``implicit_l.jl:911-951``): Moreau-decomposed
          projection onto the translated product set S3 (SOCs for the cost
          epigraphs, dual risk cones, nonnegativity, boxes).

Both are fully batched; every block is one fused elementwise/SOC op across
all nodes of the relevant class.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..problem import ProblemData, ProblemMeta
from ..zv import Dual, Primal
from .cones import project_box, project_cone_product, project_soc
from .linop import nmul
from .riccati import project_dynamics


def project_risk_kernel(data: ProblemData, meta: ProblemMeta, s_rest, tau, y):
    """S2: per non-leaf node, project (y_i, s_children, tau_children) onto
    ker([E' -I -I; F' 0 0]) with the precomputed orthogonal projector
    (cf. ``projection_S2!``, ``implicit_l.jl:688-727``).

    s_rest: [..., n-1] (= s over non-root nodes), tau: [..., n-1],
    y: [..., ny, n_nonleaf].  In the sibling-major stage order each stage's
    non-root block reshapes contiguously to [d, m] with the sibling index
    becoming a feature (sublane) dim, so the whole gather/scatter is
    reshapes + concats — no transposes, no strided access.
    """
    t = meta.tree
    d, n_nl = t.d, t.n_nonleaf

    def to_children_fm(a):
        # [..., n-1] -> [..., d, n_nonleaf] (row k = k-th children, columns
        # ordered like the non-leaf nodes)
        parts = []
        for st in range(1, t.N):
            m = t.stage_size(st - 1)
            lo = t.stage_offset(st) - 1
            blk = a[..., lo : lo + d * m]
            parts.append(blk.reshape(blk.shape[:-1] + (d, m)))
        return jnp.concatenate(parts, axis=-1)

    def from_children_fm(block):
        # inverse of to_children_fm: [..., d, n_nonleaf] -> [..., n-1]
        parts = []
        off = 0
        for st in range(1, t.N):
            m = t.stage_size(st - 1)
            blk = block[..., :, off : off + m]
            parts.append(blk.reshape(blk.shape[:-2] + (d * m,)))
            off += m
        return jnp.concatenate(parts, axis=-1)

    sg = to_children_fm(s_rest)
    tg = to_children_fm(tau)
    vec = jnp.concatenate([y, sg, tg], axis=-2)  # [..., ny + 2d, n_nl]
    out = nmul(data.ker_proj, vec)
    y_p = out[..., : meta.ny, :]
    s_p = from_children_fm(out[..., meta.ny : meta.ny + d, :])
    t_p = from_children_fm(out[..., meta.ny + d :, :])
    return s_p, t_p, y_p


def prox_f(data: ProblemData, meta: ProblemMeta, z: Primal, gamma, x0) -> Primal:
    """z <- prox_{gamma f}(z).  f(z) = s_root + indicator(S1 x S2).

    Note s_root itself is only shifted, not projected — matching the
    reference exactly (``implicit_l.jl:740-747``).
    """
    s0 = z.s[..., :1] - gamma
    x_p, u_p = project_dynamics(data, meta, z.x, z.u, x0)
    s_rest, tau_p, y_p = project_risk_kernel(data, meta, z.s[..., 1:], z.tau, z.y)
    return Primal(
        x=x_p, u=u_p, s=jnp.concatenate([s0, s_rest], axis=-1), tau=tau_p, y=y_p
    )


def _project_S3(data: ProblemData, meta: ProblemMeta, w: Dual) -> Dual:
    """Projection onto the product set S3 (cf. ``project_on_leaf_constraints!``
    and ``project_on_nonleaf_constraints!``, ``implicit_l.jl:752-909``).

    SOC vectors are ordered (t, x) per the MOI convention the reference
    depends on (``implicit_l.jl:765-767``).
    """
    # --- non-root stage-cost SOCs: (t6, qx, ru, t5) per non-root node,
    #     stacked along the feature axis (-2) ---
    nl_vec = jnp.concatenate(
        [w.t6[..., None, :], w.qx, w.ru, w.t5[..., None, :]], axis=-2
    )
    nl_p = project_soc(nl_vec)
    t6 = nl_p[..., 0, :]
    qx = nl_p[..., 1 : 1 + meta.nx, :]
    ru = nl_p[..., 1 + meta.nx : 1 + meta.nx + meta.nu, :]
    t5 = nl_p[..., -1, :]

    # --- leaf terminal-cost SOCs: (s13, qNx, s12) per leaf node ---
    leaf_vec = jnp.concatenate(
        [w.s13[..., None, :], w.qNx, w.s12[..., None, :]], axis=-2
    )
    leaf_p = project_soc(leaf_vec)
    s13 = leaf_p[..., 0, :]
    qNx = leaf_p[..., 1 : 1 + meta.nx, :]
    s12 = leaf_p[..., -1, :]

    return Dual(
        # y-block: project onto K* (dual of the risk cone), per non-leaf node
        y=project_cone_product(w.y, meta.dual_cone),
        # s - b'y >= 0
        sby=jnp.maximum(w.sby, 0.0),
        qx=qx,
        ru=ru,
        t5=t5,
        t6=t6,
        # box constraints (nonleaf x/u, leaf x)
        cx=project_box(w.cx, data.x_min, data.x_max),
        cu=project_box(w.cu, data.u_min, data.u_max),
        qNx=qNx,
        s12=s12,
        s13=s13,
        cxN=project_box(w.cxN, data.x_min, data.x_max),
        # polytopic rows (extension): two-sided clip
        pnl=None if w.pnl is None else project_box(w.pnl, data.p_lo, data.p_hi),
        plf=None
        if w.plf is None
        else project_box(w.plf, data.pN_lo, data.pN_hi),
    )


def prox_h_conj(data: ProblemData, meta: ProblemMeta, v: Dual, sigma) -> Dual:
    """v <- prox_{sigma h*}(v) by Moreau: sigma * (w - proj_S3(w)), where w is
    v/sigma with the +-1/2 epigraph shifts on (t5, t6, s12, s13)
    (``implicit_l.jl:923-951``)."""
    inv = 1.0 / sigma
    w = Dual(
        y=v.y * inv,
        sby=v.sby * inv,
        qx=v.qx * inv,
        ru=v.ru * inv,
        t5=v.t5 * inv - 0.5,
        t6=v.t6 * inv + 0.5,
        cx=v.cx * inv,
        cu=v.cu * inv,
        qNx=v.qNx * inv,
        s12=v.s12 * inv - 0.5,
        s13=v.s13 * inv + 0.5,
        cxN=v.cxN * inv,
        pnl=None if v.pnl is None else v.pnl * inv,
        plf=None if v.plf is None else v.plf * inv,
    )
    p = _project_S3(data, meta, w)
    out = {}
    for f in dataclasses.fields(Dual):
        wv, pv = getattr(w, f.name), getattr(p, f.name)
        out[f.name] = None if wv is None else sigma * (wv - pv)
    return Dual(**out)
