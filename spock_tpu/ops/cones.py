"""Batched cone and box projections (feature-major: cone/feature axis is -2,
node axis last).

Counterparts of the reference's ``project_onto_cone!`` family
(``/root/reference/src/risk_measures.jl:14-71``) and box clips
(``src/constraints.jl:24-54``), vectorized over nodes and batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..risks import ConeSpec


def project_soc(v):
    """Projection onto the second-order cone {(t, x): ||x|| <= t}.

    The cone vector lies along axis -2 ordered (t, x) — the MOI convention
    the reference relies on (``implicit_l.jl:765-767``).  v: [..., k, n] with
    t = v[..., 0, :]; nodes along the last axis.
    """
    t = v[..., 0, :]
    x = v[..., 1:, :]
    xn = jnp.sqrt(jnp.sum(x * x, axis=-2))
    # three cases: inside (xn <= t) -> identity; polar (xn <= -t) -> 0;
    # else scale onto the boundary: (t, x) <- (t + xn)/(2 xn) * (xn, x).
    inside = xn <= t
    polar = xn <= -t
    safe_xn = jnp.where(xn > 0, xn, 1.0)
    t_new = (t + xn) / 2.0
    x_new = (t_new / safe_xn)[..., None, :] * x
    t_out = jnp.where(inside, t, jnp.where(polar, 0.0, t_new))
    x_out = jnp.where(
        inside[..., None, :], x, jnp.where(polar[..., None, :], 0.0, x_new)
    )
    return jnp.concatenate([t_out[..., None, :], x_out], axis=-2)


def project_box(v, lo, hi):
    """v: [..., f, n]; lo/hi: [f] per-feature bounds (or scalars)."""
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    if lo.ndim == 1:
        lo = lo[:, None]
    if hi.ndim == 1:
        hi = hi[:, None]
    return jnp.clip(v, lo, hi)


def _project_exp_cone(v):
    """Projection onto the exponential cone K_exp = cl{(x,y,z): y>0,
    y e^{x/y} <= z}; v: [..., 3, n].  (Extension beyond the reference —
    used for EVaR.)  Bisection on the boundary parameterization."""
    r, s, t = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    in_cone = ((s > 0) & (s * jnp.exp(r / jnp.where(s > 0, s, 1.0)) <= t)) | (
        (r <= 0) & (jnp.abs(s) <= 1e-30) & (t >= 0)
    )
    neg_r, neg_s, neg_t = -r, -s, -t
    in_polar = (
        (neg_r > 0)
        & (neg_t > 0)
        & (neg_r * jnp.exp(neg_s / neg_r - 1.0) <= jnp.e * neg_t + 1e-30)
    ) | ((neg_r <= 1e-30) & (neg_s <= 0) & (neg_t <= 0))

    lo = jnp.zeros_like(r) - 20.0
    hi = jnp.zeros_like(r) + 20.0

    def g(a):
        ea = jnp.exp(a)
        y = (r * a + s + t * ea) / (1.0 + a * a + ea * ea)
        y = jnp.maximum(y, 1e-12)
        x, z = a * y, y * ea
        return (x - r) * y + (z - t) * y * ea

    for _ in range(40):
        mid = 0.5 * (lo + hi)
        gm = g(mid)
        lo = jnp.where(gm < 0, mid, lo)
        hi = jnp.where(gm >= 0, mid, hi)
    a = 0.5 * (lo + hi)
    ea = jnp.exp(a)
    y = jnp.maximum((r * a + s + t * ea) / (1.0 + a * a + ea * ea), 0.0)
    bp = jnp.stack([a * y, y, y * ea], axis=-2)

    out = jnp.where(
        in_cone[..., None, :], v, jnp.where(in_polar[..., None, :], 0.0, bp)
    )
    return out


def project_cone_product(v, spec: ConeSpec):
    """Project [..., ny, n] onto a product cone described by ``spec``
    (segments along axis -2; static boundaries -> fused elementwise ops)."""
    out = []
    off = 0
    for kind, dim in spec:
        seg = v[..., off : off + dim, :]
        if kind == "zero":
            out.append(jnp.zeros_like(seg))
        elif kind == "nonneg":
            out.append(jnp.maximum(seg, 0.0))
        elif kind == "nonpos":
            out.append(jnp.minimum(seg, 0.0))
        elif kind == "reals":
            out.append(seg)
        elif kind == "soc":
            out.append(project_soc(seg))
        elif kind == "exp":
            out.append(_project_exp_cone(seg))
        elif kind == "exp_dual":
            # Moreau: P_{K*}(v) = v + P_K(-v)
            out.append(seg + _project_exp_cone(-seg))
        else:
            raise ValueError(f"Unknown cone kind: {kind}")
        off += dim
    return jnp.concatenate(out, axis=-2)
