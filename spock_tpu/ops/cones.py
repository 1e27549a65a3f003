"""Batched cone and box projections.

Counterparts of the reference's ``project_onto_cone!`` family
(``/root/reference/src/risk_measures.jl:14-71``) and box clips
(``src/constraints.jl:24-54``), vectorized over nodes and batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..risks import ConeSpec


def project_soc(v, axis: int = -1):
    """Projection onto the second-order cone {(t, x): ||x|| <= t}.

    The cone vector is ordered (t, x) — the MOI convention the reference
    relies on (``implicit_l.jl:765-767``).  ``v``: [..., k] with t = v[..., 0].
    """
    assert axis == -1
    t = v[..., 0]
    x = v[..., 1:]
    xn = jnp.sqrt(jnp.sum(x * x, axis=-1))
    # three cases: inside (xn <= t) -> identity; polar (xn <= -t) -> 0;
    # else scale onto the boundary: (t, x) <- (t + xn)/(2 xn) * (xn, x).
    inside = xn <= t
    polar = xn <= -t
    # guard the division (xn == 0 can only occur in the inside/polar branches)
    safe_xn = jnp.where(xn > 0, xn, 1.0)
    t_new = (t + xn) / 2.0
    x_new = (t_new / safe_xn)[..., None] * x
    t_out = jnp.where(inside, t, jnp.where(polar, 0.0, t_new))
    x_out = jnp.where(
        inside[..., None], x, jnp.where(polar[..., None], 0.0, x_new)
    )
    return jnp.concatenate([t_out[..., None], x_out], axis=-1)


def project_box(v, lo, hi):
    return jnp.clip(v, lo, hi)


def _project_exp_cone(v):
    """Projection onto the exponential cone K_exp = cl{(x,y,z): y>0, y e^{x/y} <= z}.

    Iterative Newton on the dual formulation is overkill here; we use a few
    bisection steps on the KKT scalar equation, which is plenty for the
    solver's inexact-prox tolerance.  v: [..., 3].  (Extension beyond the
    reference — used for EVaR risk measures.)
    """
    # Heuristic projection via alternating cases (Parikh-Boyd style):
    r, s, t = v[..., 0], v[..., 1], v[..., 2]
    # Case 1: already in cone
    in_cone = ((s > 0) & (s * jnp.exp(r / jnp.where(s > 0, s, 1.0)) <= t)) | (
        (r <= 0) & (jnp.abs(s) <= 1e-30) & (t >= 0)
    )
    # Case 2: in polar cone -> project to 0
    # polar of K_exp: {(u,v,w): u>0... } use -K_exp^* check via heuristic
    neg = -v
    u_, vv, w_ = neg[..., 0], neg[..., 1], neg[..., 2]
    in_polar = (
        (u_ > 0) & (w_ > 0) & (u_ * jnp.exp(vv / u_ - 1.0) <= jnp.e * w_ + 1e-30)
    ) | ((u_ <= 1e-30) & (vv <= 0) & (w_ <= 0))

    # General case: solve for rho via bisection on the primal optimality
    # condition along the cone boundary z = y e^{x/y}.  We parameterize by
    # mu > 0 and run fixed bisection iterations.
    def boundary_proj(v):
        r, s, t = v[..., 0], v[..., 1], v[..., 2]
        lo = jnp.zeros_like(r) - 20.0
        hi = jnp.zeros_like(r) + 20.0

        def g(a):
            # point on boundary: x = a*y... use param p = x/y = a
            # minimize ||(x,y,z)-(r,s,t)||^2 s.t. z = y e^a, x = a y, y>0
            # optimal y for fixed a:
            ea = jnp.exp(a)
            y = (r * a + s + t * ea) / (1.0 + a * a + ea * ea)
            y = jnp.maximum(y, 1e-12)
            # derivative of objective wrt a (sign only)
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
        return jnp.stack([a * y, y, y * ea], axis=-1)

    bp = boundary_proj(v)
    out = jnp.where(in_cone[..., None], v, jnp.where(in_polar[..., None], 0.0, bp))
    return out


def project_cone_product(v, spec: ConeSpec):
    """Project [..., ny] onto a product cone described by ``spec``.

    Segment boundaries are static, so this lowers to a handful of fused
    elementwise ops (plus a norm per SOC segment).
    """
    out = []
    off = 0
    for kind, dim in spec:
        seg = v[..., off : off + dim]
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
            # Moreau: P_{K*}(v) = v + P_{-K}(-v) = v - P_K(... ) careful:
            # P_{K^*}(v) = v + P_K(-v) does NOT hold in general; use
            # P_{K^*}(v) = v - P_{K^polar}(v), K^polar = -K^*... For the exp
            # cone: P_{Kexp*}(v) = v + P_{Kexp}(-v) holds since polar(Kexp) =
            # -Kexp* (Moreau: v = P_K(v) + P_{K^polar}(v)).
            out.append(seg + _project_exp_cone(-seg))
        else:
            raise ValueError(f"Unknown cone kind: {kind}")
        off += dim
    return jnp.concatenate(out, axis=-1)
