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


def _exp_boundary_candidate(r, s, t):
    """Best point on the parameterized boundary ruled surface
    p(a, y) = (a*y, y, y*e^a), y >= 0: for each a the optimal y is closed
    form; minimize over a by coarse grid + golden-section refinement.
    Returns (x, y, z) arrays."""

    def dist_at(a):
        ea = jnp.exp(a)
        y = (r * a + s + t * ea) / (1.0 + a * a + ea * ea)
        y = jnp.maximum(y, 0.0)
        x, z = a * y, y * ea
        d = (x - r) ** 2 + (y - s) ** 2 + (z - t) ** 2
        return d, (x, y, z)

    # coarse grid over a = x/y (denser near 0, covering +-30)
    grid = jnp.concatenate(
        [
            -jnp.exp(jnp.linspace(jnp.log(30.0), -3.0, 24)),
            jnp.linspace(-0.05, 0.05, 9),
            jnp.exp(jnp.linspace(-3.0, jnp.log(30.0), 24)),
        ]
    )
    ds = jnp.stack([dist_at(a)[0] for a in grid], axis=0)  # [G, ...]
    idx = jnp.argmin(ds, axis=0)
    garr = jnp.asarray(grid, ds.dtype)
    # golden-section refine in [grid[idx-1], grid[idx+1]]
    lo = garr[jnp.clip(idx - 1, 0, garr.shape[0] - 1)]
    hi = garr[jnp.clip(idx + 1, 0, garr.shape[0] - 1)]
    phi = 0.6180339887498949
    for _ in range(40):
        m1 = hi - phi * (hi - lo)
        m2 = lo + phi * (hi - lo)
        d1, _ = dist_at(m1)
        d2, _ = dist_at(m2)
        lo = jnp.where(d1 < d2, lo, m1)
        hi = jnp.where(d1 < d2, m2, hi)
    a = 0.5 * (lo + hi)
    _, (x, y, z) = dist_at(a)
    return x, y, z


def _project_exp_cone(v):
    """Projection onto the exponential cone
    K_exp = cl{(x,y,z): y > 0, y e^{x/y} <= z}; v: [..., 3, n].
    (Extension beyond the reference — used for EVaR.)

    Case analysis (cf. the standard splitting-solver treatment):
      1. v in K_exp                      -> v
      2. -v in K_exp* (v in polar cone)  -> 0
      3. r <= 0 and s <= 0               -> face point (r, 0, max(t, 0))
      4. otherwise                       -> boundary solve (grid + golden)
    The boundary candidate and (where valid) the face candidate are compared
    and the closer one wins, which also guards case-boundary roundoff.
    """
    r, s, t = v[..., 0, :], v[..., 1, :], v[..., 2, :]

    safe_s = jnp.where(s > 0, s, 1.0)
    in_cone = ((s > 0) & (safe_s * jnp.exp(r / safe_s) <= t)) | (
        (s <= 0) & (s >= -0.0) & (r <= 0) & (t >= 0)
    )
    # polar: -v in K* = {(u,p,q): u<0, -u e^{p/u} <= e q} ∪ {0}x R+ x R+
    safe_r = jnp.where(r > 0, r, 1.0)
    in_polar = (
        (r > 0) & (t <= 0) & (safe_r * jnp.exp(s / safe_r) <= -jnp.e * t)
    ) | ((r <= 0) & (s <= 0) & (t <= 0) & (r >= -0.0) & False)

    # face candidate (valid whenever it is the projection: r<=0, s<=0 region)
    fx, fy, fz = r, jnp.zeros_like(s), jnp.maximum(t, 0.0)
    face_valid = (r <= 0) & (s <= 0)
    face_d = (fx - r) ** 2 + s**2 + (fz - t) ** 2

    bx, by, bz = _exp_boundary_candidate(r, s, t)
    bdry_d = (bx - r) ** 2 + (by - s) ** 2 + (bz - t) ** 2

    use_face = face_valid & (face_d <= bdry_d)
    px = jnp.where(use_face, fx, bx)
    py = jnp.where(use_face, fy, by)
    pz = jnp.where(use_face, fz, bz)

    out = jnp.stack([px, py, pz], axis=-2)
    out = jnp.where(in_polar[..., None, :], 0.0, out)
    out = jnp.where(in_cone[..., None, :], v, out)
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
