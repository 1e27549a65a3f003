"""The implicit linear operator L and its adjoint, as dense batched tensor ops.

Re-derivation of ``L!`` / ``L_transpose!``
(``/root/reference/src/model_dynamics/implicit_l.jl:177-449``) for the
stage-major uniform tree layout:

* "parent -> children" broadcast is ``x[:n_nonleaf]`` repeated d times along a
  new sibling axis and flattened — no gather;
* "children -> parent" reduction is a reshape to [n_nonleaf, d, ...] and a sum
  over the sibling axis — no scatter;
* per-node matrix applications are einsums that broadcast a size-1 node dim
  for uniform problem data.

Everything accepts arbitrary leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import ProblemData, ProblemMeta
from ..zv import Dual, Primal, vdot


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------


def nmul(M, x):
    """Apply per-node matrices: M [K, a, b] (K in {1, n}), x [..., n, b] -> [..., n, a]."""
    if M.shape[0] == 1:
        return jnp.einsum("ab,...nb->...na", M[0], x)
    return jnp.einsum("nab,...nb->...na", M, x)


def nmul_t(M, x):
    """Adjoint application: M [K, a, b], x [..., n, a] -> [..., n, b]."""
    if M.shape[0] == 1:
        return jnp.einsum("ab,...na->...nb", M[0], x)
    return jnp.einsum("nab,...na->...nb", M, x)


def _rep_children(a, d: int, event_rank: int):
    """Replicate along a new sibling axis placed after the node axis.

    a: [..., n_nl, E...] with `event_rank` trailing event dims after the node
    axis; returns [..., n_nl * d, E...].
    """
    node_ax = a.ndim - event_rank - 1
    expanded = jnp.expand_dims(a, node_ax + 1)
    tiled = jnp.broadcast_to(
        expanded,
        a.shape[: node_ax + 1] + (d,) + a.shape[node_ax + 1 :],
    )
    return tiled.reshape(
        a.shape[:node_ax] + (a.shape[node_ax] * d,) + a.shape[node_ax + 1 :]
    )


def _sum_children(a, d: int, event_rank: int):
    """Inverse-adjoint of :func:`_rep_children`: sum contiguous sibling groups.

    a: [..., n_nl * d, E...] -> [..., n_nl, E...].
    """
    node_ax = a.ndim - event_rank - 1
    n = a.shape[node_ax]
    reshaped = a.reshape(
        a.shape[:node_ax] + (n // d, d) + a.shape[node_ax + 1 :]
    )
    return reshaped.sum(axis=node_ax + 1)


def bdot(b, y):
    """b [K, ny] (K in {1, n}), y [..., n, ny] -> [..., n]."""
    if b.shape[0] == 1:
        return jnp.einsum("y,...ny->...n", b[0], y)
    return jnp.einsum("ny,...ny->...n", b, y)


# ---------------------------------------------------------------------------
# L and L'
# ---------------------------------------------------------------------------


def apply_L(data: ProblemData, meta: ProblemMeta, z: Primal) -> Dual:
    """v = L z (block map at ``implicit_l.jl:177-318``)."""
    t = meta.tree
    n_nl, ls, d = t.n_nonleaf, t.leaf_start, t.d

    x_nl = z.x[..., :n_nl, :]
    x_leaf = z.x[..., ls:, :]
    x_par = _rep_children(x_nl, d, 1)  # [..., n-1, nx]
    u_par = _rep_children(z.u, d, 1)  # [..., n-1, nu]

    half_tau = 0.5 * z.tau
    half_s_leaf = 0.5 * z.s[..., ls:]

    if meta.nc_nl > 0:
        pnl = jnp.einsum("cx,...nx->...nc", data.Gx, x_nl) + jnp.einsum(
            "cu,...nu->...nc", data.Gu, z.u
        )
    else:
        pnl = None
    if meta.nc_lf > 0:
        plf = jnp.einsum("cx,...nx->...nc", data.GxN, x_leaf)
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

    x_nl = v.cx + _sum_children(nmul_t(data.sqrtQ, v.qx), d, 1)
    x_leaf = v.cxN + nmul_t(data.sqrtQN, v.qNx)
    u = v.cu + _sum_children(nmul_t(data.sqrtR, v.ru), d, 1)

    if v.pnl is not None:
        x_nl = x_nl + jnp.einsum("cx,...nc->...nx", data.Gx, v.pnl)
        u = u + jnp.einsum("cu,...nc->...nu", data.Gu, v.pnl)
    if v.plf is not None:
        x_leaf = x_leaf + jnp.einsum("cx,...nc->...nx", data.GxN, v.plf)

    if data.b.shape[0] == 1:
        y = v.y - v.sby[..., None] * data.b[0]
    else:
        y = v.y - v.sby[..., None] * data.b

    s = jnp.concatenate([v.sby, 0.5 * (v.s12 + v.s13)], axis=-1)
    return Primal(
        x=jnp.concatenate([x_nl, x_leaf], axis=-2),
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
        x=rnd((t.n, meta.nx)),
        u=rnd((t.n_nonleaf, meta.nu)),
        s=rnd((t.n,)),
        tau=rnd((t.n - 1,)),
        y=rnd((t.n_nonleaf, meta.ny)),
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
