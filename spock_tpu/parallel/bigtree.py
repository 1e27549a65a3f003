"""Node-sharded solves for trees larger than one device ("big-tree" path).

The reference scales deep horizons purely sequentially in host RAM
(``examples/server_heat/scaling.jl:9-24``, N up to 15); here the stage-major
node axis of every iterate is split across a ``Mesh(..., ("node",))`` so the
dominant leaf-heavy stages live in distributed memory and the elementwise
prox/update work executes shard-locally.  Stage-boundary data movement
(parent<->child regrouping of the sibling-major layout) lowers to XLA
collectives over ICI.

GSPMD only shards evenly-divisible dimensions, and tree stage sizes are
powers of d — so the sharded carry holds a **node-padded** copy of each leaf
(last axis rounded up to a mesh multiple, zero-filled).  Each loop iteration
unpads (shard-local slice), runs the ordinary batched kernels, and re-pads +
re-constrains the result.  Numerics are identical to the unsharded solver:
the pads never enter the math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..algorithms.common import (
    SolveResult,
    bwhere,
    check_termination,
    cp_sweep,
    residual_norms,
)
from ..problem import ProblemData, ProblemMeta
from ..solver import zero_dual, zero_primal
from ..zv import sub, tmap
from .mesh import node_constrainer, replicate, shard_nodes


def pad_nodes(tree, mult: int):
    """Zero-pad the last (node) axis of every leaf to a multiple of ``mult``."""

    def pad(a):
        w = a.shape[-1]
        extra = (-w) % mult
        if extra == 0:
            return a
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, extra)]
        return jnp.pad(a, cfg)

    return tmap(pad, tree)


def unpad_nodes(tree_padded, template):
    """Slice each leaf back to the template's node-axis length."""

    def cut(a, t):
        return a[..., : t.shape[-1]] if a.shape[-1] != t.shape[-1] else a

    return tmap(cut, tree_padded, template)


def run_cp_sharded(
    data: ProblemData,
    meta: ProblemMeta,
    x0,
    tol,
    max_iter: int,
    mesh,
    z0=None,
    v0=None,
    gamma=None,
    sigma=None,
) -> SolveResult:
    """Chambolle-Pock with node-sharded iterates.  x0: [B, nx] (replicated).

    Problem data is replicated (it is O(stages), not O(nodes), thanks to the
    broadcast-uniform factor layout); only the iterates are distributed.
    Returns an ordinary (unpadded) :class:`SolveResult` whose iterates keep
    their shard placement.
    """
    if gamma is None or sigma is None:
        step = 0.99 / jnp.sqrt(data.L_sq)
        gamma = sigma = step
    L = mesh.shape["node"]
    B = x0.shape[0]
    dtype = x0.dtype
    tmpl_z = zero_primal(meta, (B,), dtype)
    tmpl_v = zero_dual(meta, (B,), dtype)
    if z0 is None:
        z0 = tmpl_z
    if v0 is None:
        v0 = tmpl_v
    constrain = node_constrainer(mesh)
    data_r = replicate(data, mesh)
    zp0 = shard_nodes(pad_nodes(z0, L), mesh)
    vp0 = shard_nodes(pad_nodes(v0, L), mesh)

    def cond(c):
        return (~jnp.all(c["done"])) & (c["it"] < max_iter)

    @jax.jit
    def solve(x0, zp, vp):
        def body(c):
            z = unpad_nodes(c["zp"], tmpl_z)
            v = unpad_nodes(c["vp"], tmpl_v)
            zbar, vbar = cp_sweep(data_r, meta, z, v, gamma, sigma, x0)
            xi1, xi2 = residual_norms(
                data_r, meta, sub(zbar, z), sub(vbar, v), gamma, sigma
            )
            conv, res0 = check_termination(xi1, xi2, c["res0"], tol)
            active = ~c["done"]
            zp_new = constrain(pad_nodes(bwhere(active, zbar, z), L))
            vp_new = constrain(pad_nodes(bwhere(active, vbar, v), L))
            return dict(
                zp=zp_new,
                vp=vp_new,
                res0=jnp.where(active[:, None], res0, c["res0"]),
                done=c["done"] | conv,
                niter=c["niter"] + active.astype(jnp.int32),
                xi1=jnp.where(active, xi1, c["xi1"]),
                xi2=jnp.where(active, xi2, c["xi2"]),
                it=c["it"] + 1,
            )

        init = dict(
            zp=zp,
            vp=vp,
            res0=jnp.full((B, 2), -jnp.inf, dtype),
            done=jnp.zeros((B,), bool),
            niter=jnp.zeros((B,), jnp.int32),
            xi1=jnp.full((B,), jnp.inf, dtype),
            xi2=jnp.full((B,), jnp.inf, dtype),
            it=jnp.zeros((), jnp.int32),
        )
        out = jax.lax.while_loop(cond, body, init)
        return out

    out = solve(x0, zp0, vp0)
    res = SolveResult(
        z=unpad_nodes(out["zp"], tmpl_z),
        v=unpad_nodes(out["vp"], tmpl_v),
        iterations=out["niter"],
        status=jnp.where(out["done"], 0, 1).astype(jnp.int32),
        xi1=out["xi1"],
        xi2=out["xi2"],
    )
    # second value: the raw padded, node-sharded final iterates (callers that
    # keep working distributed — warm starts, sharding checks — use these)
    return res, (out["zp"], out["vp"])
