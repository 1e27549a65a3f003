"""Pallas TPU kernels for the hot per-iteration blocks.

First production kernel: fused ``prox_h_conj``.  The jnp implementation is
correct but XLA materializes several HBM passes (scale, epigraph shifts, SOC
stack/concat, projections, Moreau subtract — measured ~7x below HBM peak);
this kernel does one read and one write per dual block with all arithmetic
in VMEM.

The kernel is grid-parallel over lanes (batch tiles); each step processes
whole node ranges of every block (feature-major [bt, f, n] tiles, reductions
over the sublane/feature axis).  Cone segments of the y block are unrolled
statically from the ConeSpec.  Falls back to interpret mode off-TPU so the
same code path is exercised by the CPU test suite.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..problem import ProblemData, ProblemMeta
from ..zv import Dual

# opt-in: SPOCK_PALLAS=1 enables the fused kernels inside the solver
ENABLED = os.environ.get("SPOCK_PALLAS", "0") == "1"


def _soc_project_block(vec):
    """SOC projection with the cone axis at -2 ((t, x) ordering); vec:
    [bt, k, n]."""
    t = vec[:, 0:1, :]
    x = vec[:, 1:, :]
    xn = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    inside = xn <= t
    polar = xn <= -t
    safe = jnp.where(xn > 0, xn, 1.0)
    t_new = (t + xn) * 0.5
    scale = t_new / safe
    t_out = jnp.where(inside, t, jnp.where(polar, 0.0, t_new))
    x_out = jnp.where(inside, x, jnp.where(polar, 0.0, scale * x))
    return jnp.concatenate([t_out, x_out], axis=1)


def _cone_product_block(w, spec):
    """Project [bt, ny, n] onto the product cone (segments along axis 1)."""
    out = []
    off = 0
    for kind, dim in spec:
        seg = w[:, off : off + dim, :]
        if kind == "zero":
            out.append(jnp.zeros_like(seg))
        elif kind == "nonneg":
            out.append(jnp.maximum(seg, 0.0))
        elif kind == "nonpos":
            out.append(jnp.minimum(seg, 0.0))
        elif kind == "reals":
            out.append(seg)
        elif kind == "soc":
            out.append(_soc_project_block(seg))
        else:
            # exp cones etc: handled by the jnp fallback path
            raise NotImplementedError(kind)
        off += dim
    return jnp.concatenate(out, axis=1)


def _prox_h_kernel(
    dual_spec,
    nx,
    nu,
    # inputs
    sig_ref,
    y_ref,
    sby_ref,
    qx_ref,
    ru_ref,
    t5_ref,
    t6_ref,
    cx_ref,
    cu_ref,
    qNx_ref,
    s12_ref,
    s13_ref,
    cxN_ref,
    xmin_ref,
    xmax_ref,
    umin_ref,
    umax_ref,
    # outputs
    oy,
    osby,
    oqx,
    oru,
    ot5,
    ot6,
    ocx,
    ocu,
    oqNx,
    os12,
    os13,
    ocxN,
):
    sigma = sig_ref[0]
    inv = 1.0 / sigma

    # --- y block: dual-cone projection ---
    wy = y_ref[:] * inv
    oy[:] = sigma * (wy - _cone_product_block(wy, dual_spec))

    # --- sby: clip at 0 ---
    wsby = sby_ref[:] * inv
    osby[:] = sigma * (wsby - jnp.maximum(wsby, 0.0))

    # --- non-root SOC: (t6+1/2, qx, ru, t5-1/2) ---
    wt6 = t6_ref[:] * inv + 0.5  # [bt, n-1]
    wt5 = t5_ref[:] * inv - 0.5
    wqx = qx_ref[:] * inv
    wru = ru_ref[:] * inv
    vec = jnp.concatenate(
        [wt6[:, None, :], wqx, wru, wt5[:, None, :]], axis=1
    )
    p = _soc_project_block(vec)
    ot6[:] = sigma * (wt6 - p[:, 0, :])
    oqx[:] = sigma * (wqx - p[:, 1 : 1 + nx, :])
    oru[:] = sigma * (wru - p[:, 1 + nx : 1 + nx + nu, :])
    ot5[:] = sigma * (wt5 - p[:, -1, :])

    # --- leaf SOC: (s13+1/2, qNx, s12-1/2) ---
    ws13 = s13_ref[:] * inv + 0.5
    ws12 = s12_ref[:] * inv - 0.5
    wqNx = qNx_ref[:] * inv
    vecl = jnp.concatenate(
        [ws13[:, None, :], wqNx, ws12[:, None, :]], axis=1
    )
    pl_ = _soc_project_block(vecl)
    os13[:] = sigma * (ws13 - pl_[:, 0, :])
    oqNx[:] = sigma * (wqNx - pl_[:, 1 : 1 + nx, :])
    os12[:] = sigma * (ws12 - pl_[:, -1, :])

    # --- boxes ---
    xmin = xmin_ref[:].reshape(1, nx, 1)
    xmax = xmax_ref[:].reshape(1, nx, 1)
    umin = umin_ref[:].reshape(1, nu, 1)
    umax = umax_ref[:].reshape(1, nu, 1)
    wcx = cx_ref[:] * inv
    ocx[:] = sigma * (wcx - jnp.clip(wcx, xmin, xmax))
    wcu = cu_ref[:] * inv
    ocu[:] = sigma * (wcu - jnp.clip(wcu, umin, umax))
    wcxN = cxN_ref[:] * inv
    ocxN[:] = sigma * (wcxN - jnp.clip(wcxN, xmin, xmax))


def supported(meta: ProblemMeta) -> bool:
    """Pallas path covers the polyhedral/SOC cone families, no polytopes."""
    if meta.nc_nl or meta.nc_lf:
        return False
    return all(
        k in ("zero", "nonneg", "nonpos", "reals", "soc")
        for k, _ in meta.dual_cone
    )


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def prox_h_conj_fused(
    data: ProblemData,
    meta: ProblemMeta,
    v: Dual,
    sigma,
    interpret: bool = False,
) -> Dual:
    """Drop-in fused replacement for ops.prox.prox_h_conj (same math)."""
    B = v.sby.shape[0]
    bt = 1
    for cand in (8, 4, 2, 1):
        if B % cand == 0:
            bt = cand
            break
    grid = (B // bt,)

    def bspec(f_dim, n_dim):
        if f_dim is None:
            return pl.BlockSpec(
                (bt, n_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        return pl.BlockSpec(
            (bt, f_dim, n_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    t = meta.tree
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n_nl, n_nr, n_lf = t.n_nonleaf, t.n - 1, t.n_leaf

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)

    in_specs = [
        smem,  # sigma
        bspec(ny, n_nl),  # y
        bspec(None, n_nl),  # sby
        bspec(nx, n_nr),  # qx
        bspec(nu, n_nr),  # ru
        bspec(None, n_nr),  # t5
        bspec(None, n_nr),  # t6
        bspec(nx, n_nl),  # cx
        bspec(nu, n_nl),  # cu
        bspec(nx, n_lf),  # qNx
        bspec(None, n_lf),  # s12
        bspec(None, n_lf),  # s13
        bspec(nx, n_lf),  # cxN
        full((nx,)),
        full((nx,)),
        full((nu,)),
        full((nu,)),
    ]
    out_specs = [
        bspec(ny, n_nl),
        bspec(None, n_nl),
        bspec(nx, n_nr),
        bspec(nu, n_nr),
        bspec(None, n_nr),
        bspec(None, n_nr),
        bspec(nx, n_nl),
        bspec(nu, n_nl),
        bspec(nx, n_lf),
        bspec(None, n_lf),
        bspec(None, n_lf),
        bspec(nx, n_lf),
    ]
    dtype = v.sby.dtype
    out_shape = [
        jax.ShapeDtypeStruct((B, ny, n_nl), dtype),
        jax.ShapeDtypeStruct((B, n_nl), dtype),
        jax.ShapeDtypeStruct((B, nx, n_nr), dtype),
        jax.ShapeDtypeStruct((B, nu, n_nr), dtype),
        jax.ShapeDtypeStruct((B, n_nr), dtype),
        jax.ShapeDtypeStruct((B, n_nr), dtype),
        jax.ShapeDtypeStruct((B, nx, n_nl), dtype),
        jax.ShapeDtypeStruct((B, nu, n_nl), dtype),
        jax.ShapeDtypeStruct((B, nx, n_lf), dtype),
        jax.ShapeDtypeStruct((B, n_lf), dtype),
        jax.ShapeDtypeStruct((B, n_lf), dtype),
        jax.ShapeDtypeStruct((B, nx, n_lf), dtype),
    ]

    kernel = functools.partial(_prox_h_kernel, meta.dual_cone, nx, nu)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(sigma, dtype).reshape(1),
        v.y,
        v.sby,
        v.qx,
        v.ru,
        v.t5,
        v.t6,
        v.cx,
        v.cu,
        v.qNx,
        v.s12,
        v.s13,
        v.cxN,
        data.x_min,
        data.x_max,
        data.u_min,
        data.u_max,
    )
    return Dual(
        y=outs[0],
        sby=outs[1],
        qx=outs[2],
        ru=outs[3],
        t5=outs[4],
        t6=outs[5],
        cx=outs[6],
        cu=outs[7],
        qNx=outs[8],
        s12=outs[9],
        s13=outs[10],
        cxN=outs[11],
        pnl=None,
        plf=None,
    )
