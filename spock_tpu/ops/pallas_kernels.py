"""Pallas TPU kernels for the hot per-iteration blocks.

First production kernel: fused ``prox_h_conj``.  The jnp implementation is
correct but XLA materializes several HBM passes (scale, epigraph shifts, SOC
stack/concat, projections, Moreau subtract — measured ~7x below HBM peak);
this kernel does one read and one write per dual block with all arithmetic
in VMEM.

Implementation constraints (Mosaic TPU lowering): no concatenates or
sub-tile slicing inside the kernel — the SOC projections are computed
component-wise from the squared-norm reduction, and the product-cone
projection of the y block uses precomputed per-row masks instead of segment
slices.  SOC segments inside K* are therefore routed to the jnp fallback
(``supported`` returns False); the common AV@R/TV polyhedral duals take the
fused path.

Grid-parallel over lane tiles; feature-major [bt, f, n] blocks with
reductions over the sublane/feature axis.  Falls back to interpret mode
off-TPU so the CPU test suite exercises the same code path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..problem import ProblemData, ProblemMeta
from ..zv import Dual

# opt-in: SPOCK_PALLAS=1 enables the fused kernels inside the solver
ENABLED = os.environ.get("SPOCK_PALLAS", "0") == "1"


def _soc_pieces(t, xn_sq):
    """SOC projection factors from t ([bt, n]) and ||x||^2 ([bt, n]):
    returns (t_out, x_scale) with x_out = x_scale * x applied elementwise to
    every x component — no stacked cone vector needed."""
    xn = jnp.sqrt(xn_sq)
    inside = xn <= t
    polar = xn <= -t
    safe = jnp.where(xn > 0, xn, 1.0)
    t_new = (t + xn) * 0.5
    scale = t_new / safe
    t_out = jnp.where(inside, t, jnp.where(polar, 0.0, t_new))
    x_scale = jnp.where(inside, 1.0, jnp.where(polar, 0.0, scale))
    return t_out, x_scale


def _cone_segments(dual_spec):
    """Static (kind, start, end) row segments of a polyhedral product cone."""
    segs = []
    off = 0
    for kind, dim in dual_spec:
        segs.append((kind, off, off + dim))
        off += dim
    return tuple(segs)


def _prox_h_kernel(
    cone_segments,
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

    # --- y block: polyhedral dual-cone projection via static row masks
    # (row-id iota comparisons — pallas kernels cannot close over arrays) ---
    wy = y_ref[:] * inv
    rid = jax.lax.broadcasted_iota(jnp.int32, wy.shape, dimension=1)
    py = wy
    for kind, lo, hi in cone_segments:
        m = (rid >= lo) & (rid < hi)
        if kind == "nonneg":
            py = jnp.where(m, jnp.maximum(wy, 0.0), py)
        elif kind == "nonpos":
            py = jnp.where(m, jnp.minimum(wy, 0.0), py)
        elif kind == "zero":
            py = jnp.where(m, 0.0, py)
        # reals: identity
    oy[:] = sigma * (wy - py)

    # --- sby: clip at 0 ---
    wsby = sby_ref[:] * inv
    osby[:] = sigma * (wsby - jnp.maximum(wsby, 0.0))

    # --- non-root SOC: t = t6 + 1/2; x = (qx, ru, t5 - 1/2) ---
    wt6 = t6_ref[:] * inv + 0.5  # [bt, n-1]
    wt5 = t5_ref[:] * inv - 0.5
    wqx = qx_ref[:] * inv  # [bt, nx, n-1]
    wru = ru_ref[:] * inv
    xn_sq = (
        jnp.sum(wqx * wqx, axis=1)
        + jnp.sum(wru * wru, axis=1)
        + wt5 * wt5
    )
    t_out, x_scale = _soc_pieces(wt6, xn_sq)
    ot6[:] = sigma * (wt6 - t_out)
    xs = x_scale[:, None, :]
    oqx[:] = sigma * (wqx - xs * wqx)
    oru[:] = sigma * (wru - xs * wru)
    ot5[:] = sigma * (wt5 - x_scale * wt5)

    # --- leaf SOC: t = s13 + 1/2; x = (qNx, s12 - 1/2) ---
    ws13 = s13_ref[:] * inv + 0.5
    ws12 = s12_ref[:] * inv - 0.5
    wqNx = qNx_ref[:] * inv
    xn_sq_l = jnp.sum(wqNx * wqNx, axis=1) + ws12 * ws12
    tl_out, xl_scale = _soc_pieces(ws13, xn_sq_l)
    os13[:] = sigma * (ws13 - tl_out)
    xls = xl_scale[:, None, :]
    oqNx[:] = sigma * (wqNx - xls * wqNx)
    os12[:] = sigma * (ws12 - xl_scale * ws12)

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
    """Fused path covers polyhedral dual cones without polytopes."""
    if meta.nc_nl or meta.nc_lf:
        return False
    return all(
        k in ("zero", "nonneg", "nonpos", "reals") for k, _ in meta.dual_cone
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

    kernel = functools.partial(
        _prox_h_kernel, _cone_segments(meta.dual_cone), nx, nu
    )
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
