"""Whole-sweep Pallas megakernel: one kernel per Chambolle-Pock sweep.

Motivation (measured, CLAUDE.md): at production sizes (n ~ 1e3 nodes) the
solver is kernel-COUNT bound — a SuperMann iteration issues ~100+ small XLA
kernels and per-lane cost stays ~constant across batch sizes.  A lane's
entire iterate is ~0.5 MB, far under VMEM, so the full sweep

    zbar = prox_f(z - gamma L' v),   vbar = prox_h*(v + sigma L (2 zbar - z))

fits in ONE Pallas kernel: all of L', the Riccati backward/forward sweeps,
the risk-kernel (S2) projection, L, and the Moreau/SOC/box projections run
back-to-back in VMEM with a lane-tile grid.

Requirements (falls back to the jnp path otherwise — see ``supported``):
uniform costs/risk (broadcast node dims), polyhedral dual risk cone, no
polytopes, and a per-lane state small enough for VMEM.  The sibling-major
stage order (tree.py) is what makes every tree traversal a contiguous
static slice here.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..problem import ProblemData, ProblemMeta
from ..zv import Dual, Primal

ENABLED = os.environ.get("SPOCK_PALLAS_SWEEP", "0") == "1"

# conservative VMEM budget for one grid step (bytes)
_VMEM_BUDGET = 10 * 1024 * 1024


def _per_lane_bytes(meta: ProblemMeta) -> int:
    t = meta.tree
    nz = meta.nz
    nv = meta.nv
    scratch = t.n * meta.nx + t.n_nonleaf * meta.nu + 2 * t.n
    return 4 * (2 * (nz + nv) + scratch)


def supported(meta: ProblemMeta, data: ProblemData) -> bool:
    if meta.nc_nl or meta.nc_lf:
        return False
    if any(k not in ("zero", "nonneg", "nonpos", "reals") for k, _ in meta.dual_cone):
        return False
    # uniform (broadcast) problem data only
    for arr in (data.sqrtQ, data.sqrtR, data.sqrtQN, data.E, data.F, data.b,
                data.ker_proj):
        if arr.shape[0] != 1:
            return False
    return _per_lane_bytes(meta) <= _VMEM_BUDGET


def _mm(M, X):
    """[a, b] x [bt, b, n] -> [bt, a, n] (MXU)."""
    return jax.lax.dot_general(
        M,
        X,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=X.dtype,
    ).transpose(1, 0, 2)


def _soc_pieces(t, xn_sq):
    xn = jnp.sqrt(xn_sq)
    inside = xn <= t
    polar = xn <= -t
    safe = jnp.where(xn > 0, xn, 1.0)
    t_new = (t + xn) * 0.5
    scale = t_new / safe
    t_out = jnp.where(inside, t, jnp.where(polar, 0.0, t_new))
    x_scale = jnp.where(inside, 1.0, jnp.where(polar, 0.0, scale))
    return t_out, x_scale


def _make_kernel(meta: ProblemMeta, cone_segments):
    t = meta.tree
    N, d = t.N, t.d
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, ls = t.n, t.n_nonleaf, t.leaf_start
    mker = ny + 2 * d
    off = [t.stage_offset(i) for i in range(N + 1)]
    msz = [t.stage_size(i) for i in range(N)]

    def kernel(
        # scalars
        scal_ref,  # [2] = (gamma, sigma) in SMEM
        # constants
        sqrtQ_ref, sqrtR_ref, sqrtQN_ref, b_ref, ker_ref,
        Kst_ref, Rti_ref, ABK_ref, PB_ref, Bdyn_ref,
        xmin_ref, xmax_ref, umin_ref, umax_ref,
        # per-lane state
        x0_ref,
        zx_ref, zu_ref, zs_ref, ztau_ref, zy_ref,
        vy_ref, vsby_ref, vqx_ref, vru_ref, vt5_ref, vt6_ref,
        vcx_ref, vcu_ref, vqNx_ref, vs12_ref, vs13_ref, vcxN_ref,
        # outputs: zbar blocks then vbar blocks
        ozx, ozu, ozs, oztau, ozy,
        ovy, ovsby, ovqx, ovru, ovt5, ovt6,
        ovcx, ovcu, ovqNx, ovs12, ovs13, ovcxN,
        # scratch
        gx, gu, gq, gs,
    ):
        gamma = scal_ref[0]
        sigma = scal_ref[1]
        sqrtQ = sqrtQ_ref[:]
        sqrtR = sqrtR_ref[:]
        sqrtQN = sqrtQN_ref[:]
        bvec = b_ref[:]
        ker = ker_ref[:]

        # ============ z1 = z - gamma * L'(v), into (gx, gu, zs', tau', y') ==
        # x: non-leaf part
        gx[:, :, :n_nl] = vcx_ref[:]
        # leaf part: cxN + sqrtQN' qNx
        gx[:, :, ls:] = vcxN_ref[:] + _mm(sqrtQN.T, vqNx_ref[:])
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            tmp = _mm(sqrtQ.T, vqx_ref[:, :, lo : lo + d * m])
            acc = tmp[:, :, 0:m]
            for k in range(1, d):
                acc = acc + tmp[:, :, k * m : (k + 1) * m]
            gx[:, :, off[st - 1] : off[st - 1] + m] = (
                gx[:, :, off[st - 1] : off[st - 1] + m] + acc
            )
        # u
        gu[:] = vcu_ref[:]
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            tmp = _mm(sqrtR.T, vru_ref[:, :, lo : lo + d * m])
            acc = tmp[:, :, 0:m]
            for k in range(1, d):
                acc = acc + tmp[:, :, k * m : (k + 1) * m]
            gu[:, :, off[st - 1] : off[st - 1] + m] = (
                gu[:, :, off[st - 1] : off[st - 1] + m] + acc
            )
        # z1 for x,u (overwrite scratch with z - gamma * LT)
        gx[:] = zx_ref[:] - gamma * gx[:]
        gu[:] = zu_ref[:] - gamma * gu[:]
        # s, tau, y (kept as values)
        lt_s_nl = vsby_ref[:]
        lt_s_lf = 0.5 * (vs12_ref[:] + vs13_ref[:])
        s1_nl = zs_ref[:, :n_nl] - gamma * lt_s_nl
        s1_lf = zs_ref[:, ls:] - gamma * lt_s_lf
        tau1 = ztau_ref[:] - gamma * 0.5 * (vt5_ref[:] + vt6_ref[:])
        vsby_v = vsby_ref[:]
        y1 = zy_ref[:] - gamma * (
            vy_ref[:] - bvec[:, :, None] * vsby_v[:, None, :]
        )

        # ============ prox_f ============
        # s_root -= gamma
        s1_nl_root = s1_nl[:, 0:1] - gamma
        # ---- S1 Riccati: backward ----
        gq[:, :, ls:] = -gx[:, :, ls:]
        for st in range(N - 2, -1, -1):
            m = msz[st]
            Kt = Kst_ref[st]
            Rti = Rti_ref[st]
            u_st = gu[:, :, off[st] : off[st] + m]
            # sum over children of B' q_child
            sum_d = None
            for k in range(d):
                qk = gq[:, :, off[st + 1] + k * m : off[st + 1] + (k + 1) * m]
                term = _mm(Bdyn_ref[k].T, qk)
                sum_d = term if sum_d is None else sum_d + term
            dv = _mm(Rti, u_st - sum_d)
            gs[:, :, off[st] : off[st] + m] = dv  # stash dvec in gs (nu rows)
            qi = None
            for k in range(d):
                qk = gq[:, :, off[st + 1] + k * m : off[st + 1] + (k + 1) * m]
                inner = _mm(PB_ref[st, k], dv) + qk
                term = _mm(ABK_ref[st, k].T, inner)
                qi = term if qi is None else qi + term
            qi = qi + _mm(Kt.T, dv - u_st)
            gq[:, :, off[st] : off[st] + m] = qi - gx[:, :, off[st] : off[st] + m]
        # ---- S1 forward ----
        gx[:, :, 0:1] = x0_ref[:][:, :, None]
        for st in range(N - 1):
            m = msz[st]
            x_st = gx[:, :, off[st] : off[st] + m]
            dv = gs[:, :, off[st] : off[st] + m]
            u_st = _mm(Kst_ref[st], x_st) + dv
            gu[:, :, off[st] : off[st] + m] = u_st
            for k in range(d):
                gx[:, :, off[st + 1] + k * m : off[st + 1] + (k + 1) * m] = (
                    _mm(ABK_ref[st, k], x_st) + _mm(Bdyn_ref[k], dv)
                )
        # ---- S2 kernel projection ----
        # vec rows: [y (ny); s_child (d); tau_child (d)] per non-leaf column
        # build in a values array [bt, mker, n_nl]
        rows = [y1]
        schild = []
        tchild = []
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            if st < N - 1:
                sblk = s1_nl[:, off[st] : off[st] + d * m]
            else:
                sblk = s1_lf
            schild.append(sblk.reshape(sblk.shape[0], d, m))
            tblk = tau1[:, lo : lo + d * m]
            tchild.append(tblk.reshape(tblk.shape[0], d, m))
        rows.append(jnp.concatenate(schild, axis=-1))
        rows.append(jnp.concatenate(tchild, axis=-1))
        vec = jnp.concatenate(rows, axis=-2)  # [bt, mker, n_nl]
        out = _mm(ker, vec)
        y_p = out[:, :ny, :]
        s_ch = out[:, ny : ny + d, :]
        t_ch = out[:, ny + d :, :]
        # scatter back per stage
        s_nl_parts = [s1_nl_root]
        tau_parts = []
        s_lf_val = None
        coff = 0
        for st in range(1, N):
            m = msz[st - 1]
            sblk = s_ch[:, :, coff : coff + m].reshape(s_ch.shape[0], d * m)
            tblk = t_ch[:, :, coff : coff + m].reshape(t_ch.shape[0], d * m)
            tau_parts.append(tblk)
            if st < N - 1:
                s_nl_parts.append(sblk)
            else:
                s_lf_val = sblk
            coff += m
        s_nl_val = jnp.concatenate(s_nl_parts, axis=-1)  # [bt, n_nl]
        tau_val = jnp.concatenate(tau_parts, axis=-1)

        # write zbar outputs
        ozx[:] = gx[:]
        ozu[:] = gu[:]
        ozs[:, :n_nl] = s_nl_val
        ozs[:, ls:] = s_lf_val
        oztau[:] = tau_val
        ozy[:] = y_p

        # ============ vbar = prox_h*(v + sigma L (2 zbar - z)) ============
        rx = 2.0 * gx[:] - zx_ref[:]
        ru_ = 2.0 * gu[:] - zu_ref[:]
        rs_nl = 2.0 * s_nl_val - zs_ref[:, :n_nl]
        rs_lf = 2.0 * s_lf_val - zs_ref[:, ls:]
        rtau = 2.0 * tau_val - ztau_ref[:]
        ry = 2.0 * y_p - zy_ref[:]

        inv = 1.0 / sigma
        # --- y block (w = v/sigma + L(refl)): L v1 block = ry
        wy = vy_ref[:] * inv + ry
        rid = jax.lax.broadcasted_iota(jnp.int32, wy.shape, dimension=1)
        py = wy
        for kind, lo_, hi_ in cone_segments:
            mseg = (rid >= lo_) & (rid < hi_)
            if kind == "nonneg":
                py = jnp.where(mseg, jnp.maximum(wy, 0.0), py)
            elif kind == "nonpos":
                py = jnp.where(mseg, jnp.minimum(wy, 0.0), py)
            elif kind == "zero":
                py = jnp.where(mseg, 0.0, py)
        ovy[:] = sigma * (wy - py)
        # --- sby
        bty = jnp.sum(bvec[:, :, None] * ry, axis=1)  # b' y(refl)
        wsby = vsby_ref[:] * inv + (rs_nl - bty)
        ovsby[:] = sigma * (wsby - jnp.maximum(wsby, 0.0))
        # --- non-root SOC blocks: qx/ru/t5/t6 of L(refl)
        # L qx block = sqrtQ x_parent(refl); build per stage then concat
        qx_parts = []
        ru_parts = []
        for st in range(1, N):
            m = msz[st - 1]
            xp = rx[:, :, off[st - 1] : off[st - 1] + m]
            up = ru_[:, :, off[st - 1] : off[st - 1] + m]
            qxp = _mm(sqrtQ, xp)
            rup = _mm(sqrtR, up)
            qx_parts.append(jnp.concatenate([qxp] * d, axis=-1))
            ru_parts.append(jnp.concatenate([rup] * d, axis=-1))
        lqx = jnp.concatenate(qx_parts, axis=-1)
        lru = jnp.concatenate(ru_parts, axis=-1)
        wqx = vqx_ref[:] * inv + lqx
        wru = vru_ref[:] * inv + lru
        wt5 = vt5_ref[:] * inv + 0.5 * rtau - 0.5
        wt6 = vt6_ref[:] * inv + 0.5 * rtau + 0.5
        xn_sq = (
            jnp.sum(wqx * wqx, axis=1) + jnp.sum(wru * wru, axis=1) + wt5 * wt5
        )
        t_out, x_scale = _soc_pieces(wt6, xn_sq)
        ovt6[:] = sigma * (wt6 - t_out)
        xs = x_scale[:, None, :]
        ovqx[:] = sigma * (wqx - xs * wqx)
        ovru[:] = sigma * (wru - xs * wru)
        ovt5[:] = sigma * (wt5 - x_scale * wt5)
        # --- leaf SOC: qNx/s12/s13
        wqNx = vqNx_ref[:] * inv + _mm(sqrtQN, rx[:, :, ls:])
        ws12 = vs12_ref[:] * inv + 0.5 * rs_lf - 0.5
        ws13 = vs13_ref[:] * inv + 0.5 * rs_lf + 0.5
        xn_sq_l = jnp.sum(wqNx * wqNx, axis=1) + ws12 * ws12
        tl_out, xl_scale = _soc_pieces(ws13, xn_sq_l)
        ovs13[:] = sigma * (ws13 - tl_out)
        ovqNx[:] = sigma * (wqNx - xl_scale[:, None, :] * wqNx)
        ovs12[:] = sigma * (ws12 - xl_scale * ws12)
        # --- boxes
        xmin = xmin_ref[:].reshape(1, nx, 1)
        xmax = xmax_ref[:].reshape(1, nx, 1)
        umin = umin_ref[:].reshape(1, nu, 1)
        umax = umax_ref[:].reshape(1, nu, 1)
        wcx = vcx_ref[:] * inv + rx[:, :, :n_nl]
        ovcx[:] = sigma * (wcx - jnp.clip(wcx, xmin, xmax))
        wcu = vcu_ref[:] * inv + ru_
        ovcu[:] = sigma * (wcu - jnp.clip(wcu, umin, umax))
        wcxN = vcxN_ref[:] * inv + rx[:, :, ls:]
        ovcxN[:] = sigma * (wcxN - jnp.clip(wcxN, xmin, xmax))

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def cp_sweep_fused(
    data: ProblemData,
    meta: ProblemMeta,
    z: Primal,
    v: Dual,
    gamma,
    sigma,
    x0,
    interpret: bool = False,
):
    """One-kernel cp_sweep; returns (zbar, vbar).  Same math as
    algorithms.common.cp_sweep on the supported problem class."""
    from ..risks import ConeSpec  # noqa: F401

    t = meta.tree
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    B = z.s.shape[0]
    bt = 1
    for cand in (4, 2, 1):
        if B % cand == 0 and _per_lane_bytes(meta) * cand <= _VMEM_BUDGET:
            bt = cand
            break
    grid = (B // bt,)
    dtype = z.s.dtype

    # cone segments of the dual risk cone
    segs = []
    o = 0
    for kind, dim in meta.dual_cone:
        segs.append((kind, o, o + dim))
        o += dim

    kernel = _make_kernel(meta, tuple(segs))

    def lane(f_dim, n_dim):
        if f_dim is None:
            return pl.BlockSpec((bt, n_dim), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((bt, f_dim, n_dim), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM)

    Kst = jnp.stack([k[0] for k in data.ric.K])  # [N-1, nu, nx]
    Rti = jnp.stack([r[0] for r in data.ric.Rtinv])
    ABK = jnp.stack([a[0] for a in data.ric.ABK])  # [N-1, d, nx, nx]
    PB = jnp.stack([p[0] for p in data.ric.PB])

    mker = ny + 2 * t.d
    in_specs = [
        smem,
        const((nx, nx)), const((nu, nu)), const((nx, nx)),
        const((1, ny)), const((mker, mker)),
        const(Kst.shape), const(Rti.shape), const(ABK.shape), const(PB.shape),
        const(data.B.shape),
        const((nx,)), const((nx,)), const((nu,)), const((nu,)),
        lane(None, nx),  # x0 -> [bt, nx]
        lane(nx, n), lane(nu, n_nl), lane(None, n), lane(None, n_nr),
        lane(ny, n_nl),
        lane(ny, n_nl), lane(None, n_nl), lane(nx, n_nr), lane(nu, n_nr),
        lane(None, n_nr), lane(None, n_nr), lane(nx, n_nl), lane(nu, n_nl),
        lane(nx, n_lf), lane(None, n_lf), lane(None, n_lf), lane(nx, n_lf),
    ]
    out_specs = [
        lane(nx, n), lane(nu, n_nl), lane(None, n), lane(None, n_nr),
        lane(ny, n_nl),
        lane(ny, n_nl), lane(None, n_nl), lane(nx, n_nr), lane(nu, n_nr),
        lane(None, n_nr), lane(None, n_nr), lane(nx, n_nl), lane(nu, n_nl),
        lane(nx, n_lf), lane(None, n_lf), lane(None, n_lf), lane(nx, n_lf),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, nx, n), dtype),
        jax.ShapeDtypeStruct((B, nu, n_nl), dtype),
        jax.ShapeDtypeStruct((B, n), dtype),
        jax.ShapeDtypeStruct((B, n_nr), dtype),
        jax.ShapeDtypeStruct((B, ny, n_nl), dtype),
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
    scratch = [
        pltpu.VMEM((bt, nx, n), dtype),  # gx
        pltpu.VMEM((bt, nu, n_nl), dtype),  # gu
        pltpu.VMEM((bt, nx, n), dtype),  # gq (costate)
        pltpu.VMEM((bt, max(nu, 1), n_nl), dtype),  # gs (dvec stash)
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        jnp.stack([jnp.asarray(gamma, dtype), jnp.asarray(sigma, dtype)]),
        data.sqrtQ[0], data.sqrtR[0], data.sqrtQN[0],
        data.b, data.ker_proj[0],
        Kst, Rti, ABK, PB, data.B,
        data.x_min, data.x_max, data.u_min, data.u_max,
        x0,
        z.x, z.u, z.s, z.tau, z.y,
        v.y, v.sby, v.qx, v.ru, v.t5, v.t6,
        v.cx, v.cu, v.qNx, v.s12, v.s13, v.cxN,
    )
    zbar = Primal(x=outs[0], u=outs[1], s=outs[2], tau=outs[3], y=outs[4])
    vbar = Dual(
        y=outs[5], sby=outs[6], qx=outs[7], ru=outs[8], t5=outs[9],
        t6=outs[10], cx=outs[11], cu=outs[12], qNx=outs[13], s12=outs[14],
        s13=outs[15], cxN=outs[16], pnl=None, plf=None,
    )
    return zbar, vbar
