"""Whole-sweep Pallas megakernel: one kernel per Chambolle-Pock sweep.

Motivation (measured, CLAUDE.md): at production sizes (n ~ 1e3 nodes) the
solver is kernel-COUNT bound — a SuperMann iteration issues ~100+ small XLA
kernels and per-lane cost stays ~constant across batch sizes.  A lane's
entire iterate is ~0.5 MB, far under VMEM, so the full sweep

    zbar = prox_f(z - gamma L' v),   vbar = prox_h*(v + sigma L (2 zbar - z))

fits in ONE Pallas kernel: all of L', the Riccati backward/forward sweeps,
the risk-kernel (S2) projection, L, and the Moreau/SOC/box projections run
back-to-back in VMEM with a lane-tile grid.

Mosaic-compatibility rules this kernel follows (learned on-chip):
* the last two dims of every block are full-size — per-lane vectors travel
  as [B, 1, n] and x0 as [B, nx, 1];
* no 3D dot_general — matmuls run as ``bt`` explicit 2D MXU dots;
* NO register-slice arithmetic or concatenation at nonzero lane offsets
  (Mosaic's relayout for offset-mismatched vectors is not implemented) —
  all tree regrouping goes through VMEM scratch: stores and loads at
  arbitrary static offsets canonicalize layouts.  The sibling-major stage
  order (tree.py) is what makes every such transfer a contiguous slice.

Requirements (falls back to the jnp path otherwise — see ``supported``):
uniform costs/risk (broadcast node dims), polyhedral dual risk cone, and a
per-lane state small enough for VMEM.  Two-sided polytopic constraints
(problem.Polytope) are supported: their dual rows ride as two extra lane
blocks through every phase (L', prox_h* clip, metric, direction).
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

def enabled() -> bool:
    """The megakernel is the production path: default-on on real hardware,
    default-off on CPU (interpret mode is for its own correctness tests, not
    for running the whole suite through an emulator).  SPOCK_PALLAS_SWEEP=0/1
    forces — read at call time, so setting it after import works."""
    env = os.environ.get("SPOCK_PALLAS_SWEEP")
    if env == "1":
        return True
    if env == "0":
        return False
    # default device is the TPU chip under the axon platform; only plain CPU
    # (the float64 oracle/test environment) stays on the jnp reference path
    return jax.default_backend() != "cpu"

# VMEM budget for one grid step (bytes).  The kernels request a raised scoped
# limit via CompilerParams (the default 16 MiB stack limit OOMs at production
# sizes); sizing below is exact-padded, so the budget only needs pipeline
# headroom.
_VMEM_BUDGET = 64 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _padded(f: int, w: int) -> int:
    """Floats occupied by an [f, w] f32 block under TPU (8, 128) tiling."""
    return ((f + 7) // 8) * 8 * ((w + 127) // 128) * 128


def _iterate_padded(meta: ProblemMeta) -> int:
    """Padded per-lane floats of one (Primal, Dual) iterate as kernel blocks."""
    t = meta.tree
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    blocks = [
        (nx, n), (nu, n_nl), (1, n), (1, n_nr), (ny, n_nl),  # primal
        (ny, n_nl), (1, n_nl), (nx, n_nr), (nu, n_nr), (1, n_nr),
        (1, n_nr), (nx, n_nl), (nu, n_nl), (nx, n_lf), (1, n_lf),
        (1, n_lf), (nx, n_lf),  # dual
    ]
    if meta.nc_nl:
        blocks.append((meta.nc_nl, n_nl))
    if meta.nc_lf:
        blocks.append((meta.nc_lf, n_lf))
    return sum(_padded(f, w) for f, w in blocks)


def _scratch_padded(meta: ProblemMeta) -> int:
    t = meta.tree
    nx, nu = meta.nx, meta.nu
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    mker = meta.ny + 2 * t.d
    child_w = max(n_lf // t.d, 1)
    blocks = [
        (nx, n), (nu, n_nl), (nx, n), (max(nu, 1), max(n_nl, n_lf)),
        (mker, n_nl), (mker, n_nl), (1, n), (1, n_nr), (nx, n_nr),
        (max(nu, 1), n_nr), (max(t.d * nx, nx + nu), child_w),
        (t.d * nx, child_w),
    ]
    return sum(_padded(f, w) for f, w in blocks)


def _vmem_bytes(
    meta: ProblemMeta, bt: int, n_out_iterates: int, n_in_iterates: int = 1
) -> int:
    """Estimated scoped-VMEM bytes for one sweep-kernel grid step: I/O blocks
    are double-buffered by the Mosaic pipeline; scratch is persistent."""
    it = _iterate_padded(meta)
    io = (n_in_iterates + n_out_iterates) * it + _padded(meta.nx, 1)
    return 4 * bt * (2 * io + _scratch_padded(meta))


def _pick_bt(
    meta: ProblemMeta, B: int, n_out_iterates: int, n_in_iterates: int = 1
) -> int:
    for cand in (8, 4, 2, 1):
        if B % cand == 0 and _vmem_bytes(
            meta, cand, n_out_iterates, n_in_iterates
        ) <= _VMEM_BUDGET:
            return cand
    return 1


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",),  # lane tiles are independent
        vmem_limit_bytes=_VMEM_LIMIT,
    )


def supported(meta: ProblemMeta, data: ProblemData) -> bool:
    if any(k not in ("zero", "nonneg", "nonpos", "reals") for k, _ in meta.dual_cone):
        return False
    # RISK data (b and the S2 projectors) may be per-node — the kernel
    # consumes b as [ny, n_nl] and ker_proj as a [mker^2, n_nl] contraction
    # (r4, nonuniform AV@R, risk_measures.jl:127-136).  COST matrices may be
    # per-node too (r5): sqrtQ/sqrtR/sqrtQN ride as [b*a, n] slabs consumed
    # by a static a-term multiply-add contraction (the cost convention:
    # Q[j-1]/R[j-1] weight the parent's (x, u) on the edge to non-root j,
    # cost.jl:1-7 / model_mosek.jl:16-26).
    if data.b.shape[0] not in (1, meta.tree.n_nonleaf):
        return False
    if data.ker_proj.shape[0] != data.b.shape[0]:
        return False
    t = meta.tree
    if data.sqrtQ.shape[0] not in (1, t.n - 1):
        return False
    if data.sqrtR.shape[0] not in (1, t.n - 1):
        return False
    if data.sqrtQN.shape[0] not in (1, t.n_leaf):
        return False
    # worst case: the candidate kernel (2 input iterates, 2 output iterates)
    return (
        _vmem_bytes(meta, 1, 2, 2) + _cost_slab_bytes(meta, data)
        <= _VMEM_BUDGET
    )


def _cost_slab_bytes(meta: ProblemMeta, data: ProblemData) -> int:
    """Extra VMEM of the per-node cost slabs (0 when costs are uniform)."""
    t = meta.tree
    total = 0
    if data.sqrtQ.shape[0] != 1:
        total += 2 * meta.nx * meta.nx * (t.n - 1)
    if data.sqrtR.shape[0] != 1:
        total += 2 * meta.nu * meta.nu * (t.n - 1)
    if data.sqrtQN.shape[0] != 1:
        total += 2 * meta.nx * meta.nx * t.n_leaf
    return 4 * total


def _cost_consts(data: ProblemData):
    """(qf, qt, rf, rt, qnf, qnt) kernel constants for the cost matrices.

    Uniform: the [a, a] matrix and its transpose (one MXU dot per use).
    Per-node: forward/transpose SLABS [a*a, n] with
    ``slabF[j*a + i, c] = M[c, i, j]`` / ``slabT[k*a + i, c] = M[c, k, i]``
    consumed by an a-term row-broadcast multiply-add contraction (one wide
    VPU FMA per input row — cheaper than per-lane dots, no MXU)."""

    def pair(m):
        if m.shape[0] == 1:
            return m[0], m[0].T
        n, a, _ = m.shape
        return (
            m.transpose(2, 1, 0).reshape(a * a, n),
            m.transpose(1, 2, 0).reshape(a * a, n),
        )

    qf, qt = pair(data.sqrtQ)
    rf, rt = pair(data.sqrtR)
    qnf, qnt = pair(data.sqrtQN)
    return qf, qt, rf, rt, qnf, qnt


def _risk_consts(meta: ProblemMeta, data: ProblemData):
    """(b_arg, ker_arg) in kernel layout: [ny, 1] / [mker, mker] when the
    risk is uniform, [ny, n_nl] / [mker*mker, n_nl] when per-node (the
    kernel branches statically on these shapes)."""
    mker = meta.ny + 2 * meta.tree.d
    if data.b.shape[0] == 1:
        return data.b[0][:, None], data.ker_proj[0]
    n_nl = meta.tree.n_nonleaf
    return (
        data.b.T,
        data.ker_proj.transpose(1, 2, 0).reshape(mker * mker, n_nl),
    )


def _mm(M, X):
    """[a, b] x [bt, b, n] -> [bt, a, n] as bt explicit 2D MXU dots.

    Mosaic's 3D dot_general lowering collapses (bt, n) into one lane axis
    (an unsupported shape cast for small unaligned n), so the batch loop is
    unrolled into clean 2D matmuls instead."""
    outs = [
        jnp.dot(
            M, X[i], preferred_element_type=X.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        for i in range(X.shape[0])
    ]
    return jnp.stack(outs, axis=0)


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


def _make_kernel(
    meta: ProblemMeta,
    cone_segments,
    with_metric: bool = False,
    with_direction: bool = False,
):
    """Build the sweep kernel body.

    with_metric: additionally emit M r of the sweep residual plus per-lane
    reductions (||r||_M^2, inf-norms of M r's primal/dual halves).
    with_direction: the kernel evaluates the sweep at the SuperMann
    *candidate* point (z, v) + tau * (dz, dv) (sp.jl:118-164) — tau and the
    direction arrive as extra inputs, every z/v read is shifted in VMEM, and
    the metric image of the direction M d is reduced in-kernel to the three
    scalars SuperMann actually consumes (<r~, M d> and the two inf-norms for
    the operator-free termination residuals) without ever materializing M d
    in HBM.
    """
    assert with_metric or not with_direction
    t = meta.tree
    N, d = t.N, t.d
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    nc, ncL = meta.nc_nl, meta.nc_lf
    npb = 17 + (1 if nc else 0) + (1 if ncL else 0)  # pair blocks
    n, n_nl, ls = t.n, t.n_nonleaf, t.leaf_start
    off = [t.stage_offset(i) for i in range(N + 1)]
    msz = [t.stage_size(i) for i in range(N)]
    mker = ny + 2 * d

    def kernel(
        # scalars
        scal_ref,  # [2] = (gamma, sigma) in SMEM
        # constants (transposes precomputed on host: in-kernel 2D transposes
        # are another Mosaic relayout hazard)
        sqrtQ_ref, sqrtR_ref, sqrtQN_ref, sqrtQT_ref, sqrtRT_ref,
        sqrtQNT_ref, b_ref, ker_ref,
        Kst_ref, KstT_ref, Rti_ref, BTall_ref, PBstk_ref, ABKTall_ref,
        ABKBall_ref,
        xmin_ref, xmax_ref, umin_ref, umax_ref,
        # then (in rest): optional polytope constants, x0, the per-lane
        # state blocks (17 + optional vpnl/vplf); with_direction: tau then
        # the direction blocks; outputs: zbar/vbar blocks (then, with
        # with_metric, M r and the scalar reductions); trailing 12 refs are
        # scratch
        *rest,
    ):
        if nc:
            Gx_ref, Gu_ref, GxT_ref, GuT_ref, plo_ref, phi_ref = rest[:6]
            rest = rest[6:]
        if ncL:
            GxN_ref, GxNT_ref, ploN_ref, phiN_ref = rest[:4]
            rest = rest[4:]
        x0_ref = rest[0]
        (
            zx_ref, zu_ref, zs_ref, ztau_ref, zy_ref,
            vy_ref, vsby_ref, vqx_ref, vru_ref, vt5_ref, vt6_ref,
            vcx_ref, vcu_ref, vqNx_ref, vs12_ref, vs13_ref, vcxN_ref,
        ) = rest[1:18]
        rest = rest[18:]
        vpnl_ref = vplf_ref = None
        if nc:
            vpnl_ref = rest[0]
            rest = rest[1:]
        if ncL:
            vplf_ref = rest[0]
            rest = rest[1:]
        if with_direction:
            (
                tau_ref,
                dzx_ref, dzu_ref, dzs_ref, dztau_ref, dzy_ref,
                dvy_ref, dvsby_ref, dvqx_ref, dvru_ref, dvt5_ref, dvt6_ref,
                dvcx_ref, dvcu_ref, dvqNx_ref, dvs12_ref, dvs13_ref,
                dvcxN_ref,
            ) = rest[:18]
            rest = rest[18:]
            dpnl_ref = dplf_ref = None
            if nc:
                dpnl_ref = rest[0]
                rest = rest[1:]
            if ncL:
                dplf_ref = rest[0]
                rest = rest[1:]
        out_refs, (gx, gu, gq, gs, gk, gk2, gss, gtt, gqx, gru, gst, gst2) = (
            rest[:-12],
            rest[-12:],
        )
        (
            ozx, ozu, ozs, oztau, ozy,
            ovy, ovsby, ovqx, ovru, ovt5, ovt6,
            ovcx, ovcu, ovqNx, ovs12, ovs13, ovcxN,
        ) = out_refs[:17]
        ovpnl = ovplf = None
        k_ = 17
        if nc:
            ovpnl = out_refs[k_]
            k_ += 1
        if ncL:
            ovplf = out_refs[k_]
            k_ += 1
        gamma = scal_ref[0]
        sigma = scal_ref[1]
        # b is [ny, 1] (uniform) or [ny, n_nl] (per-node risk) — every use
        # broadcasts against [bt, ny, n_nl], so both shapes just work
        b3 = b_ref[:][None]
        ker = ker_ref[:]
        # cost matrices: uniform [a, a] (+ transpose) -> per-lane MXU dots;
        # per-node SLABS [a*a, n] -> static a-term row-broadcast multiply-add
        # over the node slice (see _cost_consts)
        pnQ = sqrtQ_ref.shape != (nx, nx)
        pnR = sqrtR_ref.shape != (nu, nu)
        pnQN = sqrtQN_ref.shape != (nx, nx)
        pnC = pnQ or pnR

        def _slab_mm(slab_ref, X, lo_, hi_):
            b_in = X.shape[1]
            a = slab_ref.shape[0] // b_in
            acc = slab_ref[0:a, lo_:hi_][None] * X[:, 0:1, :]
            for j in range(1, b_in):
                acc = acc + (
                    slab_ref[j * a : (j + 1) * a, lo_:hi_][None]
                    * X[:, j : j + 1, :]
                )
            return acc

        def qmm(X, lo_, hi_):
            return (_slab_mm(sqrtQ_ref, X, lo_, hi_) if pnQ
                    else _mm(sqrtQ_ref[:], X))

        def qtmm(X, lo_, hi_):
            return (_slab_mm(sqrtQT_ref, X, lo_, hi_) if pnQ
                    else _mm(sqrtQT_ref[:], X))

        def rmm(X, lo_, hi_):
            return (_slab_mm(sqrtR_ref, X, lo_, hi_) if pnR
                    else _mm(sqrtR_ref[:], X))

        def rtmm(X, lo_, hi_):
            return (_slab_mm(sqrtRT_ref, X, lo_, hi_) if pnR
                    else _mm(sqrtRT_ref[:], X))

        def qnmm(X):
            return (_slab_mm(sqrtQN_ref, X, 0, n - ls) if pnQN
                    else _mm(sqrtQN_ref[:], X))

        def qntmm(X):
            return (_slab_mm(sqrtQNT_ref, X, 0, n - ls) if pnQN
                    else _mm(sqrtQNT_ref[:], X))

        def s2_project(gk_all, dst):
            """Apply the kernel projector(s) into dst: one MXU dot when
            uniform, a static mker^2 multiply-add contraction over [1, n_nl]
            rows when per-node ([mker*mker, n_nl] layout, kp[i*mker+j, c] =
            ker_proj[c, i, j]) — per-node mker x mker matmuls don't map to
            a single 2D dot, but the contraction is pure VPU work (row
            writes, no register concat)."""
            if ker.shape == (mker, mker):
                dst[:] = _mm(ker, gk_all)
                return
            for i in range(mker):
                acc = ker[i * mker : i * mker + 1, :][None] * gk_all[:, 0:1, :]
                for j in range(1, mker):
                    acc = acc + (
                        ker[i * mker + j : i * mker + j + 1, :][None]
                        * gk_all[:, j : j + 1, :]
                    )
                dst[:, i : i + 1, :] = acc

        # candidate-point accessors: every z/v read is (z + tau d) when the
        # kernel evaluates a SuperMann candidate, the plain ref otherwise
        if with_direction:
            tau_v = tau_ref[:]  # [bt, 1, 1]

            def mk(ref, dref):
                def get(sl=None):
                    if sl is None:
                        return ref[:] + tau_v * dref[:]
                    return ref[:, :, sl] + tau_v * dref[:, :, sl]

                return get

            zx_, zu_, zs_, ztau_, zy_ = (
                mk(zx_ref, dzx_ref), mk(zu_ref, dzu_ref), mk(zs_ref, dzs_ref),
                mk(ztau_ref, dztau_ref), mk(zy_ref, dzy_ref),
            )
            vy_, vsby_, vqx_, vru_, vt5_, vt6_ = (
                mk(vy_ref, dvy_ref), mk(vsby_ref, dvsby_ref),
                mk(vqx_ref, dvqx_ref), mk(vru_ref, dvru_ref),
                mk(vt5_ref, dvt5_ref), mk(vt6_ref, dvt6_ref),
            )
            vcx_, vcu_, vqNx_, vs12_, vs13_, vcxN_ = (
                mk(vcx_ref, dvcx_ref), mk(vcu_ref, dvcu_ref),
                mk(vqNx_ref, dvqNx_ref), mk(vs12_ref, dvs12_ref),
                mk(vs13_ref, dvs13_ref), mk(vcxN_ref, dvcxN_ref),
            )
            vpnl_ = mk(vpnl_ref, dpnl_ref) if nc else None
            vplf_ = mk(vplf_ref, dplf_ref) if ncL else None
        else:

            def mk(ref):
                def get(sl=None):
                    return ref[:] if sl is None else ref[:, :, sl]

                return get

            zx_, zu_, zs_, ztau_, zy_ = (
                mk(zx_ref), mk(zu_ref), mk(zs_ref), mk(ztau_ref), mk(zy_ref)
            )
            vy_, vsby_, vqx_, vru_, vt5_, vt6_ = (
                mk(vy_ref), mk(vsby_ref), mk(vqx_ref), mk(vru_ref),
                mk(vt5_ref), mk(vt6_ref),
            )
            vcx_, vcu_, vqNx_, vs12_, vs13_, vcxN_ = (
                mk(vcx_ref), mk(vcu_ref), mk(vqNx_ref), mk(vs12_ref),
                mk(vs13_ref), mk(vcxN_ref),
            )
            vpnl_ = mk(vpnl_ref) if nc else None
            vplf_ = mk(vplf_ref) if ncL else None

        # per-lane "scalar rows" stay 3D [bt, 1, n] throughout
        ztau_v = ztau_()
        vsby_v = vsby_()
        vt5_v = vt5_()
        vt6_v = vt6_()
        vs12_v = vs12_()
        vs13_v = vs13_()

        # ============ z1 = z - gamma * L'(v), into (gx, gu, s', tau', y') ==
        # x: non-leaf part (+ polytope rows' Gx' pnl)
        if nc:
            gx[:, :, :n_nl] = vcx_() + _mm(GxT_ref[:], vpnl_())
        else:
            gx[:, :, :n_nl] = vcx_()
        # leaf part: cxN + sqrtQN' qNx (+ GxN' plf)
        gx_lf = vcxN_() + qntmm(vqNx_())
        if ncL:
            gx_lf = gx_lf + _mm(GxNT_ref[:], vplf_())
        gx[:, :, ls:] = gx_lf
        # stage loops: round the per-stage child-sum temps through scratch so
        # every add sees canonical (offset-0) operands.  gq/gs are free here
        # (first written by the Riccati phase below).
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            gq[:, :, 0 : d * m] = qtmm(
                vqx_(slice(lo, lo + d * m)), lo, lo + d * m
            )
            acc = gq[:, :, 0:m]
            for k in range(1, d):
                acc = acc + gq[:, :, k * m : (k + 1) * m]
            gx[:, :, off[st - 1] : off[st - 1] + m] = (
                gx[:, :, off[st - 1] : off[st - 1] + m] + acc
            )
        # u (+ polytope rows' Gu' pnl)
        if nc:
            gu[:] = vcu_() + _mm(GuT_ref[:], vpnl_())
        else:
            gu[:] = vcu_()
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            gs[:, :, 0 : d * m] = rtmm(
                vru_(slice(lo, lo + d * m)), lo, lo + d * m
            )
            acc = gs[:, :, 0:m]
            for k in range(1, d):
                acc = acc + gs[:, :, k * m : (k + 1) * m]
            gu[:, :, off[st - 1] : off[st - 1] + m] = (
                gu[:, :, off[st - 1] : off[st - 1] + m] + acc
            )
        # z1 for x,u (overwrite scratch with z - gamma * LT)
        gx[:] = zx_() - gamma * gx[:]
        gu[:] = zu_() - gamma * gu[:]
        # s, tau, y — store the pre-projection values in gss/gtt for the
        # offset-shifting S2 gather below
        lt_s_lf = 0.5 * (vs12_v + vs13_v)
        gss[:, :, :n_nl] = zs_(slice(0, n_nl)) - gamma * vsby_v
        gss[:, :, ls:] = zs_(slice(ls, n)) - gamma * lt_s_lf
        gtt[:] = ztau_v - gamma * 0.5 * (vt5_v + vt6_v)
        y1 = zy_() - gamma * (vy_() - b3 * vsby_v)

        # ============ prox_f ============
        # ---- S1 Riccati: backward ----
        # Child matrices are stacked host-side ([B_1'|...|B_d'] etc.) so each
        # stage costs 4 dots regardless of d: MXU rows up to 128 are free.
        gq[:, :, ls:] = -gx[:, :, ls:]
        for st in range(N - 2, -1, -1):
            m = msz[st]
            u_st = gu[:, :, off[st] : off[st] + m]
            # gather the d child costates into sublane-stacked layout
            for k in range(d):
                gst[:, k * nx : (k + 1) * nx, 0:m] = gq[
                    :, :, off[st + 1] + k * m : off[st + 1] + (k + 1) * m
                ]
            qstk = gst[:, :, 0:m]  # [bt, d*nx, m]
            sum_d = _mm(BTall_ref[:], qstk)
            dv = _mm(Rti_ref[st], u_st - sum_d)
            gs[:, :, off[st] : off[st] + m] = dv  # stash dvec in gs (nu rows)
            innerstk = _mm(PBstk_ref[st], dv) + qstk
            qi = _mm(ABKTall_ref[st], innerstk) + _mm(
                KstT_ref[st], dv - u_st
            )
            gq[:, :, off[st] : off[st] + m] = qi - gx[:, :, off[st] : off[st] + m]
        # ---- S1 forward ----
        gx[:, :, 0:1] = x0_ref[:]
        for st in range(N - 1):
            m = msz[st]
            x_st = gx[:, :, off[st] : off[st] + m]
            dv = gs[:, :, off[st] : off[st] + m]
            gu[:, :, off[st] : off[st] + m] = _mm(Kst_ref[st], x_st) + dv
            # all d children in one dot: [ABK_k | B_k] rows stacked
            gst[:, 0:nx, 0:m] = x_st
            gst[:, nx : nx + nu, 0:m] = dv
            gst2[:, :, 0:m] = _mm(ABKBall_ref[st], gst[:, 0 : nx + nu, 0:m])
            for k in range(d):
                gx[:, :, off[st + 1] + k * m : off[st + 1] + (k + 1) * m] = (
                    gst2[:, k * nx : (k + 1) * nx, 0:m]
                )
        # ---- S2 kernel projection ----
        # Build vec rows [y (ny); s_child (d); tau_child (d)] per non-leaf
        # column in gk via scratch->scratch copies (sibling-major order makes
        # every child block one contiguous lane slice).
        gk[:, :ny, :] = y1
        coff = 0
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            for k in range(d):
                gk[:, ny + k : ny + k + 1, coff : coff + m] = gss[
                    :, :, off[st] + k * m : off[st] + (k + 1) * m
                ]
                gk[:, ny + d + k : ny + d + k + 1, coff : coff + m] = gtt[
                    :, :, lo + k * m : lo + (k + 1) * m
                ]
            coff += m
        s2_project(gk[:], gk2)
        # scatter back: y_p from rows [0, ny); s/tau from child rows
        y_p = gk2[:, :ny, :]
        # s_root: shifted by -gamma (linear objective), not S2-projected
        ozs[:, :, 0:1] = gss[:, :, 0:1] - gamma
        coff = 0
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            for k in range(d):
                ozs[:, :, off[st] + k * m : off[st] + (k + 1) * m] = gk2[
                    :, ny + k : ny + k + 1, coff : coff + m
                ]
                oztau[:, :, lo + k * m : lo + (k + 1) * m] = gk2[
                    :, ny + d + k : ny + d + k + 1, coff : coff + m
                ]
            coff += m

        # write remaining zbar outputs
        ozx[:] = gx[:]
        ozu[:] = gu[:]
        ozy[:] = y_p
        s_nl_val = ozs[:, :, :n_nl]
        s_lf_val = ozs[:, :, ls:]
        tau_val = oztau[:]

        # ============ vbar = prox_h*(v + sigma L (2 zbar - z)) ============
        ru_ = 2.0 * gu[:] - zu_()
        rs_nl = 2.0 * s_nl_val - zs_(slice(0, n_nl))
        rs_lf = 2.0 * s_lf_val - zs_(slice(ls, n))
        rtau = 2.0 * tau_val - ztau_v
        ry = 2.0 * y_p - zy_()

        inv = 1.0 / sigma
        # --- y block (w = v/sigma + L(refl)): L v1 block = ry
        wy = vy_() * inv + ry
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
        bty = jnp.sum(b3 * ry, axis=1, keepdims=True)
        wsby = vsby_v * inv + (rs_nl - bty)
        ovsby[:] = sigma * (wsby - jnp.maximum(wsby, 0.0))
        # --- non-root SOC blocks: qx/ru/t5/t6 of L(refl)
        # L qx block = sqrtQ x_parent(refl), replicated to each child slice
        # via stores into gqx/gru (parent slices re-loaded from refs/scratch
        # so every matmul operand is canonical)
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            po = off[st - 1]
            xp = 2.0 * gx[:, :, po : po + m] - zx_(slice(po, po + m))
            up = 2.0 * gu[:, :, po : po + m] - zu_(slice(po, po + m))
            if pnC:
                for k in range(d):
                    s0, s1 = lo + k * m, lo + (k + 1) * m
                    gqx[:, :, s0:s1] = qmm(xp, s0, s1)
                    gru[:, :, s0:s1] = rmm(up, s0, s1)
            else:
                qxp = qmm(xp, lo, lo + m)
                rup = rmm(up, lo, lo + m)
                for k in range(d):
                    gqx[:, :, lo + k * m : lo + (k + 1) * m] = qxp
                    gru[:, :, lo + k * m : lo + (k + 1) * m] = rup
        wqx = vqx_() * inv + gqx[:]
        wru = vru_() * inv + gru[:]
        wt5 = vt5_v * inv + 0.5 * rtau - 0.5
        wt6 = vt6_v * inv + 0.5 * rtau + 0.5
        xn_sq = (
            jnp.sum(wqx * wqx, axis=1, keepdims=True)
            + jnp.sum(wru * wru, axis=1, keepdims=True)
            + wt5 * wt5
        )
        t_out, x_scale = _soc_pieces(wt6, xn_sq)  # [bt, 1, n_nr]
        ovt6[:] = sigma * (wt6 - t_out)
        ovqx[:] = sigma * (wqx - x_scale * wqx)
        ovru[:] = sigma * (wru - x_scale * wru)
        ovt5[:] = sigma * (wt5 - x_scale * wt5)
        # --- leaf SOC: qNx/s12/s13 (leaf slice re-loaded, not register-cut)
        rx_lf = 2.0 * gx[:, :, ls:] - zx_(slice(ls, n))
        wqNx = vqNx_() * inv + qnmm(rx_lf)
        ws12 = vs12_v * inv + 0.5 * rs_lf - 0.5
        ws13 = vs13_v * inv + 0.5 * rs_lf + 0.5
        xn_sq_l = jnp.sum(wqNx * wqNx, axis=1, keepdims=True) + ws12 * ws12
        tl_out, xl_scale = _soc_pieces(ws13, xn_sq_l)
        ovs13[:] = sigma * (ws13 - tl_out)
        ovqNx[:] = sigma * (wqNx - xl_scale * wqNx)
        ovs12[:] = sigma * (ws12 - xl_scale * ws12)
        # --- boxes (bounds travel as [nx, 1] 2D constants)
        xmin = xmin_ref[:][None]
        xmax = xmax_ref[:][None]
        umin = umin_ref[:][None]
        umax = umax_ref[:][None]
        rx_nl = 2.0 * gx[:, :, :n_nl] - zx_(slice(0, n_nl))
        wcx = vcx_() * inv + rx_nl
        ovcx[:] = sigma * (wcx - jnp.clip(wcx, xmin, xmax))
        wcu = vcu_() * inv + ru_
        ovcu[:] = sigma * (wcu - jnp.clip(wcu, umin, umax))
        wcxN = vcxN_() * inv + rx_lf
        ovcxN[:] = sigma * (wcxN - jnp.clip(wcxN, xmin, xmax))
        # --- polytope rows: L block Gx x + Gu u (nonleaf) / GxN x (leaf),
        # prox = two-sided clip onto [lo, hi] (ops/prox.py:130)
        if nc:
            plo = plo_ref[:][None]
            phi = phi_ref[:][None]
            wpnl = vpnl_() * inv + _mm(Gx_ref[:], rx_nl) + _mm(
                Gu_ref[:], ru_
            )
            ovpnl[:] = sigma * (wpnl - jnp.clip(wpnl, plo, phi))
        if ncL:
            ploN = ploN_ref[:][None]
            phiN = phiN_ref[:][None]
            wplf = vplf_() * inv + _mm(GxN_ref[:], rx_lf)
            ovplf[:] = sigma * (wplf - jnp.clip(wplf, ploN, phiN))

        if not with_metric:
            return

        # ============ metric image of the sweep residual ============
        #   r  = (rw, ru) = (z - zbar, v - vbar)
        #   M r = (rw - gamma L' ru,  ru - sigma L rw)
        # Reapplies the same L / L' block maps to the residual, entirely in
        # VMEM — replaces the separate metric_apply L/L' pair (~30 XLA
        # kernels) SuperMann otherwise issues right after every sweep.
        (
            omzx, omzu, omzs, omztau, omzy,
            omvy, omvsby, omvqx, omvru, omvt5, omvt6,
            omvcx, omvcu, omvqNx, omvs12, omvs13, omvcxN,
        ) = out_refs[npb : npb + 17]
        omvpnl = omvplf = None
        k_ = npb + 17
        if nc:
            omvpnl = out_refs[k_]
            k_ += 1
        if ncL:
            omvplf = out_refs[k_]
            k_ += 1
        # ---- residual blocks into (reusable) scratch / registers ----
        gx[:] = zx_() - gx[:]  # rw.x  (gx held zbar.x)
        gu[:] = zu_() - gu[:]  # rw.u
        gss[:] = zs_() - ozs[:]  # rw.s
        gtt[:] = ztau_v - oztau[:]  # rw.tau
        rwy = zy_() - y_p  # rw.y
        gqx[:] = vqx_() - ovqx[:]  # ru.qx  (gqx/gru free after vbar)
        gru[:] = vru_() - ovru[:]  # ru.ru
        ruy = vy_() - ovy[:]
        rusby = vsby_v - ovsby[:]
        rut5 = vt5_v - ovt5[:]
        rut6 = vt6_v - ovt6[:]
        rus12 = vs12_v - ovs12[:]
        rus13 = vs13_v - ovs13[:]
        ruqNx = vqNx_() - ovqNx[:]
        rucx = vcx_() - ovcx[:]
        rucu = vcu_() - ovcu[:]
        rucxN = vcxN_() - ovcxN[:]
        rupnl = vpnl_() - ovpnl[:] if nc else None
        ruplf = vplf_() - ovplf[:] if ncL else None

        # ---- M r (dual part): ru - sigma * L(rw) ----
        omvy[:] = ruy - sigma * rwy
        bty_rw = jnp.sum(b3 * rwy, axis=1, keepdims=True)
        omvsby[:] = rusby - sigma * (gss[:, :, :n_nl] - bty_rw)
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            po = off[st - 1]
            for k in range(d):
                s0, s1 = lo + k * m, lo + (k + 1) * m
                sl = slice(s0, s1)
                qxp = qmm(gx[:, :, po : po + m], s0, s1)
                rup = rmm(gu[:, :, po : po + m], s0, s1)
                omvqx[:, :, sl] = gqx[:, :, sl] - sigma * qxp
                omvru[:, :, sl] = gru[:, :, sl] - sigma * rup
        omvt5[:] = rut5 - sigma * 0.5 * gtt[:]
        omvt6[:] = rut6 - sigma * 0.5 * gtt[:]
        omvcx[:] = rucx - sigma * gx[:, :, :n_nl]
        omvcu[:] = rucu - sigma * gu[:]
        omvqNx[:] = ruqNx - sigma * qnmm(gx[:, :, ls:])
        omvs12[:] = rus12 - sigma * 0.5 * gss[:, :, ls:]
        omvs13[:] = rus13 - sigma * 0.5 * gss[:, :, ls:]
        omvcxN[:] = rucxN - sigma * gx[:, :, ls:]
        if nc:
            omvpnl[:] = rupnl - sigma * (
                _mm(Gx_ref[:], gx[:, :, :n_nl]) + _mm(Gu_ref[:], gu[:])
            )
        if ncL:
            omvplf[:] = ruplf - sigma * _mm(GxN_ref[:], gx[:, :, ls:])

        # ---- M r (primal part): rw - gamma * L'(ru) ----
        # accumulate L'(ru).x / .u in the output refs, then finish in place
        omzx[:, :, :n_nl] = (
            rucx + _mm(GxT_ref[:], rupnl) if nc else rucx
        )
        omzx_lf = rucxN + qntmm(ruqNx)
        if ncL:
            omzx_lf = omzx_lf + _mm(GxNT_ref[:], ruplf)
        omzx[:, :, ls:] = omzx_lf
        omzu[:] = rucu + _mm(GuT_ref[:], rupnl) if nc else rucu
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            gq[:, :, 0 : d * m] = qtmm(
                gqx[:, :, lo : lo + d * m], lo, lo + d * m
            )
            acc = gq[:, :, 0:m]
            for k in range(1, d):
                acc = acc + gq[:, :, k * m : (k + 1) * m]
            omzx[:, :, off[st - 1] : off[st - 1] + m] = (
                omzx[:, :, off[st - 1] : off[st - 1] + m] + acc
            )
            gs[:, :, 0 : d * m] = rtmm(
                gru[:, :, lo : lo + d * m], lo, lo + d * m
            )
            accu = gs[:, :, 0:m]
            for k in range(1, d):
                accu = accu + gs[:, :, k * m : (k + 1) * m]
            omzu[:, :, off[st - 1] : off[st - 1] + m] = (
                omzu[:, :, off[st - 1] : off[st - 1] + m] + accu
            )
        omzx[:] = gx[:] - gamma * omzx[:]
        omzu[:] = gu[:] - gamma * omzu[:]
        omzs[:, :, :n_nl] = gss[:, :, :n_nl] - gamma * rusby
        omzs[:, :, ls:] = gss[:, :, ls:] - gamma * 0.5 * (rus12 + rus13)
        omztau[:] = gtt[:] - gamma * 0.5 * (rut5 + rut6)
        omzy[:] = rwy - gamma * (ruy - b3 * rusby)

        # ---- scalar reductions: ||r||_M^2 and inf-norms of M r ----
        # (the per-lane numbers SuperMann otherwise computes with separate
        # full passes over the iterate — sp.jl:133-164 via spock_dot).
        # Two-stage reductions: Mosaic's layout inference aborts on a single
        # axis=(1, 2) multi-reduction to [bt, 1, 1] (inferReshape check
        # failure, TPU-probed), but sublane-then-lane reductions lower fine.
        def s3(x):
            return jnp.sum(
                jnp.sum(x, axis=1, keepdims=True), axis=2, keepdims=True
            )

        def a3(x):
            return jnp.max(
                jnp.max(jnp.abs(x), axis=1, keepdims=True),
                axis=2,
                keepdims=True,
            )

        ornsq, onmz, onmv = out_refs[2 * npb : 2 * npb + 3]
        rnsq = (
            s3(gx[:] * omzx[:]) + s3(gu[:] * omzu[:]) + s3(gss[:] * omzs[:])
            + s3(gtt[:] * omztau[:]) + s3(rwy * omzy[:])
            + s3(ruy * omvy[:]) + s3(rusby * omvsby[:])
            + s3(gqx[:] * omvqx[:]) + s3(gru[:] * omvru[:])
            + s3(rut5 * omvt5[:]) + s3(rut6 * omvt6[:])
            + s3(rucx * omvcx[:]) + s3(rucu * omvcu[:])
            + s3(ruqNx * omvqNx[:]) + s3(rus12 * omvs12[:])
            + s3(rus13 * omvs13[:]) + s3(rucxN * omvcxN[:])
        )
        if nc:
            rnsq = rnsq + s3(rupnl * omvpnl[:])
        if ncL:
            rnsq = rnsq + s3(ruplf * omvplf[:])
        ornsq[:] = rnsq
        onmz[:] = jnp.maximum(
            jnp.maximum(
                jnp.maximum(a3(omzx[:]), a3(omzu[:])),
                jnp.maximum(a3(omzs[:]), a3(omztau[:])),
            ),
            a3(omzy[:]),
        )
        nmv = a3(omvy[:])
        for ref in (omvsby, omvqx, omvru, omvt5, omvt6, omvcx, omvcu,
                    omvqNx, omvs12, omvs13, omvcxN, omvpnl, omvplf):
            if ref is not None:
                nmv = jnp.maximum(nmv, a3(ref[:]))
        onmv[:] = nmv

        if not with_direction:
            return

        # ============ reductions of the direction metric M d ============
        # SuperMann consumes M d only through <r~, M d> (the rho test,
        # sp.jl:193-222) and the inf-norms of its halves (operator-free
        # termination residuals) — reduce every block on the fly, nothing
        # goes back to HBM.
        orho, onmdz, onmdv = out_refs[2 * npb + 3 : 2 * npb + 6]
        dzy_v = dzy_ref[:]
        dvy_v = dvy_ref[:]
        dvsby_v = dvsby_ref[:]
        dvt5_v = dvt5_ref[:]
        dvt6_v = dvt6_ref[:]
        dvs12_v = dvs12_ref[:]
        dvs13_v = dvs13_ref[:]
        dzs_v = dzs_ref[:]
        dztau_v = dztau_ref[:]

        # ---- M d (dual): dv - sigma L dz, dotted with ru blocks ----
        mdvy = dvy_v - sigma * dzy_v
        rho = s3(ruy * mdvy)
        nmdv = a3(mdvy)
        bty_d = jnp.sum(b3 * dzy_v, axis=1, keepdims=True)
        mdvsby = dvsby_v - sigma * (dzs_v[:, :, :n_nl] - bty_d)
        rho = rho + s3(rusby * mdvsby)
        nmdv = jnp.maximum(nmdv, a3(mdvsby))
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            po = off[st - 1]
            for k in range(d):
                s0, s1 = lo + k * m, lo + (k + 1) * m
                sl = slice(s0, s1)
                qxp_d = qmm(dzx_ref[:, :, po : po + m], s0, s1)
                rup_d = rmm(dzu_ref[:, :, po : po + m], s0, s1)
                mdvqx = dvqx_ref[:, :, sl] - sigma * qxp_d
                mdvru = dvru_ref[:, :, sl] - sigma * rup_d
                rho = rho + s3(gqx[:, :, sl] * mdvqx) + s3(
                    gru[:, :, sl] * mdvru
                )
                nmdv = jnp.maximum(
                    nmdv, jnp.maximum(a3(mdvqx), a3(mdvru))
                )
        mdvt5 = dvt5_v - sigma * 0.5 * dztau_v
        mdvt6 = dvt6_v - sigma * 0.5 * dztau_v
        rho = rho + s3(rut5 * mdvt5) + s3(rut6 * mdvt6)
        nmdv = jnp.maximum(nmdv, jnp.maximum(a3(mdvt5), a3(mdvt6)))
        mdvcx = dvcx_ref[:] - sigma * dzx_ref[:, :, :n_nl]
        mdvcu = dvcu_ref[:] - sigma * dzu_ref[:]
        rho = rho + s3(rucx * mdvcx) + s3(rucu * mdvcu)
        nmdv = jnp.maximum(nmdv, jnp.maximum(a3(mdvcx), a3(mdvcu)))
        mdvqNx = dvqNx_ref[:] - sigma * qnmm(dzx_ref[:, :, ls:])
        mdvs12 = dvs12_v - sigma * 0.5 * dzs_v[:, :, ls:]
        mdvs13 = dvs13_v - sigma * 0.5 * dzs_v[:, :, ls:]
        mdvcxN = dvcxN_ref[:] - sigma * dzx_ref[:, :, ls:]
        rho = (
            rho + s3(ruqNx * mdvqNx) + s3(rus12 * mdvs12)
            + s3(rus13 * mdvs13) + s3(rucxN * mdvcxN)
        )
        nmdv = jnp.maximum(
            nmdv,
            jnp.maximum(
                jnp.maximum(a3(mdvqNx), a3(mdvs12)),
                jnp.maximum(a3(mdvs13), a3(mdvcxN)),
            ),
        )
        if nc:
            mdvpnl = dpnl_ref[:] - sigma * (
                _mm(Gx_ref[:], dzx_ref[:, :, :n_nl])
                + _mm(Gu_ref[:], dzu_ref[:])
            )
            rho = rho + s3(rupnl * mdvpnl)
            nmdv = jnp.maximum(nmdv, a3(mdvpnl))
        if ncL:
            mdvplf = dplf_ref[:] - sigma * _mm(
                GxN_ref[:], dzx_ref[:, :, ls:]
            )
            rho = rho + s3(ruplf * mdvplf)
            nmdv = jnp.maximum(nmdv, a3(mdvplf))
        onmdv[:] = nmdv

        # ---- M d (primal): dz - gamma L' dv, dotted with rw blocks ----
        mdzy = dzy_v - gamma * (dvy_v - b3 * dvsby_v)
        rho = rho + s3(rwy * mdzy)
        nmdz = a3(mdzy)
        mdzs_nl = dzs_v[:, :, :n_nl] - gamma * dvsby_v
        mdzs_lf = dzs_v[:, :, ls:] - gamma * 0.5 * (dvs12_v + dvs13_v)
        rho = rho + s3(gss[:, :, :n_nl] * mdzs_nl) + s3(
            gss[:, :, ls:] * mdzs_lf
        )
        nmdz = jnp.maximum(nmdz, jnp.maximum(a3(mdzs_nl), a3(mdzs_lf)))
        mdztau = dztau_v - gamma * 0.5 * (dvt5_v + dvt6_v)
        rho = rho + s3(gtt[:] * mdztau)
        nmdz = jnp.maximum(nmdz, a3(mdztau))
        ltd_lf = dvcxN_ref[:] + qntmm(dvqNx_ref[:])
        if ncL:
            ltd_lf = ltd_lf + _mm(GxNT_ref[:], dplf_ref[:])
        mdzx_lf = dzx_ref[:, :, ls:] - gamma * ltd_lf
        rho = rho + s3(gx[:, :, ls:] * mdzx_lf)
        nmdz = jnp.maximum(nmdz, a3(mdzx_lf))
        # per-stage child sums via the (now free) gq/gs scratch
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            po = off[st - 1]
            gq[:, :, 0 : d * m] = qtmm(
                dvqx_ref[:, :, lo : lo + d * m], lo, lo + d * m
            )
            acc = gq[:, :, 0:m]
            for k in range(1, d):
                acc = acc + gq[:, :, k * m : (k + 1) * m]
            if nc:
                acc = acc + _mm(GxT_ref[:], dpnl_ref[:, :, po : po + m])
            mdzx_st = dzx_ref[:, :, po : po + m] - gamma * (
                dvcx_ref[:, :, po : po + m] + acc
            )
            rho = rho + s3(gx[:, :, po : po + m] * mdzx_st)
            nmdz = jnp.maximum(nmdz, a3(mdzx_st))
            gs[:, :, 0 : d * m] = rtmm(
                dvru_ref[:, :, lo : lo + d * m], lo, lo + d * m
            )
            accu = gs[:, :, 0:m]
            for k in range(1, d):
                accu = accu + gs[:, :, k * m : (k + 1) * m]
            if nc:
                accu = accu + _mm(GuT_ref[:], dpnl_ref[:, :, po : po + m])
            mdzu_st = dzu_ref[:, :, po : po + m] - gamma * (
                dvcu_ref[:, :, po : po + m] + accu
            )
            rho = rho + s3(gu[:, :, po : po + m] * mdzu_st)
            nmdz = jnp.maximum(nmdz, a3(mdzu_st))
        orho[:] = rho
        onmdz[:] = nmdz

    return kernel


def _make_metric_kernel(meta: ProblemMeta):
    """One-kernel M (z, v) = (z - gamma L' v, v - sigma L z).

    The standalone companion of the sweep megakernel's metric phase: applies
    both implicit-operator passes to an arbitrary (primal, dual) pair in one
    launch (SuperMann needs this for M d of the quasi-Newton direction,
    sp.jl:193-222 via spock_dot — ~30 small XLA kernels otherwise)."""
    t = meta.tree
    N, d = t.N, t.d
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, ls = t.n, t.n_nonleaf, t.leaf_start
    off = [t.stage_offset(i) for i in range(N + 1)]
    msz = [t.stage_size(i) for i in range(N)]

    nc, ncL = meta.nc_nl, meta.nc_lf

    def kernel(
        scal_ref,
        sqrtQ_ref, sqrtR_ref, sqrtQN_ref, sqrtQT_ref, sqrtRT_ref,
        sqrtQNT_ref, b_ref,
        *rest,
    ):
        if nc:
            Gx_ref, Gu_ref, GxT_ref, GuT_ref = rest[:4]
            rest = rest[4:]
        if ncL:
            GxN_ref, GxNT_ref = rest[:2]
            rest = rest[2:]
        (
            zx_ref, zu_ref, zs_ref, ztau_ref, zy_ref,
            vy_ref, vsby_ref, vqx_ref, vru_ref, vt5_ref, vt6_ref,
            vcx_ref, vcu_ref, vqNx_ref, vs12_ref, vs13_ref, vcxN_ref,
        ) = rest[:17]
        rest = rest[17:]
        vpnl_ref = vplf_ref = None
        if nc:
            vpnl_ref = rest[0]
            rest = rest[1:]
        if ncL:
            vplf_ref = rest[0]
            rest = rest[1:]
        (
            omzx, omzu, omzs, omztau, omzy,
            omvy, omvsby, omvqx, omvru, omvt5, omvt6,
            omvcx, omvcu, omvqNx, omvs12, omvs13, omvcxN,
        ) = rest[:17]
        rest = rest[17:]
        omvpnl = omvplf = None
        if nc:
            omvpnl = rest[0]
            rest = rest[1:]
        if ncL:
            omvplf = rest[0]
            rest = rest[1:]
        gq, gs = rest
        gamma = scal_ref[0]
        sigma = scal_ref[1]
        b3 = b_ref[:][None]
        pnQ = sqrtQ_ref.shape != (nx, nx)
        pnR = sqrtR_ref.shape != (nu, nu)
        pnQN = sqrtQN_ref.shape != (nx, nx)

        def _slab_mm(slab_ref, X, lo_, hi_):
            b_in = X.shape[1]
            a = slab_ref.shape[0] // b_in
            acc = slab_ref[0:a, lo_:hi_][None] * X[:, 0:1, :]
            for j in range(1, b_in):
                acc = acc + (
                    slab_ref[j * a : (j + 1) * a, lo_:hi_][None]
                    * X[:, j : j + 1, :]
                )
            return acc

        def qmm(X, lo_, hi_):
            return (_slab_mm(sqrtQ_ref, X, lo_, hi_) if pnQ
                    else _mm(sqrtQ_ref[:], X))

        def qtmm(X, lo_, hi_):
            return (_slab_mm(sqrtQT_ref, X, lo_, hi_) if pnQ
                    else _mm(sqrtQT_ref[:], X))

        def rmm(X, lo_, hi_):
            return (_slab_mm(sqrtR_ref, X, lo_, hi_) if pnR
                    else _mm(sqrtR_ref[:], X))

        def rtmm(X, lo_, hi_):
            return (_slab_mm(sqrtRT_ref, X, lo_, hi_) if pnR
                    else _mm(sqrtRT_ref[:], X))

        def qnmm(X):
            return (_slab_mm(sqrtQN_ref, X, 0, n - ls) if pnQN
                    else _mm(sqrtQN_ref[:], X))

        def qntmm(X):
            return (_slab_mm(sqrtQNT_ref, X, 0, n - ls) if pnQN
                    else _mm(sqrtQNT_ref[:], X))
        zy = zy_ref[:]
        zs = zs_ref[:]
        ztau = ztau_ref[:]
        vsby = vsby_ref[:]
        vt5 = vt5_ref[:]
        vt6 = vt6_ref[:]
        vs12 = vs12_ref[:]
        vs13 = vs13_ref[:]

        # ---- dual part: v - sigma L z ----
        omvy[:] = vy_ref[:] - sigma * zy
        bty = jnp.sum(b3 * zy, axis=1, keepdims=True)
        omvsby[:] = vsby - sigma * (zs[:, :, :n_nl] - bty)
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            po = off[st - 1]
            for k in range(d):
                s0, s1 = lo + k * m, lo + (k + 1) * m
                sl = slice(s0, s1)
                qxp = qmm(zx_ref[:, :, po : po + m], s0, s1)
                rup = rmm(zu_ref[:, :, po : po + m], s0, s1)
                omvqx[:, :, sl] = vqx_ref[:, :, sl] - sigma * qxp
                omvru[:, :, sl] = vru_ref[:, :, sl] - sigma * rup
        omvt5[:] = vt5 - sigma * 0.5 * ztau
        omvt6[:] = vt6 - sigma * 0.5 * ztau
        omvcx[:] = vcx_ref[:] - sigma * zx_ref[:, :, :n_nl]
        omvcu[:] = vcu_ref[:] - sigma * zu_ref[:]
        omvqNx[:] = vqNx_ref[:] - sigma * qnmm(zx_ref[:, :, ls:])
        omvs12[:] = vs12 - sigma * 0.5 * zs[:, :, ls:]
        omvs13[:] = vs13 - sigma * 0.5 * zs[:, :, ls:]
        omvcxN[:] = vcxN_ref[:] - sigma * zx_ref[:, :, ls:]
        if nc:
            omvpnl[:] = vpnl_ref[:] - sigma * (
                _mm(Gx_ref[:], zx_ref[:, :, :n_nl])
                + _mm(Gu_ref[:], zu_ref[:])
            )
        if ncL:
            omvplf[:] = vplf_ref[:] - sigma * _mm(
                GxN_ref[:], zx_ref[:, :, ls:]
            )

        # ---- primal part: z - gamma L' v (accumulate L'v in the outputs) ----
        omzx[:, :, :n_nl] = (
            vcx_ref[:] + _mm(GxT_ref[:], vpnl_ref[:]) if nc else vcx_ref[:]
        )
        ltx_lf = vcxN_ref[:] + qntmm(vqNx_ref[:])
        if ncL:
            ltx_lf = ltx_lf + _mm(GxNT_ref[:], vplf_ref[:])
        omzx[:, :, ls:] = ltx_lf
        omzu[:] = (
            vcu_ref[:] + _mm(GuT_ref[:], vpnl_ref[:]) if nc else vcu_ref[:]
        )
        for st in range(1, N):
            m = msz[st - 1]
            lo = off[st] - 1
            gq[:, :, 0 : d * m] = qtmm(
                vqx_ref[:, :, lo : lo + d * m], lo, lo + d * m
            )
            acc = gq[:, :, 0:m]
            for k in range(1, d):
                acc = acc + gq[:, :, k * m : (k + 1) * m]
            omzx[:, :, off[st - 1] : off[st - 1] + m] = (
                omzx[:, :, off[st - 1] : off[st - 1] + m] + acc
            )
            gs[:, :, 0 : d * m] = rtmm(
                vru_ref[:, :, lo : lo + d * m], lo, lo + d * m
            )
            accu = gs[:, :, 0:m]
            for k in range(1, d):
                accu = accu + gs[:, :, k * m : (k + 1) * m]
            omzu[:, :, off[st - 1] : off[st - 1] + m] = (
                omzu[:, :, off[st - 1] : off[st - 1] + m] + accu
            )
        omzx[:] = zx_ref[:] - gamma * omzx[:]
        omzu[:] = zu_ref[:] - gamma * omzu[:]
        omzs[:, :, :n_nl] = zs[:, :, :n_nl] - gamma * vsby
        omzs[:, :, ls:] = zs[:, :, ls:] - gamma * 0.5 * (vs12 + vs13)
        omztau[:] = ztau - gamma * 0.5 * (vt5 + vt6)
        omzy[:] = zy - gamma * (vy_ref[:] - b3 * vsby)

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def metric_apply_fused(
    data: ProblemData,
    meta: ProblemMeta,
    z: Primal,
    v: Dual,
    gamma,
    sigma,
    interpret: bool = False,
):
    """One-kernel M (z, v); same math as ops.linop.metric_apply on the
    supported problem class."""
    t = meta.tree
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    B = z.s.shape[0]
    bt = _pick_bt(meta, B, 1)
    grid = (B // bt,)
    dtype = z.s.dtype
    kernel = _make_metric_kernel(meta)

    def lane(f_dim, n_dim):
        if f_dim is None:
            f_dim = 1
        return pl.BlockSpec((bt, f_dim, n_dim), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM)
    qf, qt, rf, rt, qnf, qnt = _cost_consts(data)
    nc, ncL = meta.nc_nl, meta.nc_lf

    pair_specs = [
        lane(nx, n), lane(nu, n_nl), lane(None, n), lane(None, n_nr),
        lane(ny, n_nl),
        lane(ny, n_nl), lane(None, n_nl), lane(nx, n_nr), lane(nu, n_nr),
        lane(None, n_nr), lane(None, n_nr), lane(nx, n_nl), lane(nu, n_nl),
        lane(nx, n_lf), lane(None, n_lf), lane(None, n_lf), lane(nx, n_lf),
    ]
    pair_shapes = [
        jax.ShapeDtypeStruct((B, nx, n), dtype),
        jax.ShapeDtypeStruct((B, nu, n_nl), dtype),
        jax.ShapeDtypeStruct((B, 1, n), dtype),
        jax.ShapeDtypeStruct((B, 1, n_nr), dtype),
        jax.ShapeDtypeStruct((B, ny, n_nl), dtype),
        jax.ShapeDtypeStruct((B, ny, n_nl), dtype),
        jax.ShapeDtypeStruct((B, 1, n_nl), dtype),
        jax.ShapeDtypeStruct((B, nx, n_nr), dtype),
        jax.ShapeDtypeStruct((B, nu, n_nr), dtype),
        jax.ShapeDtypeStruct((B, 1, n_nr), dtype),
        jax.ShapeDtypeStruct((B, 1, n_nr), dtype),
        jax.ShapeDtypeStruct((B, nx, n_nl), dtype),
        jax.ShapeDtypeStruct((B, nu, n_nl), dtype),
        jax.ShapeDtypeStruct((B, nx, n_lf), dtype),
        jax.ShapeDtypeStruct((B, 1, n_lf), dtype),
        jax.ShapeDtypeStruct((B, 1, n_lf), dtype),
        jax.ShapeDtypeStruct((B, nx, n_lf), dtype),
    ]
    poly_const_specs = []
    poly_consts = []
    poly_state = []
    if nc:
        pair_specs.append(lane(nc, n_nl))
        pair_shapes.append(jax.ShapeDtypeStruct((B, nc, n_nl), dtype))
        poly_const_specs += [
            const((nc, nx)), const((nc, nu)), const((nx, nc)),
            const((nu, nc)),
        ]
        poly_consts += [data.Gx, data.Gu, data.Gx.T, data.Gu.T]
        poly_state.append(v.pnl)
    if ncL:
        pair_specs.append(lane(ncL, n_lf))
        pair_shapes.append(jax.ShapeDtypeStruct((B, ncL, n_lf), dtype))
        poly_const_specs += [const((ncL, nx)), const((nx, ncL))]
        poly_consts += [data.GxN, data.GxN.T]
        poly_state.append(v.plf)
    b_arg, _ = _risk_consts(meta, data)
    in_specs = [
        smem,
        const(qf.shape), const(rf.shape), const(qnf.shape),
        const(qt.shape), const(rt.shape), const(qnt.shape),
        const(b_arg.shape),
    ] + poly_const_specs + pair_specs
    scratch = [
        pltpu.VMEM((bt, nx, n), dtype),  # gq
        pltpu.VMEM((bt, max(nu, 1), max(n_nl, n_lf)), dtype),  # gs
    ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pair_specs,
        out_shape=pair_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(
        jnp.stack([jnp.asarray(gamma, dtype), jnp.asarray(sigma, dtype)]),
        qf, rf, qnf, qt, rt, qnt,
        b_arg,
        *poly_consts,
        z.x, z.u, z.s[:, None, :], z.tau[:, None, :], z.y,
        v.y, v.sby[:, None, :], v.qx, v.ru, v.t5[:, None, :],
        v.t6[:, None, :],
        v.cx, v.cu, v.qNx, v.s12[:, None, :], v.s13[:, None, :], v.cxN,
        *poly_state,
    )
    sq = lambda a: a[:, 0, :]
    k_ = 17
    pnl = plf = None
    if nc:
        pnl = outs[k_]
        k_ += 1
    if ncL:
        plf = outs[k_]
    mz = Primal(x=outs[0], u=outs[1], s=sq(outs[2]), tau=sq(outs[3]),
                y=outs[4])
    mv = Dual(
        y=outs[5], sby=sq(outs[6]), qx=outs[7], ru=outs[8], t5=sq(outs[9]),
        t6=sq(outs[10]), cx=outs[11], cu=outs[12], qNx=outs[13],
        s12=sq(outs[14]), s13=sq(outs[15]), cxN=outs[16], pnl=pnl, plf=plf,
    )
    return mz, mv


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
    return _sweep_impl(
        data, meta, z, v, gamma, sigma, x0, False, interpret
    )


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def cp_sweep_metric_fused(
    data: ProblemData,
    meta: ProblemMeta,
    z: Primal,
    v: Dual,
    gamma,
    sigma,
    x0,
    interpret: bool = False,
):
    """cp_sweep + the metric image of its fixed-point residual + per-lane
    reductions, one kernel.

    Returns ``(zbar, vbar, Mrz, Mrv, rnorm_sq, nMrz, nMrv)`` with
    ``(Mrz, Mrv) = M (z - zbar, v - vbar)``, ``rnorm_sq = <r, M r>`` and
    ``nMrz/nMrv`` the inf-norms of M r's halves — everything SuperMann needs
    after a sweep (sp.jl:133-164 computes these with a separate spock_dot
    L/L' pair plus reduction passes; here they ride the same VMEM residency
    as the sweep itself)."""
    return _sweep_impl(
        data, meta, z, v, gamma, sigma, x0, True, interpret
    )


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def candidate_sweep_fused(
    data: ProblemData,
    meta: ProblemMeta,
    z: Primal,
    v: Dual,
    dz: Primal,
    dv: Dual,
    tau,
    gamma,
    sigma,
    x0,
    interpret: bool = False,
):
    """SuperMann candidate evaluation, one kernel: the CP sweep at
    (w, u) = (z, v) + tau (dz, dv), the metric image of the candidate
    residual, and every scalar the K1/K2 tests consume.

    Returns ``(wbar, ubar, Mrz, Mrv, rnorm_sq, nMrz, nMrv, rho_dot, nMdz,
    nMdv)`` where the first seven mirror :func:`cp_sweep_metric_fused`
    evaluated at the candidate point, ``rho_dot = <r~, M d>`` (the
    correction term of SuperMann's rho test, sp.jl:193-222) and nMdz/nMdv
    are the inf-norms of M d's halves (operator-free termination residuals
    for K1 steps).  M d itself never leaves VMEM."""
    return _sweep_impl(
        data, meta, z, v, gamma, sigma, x0, True, interpret,
        direction=(dz, dv, tau),
    )


def _sweep_impl(
    data: ProblemData,
    meta: ProblemMeta,
    z: Primal,
    v: Dual,
    gamma,
    sigma,
    x0,
    with_metric: bool,
    interpret: bool,
    direction=None,
):
    t = meta.tree
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    B = z.s.shape[0]
    with_direction = direction is not None
    bt = _pick_bt(
        meta, B, 2 if with_metric else 1, 2 if with_direction else 1
    )
    grid = (B // bt,)
    dtype = z.s.dtype

    # cone segments of the dual risk cone
    segs = []
    o = 0
    for kind, dim in meta.dual_cone:
        segs.append((kind, o, o + dim))
        o += dim

    kernel = _make_kernel(
        meta, tuple(segs), with_metric=with_metric,
        with_direction=with_direction,
    )

    def lane(f_dim, n_dim):
        # Mosaic requires the last two block dims to be aligned or full-size;
        # per-lane vectors therefore travel as [B, 1, n] (f_dim None) and x0
        # as [B, nx, 1], so every lane block is (bt, full, full).
        if f_dim is None:
            f_dim = 1
        return pl.BlockSpec((bt, f_dim, n_dim), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM)

    d = t.d
    Kst = jnp.stack([k[0] for k in data.ric.K])  # [N-1, nu, nx]
    Rti = jnp.stack([r[0] for r in data.ric.Rtinv])
    ABK = jnp.stack([a[0] for a in data.ric.ABK])  # [N-1, d, nx, nx]
    PB = jnp.stack([p[0] for p in data.ric.PB])
    KstT = Kst.transpose(0, 2, 1)
    qf, qt, rf, rt, qnf, qnt = _cost_consts(data)
    # child-stacked Riccati matrices (one dot per stage instead of d):
    BTall = jnp.concatenate(
        [data.B[k].T for k in range(d)], axis=1
    )  # [nu, d*nx]
    PBstk = jnp.concatenate(
        [PB[:, k] for k in range(d)], axis=1
    )  # [N-1, d*nx, nu]
    ABKTall = jnp.concatenate(
        [ABK[:, k].transpose(0, 2, 1) for k in range(d)], axis=2
    )  # [N-1, nx, d*nx]
    ABKstk = jnp.concatenate(
        [ABK[:, k] for k in range(d)], axis=1
    )  # [N-1, d*nx, nx]
    Bstk = jnp.concatenate([data.B[k] for k in range(d)], axis=0)
    ABKBall = jnp.concatenate(
        [ABKstk, jnp.broadcast_to(Bstk, (ABKstk.shape[0],) + Bstk.shape)],
        axis=2,
    )  # [N-1, d*nx, nx+nu]

    nc, ncL = meta.nc_nl, meta.nc_lf
    mker = ny + 2 * t.d
    poly_const_specs = []
    poly_lane_specs = []
    poly_lane_shapes = []
    if nc:
        poly_const_specs += [
            const((nc, nx)), const((nc, nu)), const((nx, nc)),
            const((nu, nc)), const((nc, 1)), const((nc, 1)),
        ]
        poly_lane_specs.append(lane(nc, n_nl))
        poly_lane_shapes.append(jax.ShapeDtypeStruct((B, nc, n_nl), dtype))
    if ncL:
        poly_const_specs += [
            const((ncL, nx)), const((nx, ncL)), const((ncL, 1)),
            const((ncL, 1)),
        ]
        poly_lane_specs.append(lane(ncL, n_lf))
        poly_lane_shapes.append(jax.ShapeDtypeStruct((B, ncL, n_lf), dtype))
    b_arg, ker_arg = _risk_consts(meta, data)
    in_specs = [
        smem,
        const(qf.shape), const(rf.shape), const(qnf.shape),
        const(qt.shape), const(rt.shape), const(qnt.shape),
        const(b_arg.shape), const(ker_arg.shape),
        const(Kst.shape), const(KstT.shape), const(Rti.shape),
        const(BTall.shape), const(PBstk.shape), const(ABKTall.shape),
        const(ABKBall.shape),
        const((nx, 1)), const((nx, 1)), const((nu, 1)), const((nu, 1)),
        *poly_const_specs,
        lane(nx, 1),  # x0 -> [bt, nx, 1]
        lane(nx, n), lane(nu, n_nl), lane(None, n), lane(None, n_nr),
        lane(ny, n_nl),
        lane(ny, n_nl), lane(None, n_nl), lane(nx, n_nr), lane(nu, n_nr),
        lane(None, n_nr), lane(None, n_nr), lane(nx, n_nl), lane(nu, n_nl),
        lane(nx, n_lf), lane(None, n_lf), lane(None, n_lf), lane(nx, n_lf),
        *poly_lane_specs,
    ]
    out_specs = [
        lane(nx, n), lane(nu, n_nl), lane(None, n), lane(None, n_nr),
        lane(ny, n_nl),
        lane(ny, n_nl), lane(None, n_nl), lane(nx, n_nr), lane(nu, n_nr),
        lane(None, n_nr), lane(None, n_nr), lane(nx, n_nl), lane(nu, n_nl),
        lane(nx, n_lf), lane(None, n_lf), lane(None, n_lf), lane(nx, n_lf),
        *poly_lane_specs,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, nx, n), dtype),
        jax.ShapeDtypeStruct((B, nu, n_nl), dtype),
        jax.ShapeDtypeStruct((B, 1, n), dtype),
        jax.ShapeDtypeStruct((B, 1, n_nr), dtype),
        jax.ShapeDtypeStruct((B, ny, n_nl), dtype),
        jax.ShapeDtypeStruct((B, ny, n_nl), dtype),
        jax.ShapeDtypeStruct((B, 1, n_nl), dtype),
        jax.ShapeDtypeStruct((B, nx, n_nr), dtype),
        jax.ShapeDtypeStruct((B, nu, n_nr), dtype),
        jax.ShapeDtypeStruct((B, 1, n_nr), dtype),
        jax.ShapeDtypeStruct((B, 1, n_nr), dtype),
        jax.ShapeDtypeStruct((B, nx, n_nl), dtype),
        jax.ShapeDtypeStruct((B, nu, n_nl), dtype),
        jax.ShapeDtypeStruct((B, nx, n_lf), dtype),
        jax.ShapeDtypeStruct((B, 1, n_lf), dtype),
        jax.ShapeDtypeStruct((B, 1, n_lf), dtype),
        jax.ShapeDtypeStruct((B, nx, n_lf), dtype),
        *poly_lane_shapes,
    ]
    npb = len(out_specs)  # pair blocks incl. polytope rows
    pair_lane_specs = list(out_specs)  # the npb (zbar, vbar) block specs
    if with_direction:
        # tau [B, 1, 1] plus the direction blocks after the (z, v) state
        in_specs = in_specs + [lane(None, 1)] + pair_lane_specs
    if with_metric:
        # M r outputs: same block structure as (zbar, vbar); then the
        # per-lane scalar reductions [B, 1, 1]
        n_scal = 6 if with_direction else 3
        out_specs = out_specs + out_specs + [lane(None, 1)] * n_scal
        out_shape = (
            out_shape
            + out_shape
            + [jax.ShapeDtypeStruct((B, 1, 1), dtype)] * n_scal
        )
    scratch = [
        pltpu.VMEM((bt, nx, n), dtype),  # gx
        pltpu.VMEM((bt, nu, n_nl), dtype),  # gu
        pltpu.VMEM((bt, nx, n), dtype),  # gq (costate / L' temp)
        pltpu.VMEM((bt, max(nu, 1), max(n_nl, n_lf)), dtype),  # gs (dvec / L' temp)
        pltpu.VMEM((bt, mker, n_nl), dtype),  # gk (S2 gather)
        pltpu.VMEM((bt, mker, n_nl), dtype),  # gk2 (S2 projected)
        pltpu.VMEM((bt, 1, n), dtype),  # gss (s pre-projection)
        pltpu.VMEM((bt, 1, n_nr), dtype),  # gtt (tau pre-projection)
        pltpu.VMEM((bt, nx, n_nr), dtype),  # gqx (L qx block)
        pltpu.VMEM((bt, max(nu, 1), n_nr), dtype),  # gru (L ru block)
        pltpu.VMEM(
            (bt, max(t.d * nx, nx + nu), max(n_lf // t.d, 1)), dtype
        ),  # gst (child-stack gather / [x; dv])
        pltpu.VMEM((bt, t.d * nx, max(n_lf // t.d, 1)), dtype),  # gst2
    ]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )
    poly_consts = []
    poly_state = []
    if nc:
        poly_consts += [
            data.Gx, data.Gu, data.Gx.T, data.Gu.T,
            data.p_lo[:, None], data.p_hi[:, None],
        ]
        poly_state.append(v.pnl)
    if ncL:
        poly_consts += [
            data.GxN, data.GxN.T, data.pN_lo[:, None], data.pN_hi[:, None],
        ]
        poly_state.append(v.plf)
    poly_dirs = []
    if with_direction:
        if nc:
            poly_dirs.append(direction[1].pnl)
        if ncL:
            poly_dirs.append(direction[1].plf)
    outs = call(
        jnp.stack([jnp.asarray(gamma, dtype), jnp.asarray(sigma, dtype)]),
        qf, rf, qnf, qt, rt, qnt,
        b_arg, ker_arg,
        Kst, KstT, Rti, BTall, PBstk, ABKTall, ABKBall,
        data.x_min[:, None], data.x_max[:, None],
        data.u_min[:, None], data.u_max[:, None],
        *poly_consts,
        x0[:, :, None],
        z.x, z.u, z.s[:, None, :], z.tau[:, None, :], z.y,
        v.y, v.sby[:, None, :], v.qx, v.ru, v.t5[:, None, :],
        v.t6[:, None, :],
        v.cx, v.cu, v.qNx, v.s12[:, None, :], v.s13[:, None, :], v.cxN,
        *poly_state,
        *(
            (
                jnp.asarray(direction[2], dtype).reshape(B, 1, 1)
                if jnp.ndim(direction[2])
                else jnp.full((B, 1, 1), direction[2], dtype),
                direction[0].x, direction[0].u,
                direction[0].s[:, None, :], direction[0].tau[:, None, :],
                direction[0].y,
                direction[1].y, direction[1].sby[:, None, :],
                direction[1].qx, direction[1].ru,
                direction[1].t5[:, None, :], direction[1].t6[:, None, :],
                direction[1].cx, direction[1].cu, direction[1].qNx,
                direction[1].s12[:, None, :], direction[1].s13[:, None, :],
                direction[1].cxN,
                *poly_dirs,
            )
            if with_direction
            else ()
        ),
    )
    sq = lambda a: a[:, 0, :]

    def unpack(o):
        zpart = Primal(x=o[0], u=o[1], s=sq(o[2]), tau=sq(o[3]), y=o[4])
        k_ = 17
        pnl = plf = None
        if nc:
            pnl = o[k_]
            k_ += 1
        if ncL:
            plf = o[k_]
        vpart = Dual(
            y=o[5], sby=sq(o[6]), qx=o[7], ru=o[8], t5=sq(o[9]),
            t6=sq(o[10]), cx=o[11], cu=o[12], qNx=o[13],
            s12=sq(o[14]), s13=sq(o[15]), cxN=o[16], pnl=pnl, plf=plf,
        )
        return zpart, vpart

    zbar, vbar = unpack(outs[:npb])
    if not with_metric:
        return zbar, vbar
    Mrz, Mrv = unpack(outs[npb : 2 * npb])
    scal = [a[:, 0, 0] for a in outs[2 * npb :]]
    if not with_direction:
        rnsq, nmz, nmv = scal
        return zbar, vbar, Mrz, Mrv, rnsq, nmz, nmv
    rnsq, nmz, nmv, rho_dot, nmdz, nmdv = scal
    return zbar, vbar, Mrz, Mrv, rnsq, nmz, nmv, rho_dot, nmdz, nmdv
