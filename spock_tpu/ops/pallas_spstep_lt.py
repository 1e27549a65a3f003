"""Fused whole-iteration SuperMann step: ONE Pallas kernel per iteration.

Round-2 measurement (examples/iter_bench.py, B=128 server_heat headline):
the farm iteration cost 12.4 ms — fresh sweep megakernel 3.0 ms, candidate
megakernel ~3.4 ms, flat Anderson glue 3.5 ms ([B, K] ravel/unravel,
[B, 3, K] history writes, Gram matmuls), masked-update/ravel glue ~2.5 ms.
Everything between the two sweeps is elementwise work and tiny reductions
over the same iterate-sized data the sweeps already hold in VMEM — so this
kernel runs the ENTIRE tau=1 iteration in one launch:

  1. fresh CP sweep + metric reductions at (z, v)   [skipped per lane-tile
     when every lane's sweep cache is valid — in warm steady state most
     lanes K1-accepted the previous tau=1 candidate, whose sweep results
     ARE this iteration's]
  2. Anderson direction: secant y/p, newest-first history rows, validity-
     masked 3x3 Gram + closed-form solve, d = -r - gamma' P   [the flat
     glue disappears: no ravel, no [B, 3, K] traffic, rows written once]
  3. candidate sweep + metric + M d reductions at (z + d, v + dv)
  4. K1/K2/fallback selection and the lane-masked state update
     (z_new, s_new, r, cache, all SuperMann scalars)

Data layout: the (Primal, Dual) pair is PACKED into three class arrays
(node axis last, concatenated segments at static offsets) —

  W [B, FW, WW]: zx | zu | vqx | vru | vcx | vcu | vqNx | vcxN   (FW = max(nx, nu))
  Y [B, ny, WY]: zy | vy
  S [B, 1,  WS]: zs | ztau | vsby | vt5 | vt6 | vs12 | vs13

so one iterate pair is 3 pallas refs instead of 17.  This matters: the
per-grid-step DMA descriptor count is a first-order cost at these sizes
(the round-2 megakernels ran ~6-10x over their HBM-bandwidth bound), and
the packed layout also lets the residual/secant/history algebra run as
whole-class array ops.  Rows nu..FW / nx..FW of W segments are structural
padding kept exactly zero (pack_pair zeroes them; the kernel re-zeroes the
segments it writes), so full-array reductions are exact.

History rotation: the Anderson window is stored newest-first as m = 3
separate row-trios in the carry.  The kernel reads the age-1/age-2 rows,
computes the new age-0 row (y, p), and the HOST binds the outputs into the
carry slot of the current phase (it mod 3, static per call site via a
3-phase loop unroll) — rows that merely age are passed through the carry
untouched, so the steady-state history traffic is exactly one row written
+ two read per iteration, and a farm-refilled lane is BITWISE equal to a
standalone warm solve (validity = age <= niter, see
algorithms/anderson.direction_struct).

Mosaic rules followed (same as ops/pallas_sweep.py, learned on-chip):
last-two block dims full-size, no 3D dot_general (per-lane 2D MXU dots),
no register concat/slicing at nonzero lane offsets — tree regrouping goes
through VMEM scratch; two-stage (sublane then lane) reductions.

Cites: candidate/K1/K2 semantics per /root/reference/src/model_algorithms/
sp.jl:118-222; Anderson per qnewton_directions/anderson.jl; the CP sweep
blocks per model_dynamics/implicit_l.jl:177-951.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..problem import ProblemData, ProblemMeta
from ..zv import Dual, Primal
from . import pallas_sweep

# ---------------------------------------------------------------------------
# packed layout
# ---------------------------------------------------------------------------

_W, _Y, _S = 0, 1, 2

_Y_SEGS = ("zy", "vy")
_S_SEGS = ("zs", "ztau", "vsby", "vt5", "vt6", "vs12", "vs13")


@dataclasses.dataclass(frozen=True)
class PackMeta:
    FW: int
    WW: int
    WY: int
    WS: int
    w_segs: tuple  # W-class segment names in layout order (incl. polytopes)
    seg: dict  # name -> (class_idx, rows, lo, hi)

    def __hash__(self):
        return hash((self.FW, self.WW, self.WY, self.WS, self.w_segs))


@functools.lru_cache(maxsize=None)
def pack_meta(meta: ProblemMeta) -> PackMeta:
    t = meta.tree
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    nc, ncL = meta.nc_nl, meta.nc_lf
    FW = max(nx, nu, nc, ncL)
    seg = {}

    def lay(cls, entries):
        o = 0
        for name, rows, w in entries:
            seg[name] = (cls, rows, o, o + w)
            o += w
        return o

    w_entries = [
        ("zx", nx, n), ("zu", nu, n_nl), ("vqx", nx, n_nr),
        ("vru", nu, n_nr), ("vcx", nx, n_nl), ("vcu", nu, n_nl),
        ("vqNx", nx, n_lf), ("vcxN", nx, n_lf),
    ]
    # polytope dual rows ride the W class (same node widths as vcx/vcxN)
    if nc:
        w_entries.append(("vpnl", nc, n_nl))
    if ncL:
        w_entries.append(("vplf", ncL, n_lf))
    WW = lay(_W, w_entries)
    WY = lay(_Y, [("zy", ny, n_nl), ("vy", ny, n_nl)])
    WS = lay(_S, [
        ("zs", 1, n), ("ztau", 1, n_nr), ("vsby", 1, n_nl),
        ("vt5", 1, n_nr), ("vt6", 1, n_nr), ("vs12", 1, n_lf),
        ("vs13", 1, n_lf),
    ])
    return PackMeta(
        FW=FW, WW=WW, WY=WY, WS=WS,
        w_segs=tuple(e[0] for e in w_entries), seg=seg,
    )


def _pair_leaves(z: Primal, v: Dual):
    lv = {
        "zx": z.x, "zu": z.u, "zs": z.s[..., None, :],
        "ztau": z.tau[..., None, :], "zy": z.y,
        "vy": v.y, "vsby": v.sby[..., None, :], "vqx": v.qx, "vru": v.ru,
        "vt5": v.t5[..., None, :], "vt6": v.t6[..., None, :],
        "vcx": v.cx, "vcu": v.cu, "vqNx": v.qNx,
        "vs12": v.s12[..., None, :], "vs13": v.s13[..., None, :],
        "vcxN": v.cxN,
    }
    if v.pnl is not None:
        lv["vpnl"] = v.pnl
    if v.plf is not None:
        lv["vplf"] = v.plf
    return lv


def pack_pair(meta: ProblemMeta, z: Primal, v: Dual):
    """(Primal, Dual) -> (W, Y, S) packed class arrays (pad rows zeroed)."""
    pk = pack_meta(meta)
    lv = _pair_leaves(z, v)

    def cat(names, FH):
        parts = []
        for nm in names:
            a = lv[nm]
            rows = a.shape[-2]
            if rows < FH:
                padcfg = [(0, 0)] * (a.ndim - 2) + [(0, FH - rows), (0, 0)]
                a = jnp.pad(a, padcfg)
            parts.append(a)
        return jnp.concatenate(parts, axis=-1)

    return (
        cat(pk.w_segs, pk.FW),
        cat(_Y_SEGS, meta.ny),
        cat(_S_SEGS, 1),
    )


def unpack_pair(meta: ProblemMeta, trio):
    pk = pack_meta(meta)

    def get(name):
        cls, rows, lo, hi = pk.seg[name]
        return trio[cls][..., :rows, lo:hi]

    sq = lambda a: a[..., 0, :]
    z = Primal(
        x=get("zx"), u=get("zu"), s=sq(get("zs")), tau=sq(get("ztau")),
        y=get("zy"),
    )
    v = Dual(
        y=get("vy"), sby=sq(get("vsby")), qx=get("vqx"), ru=get("vru"),
        t5=sq(get("vt5")), t6=sq(get("vt6")), cx=get("vcx"), cu=get("vcu"),
        qNx=get("vqNx"), s12=sq(get("vs12")), s13=sq(get("vs13")),
        cxN=get("vcxN"),
        pnl=get("vpnl") if "vpnl" in pk.seg else None,
        plf=get("vplf") if "vplf" in pk.seg else None,
    )
    return z, v


def root_u(meta: ProblemMeta, trio):
    """Root input u_1 straight from the packed layout (no unpack)."""
    pk = pack_meta(meta)
    _, rows, lo, _ = pk.seg["zu"]
    return trio[_W][..., :rows, lo]


def zero_trio(meta: ProblemMeta, B: int, dtype):
    pk = pack_meta(meta)
    return (
        jnp.zeros((B, pk.FW, pk.WW), dtype),
        jnp.zeros((B, meta.ny, pk.WY), dtype),
        jnp.zeros((B, 1, pk.WS), dtype),
    )


# ---------------------------------------------------------------------------
# sizing / support
# ---------------------------------------------------------------------------

def _trio_padded(meta: ProblemMeta) -> int:
    """Padded floats of one packed pair under (8, 128) tiling."""
    pk = pack_meta(meta)
    pad = pallas_sweep._padded
    return (
        pad(pk.FW, pk.WW) + pad(meta.ny, pk.WY) + pad(1, pk.WS)
    )


def _step_vmem_bytes(meta: ProblemMeta, bt: int) -> int:
    it = _trio_padded(meta)
    pad = pallas_sweep._padded
    t = meta.tree
    nx, nu = meta.nx, meta.nu
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    mker = meta.ny + 2 * t.d
    child_w = max(n_lf // t.d, 1)
    # I/O: 8 trios in (z, cache, r_prev, s_prev, 4 history rows),
    # 6 trios out + scalar packs; double-buffered by the pipeline
    io = 8 * it + 6 * it + 2 * pad(1, 16) + pad(nx, 1)
    scratch = 2 * it + pad(1, 16) + sum(
        pad(f, w)
        for f, w in [
            (nx, n), (nu, n_nl), (nx, n), (max(nu, 1), max(n_nl, n_lf)),
            (mker, n_nl), (mker, n_nl), (1, n), (1, n_nr), (nx, n_nr),
            (max(nu, 1), n_nr), (max(t.d * nx, nx + nu), child_w),
            (t.d * nx, child_w), (nx, n), (nu, n_nl),
        ]
    )
    return 4 * bt * (2 * io + scratch)


_STEP_VMEM_BUDGET = 96 * 1024 * 1024


def _pick_bt(meta: ProblemMeta, B: int) -> int:
    for cand in (8, 4, 2, 1):
        if B % cand == 0 and _step_vmem_bytes(meta, cand) <= _STEP_VMEM_BUDGET:
            return cand
    return 1


def enabled() -> bool:
    import os

    env = os.environ.get("SPOCK_FUSED_STEP")
    if env == "1":
        return True
    if env == "0":
        return False
    return pallas_sweep.enabled()


def supported(meta: ProblemMeta, data: ProblemData) -> bool:
    """Same problem class as the sweep megakernel (incl. two-sided polytope
    rows, which pack as extra W-class segments since round 4), plus VMEM
    fit."""
    if not pallas_sweep.supported(meta, data):
        return False
    # the whole-iteration kernel keeps the uniform-cost single-dot fast
    # path; per-node cost slabs (r5) ride the sweep megakernels instead
    for arr in (data.sqrtQ, data.sqrtR, data.sqrtQN):
        if arr.shape[0] != 1:
            return False
    return _step_vmem_bytes(meta, 1) <= _STEP_VMEM_BUDGET


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

# scalar-pack input slots ([B, 1, 16] f32)
_SC_ACTIVE, _SC_VALID1, _SC_VALID2, _SC_CACHE = 0, 1, 2, 3
_SC_RSAFE, _SC_QPOW, _SC_RNC, _SC_NMZC, _SC_NMVC = 4, 5, 6, 7, 8
# scalar-pack output slots
_OC_K1, _OC_K2, _OC_LOOP, _OC_RN, _OC_RT, _OC_RSAFE = 0, 1, 2, 3, 4, 5
_OC_XI1, _OC_XI2, _OC_NMRWZ, _OC_NMRWV = 6, 7, 8, 9
_OC_G0, _OC_G1, _OC_G2 = 10, 11, 12


def _s3(x):
    return jnp.sum(jnp.sum(x, axis=1, keepdims=True), axis=2, keepdims=True)


def _a3(x):
    return jnp.max(
        jnp.max(jnp.abs(x), axis=1, keepdims=True), axis=2, keepdims=True
    )


def _make_step_kernel(meta, pk: PackMeta, cone_segments, c1, sigma_k2, lam,
                      lam_sp):
    t = meta.tree
    N, d = t.N, t.d
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, ls = t.n, t.n_nonleaf, t.leaf_start
    n_nr, n_lf = t.n - 1, t.n_leaf
    nc, ncL = meta.nc_nl, meta.nc_lf
    off = [t.stage_offset(i) for i in range(N + 1)]
    msz = [t.stage_size(i) for i in range(N)]
    seg = pk.seg
    FW = pk.FW
    _mm = pallas_sweep._mm
    _soc = pallas_sweep._soc_pieces

    def kernel(
        flags_ref,  # [n_tiles] int32 scalar-prefetch: tile-all-cached flag
        scal_ref,  # [2] SMEM (gamma, sigma)
        sqrtQ_ref, sqrtR_ref, sqrtQN_ref, sqrtQT_ref, sqrtRT_ref,
        sqrtQNT_ref, b_ref, ker_ref,
        Kst_ref, KstT_ref, Rti_ref, BTall_ref, PBstk_ref, ABKTall_ref,
        ABKBall_ref,
        xmin_ref, xmax_ref, umin_ref, umax_ref,
        # polytope constants ((1, 1) zero dummies when nc/ncL == 0)
        pGx_ref, pGu_ref, pGxT_ref, pGuT_ref, plo_ref, phi_ref,
        pGxN_ref, pGxNT_ref, ploN_ref, phiN_ref,
        x0_ref,  # [bt, nx, 1]
        sc_ref,  # [bt, 1, 16]
        zW, zY, zS,  # current iterate pair
        cW, cY, cS,  # cached sweep results (prev tau=1 candidate)
        rpW, rpY, rpS,  # r_prev
        spW, spY, spS,  # s_prev
        a1rW, a1rY, a1rS,  # MR age-1 row
        a2rW, a2rY, a2rS,  # MR age-2 row
        a1pW, a1pY, a1pS,  # MP age-1 row
        a2pW, a2pY, a2pS,  # MP age-2 row
        # outputs
        oznW, oznY, oznS,  # z_new
        owW, owY, owS,  # candidate sweep results (next cache)
        orW, orY, orS,  # r (next r_prev)
        osW, osY, osS,  # s_new (next s_prev)
        oyW, oyY, oyS,  # new MR row (y)
        opW, opY, opS,  # new MP row (p)
        oscal,  # [bt, 1, 16]
        # scratch
        sbW, sbY, sbS,  # fresh sweep dest -> selected zbar/vbar
        sdW, sdY, sdS,  # direction d
        sscal,  # [bt, 1, 16] fresh metric scalars
        gx, gu, gq, gs, gk, gk2, gss, gtt, gqx, gru, gst, gst2,
        gmx, gmu,  # metric primal accumulators
        gbc,  # [bt, 1, max width] per-lane-scalar broadcast staging
    ):
        gamma = scal_ref[0]
        sigma = scal_ref[1]
        bt = zS.shape[0]
        sqrtQ = sqrtQ_ref[:]
        sqrtR = sqrtR_ref[:]
        sqrtQN = sqrtQN_ref[:]
        b3 = b_ref[:][None]  # [1, ny, 1]

        z_trio = (zW, zY, zS)
        sb_trio = (sbW, sbY, sbS)
        sd_trio = (sdW, sdY, sdS)
        ow_trio = (owW, owY, owS)

        # [bt, 1, 1] per-lane scalars against [bt, f, w] class arrays:
        # Mosaic has no both-axes broadcast (and its canonicalizer fuses a
        # lanes-then-sublanes chain back into one), so the lane-broadcast is
        # staged through VMEM — store canonicalizes the layout, the
        # subsequent elementwise op broadcasts sublanes only.  Each staged
        # value is consumed before the next call rewrites gbc (load-before-
        # store order is preserved on the ref).
        def bca(s11, w):
            gbc[:, :, :w] = jnp.broadcast_to(s11, (bt, 1, w))
            return gbc[:, :, :w]

        def bmul(s11, a):
            return bca(s11, a.shape[2]) * a

        def bsel(c11, a, b):
            return jnp.where(bca(c11.astype(zS.dtype), a.shape[2]) > 0, a, b)

        def rd(trio, name, a=None, b_=None):
            cls, rows, lo, hi = seg[name]
            if a is not None:
                lo, hi = lo + a, lo + b_
            return trio[cls][:, :rows, lo:hi]

        def wr(trio, name, val, a=None, b_=None):
            cls, rows, lo, hi = seg[name]
            if a is not None:
                lo, hi = lo + a, lo + b_
            trio[cls][:, :rows, lo:hi] = val

        def zero_pads(trio):
            # keep the pad rows of written W segments exactly zero so
            # whole-class reductions/arithmetic stay exact
            for name in pk.w_segs:
                cls, rows, lo, hi = seg[name]
                if rows < FW:
                    trio[cls][:, rows:, lo:hi] = jnp.zeros(
                        (bt, FW - rows, hi - lo), zS.dtype
                    )

        # ------------------------------------------------------------------
        # CP sweep at an evaluation point, writing (zbar, vbar) into dst.
        # rp(name, a, b) reads the point's pair segments.
        # ------------------------------------------------------------------
        def sweep(rp, dst):
            # ---- z1 = z - gamma L'(v) into gx/gu/gss/gtt/y1 ----
            gx[:, :, :n_nl] = (
                rp("vcx") + _mm(pGxT_ref[:], rp("vpnl")) if nc else rp("vcx")
            )
            gx_lf = rp("vcxN") + _mm(sqrtQNT_ref[:], rp("vqNx"))
            if ncL:
                gx_lf = gx_lf + _mm(pGxNT_ref[:], rp("vplf"))
            gx[:, :, ls:] = gx_lf
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                gq[:, :, 0 : d * m] = _mm(
                    sqrtQT_ref[:], rp("vqx", lo, lo + d * m)
                )
                acc = gq[:, :, 0:m]
                for k in range(1, d):
                    acc = acc + gq[:, :, k * m : (k + 1) * m]
                gx[:, :, off[st - 1] : off[st - 1] + m] = (
                    gx[:, :, off[st - 1] : off[st - 1] + m] + acc
                )
            gu[:] = (
                rp("vcu") + _mm(pGuT_ref[:], rp("vpnl")) if nc else rp("vcu")
            )
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                gs[:, :, 0 : d * m] = _mm(
                    sqrtRT_ref[:], rp("vru", lo, lo + d * m)
                )
                acc = gs[:, :, 0:m]
                for k in range(1, d):
                    acc = acc + gs[:, :, k * m : (k + 1) * m]
                gu[:, :, off[st - 1] : off[st - 1] + m] = (
                    gu[:, :, off[st - 1] : off[st - 1] + m] + acc
                )
            gx[:] = rp("zx") - gamma * gx[:]
            gu[:] = rp("zu") - gamma * gu[:]
            vsby_v = rp("vsby")
            vt5_v = rp("vt5")
            vt6_v = rp("vt6")
            ztau_v = rp("ztau")
            gss[:, :, :n_nl] = rp("zs", 0, n_nl) - gamma * vsby_v
            gss[:, :, ls:] = rp("zs", ls, n) - gamma * 0.5 * (
                rp("vs12") + rp("vs13")
            )
            gtt[:] = ztau_v - gamma * 0.5 * (vt5_v + vt6_v)
            y1 = rp("zy") - gamma * (rp("vy") - b3 * vsby_v)

            # ---- prox_f: S1 Riccati backward ----
            gq[:, :, ls:] = -gx[:, :, ls:]
            for st in range(N - 2, -1, -1):
                m = msz[st]
                u_st = gu[:, :, off[st] : off[st] + m]
                for k in range(d):
                    gst[:, k * nx : (k + 1) * nx, 0:m] = gq[
                        :, :, off[st + 1] + k * m : off[st + 1] + (k + 1) * m
                    ]
                qstk = gst[:, :, 0:m]
                sum_d = _mm(BTall_ref[:], qstk)
                dv = _mm(Rti_ref[st], u_st - sum_d)
                gs[:, :, off[st] : off[st] + m] = dv
                innerstk = _mm(PBstk_ref[st], dv) + qstk
                qi = _mm(ABKTall_ref[st], innerstk) + _mm(
                    KstT_ref[st], dv - u_st
                )
                gq[:, :, off[st] : off[st] + m] = (
                    qi - gx[:, :, off[st] : off[st] + m]
                )
            # ---- S1 forward ----
            gx[:, :, 0:1] = x0_ref[:]
            for st in range(N - 1):
                m = msz[st]
                x_st = gx[:, :, off[st] : off[st] + m]
                dv = gs[:, :, off[st] : off[st] + m]
                gu[:, :, off[st] : off[st] + m] = _mm(Kst_ref[st], x_st) + dv
                gst[:, 0:nx, 0:m] = x_st
                gst[:, nx : nx + nu, 0:m] = dv
                gst2[:, :, 0:m] = _mm(ABKBall_ref[st], gst[:, 0 : nx + nu, 0:m])
                for k in range(d):
                    gx[:, :, off[st + 1] + k * m : off[st + 1] + (k + 1) * m] = (
                        gst2[:, k * nx : (k + 1) * nx, 0:m]
                    )
            # ---- S2 kernel projection ----
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
            kerm = ker_ref[:]
            mk_ = ny + 2 * d
            if kerm.shape == (mk_, mk_):
                gk2[:] = _mm(kerm, gk[:])
            else:
                # per-node projectors ([mker^2, n_nl]): static multiply-add
                # contraction over [1, n_nl] rows (see pallas_sweep
                # s2_project)
                for i_ in range(mk_):
                    acc_ = (
                        kerm[i_ * mk_ : i_ * mk_ + 1, :][None]
                        * gk[:, 0:1, :]
                    )
                    for j_ in range(1, mk_):
                        acc_ = acc_ + (
                            kerm[i_ * mk_ + j_ : i_ * mk_ + j_ + 1, :][None]
                            * gk[:, j_ : j_ + 1, :]
                        )
                    gk2[:, i_ : i_ + 1, :] = acc_
            y_p = gk2[:, :ny, :]
            wr(dst, "zs", gss[:, :, 0:1] - gamma, 0, 1)
            coff = 0
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                for k in range(d):
                    wr(
                        dst, "zs",
                        gk2[:, ny + k : ny + k + 1, coff : coff + m],
                        off[st] + k * m, off[st] + (k + 1) * m,
                    )
                    wr(
                        dst, "ztau",
                        gk2[:, ny + d + k : ny + d + k + 1, coff : coff + m],
                        lo + k * m, lo + (k + 1) * m,
                    )
                coff += m
            wr(dst, "zx", gx[:])
            wr(dst, "zu", gu[:])
            wr(dst, "zy", y_p)
            s_nl_val = rd(dst, "zs", 0, n_nl)
            s_lf_val = rd(dst, "zs", ls, n)
            tau_val = rd(dst, "ztau")

            # ---- vbar = prox_h*(v + sigma L (2 zbar - z)) ----
            ru_ = 2.0 * gu[:] - rp("zu")
            rs_nl = 2.0 * s_nl_val - rp("zs", 0, n_nl)
            rs_lf = 2.0 * s_lf_val - rp("zs", ls, n)
            rtau = 2.0 * tau_val - ztau_v
            ry = 2.0 * y_p - rp("zy")
            inv = 1.0 / sigma
            wy = rp("vy") * inv + ry
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
            wr(dst, "vy", sigma * (wy - py))
            bty = jnp.sum(b3 * ry, axis=1, keepdims=True)
            wsby = rp("vsby") * inv + (rs_nl - bty)
            wr(dst, "vsby", sigma * (wsby - jnp.maximum(wsby, 0.0)))
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1]
                xp = 2.0 * gx[:, :, po : po + m] - rp("zx", po, po + m)
                up = 2.0 * gu[:, :, po : po + m] - rp("zu", po, po + m)
                qxp = _mm(sqrtQ, xp)
                rup = _mm(sqrtR, up)
                for k in range(d):
                    gqx[:, :, lo + k * m : lo + (k + 1) * m] = qxp
                    gru[:, :, lo + k * m : lo + (k + 1) * m] = rup
            wqx = rp("vqx") * inv + gqx[:]
            wru = rp("vru") * inv + gru[:]
            wt5 = vt5_v * inv + 0.5 * rtau - 0.5
            wt6 = vt6_v * inv + 0.5 * rtau + 0.5
            xn_sq = (
                jnp.sum(wqx * wqx, axis=1, keepdims=True)
                + jnp.sum(wru * wru, axis=1, keepdims=True)
                + wt5 * wt5
            )
            t_out, x_scale = _soc(wt6, xn_sq)
            wr(dst, "vt6", sigma * (wt6 - t_out))
            wr(dst, "vqx", sigma * (wqx - x_scale * wqx))
            wr(dst, "vru", sigma * (wru - x_scale * wru))
            wr(dst, "vt5", sigma * (wt5 - x_scale * wt5))
            rx_lf = 2.0 * gx[:, :, ls:] - rp("zx", ls, n)
            wqNx = rp("vqNx") * inv + _mm(sqrtQN, rx_lf)
            ws12 = rp("vs12") * inv + 0.5 * rs_lf - 0.5
            ws13 = rp("vs13") * inv + 0.5 * rs_lf + 0.5
            xn_sq_l = jnp.sum(wqNx * wqNx, axis=1, keepdims=True) + ws12 * ws12
            tl_out, xl_scale = _soc(ws13, xn_sq_l)
            wr(dst, "vs13", sigma * (ws13 - tl_out))
            wr(dst, "vqNx", sigma * (wqNx - xl_scale * wqNx))
            wr(dst, "vs12", sigma * (ws12 - xl_scale * ws12))
            xmin = xmin_ref[:][None]
            xmax = xmax_ref[:][None]
            umin = umin_ref[:][None]
            umax = umax_ref[:][None]
            rx_nl = 2.0 * gx[:, :, :n_nl] - rp("zx", 0, n_nl)
            wcx = rp("vcx") * inv + rx_nl
            wr(dst, "vcx", sigma * (wcx - jnp.clip(wcx, xmin, xmax)))
            wcu = rp("vcu") * inv + ru_
            wr(dst, "vcu", sigma * (wcu - jnp.clip(wcu, umin, umax)))
            wcxN = rp("vcxN") * inv + rx_lf
            wr(dst, "vcxN", sigma * (wcxN - jnp.clip(wcxN, xmin, xmax)))
            # polytope rows: L block Gx x + Gu u (nonleaf) / GxN x (leaf),
            # prox = two-sided clip (cf. pallas_sweep polytope blocks)
            if nc:
                wpnl = rp("vpnl") * inv + _mm(pGx_ref[:], rx_nl) + _mm(
                    pGu_ref[:], ru_
                )
                plo = plo_ref[:][None]
                phi = phi_ref[:][None]
                wr(dst, "vpnl", sigma * (wpnl - jnp.clip(wpnl, plo, phi)))
            if ncL:
                wplf = rp("vplf") * inv + _mm(pGxN_ref[:], rx_lf)
                ploN = ploN_ref[:][None]
                phiN = phiN_ref[:][None]
                wr(dst, "vplf", sigma * (wplf - jnp.clip(wplf, ploN, phiN)))
            zero_pads(dst)

        # ------------------------------------------------------------------
        # metric reductions at an evaluation point with sweep results in dst:
        # returns (rnsq, nmz, nmv) of r = point - dst, all [bt, 1, 1].
        # Reapplies the L/L' block maps to the residual entirely in VMEM —
        # nothing is written to HBM.
        # ------------------------------------------------------------------
        def metric_reduce(rp, dst):
            def res(name, a=None, b_=None):
                return rp(name, a, b_) - rd(dst, name, a, b_)

            ruy = res("vy")
            rusby = res("vsby")
            rut5 = res("vt5")
            rut6 = res("vt6")
            rus12 = res("vs12")
            rus13 = res("vs13")
            rwy = res("zy")
            rwtau = res("ztau")

            # dual part: ru - sigma L rw
            mvy = ruy - sigma * rwy
            rnsq = _s3(ruy * mvy)
            nmv = _a3(mvy)
            bty_rw = jnp.sum(b3 * rwy, axis=1, keepdims=True)
            mvsby = rusby - sigma * (res("zs", 0, n_nl) - bty_rw)
            rnsq = rnsq + _s3(rusby * mvsby)
            nmv = jnp.maximum(nmv, _a3(mvsby))
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1]
                qxp = _mm(sqrtQ, res("zx", po, po + m))
                rup = _mm(sqrtR, res("zu", po, po + m))
                for k in range(d):
                    a0, b0 = lo + k * m, lo + (k + 1) * m
                    mvqx = res("vqx", a0, b0) - sigma * qxp
                    mvru = res("vru", a0, b0) - sigma * rup
                    rnsq = rnsq + _s3(res("vqx", a0, b0) * mvqx) + _s3(
                        res("vru", a0, b0) * mvru
                    )
                    nmv = jnp.maximum(
                        nmv, jnp.maximum(_a3(mvqx), _a3(mvru))
                    )
            mvt5 = rut5 - sigma * 0.5 * rwtau
            mvt6 = rut6 - sigma * 0.5 * rwtau
            rnsq = rnsq + _s3(rut5 * mvt5) + _s3(rut6 * mvt6)
            nmv = jnp.maximum(nmv, jnp.maximum(_a3(mvt5), _a3(mvt6)))
            mvcx = res("vcx") - sigma * res("zx", 0, n_nl)
            mvcu = res("vcu") - sigma * res("zu")
            rnsq = rnsq + _s3(res("vcx") * mvcx) + _s3(res("vcu") * mvcu)
            nmv = jnp.maximum(nmv, jnp.maximum(_a3(mvcx), _a3(mvcu)))
            mvqNx = res("vqNx") - sigma * _mm(sqrtQN, res("zx", ls, n))
            mvs12 = rus12 - sigma * 0.5 * res("zs", ls, n)
            mvs13 = rus13 - sigma * 0.5 * res("zs", ls, n)
            mvcxN = res("vcxN") - sigma * res("zx", ls, n)
            rnsq = (
                rnsq + _s3(res("vqNx") * mvqNx) + _s3(rus12 * mvs12)
                + _s3(rus13 * mvs13) + _s3(res("vcxN") * mvcxN)
            )
            nmv = jnp.maximum(
                nmv,
                jnp.maximum(
                    jnp.maximum(_a3(mvqNx), _a3(mvs12)),
                    jnp.maximum(_a3(mvs13), _a3(mvcxN)),
                ),
            )
            if nc:
                mvpnl = res("vpnl") - sigma * (
                    _mm(pGx_ref[:], res("zx", 0, n_nl))
                    + _mm(pGu_ref[:], res("zu"))
                )
                rnsq = rnsq + _s3(res("vpnl") * mvpnl)
                nmv = jnp.maximum(nmv, _a3(mvpnl))
            if ncL:
                mvplf = res("vplf") - sigma * _mm(
                    pGxN_ref[:], res("zx", ls, n)
                )
                rnsq = rnsq + _s3(res("vplf") * mvplf)
                nmv = jnp.maximum(nmv, _a3(mvplf))

            # primal part: rw - gamma L' ru (accumulate L'ru in gmx/gmu)
            gmx[:, :, :n_nl] = (
                res("vcx") + _mm(pGxT_ref[:], res("vpnl"))
                if nc else res("vcx")
            )
            gmx_lf = res("vcxN") + _mm(sqrtQNT_ref[:], res("vqNx"))
            if ncL:
                gmx_lf = gmx_lf + _mm(pGxNT_ref[:], res("vplf"))
            gmx[:, :, ls:] = gmx_lf
            gmu[:] = (
                res("vcu") + _mm(pGuT_ref[:], res("vpnl"))
                if nc else res("vcu")
            )
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                gq[:, :, 0 : d * m] = _mm(
                    sqrtQT_ref[:], res("vqx", lo, lo + d * m)
                )
                acc = gq[:, :, 0:m]
                for k in range(1, d):
                    acc = acc + gq[:, :, k * m : (k + 1) * m]
                gmx[:, :, off[st - 1] : off[st - 1] + m] = (
                    gmx[:, :, off[st - 1] : off[st - 1] + m] + acc
                )
                gs[:, :, 0 : d * m] = _mm(
                    sqrtRT_ref[:], res("vru", lo, lo + d * m)
                )
                accu = gs[:, :, 0:m]
                for k in range(1, d):
                    accu = accu + gs[:, :, k * m : (k + 1) * m]
                gmu[:, :, off[st - 1] : off[st - 1] + m] = (
                    gmu[:, :, off[st - 1] : off[st - 1] + m] + accu
                )
            mzx = res("zx") - gamma * gmx[:]
            mzu = res("zu") - gamma * gmu[:]
            rnsq = rnsq + _s3(res("zx") * mzx) + _s3(res("zu") * mzu)
            nmz = jnp.maximum(_a3(mzx), _a3(mzu))
            mzs_nl = res("zs", 0, n_nl) - gamma * rusby
            mzs_lf = res("zs", ls, n) - gamma * 0.5 * (rus12 + rus13)
            rnsq = rnsq + _s3(res("zs", 0, n_nl) * mzs_nl) + _s3(
                res("zs", ls, n) * mzs_lf
            )
            nmz = jnp.maximum(nmz, jnp.maximum(_a3(mzs_nl), _a3(mzs_lf)))
            mztau = rwtau - gamma * 0.5 * (rut5 + rut6)
            rnsq = rnsq + _s3(rwtau * mztau)
            nmz = jnp.maximum(nmz, _a3(mztau))
            mzy = rwy - gamma * (ruy - b3 * rusby)
            rnsq = rnsq + _s3(rwy * mzy)
            nmz = jnp.maximum(nmz, _a3(mzy))
            return rnsq, nmz, nmv

        # ------------------------------------------------------------------
        # M d reductions dotted with the candidate residual r~ = point - ow:
        # returns (rho_dot, nmdz, nmdv).  d lives in sd scratch.
        # ------------------------------------------------------------------
        def md_reduce(rp_cand):
            def dseg(name, a=None, b_=None):
                return rd(sd_trio, name, a, b_)

            def rt_(name, a=None, b_=None):
                return rp_cand(name, a, b_) - rd(ow_trio, name, a, b_)

            dzy_v = dseg("zy")
            dztau_v = dseg("ztau")
            mdvy = dseg("vy") - sigma * dzy_v
            rho = _s3(rt_("vy") * mdvy)
            nmdv = _a3(mdvy)
            bty_d = jnp.sum(b3 * dzy_v, axis=1, keepdims=True)
            mdvsby = dseg("vsby") - sigma * (dseg("zs", 0, n_nl) - bty_d)
            rho = rho + _s3(rt_("vsby") * mdvsby)
            nmdv = jnp.maximum(nmdv, _a3(mdvsby))
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1]
                qxp_d = _mm(sqrtQ, dseg("zx", po, po + m))
                rup_d = _mm(sqrtR, dseg("zu", po, po + m))
                for k in range(d):
                    a0, b0 = lo + k * m, lo + (k + 1) * m
                    mdvqx = dseg("vqx", a0, b0) - sigma * qxp_d
                    mdvru = dseg("vru", a0, b0) - sigma * rup_d
                    rho = rho + _s3(rt_("vqx", a0, b0) * mdvqx) + _s3(
                        rt_("vru", a0, b0) * mdvru
                    )
                    nmdv = jnp.maximum(
                        nmdv, jnp.maximum(_a3(mdvqx), _a3(mdvru))
                    )
            mdvt5 = dseg("vt5") - sigma * 0.5 * dztau_v
            mdvt6 = dseg("vt6") - sigma * 0.5 * dztau_v
            rho = rho + _s3(rt_("vt5") * mdvt5) + _s3(rt_("vt6") * mdvt6)
            nmdv = jnp.maximum(nmdv, jnp.maximum(_a3(mdvt5), _a3(mdvt6)))
            mdvcx = dseg("vcx") - sigma * dseg("zx", 0, n_nl)
            mdvcu = dseg("vcu") - sigma * dseg("zu")
            rho = rho + _s3(rt_("vcx") * mdvcx) + _s3(rt_("vcu") * mdvcu)
            nmdv = jnp.maximum(nmdv, jnp.maximum(_a3(mdvcx), _a3(mdvcu)))
            mdvqNx = dseg("vqNx") - sigma * _mm(sqrtQN, dseg("zx", ls, n))
            mdvs12 = dseg("vs12") - sigma * 0.5 * dseg("zs", ls, n)
            mdvs13 = dseg("vs13") - sigma * 0.5 * dseg("zs", ls, n)
            mdvcxN = dseg("vcxN") - sigma * dseg("zx", ls, n)
            rho = (
                rho + _s3(rt_("vqNx") * mdvqNx) + _s3(rt_("vs12") * mdvs12)
                + _s3(rt_("vs13") * mdvs13) + _s3(rt_("vcxN") * mdvcxN)
            )
            nmdv = jnp.maximum(
                nmdv,
                jnp.maximum(
                    jnp.maximum(_a3(mdvqNx), _a3(mdvs12)),
                    jnp.maximum(_a3(mdvs13), _a3(mdvcxN)),
                ),
            )
            if nc:
                mdvpnl = dseg("vpnl") - sigma * (
                    _mm(pGx_ref[:], dseg("zx", 0, n_nl))
                    + _mm(pGu_ref[:], dseg("zu"))
                )
                rho = rho + _s3(rt_("vpnl") * mdvpnl)
                nmdv = jnp.maximum(nmdv, _a3(mdvpnl))
            if ncL:
                mdvplf = dseg("vplf") - sigma * _mm(
                    pGxN_ref[:], dseg("zx", ls, n)
                )
                rho = rho + _s3(rt_("vplf") * mdvplf)
                nmdv = jnp.maximum(nmdv, _a3(mdvplf))

            mdzy = dzy_v - gamma * (dseg("vy") - b3 * dseg("vsby"))
            rho = rho + _s3(rt_("zy") * mdzy)
            nmdz = _a3(mdzy)
            mdzs_nl = dseg("zs", 0, n_nl) - gamma * dseg("vsby")
            mdzs_lf = dseg("zs", ls, n) - gamma * 0.5 * (
                dseg("vs12") + dseg("vs13")
            )
            rho = rho + _s3(rt_("zs", 0, n_nl) * mdzs_nl) + _s3(
                rt_("zs", ls, n) * mdzs_lf
            )
            nmdz = jnp.maximum(nmdz, jnp.maximum(_a3(mdzs_nl), _a3(mdzs_lf)))
            mdztau = dztau_v - gamma * 0.5 * (dseg("vt5") + dseg("vt6"))
            rho = rho + _s3(rt_("ztau") * mdztau)
            nmdz = jnp.maximum(nmdz, _a3(mdztau))
            ltd_lf = dseg("vcxN") + _mm(sqrtQNT_ref[:], dseg("vqNx"))
            if ncL:
                ltd_lf = ltd_lf + _mm(pGxNT_ref[:], dseg("vplf"))
            mdzx_lf = dseg("zx", ls, n) - gamma * ltd_lf
            rho = rho + _s3(rt_("zx", ls, n) * mdzx_lf)
            nmdz = jnp.maximum(nmdz, _a3(mdzx_lf))
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1]
                gq[:, :, 0 : d * m] = _mm(
                    sqrtQT_ref[:], dseg("vqx", lo, lo + d * m)
                )
                acc = gq[:, :, 0:m]
                for k in range(1, d):
                    acc = acc + gq[:, :, k * m : (k + 1) * m]
                if nc:
                    acc = acc + _mm(pGxT_ref[:], dseg("vpnl", po, po + m))
                mdzx_st = dseg("zx", po, po + m) - gamma * (
                    dseg("vcx", po, po + m) + acc
                )
                rho = rho + _s3(rt_("zx", po, po + m) * mdzx_st)
                nmdz = jnp.maximum(nmdz, _a3(mdzx_st))
                gs[:, :, 0 : d * m] = _mm(
                    sqrtRT_ref[:], dseg("vru", lo, lo + d * m)
                )
                accu = gs[:, :, 0:m]
                for k in range(1, d):
                    accu = accu + gs[:, :, k * m : (k + 1) * m]
                if nc:
                    accu = accu + _mm(pGuT_ref[:], dseg("vpnl", po, po + m))
                mdzu_st = dseg("zu", po, po + m) - gamma * (
                    dseg("vcu", po, po + m) + accu
                )
                rho = rho + _s3(rt_("zu", po, po + m) * mdzu_st)
                nmdz = jnp.maximum(nmdz, _a3(mdzu_st))
            return rho, nmdz, nmdv

        # ==================================================================
        # phase 1: fresh sweep + metric at (z, v) — tile-skipped when every
        # lane in the tile has a valid cache
        # ==================================================================
        def rp_z(name, a=None, b_=None):
            return rd(z_trio, name, a, b_)

        allc = flags_ref[pl.program_id(0)]

        @pl.when(allc == 0)
        def _fresh():
            sweep(rp_z, sb_trio)
            rnsq, nmz, nmv = metric_reduce(rp_z, sb_trio)
            sscal[:, :, 0:1] = jnp.sqrt(jnp.maximum(rnsq, 0.0))
            sscal[:, :, 1:2] = nmz
            sscal[:, :, 2:3] = nmv

        # per-lane select: cached candidate results / fresh sweep
        cache3 = sc_ref[:, :, _SC_CACHE : _SC_CACHE + 1] > 0  # [bt, 1, 1]
        sbW[:] = bsel(cache3, cW[:], sbW[:])
        sbY[:] = bsel(cache3, cY[:], sbY[:])
        sbS[:] = bsel(cache3, cS[:], sbS[:])
        rn = jnp.where(
            cache3, sc_ref[:, :, _SC_RNC : _SC_RNC + 1], sscal[:, :, 0:1]
        )
        nmz_sel = jnp.where(
            cache3, sc_ref[:, :, _SC_NMZC : _SC_NMZC + 1], sscal[:, :, 1:2]
        )
        nmv_sel = jnp.where(
            cache3, sc_ref[:, :, _SC_NMVC : _SC_NMVC + 1], sscal[:, :, 2:3]
        )

        # ==================================================================
        # phase 2: residual, secant rows, Anderson direction
        # ==================================================================
        act3 = sc_ref[:, :, _SC_ACTIVE : _SC_ACTIVE + 1]
        hp3 = sc_ref[:, :, _SC_VALID1 : _SC_VALID1 + 1]  # has_prev == valid1
        v23 = sc_ref[:, :, _SC_VALID2 : _SC_VALID2 + 1]

        # r, y, p as whole-class expressions (pads are zero by construction)
        rW_v = zW[:] - sbW[:]
        rY_v = zY[:] - sbY[:]
        rS_v = zS[:] - sbS[:]
        yW_v = rW_v - bmul(hp3, rpW[:])
        yY_v = rY_v - bmul(hp3, rpY[:])
        yS_v = rS_v - bmul(hp3, rpS[:])
        oyW[:] = yW_v
        oyY[:] = yY_v
        oyS[:] = yS_v
        pW_v = bmul(hp3, spW[:]) - yW_v
        pY_v = bmul(hp3, spY[:]) - yY_v
        pS_v = bmul(hp3, spS[:]) - yS_v
        opW[:] = pW_v
        opY[:] = pY_v
        opS[:] = pS_v
        # next r_prev: only active lanes advance their residual
        orW[:] = bsel(act3 > 0, rW_v, rpW[:])
        orY[:] = bsel(act3 > 0, rY_v, rpY[:])
        orS[:] = bsel(act3 > 0, rS_v, rpS[:])

        def dot3(aW, aY, aS, bW, bY, bS):
            return _s3(aW * bW) + _s3(aY * bY) + _s3(aS * bS)

        g00 = dot3(yW_v, yY_v, yS_v, yW_v, yY_v, yS_v)
        g01 = dot3(yW_v, yY_v, yS_v, a1rW[:], a1rY[:], a1rS[:]) * hp3
        g02 = dot3(yW_v, yY_v, yS_v, a2rW[:], a2rY[:], a2rS[:]) * v23
        g11 = dot3(a1rW[:], a1rY[:], a1rS[:], a1rW[:], a1rY[:], a1rS[:]) * hp3
        g12 = (
            dot3(a1rW[:], a1rY[:], a1rS[:], a2rW[:], a2rY[:], a2rS[:])
            * hp3 * v23
        )
        g22 = dot3(a2rW[:], a2rY[:], a2rS[:], a2rW[:], a2rY[:], a2rS[:]) * v23
        c0 = dot3(yW_v, yY_v, yS_v, rW_v, rY_v, rS_v)
        c1_ = dot3(a1rW[:], a1rY[:], a1rS[:], rW_v, rY_v, rS_v) * hp3
        c2 = dot3(a2rW[:], a2rY[:], a2rS[:], rW_v, rY_v, rS_v) * v23

        # regularized closed-form 3x3 solve (matches anderson._solve3)
        tr = g00 + g11 + g22
        eps = 1e-10 * (tr / 3.0) + 1e-30
        a_, bb, cc = g00 + eps, g01, g02
        d_, e_, f_ = g01, g11 + eps, g12
        g_, h_, i_ = g02, g12, g22 + eps
        co00 = e_ * i_ - f_ * h_
        co01 = f_ * g_ - d_ * i_
        co02 = d_ * h_ - e_ * g_
        det = a_ * co00 + bb * co01 + cc * co02
        co10 = cc * h_ - bb * i_
        co11 = a_ * i_ - cc * g_
        co12 = bb * g_ - a_ * h_
        co20 = bb * f_ - cc * e_
        co21 = cc * d_ - a_ * f_
        co22 = a_ * e_ - bb * d_
        x0s = co00 * c0 + co10 * c1_ + co20 * c2
        x1s = co01 * c0 + co11 * c1_ + co21 * c2
        x2s = co02 * c0 + co12 * c1_ + co22 * c2
        dinv = 1.0 / jnp.where(det != 0, det, 1.0)
        gam0 = x0s * dinv
        gam1 = x1s * dinv * hp3
        gam2 = x2s * dinv * v23

        sdW[:] = (
            -rW_v - bmul(gam0, pW_v) - bmul(gam1, a1pW[:])
            - bmul(gam2, a2pW[:])
        )
        sdY[:] = (
            -rY_v - bmul(gam0, pY_v) - bmul(gam1, a1pY[:])
            - bmul(gam2, a2pY[:])
        )
        sdS[:] = (
            -rS_v - bmul(gam0, pS_v) - bmul(gam1, a1pS[:])
            - bmul(gam2, a2pS[:])
        )

        # ==================================================================
        # phase 3: candidate sweep + metric + M d reductions at (z + d)
        # ==================================================================
        def rp_cand(name, a=None, b_=None):
            return rd(z_trio, name, a, b_) + rd(sd_trio, name, a, b_)

        sweep(rp_cand, ow_trio)
        rtsq, nmrwz, nmrwv = metric_reduce(rp_cand, ow_trio)
        rho_dot, nmdz, nmdv = md_reduce(rp_cand)

        # ==================================================================
        # phase 4: K1/K2/fallback selection + state update (sp.jl:166-222)
        # ==================================================================
        rtsq = jnp.maximum(rtsq, 0.0)
        rt = jnp.sqrt(rtsq)
        r_safe = sc_ref[:, :, _SC_RSAFE : _SC_RSAFE + 1]
        q_pow = sc_ref[:, :, _SC_QPOW : _SC_QPOW + 1]
        k1 = (act3 > 0) & (rn <= r_safe) & (rt <= c1 * rn)
        rho = rtsq - rho_dot  # tau = 1
        k2 = (act3 > 0) & (~k1) & (rho >= sigma_k2 * rn * rt)
        coef = lam_sp * jnp.where(
            rtsq > 0, rho / jnp.where(rtsq > 0, rtsq, 1.0), 0.0
        )
        looping = (act3 > 0) & (~k1) & (~k2)

        k1f = k1.astype(zS.dtype)
        k2f = k2.astype(zS.dtype)

        def commit(zc, dc, wc, sbc, ozc):
            w_v = zc[:] + dc[:]
            zk2 = zc[:] - bmul(coef, w_v - wc[:])
            if lam == 1.0:
                zfb = sbc[:]
            else:
                zfb = lam * sbc[:] + (1.0 - lam) * zc[:]
            sel = bsel(k1, w_v, bsel(k2, zk2, zfb))
            ozc[:] = bsel(act3 > 0, sel, zc[:])

        commit(zW, sdW, owW, sbW, oznW)
        commit(zY, sdY, owY, sbY, oznY)
        commit(zS, sdS, owS, sbS, oznS)
        # s_new: only active lanes advance the secant
        osW[:] = bsel(act3 > 0, oznW[:] - zW[:], spW[:])
        osY[:] = bsel(act3 > 0, oznY[:] - zY[:], spY[:])
        osS[:] = bsel(act3 > 0, oznS[:] - zS[:], spS[:])

        # scalars
        r_safe_new = jnp.where(k1, rt + q_pow, r_safe)
        xi1 = jnp.where(
            k1, nmdz / gamma,
            jnp.where(k2, coef * nmrwz / gamma, lam * nmz_sel / gamma),
        )
        xi2 = jnp.where(
            k1, nmdv / sigma,
            jnp.where(k2, coef * nmrwv / sigma, lam * nmv_sel / sigma),
        )
        oscal[:, :, _OC_K1 : _OC_K1 + 1] = k1f
        oscal[:, :, _OC_K2 : _OC_K2 + 1] = k2f
        oscal[:, :, _OC_LOOP : _OC_LOOP + 1] = looping.astype(zS.dtype)
        oscal[:, :, _OC_RN : _OC_RN + 1] = rn
        oscal[:, :, _OC_RT : _OC_RT + 1] = rt
        oscal[:, :, _OC_RSAFE : _OC_RSAFE + 1] = r_safe_new
        oscal[:, :, _OC_XI1 : _OC_XI1 + 1] = xi1
        oscal[:, :, _OC_XI2 : _OC_XI2 + 1] = xi2
        oscal[:, :, _OC_NMRWZ : _OC_NMRWZ + 1] = nmrwz
        oscal[:, :, _OC_NMRWV : _OC_NMRWV + 1] = nmrwv
        oscal[:, :, _OC_G0 : _OC_G0 + 1] = gam0
        oscal[:, :, _OC_G1 : _OC_G1 + 1] = gam1
        oscal[:, :, _OC_G2 : _OC_G2 + 1] = gam2
        oscal[:, :, _OC_G2 + 1 :] = jnp.zeros(
            (bt, 1, 16 - (_OC_G2 + 1)), zS.dtype
        )

    return kernel


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("meta", "c1", "sigma_k2", "lam", "lam_sp", "interpret"),
)
def sp_step_fused(
    data: ProblemData,
    meta: ProblemMeta,
    z_trio,
    cache_trio,
    r_prev_trio,
    s_prev_trio,
    mr_a1,
    mr_a2,
    mp_a1,
    mp_a2,
    x0,
    scal_pack,  # [B, 9] f32: active, valid1, valid2, cache, r_safe, q_pow,
    #             rnorm_c, nMrz_c, nMrv_c
    gamma,
    sigma,
    c1: float,
    sigma_k2: float,
    lam: float,
    lam_sp: float,
    interpret: bool = False,
):
    """One fused SuperMann iteration (tau = 1 trial).

    Returns (z_new_trio, w_trio, r_trio, s_trio, y_trio, p_trio,
    out_scal [B, 16]) — see the module docstring for what each is.
    """
    pk = pack_meta(meta)
    t = meta.tree
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    B = z_trio[2].shape[0]
    bt = _pick_bt(meta, B)
    grid = (B // bt,)
    dtype = z_trio[2].dtype

    segs = []
    o = 0
    for kind, dim in meta.dual_cone:
        segs.append((kind, o, o + dim))
        o += dim

    kernel = _make_step_kernel(
        meta, pk, tuple(segs), float(c1), float(sigma_k2), float(lam),
        float(lam_sp),
    )

    # index maps under PrefetchScalarGridSpec receive the scalar-prefetch
    # refs as trailing arguments
    def lane(f_dim, n_dim):
        return pl.BlockSpec((bt, f_dim, n_dim), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    trio_spec = [lane(pk.FW, pk.WW), lane(ny, pk.WY), lane(1, pk.WS)]
    trio_shape = [
        jax.ShapeDtypeStruct((B, pk.FW, pk.WW), dtype),
        jax.ShapeDtypeStruct((B, ny, pk.WY), dtype),
        jax.ShapeDtypeStruct((B, 1, pk.WS), dtype),
    ]

    d = t.d
    Kst = jnp.stack([k[0] for k in data.ric.K])
    Rti = jnp.stack([r[0] for r in data.ric.Rtinv])
    ABK = jnp.stack([a[0] for a in data.ric.ABK])
    PB = jnp.stack([p[0] for p in data.ric.PB])
    KstT = Kst.transpose(0, 2, 1)
    sQ, sR, sQN = data.sqrtQ[0], data.sqrtR[0], data.sqrtQN[0]
    BTall = jnp.concatenate([data.B[k].T for k in range(d)], axis=1)
    PBstk = jnp.concatenate([PB[:, k] for k in range(d)], axis=1)
    ABKTall = jnp.concatenate(
        [ABK[:, k].transpose(0, 2, 1) for k in range(d)], axis=2
    )
    ABKstk = jnp.concatenate([ABK[:, k] for k in range(d)], axis=1)
    Bstk = jnp.concatenate([data.B[k] for k in range(d)], axis=0)
    ABKBall = jnp.concatenate(
        [ABKstk, jnp.broadcast_to(Bstk, (ABKstk.shape[0],) + Bstk.shape)],
        axis=2,
    )
    mker = ny + 2 * t.d
    b_arg, ker_arg = pallas_sweep._risk_consts(meta, data)

    # polytope constants ((1, 1) zero dummies when the problem has none —
    # the kernel's nc/ncL statics gate every use)
    nc, ncL = meta.nc_nl, meta.nc_lf
    z11 = jnp.zeros((1, 1), dtype)
    if nc:
        pGx, pGu = data.Gx, data.Gu
        pGxT, pGuT = data.Gx.T, data.Gu.T
        plo, phi = data.p_lo[:, None], data.p_hi[:, None]
    else:
        pGx = pGu = pGxT = pGuT = plo = phi = z11
    if ncL:
        pGxN, pGxNT = data.GxN, data.GxN.T
        ploN, phiN = data.pN_lo[:, None], data.pN_hi[:, None]
    else:
        pGxN = pGxNT = ploN = phiN = z11
    poly_consts = [pGx, pGu, pGxT, pGuT, plo, phi, pGxN, pGxNT, ploN, phiN]

    smem2 = pl.BlockSpec((2,), lambda i, *_: (0,), memory_space=pltpu.SMEM)

    in_specs = (
        [
            smem2,
            const((nx, nx)), const((nu, nu)), const((nx, nx)),
            const((nx, nx)), const((nu, nu)), const((nx, nx)),
            const(b_arg.shape), const(ker_arg.shape),
            const(Kst.shape), const(KstT.shape), const(Rti.shape),
            const(BTall.shape), const(PBstk.shape), const(ABKTall.shape),
            const(ABKBall.shape),
            const((nx, 1)), const((nx, 1)), const((nu, 1)), const((nu, 1)),
        ]
        + [const(a.shape) for a in poly_consts]
        + [
            lane(nx, 1),  # x0
            lane(1, 16),  # scalar pack
        ]
        + trio_spec * 8
    )
    out_specs = trio_spec * 6 + [lane(1, 16)]
    out_shape = trio_shape * 6 + [jax.ShapeDtypeStruct((B, 1, 16), dtype)]
    scratch = [
        pltpu.VMEM((bt, pk.FW, pk.WW), dtype),  # sbW
        pltpu.VMEM((bt, ny, pk.WY), dtype),  # sbY
        pltpu.VMEM((bt, 1, pk.WS), dtype),  # sbS
        pltpu.VMEM((bt, pk.FW, pk.WW), dtype),  # sdW
        pltpu.VMEM((bt, ny, pk.WY), dtype),  # sdY
        pltpu.VMEM((bt, 1, pk.WS), dtype),  # sdS
        pltpu.VMEM((bt, 1, 16), dtype),  # sscal
        pltpu.VMEM((bt, nx, n), dtype),  # gx
        pltpu.VMEM((bt, nu, n_nl), dtype),  # gu
        pltpu.VMEM((bt, nx, n), dtype),  # gq
        pltpu.VMEM((bt, max(nu, 1), max(n_nl, n_lf)), dtype),  # gs
        pltpu.VMEM((bt, mker, n_nl), dtype),  # gk
        pltpu.VMEM((bt, mker, n_nl), dtype),  # gk2
        pltpu.VMEM((bt, 1, n), dtype),  # gss
        pltpu.VMEM((bt, 1, n_nr), dtype),  # gtt
        pltpu.VMEM((bt, nx, n_nr), dtype),  # gqx
        pltpu.VMEM((bt, max(nu, 1), n_nr), dtype),  # gru
        pltpu.VMEM(
            (bt, max(t.d * nx, nx + nu), max(n_lf // t.d, 1)), dtype
        ),  # gst
        pltpu.VMEM((bt, t.d * nx, max(n_lf // t.d, 1)), dtype),  # gst2
        pltpu.VMEM((bt, nx, n), dtype),  # gmx
        pltpu.VMEM((bt, nu, n_nl), dtype),  # gmu
        pltpu.VMEM((bt, 1, max(pk.WW, pk.WY, pk.WS)), dtype),  # gbc
    ]

    sc16 = jnp.concatenate(
        [scal_pack, jnp.zeros((B, 16 - scal_pack.shape[-1]), dtype)], axis=-1
    )[:, None, :]
    # per-tile "every lane cached" flag — controls the fresh-sweep skip
    tile_all_cached = jnp.min(
        scal_pack[:, 3].astype(jnp.int32).reshape(B // bt, bt), axis=1
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        tile_all_cached,
        jnp.stack([jnp.asarray(gamma, dtype), jnp.asarray(sigma, dtype)]),
        sQ, sR, sQN, sQ.T, sR.T, sQN.T,
        b_arg, ker_arg,
        Kst, KstT, Rti, BTall, PBstk, ABKTall, ABKBall,
        data.x_min[:, None], data.x_max[:, None],
        data.u_min[:, None], data.u_max[:, None],
        *poly_consts,
        x0[:, :, None],
        sc16,
        *z_trio, *cache_trio, *r_prev_trio, *s_prev_trio,
        *mr_a1, *mr_a2, *mp_a1, *mp_a2,
    )
    z_new = tuple(outs[0:3])
    w = tuple(outs[3:6])
    r = tuple(outs[6:9])
    s = tuple(outs[9:12])
    y = tuple(outs[12:15])
    p = tuple(outs[15:18])
    out_scal = outs[18][:, 0, :]
    return z_new, w, r, s, y, p, out_scal


# ---------------------------------------------------------------------------
# layout helpers (lane-tiled flavor): per-lane scalars against [B, f, W]
# trio class arrays.  Counterparts of the lane-packed module's helpers so
# host code (algorithms/supermann.py) stays layout-agnostic.
# ---------------------------------------------------------------------------


def lane_rows(s, arr):
    """Per-lane scalar s [B] broadcastable against a trio class array."""
    return s[:, None, None]


def lane_mask(mask, arr):
    """Per-lane bool mask [B] broadcastable against a trio class array."""
    return mask[:, None, None]
