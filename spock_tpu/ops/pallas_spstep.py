"""Fused whole-iteration SuperMann step: ONE Pallas kernel per iteration,
in a LANE-PACKED layout (round 5).

Round-4 profiling (CLAUDE.md): the fused-step iteration was SMALL-OP bound —
every per-stage matmul ran as ``bt`` separate per-lane 2D dots (the ``_mm``
unroll) and the early tree stages have tiny widths (m = 1..64), so each grid
step issued thousands of latency-bound micro-ops (~6x over the kernel's HBM
bound).  This rewrite packs the lane axis INTO the node axis everywhere:

  column  c = node * bt + lane

so a [rows, w] per-lane segment becomes one [rows, w * bt] block shared by
the whole lane tile, and every per-stage matmul is ONE ``[a, b] x
[b, m * bt]`` MXU dot — bt x fewer dot issues and >= 128-wide lanes from
stage ~ log_d(128/bt) instead of ~ log_d(128).  Tree structure survives
packing verbatim: stage slices stay contiguous (``off[st]*bt :
(off[st]+m)*bt``) and sibling-major child blocks stay contiguous, so all the
regrouping copies are the same blockwise VMEM transfers as before, just
bt x wider.

Data layout: the (Primal, Dual) pair is packed into three class arrays held
in HBM *in packed form across iterations* (no per-iteration relayout):

  W [G, FW, WW*bt]: zx | zu | vqx | vru | vcx | vcu | vqNx | vcxN (| vpnl
                    | vplf)  with FW = max(nx, nu, nc, ncL), G = B / bt
  Y [G, ny, WY*bt]: zy | vy
  S [G, 8,  n*bt]:  one SEGMENT PER SUBLANE ROW (zs, ztau, vsby, vt5, vt6,
                    vs12, vs13, unused) — the round-4 layout stored the 7
                    scalar rows side by side in one [1, WS] row that tiling
                    padded to 8 sublanes (8x VMEM/DMA waste, the measured
                    B=1024 lane-wall driver); row-packing makes the S class
                    5.5x smaller at the headline config.

Per-lane scalars/reductions under packing: per-lane inner products and
inf-norms accumulate ELEMENTWISE into shared accumulator rows (lane
congruence c = lane mod bt is preserved by prefix-aligned adds/maxes), and
ONE log2-halving pass folds each row to its [1, bt] per-lane totals —
replacing per-block per-lane reductions with O(log W) whole-row ops.
Per-lane scalar -> class-array broadcasts ride one [1, bt] x [bt, WW*bt]
MXU dot against a tiled-identity constant (Mosaic has no strided lane
broadcast).

Everything else (3-phase Anderson history slots, per-lane sweep-cache skip,
K1/K2/fallback semantics) is unchanged from the round-2..4 design.  Set
``SPOCK_LANE_PACK=0`` to fall back to the round-4 lane-tiled kernel
(ops/pallas_spstep_lt).

Cites: candidate/K1/K2 semantics per /root/reference/src/model_algorithms/
sp.jl:118-222; Anderson per qnewton_directions/anderson.jl; the CP sweep
blocks per model_dynamics/implicit_l.jl:177-951 (the per-stage loops fused
here are implicit_l.jl:214-272,584-637).
"""

from __future__ import annotations

import dataclasses
import functools
import os

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
# S-class: one segment per sublane row, row width = n (the widest, zs)
_S_SEGS = ("zs", "ztau", "vsby", "vt5", "vt6", "vs12", "vs13")
_S_ROWS = 8


@dataclasses.dataclass(frozen=True)
class PackMeta:
    FW: int
    WW: int
    WY: int
    WS: int  # S-class ROW width in nodes (= n)
    w_segs: tuple  # W-class segment names in layout order (incl. polytopes)
    seg: dict  # name -> (class_idx, rows, row, lo, hi)

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
            seg[name] = (cls, rows, 0, o, o + w)
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
    s_widths = [n, n_nr, n_nl, n_nr, n_nr, n_lf, n_lf]
    for r, (name, w) in enumerate(zip(_S_SEGS, s_widths)):
        seg[name] = (_S, 1, r, 0, w)
    return PackMeta(
        FW=FW, WW=WW, WY=WY, WS=n,
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


def _lanepack(a, bt):
    """[B, f, W] -> [B/bt, f, W*bt] with column = node*bt + lane.

    The result is layout-barriered: without it, XLA layout assignment
    propagates the transpose through to the surrounding program and picks a
    {0,2,1} PHYSICAL layout for the packed trios — which (a) pads the f ~ 20
    dim onto 128 lanes (6.4x HBM inflation) and (b) inserts layout-
    conversion copies around every pallas call in the farm loop (measured:
    +7 ms/iteration, the round-5 farm regression)."""
    B, f, W = a.shape
    out = (
        a.reshape(B // bt, bt, f, W)
        .transpose(0, 2, 3, 1)
        .reshape(B // bt, f, W * bt)
    )
    return jax.lax.optimization_barrier(out)


def _laneunpack(a, bt):
    """Inverse of :func:`_lanepack` (input layout-barriered, see there)."""
    G, f, Wbt = a.shape
    W = Wbt // bt
    a = jax.lax.optimization_barrier(a)
    return (
        a.reshape(G, f, W, bt).transpose(0, 3, 1, 2).reshape(G * bt, f, W)
    )


def pack_pair(meta: ProblemMeta, z: Primal, v: Dual):
    """(Primal, Dual) -> (W, Y, S) lane-packed class arrays (pads zeroed)."""
    pk = pack_meta(meta)
    lv = _pair_leaves(z, v)
    B = z.s.shape[0]
    bt = _pick_bt(meta, B)
    dtype = z.s.dtype

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

    srows = []
    for nm in _S_SEGS:
        a = lv[nm]  # [B, 1, w]
        srows.append(
            jnp.pad(a, ((0, 0), (0, 0), (0, pk.WS - a.shape[-1])))
        )
    srows.append(jnp.zeros((B, 1, pk.WS), dtype))
    return (
        _lanepack(cat(pk.w_segs, pk.FW), bt),
        _lanepack(cat(_Y_SEGS, meta.ny), bt),
        _lanepack(jnp.concatenate(srows, axis=1), bt),
    )


def trio_bt(meta: ProblemMeta, trio) -> int:
    """Lane-tile size a packed trio was built with (from its S-class shape)."""
    return trio[_S].shape[-1] // pack_meta(meta).WS


def unpack_pair(meta: ProblemMeta, trio):
    pk = pack_meta(meta)
    bt = trio_bt(meta, trio)
    W, Y, S = (_laneunpack(a, bt) for a in trio)

    def get(name):
        cls, rows, row, lo, hi = pk.seg[name]
        arr = (W, Y, S)[cls]
        if cls == _S:
            return arr[..., row : row + 1, lo:hi]
        return arr[..., :rows, lo:hi]

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
    bt = trio_bt(meta, trio)
    _, rows, _, lo, _ = pk.seg["zu"]
    blk = trio[_W][:, :rows, lo * bt : (lo + 1) * bt]  # [G, nu, bt]
    # barrier: keep the carry's {2,1,0} layout from chasing this transpose
    blk = jax.lax.optimization_barrier(blk)
    G = blk.shape[0]
    return blk.transpose(0, 2, 1).reshape(G * bt, rows)


def zero_trio(meta: ProblemMeta, B: int, dtype):
    pk = pack_meta(meta)
    bt = _pick_bt(meta, B)
    G = B // bt
    return (
        jnp.zeros((G, pk.FW, pk.WW * bt), dtype),
        jnp.zeros((G, meta.ny, pk.WY * bt), dtype),
        jnp.zeros((G, _S_ROWS, pk.WS * bt), dtype),
    )


def lane_rows(s, arr):
    """Per-lane scalar s [B] as a [G, 1, W*bt] row broadcastable against a
    packed class array ``arr`` (host-side XLA; the in-kernel equivalent is
    the tiled-identity matmul)."""
    G, _, Wbt = arr.shape
    bt = s.shape[0] // G
    W = Wbt // bt
    return jax.lax.optimization_barrier(
        jnp.broadcast_to(s.reshape(G, 1, 1, bt), (G, 1, W, bt))
        .reshape(G, 1, Wbt)
    )


def lane_mask(mask, arr):
    """Per-lane bool mask [B] broadcastable against a packed class array."""
    return lane_rows(mask, arr)


# ---------------------------------------------------------------------------
# sizing / support
# ---------------------------------------------------------------------------


def _trio_bytes(meta: ProblemMeta, bt: int) -> int:
    """Bytes of one packed pair (VMEM (8,128)-tile padded) for a bt-tile."""
    pk = pack_meta(meta)
    pad = pallas_sweep._padded
    return 4 * (
        pad(pk.FW, pk.WW * bt)
        + pad(meta.ny, pk.WY * bt)
        + pad(_S_ROWS, pk.WS * bt)
    )


def _trio_padded(meta: ProblemMeta) -> int:
    """Padded floats of one packed pair PER LANE (bt=8 tiling) — feeds the
    per-lane HBM-carry accounting in examples/pod_scale.py."""
    return _trio_bytes(meta, 8) // 4 // 8


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _step_vmem_bytes(meta: ProblemMeta, bt: int) -> int:
    it = _trio_bytes(meta, bt)
    pad = pallas_sweep._padded
    t = meta.tree
    nx, nu = meta.nx, meta.nu
    pk = pack_meta(meta)
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    mker = meta.ny + 2 * t.d
    child_w = max(n_lf // t.d, 1) * bt
    wacc = _next_pow2(pk.WW * bt)
    # I/O: 8 trios in (z, cache, r_prev, s_prev, 4 history rows), 6 out
    # (+ x0/scalar packs); double-buffered by the Mosaic pipeline
    io = 14 * it + 4 * (pad(nx, bt) + 2 * pad(1, 16 * bt))
    scratch = 2 * it + 4 * sum(
        pad(f, w)
        for f, w in [
            (nx, n * bt), (nu, n_nl * bt), (nx, n * bt),
            (max(nu, 1), max(n_nl, n_lf) * bt),
            (mker, n_nl * bt), (mker, n_nl * bt), (2, n * bt),
            (nx, n_nr * bt), (max(nu, 1), n_nr * bt),
            (max(t.d * nx, nx + nu), child_w), (t.d * nx, child_w),
            (nx, n * bt), (nu, n_nl * bt),  # gmx, gmu
            (16, wacc), (8, wacc), (8, pk.WW * bt),  # sacc, macc, srep
            (bt, pk.WW * bt),  # tiled-identity broadcast constant
        ]
    )
    return 2 * io + scratch


_STEP_VMEM_BUDGET = 96 * 1024 * 1024


def _budget() -> int:
    mb = os.environ.get("SPOCK_STEP_VMEM_MB")
    return int(mb) * 1024 * 1024 if mb else _STEP_VMEM_BUDGET


def _pick_bt(meta: ProblemMeta, B: int) -> int:
    for cand in (8, 4, 2, 1):
        if B % cand == 0 and _step_vmem_bytes(meta, cand) <= _budget():
            return cand
    return 1


def enabled() -> bool:
    env = os.environ.get("SPOCK_FUSED_STEP")
    if env == "1":
        return True
    if env == "0":
        return False
    return pallas_sweep.enabled()


def supported(meta: ProblemMeta, data: ProblemData) -> bool:
    """Same problem class as the sweep megakernel (incl. two-sided polytope
    rows and per-node risk data), plus VMEM fit."""
    if not pallas_sweep.supported(meta, data):
        return False
    # the whole-iteration kernel keeps the uniform-cost single-dot fast
    # path; per-node cost slabs (r5) ride the sweep megakernels instead
    for arr in (data.sqrtQ, data.sqrtR, data.sqrtQN):
        if arr.shape[0] != 1:
            return False
    return _step_vmem_bytes(meta, 1) <= _budget()


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

# scalar-pack input slots (packed [1, 16*bt], col = slot*bt + lane)
_SC_ACTIVE, _SC_VALID1, _SC_VALID2, _SC_CACHE = 0, 1, 2, 3
_SC_RSAFE, _SC_QPOW, _SC_RNC, _SC_NMZC, _SC_NMVC = 4, 5, 6, 7, 8
_SC_TAU = 9  # per-lane candidate step size (1.0 on the peeled trial;
#              beta^k on backtracking retrials — sp.jl:371)

# host-visible capability flag: the packed kernel evaluates candidates at
# per-lane tau, so SuperMann backtracking re-invokes THIS kernel on packed
# trios (no unpack/pack/cond in the device loop)
KERNEL_TAU = True
# scalar-pack output slots
_OC_K1, _OC_K2, _OC_LOOP, _OC_RN, _OC_RT, _OC_RSAFE = 0, 1, 2, 3, 4, 5
_OC_XI1, _OC_XI2, _OC_NMRWZ, _OC_NMRWV = 6, 7, 8, 9
_OC_G0, _OC_G1, _OC_G2 = 10, 11, 12

# sum-accumulator rows (sacc [16, WACC])
_R_G00, _R_G01, _R_G02, _R_G11, _R_G12, _R_G22 = 0, 1, 2, 3, 4, 5
_R_C0, _R_C1, _R_C2, _R_RNF = 6, 7, 8, 9
_R_RT, _R_RHO = 10, 11
# max-accumulator rows (macc [8, WACC])
_M_NMZ, _M_NMV, _M_NMRWZ, _M_NMRWV, _M_NMDZ, _M_NMDV = 0, 1, 2, 3, 4, 5
# broadcast-replica rows (srep [8, WW*bt])
_P_HP, _P_V2, _P_ACT, _P_CACHE = 0, 1, 2, 3
_P_G0, _P_G1, _P_G2, _P_TAU = 4, 5, 6, 7
_P_K1, _P_K2, _P_COEF = 0, 1, 3  # phase-4 reuse (phase-2 consumers done)


def _make_step_kernel(meta, pk: PackMeta, bt, cone_segments, c1, sigma_k2,
                      lam, lam_sp):
    # phase-bisection knob for on-chip profiling ONLY (breaks semantics):
    # comma list of {metric,md,gram,repl,sweep2} to skip
    _skip = set(
        s for s in os.environ.get("SPOCK_PROF_SKIP", "").split(",") if s
    )
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
    WWb, WYb, WSb = pk.WW * bt, pk.WY * bt, pk.WS * bt
    WACC = _next_pow2(WWb)
    _soc = pallas_sweep._soc_pieces

    def _dot(M, X):
        return jnp.dot(
            M, X, preferred_element_type=X.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    def kernel(
        flags_ref,  # [n_tiles] int32 scalar-prefetch: tile-all-cached flag
        scal_ref,  # [2] SMEM (gamma, sigma)
        sqrtQ_ref, sqrtR_ref, sqrtQN_ref, sqrtQT_ref, sqrtRT_ref,
        sqrtQNT_ref, b_ref, ker_ref, tile_ref,
        Kst_ref, KstT_ref, Rti_ref, BTall_ref, PBstk_ref, ABKTall_ref,
        ABKBall_ref,
        xmin_ref, xmax_ref, umin_ref, umax_ref,
        # polytope constants ((1, 1) zero dummies when nc/ncL == 0)
        pGx_ref, pGu_ref, pGxT_ref, pGuT_ref, plo_ref, phi_ref,
        pGxN_ref, pGxNT_ref, ploN_ref, phiN_ref,
        x0_ref,  # [1, nx, bt]
        sc_ref,  # [1, 1, 16*bt]
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
        oscal,  # [1, 1, 16*bt]
        # scratch (2D except the class-shaped trios, which mirror the blocks)
        sbW, sbY, sbS,  # fresh sweep dest -> selected zbar/vbar [1, f, W*bt]
        sdW, sdY, sdS,  # direction d
        gx, gu, gq, gs, gk, gk2, gsst, gqx, gru, gst, gst2,
        gmx, gmu,  # metric primal accumulators
        sacc,  # [16, WACC] per-lane sum accumulators
        macc,  # [8, WACC] per-lane max accumulators
        srep,  # [8, WW*bt] lane-replicated per-lane scalar rows
    ):
        gamma = scal_ref[0]
        sigma = scal_ref[1]
        dtp = zS.dtype
        sqrtQ = sqrtQ_ref[:]
        sqrtR = sqrtR_ref[:]
        sqrtQN = sqrtQN_ref[:]
        bmat = b_ref[:]  # [ny, 1] uniform | [ny, n_nl*bt] per-node

        z_trio = (zW, zY, zS)
        sb_trio = (sbW, sbY, sbS)
        sd_trio = (sdW, sdY, sdS)
        ow_trio = (owW, owY, owS)
        cls_w = (WWb, WYb, WSb)

        # ---- per-lane scalar plumbing -----------------------------------
        def sc(slot):
            """Scalar-pack slot as a [1, bt] per-lane vector."""
            return sc_ref[0, 0:1, slot * bt : (slot + 1) * bt]

        def repl(row, s_vec):
            """Replicate a [1, bt] per-lane vector across lanes into srep
            row ``row`` (one MXU dot against the tiled identity)."""
            if "repl" in _skip:
                return
            srep[row : row + 1, :] = _dot(s_vec, tile_ref[:])

        def rrow(row, w):
            return srep[row : row + 1, :w]

        def bmul(row, a):
            return rrow(row, a.shape[-1]) * a

        def bsel(row, a, b):
            return jnp.where(rrow(row, a.shape[-1]) > 0, a, b)

        # ---- per-lane reduction plumbing --------------------------------
        def sadd(row, prod):
            """Accumulate a per-lane sum contribution (elementwise; the
            lane attribution c = lane mod bt survives prefix adds)."""
            w = prod.shape[-1]
            sacc[row : row + 1, :w] = sacc[row : row + 1, :w] + jnp.sum(
                prod, axis=0, keepdims=True
            )

        def mmax(row, x):
            w = x.shape[-1]
            macc[row : row + 1, :w] = jnp.maximum(
                macc[row : row + 1, :w],
                jnp.max(jnp.abs(x), axis=0, keepdims=True),
            )

        def finish_sum():
            w = WACC
            while w > bt:
                h = w // 2
                sacc[:, :h] = sacc[:, :h] + sacc[:, h:w]
                w = h

        def finish_max():
            w = WACC
            while w > bt:
                h = w // 2
                macc[:, :h] = jnp.maximum(macc[:, :h], macc[:, h:w])
                w = h

        def ssum(row):
            return sacc[row : row + 1, 0:bt]

        def smax(row):
            return macc[row : row + 1, 0:bt]

        # ---- packed segment access --------------------------------------
        def rd(trio, name, a=None, b_=None):
            cls, rows, row, lo, hi = seg[name]
            if a is not None:
                lo, hi = lo + a, lo + b_
            if cls == _S:
                return trio[_S][0, row : row + 1, lo * bt : hi * bt]
            return trio[cls][0, :rows, lo * bt : hi * bt]

        def wr(trio, name, val, a=None, b_=None):
            cls, rows, row, lo, hi = seg[name]
            if a is not None:
                lo, hi = lo + a, lo + b_
            if cls == _S:
                trio[_S][0, row : row + 1, lo * bt : hi * bt] = val
            else:
                trio[cls][0, :rows, lo * bt : hi * bt] = val

        def zero_pads(trio):
            # keep pad rows/tails of written segments exactly zero so
            # whole-class reductions/arithmetic stay exact
            for name in pk.w_segs:
                cls, rows, _, lo, hi = seg[name]
                if rows < FW:
                    trio[_W][0, rows:FW, lo * bt : hi * bt] = jnp.zeros(
                        (FW - rows, (hi - lo) * bt), dtp
                    )
            for name in _S_SEGS:
                _, _, row, lo, hi = seg[name]
                if hi < pk.WS:
                    trio[_S][0, row : row + 1, hi * bt :] = jnp.zeros(
                        (1, (pk.WS - hi) * bt), dtp
                    )
            trio[_S][0, _S_ROWS - 1 :, :] = jnp.zeros((1, WSb), dtp)

        # ------------------------------------------------------------------
        # CP sweep at an evaluation point, writing (zbar, vbar) into dst.
        # rp(name, a, b) reads the point's pair segments.  All per-stage
        # matmuls are single [a, b] x [b, m*bt] MXU dots.
        # ------------------------------------------------------------------
        def sweep(rp, dst):
            # ---- z1 = z - gamma L'(v) into gx/gu/gsst rows/y1 ----
            gx[:, : n_nl * bt] = (
                rp("vcx") + _dot(pGxT_ref[:], rp("vpnl")) if nc else rp("vcx")
            )
            gx_lf = rp("vcxN") + _dot(sqrtQNT_ref[:], rp("vqNx"))
            if ncL:
                gx_lf = gx_lf + _dot(pGxNT_ref[:], rp("vplf"))
            gx[:, ls * bt :] = gx_lf
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1] * bt
                gq[:, 0 : d * m * bt] = _dot(
                    sqrtQT_ref[:], rp("vqx", lo, lo + d * m)
                )
                acc = gq[:, 0 : m * bt]
                for k in range(1, d):
                    acc = acc + gq[:, k * m * bt : (k + 1) * m * bt]
                gx[:, po : po + m * bt] = gx[:, po : po + m * bt] + acc
            gu[:] = (
                rp("vcu") + _dot(pGuT_ref[:], rp("vpnl")) if nc else rp("vcu")
            )
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1] * bt
                gs[:, 0 : d * m * bt] = _dot(
                    sqrtRT_ref[:], rp("vru", lo, lo + d * m)
                )
                acc = gs[:, 0 : m * bt]
                for k in range(1, d):
                    acc = acc + gs[:, k * m * bt : (k + 1) * m * bt]
                gu[:, po : po + m * bt] = gu[:, po : po + m * bt] + acc
            gx[:] = rp("zx") - gamma * gx[:]
            gu[:] = rp("zu") - gamma * gu[:]
            vsby_v = rp("vsby")
            vt5_v = rp("vt5")
            vt6_v = rp("vt6")
            ztau_v = rp("ztau")
            gsst[0:1, 0 : n_nl * bt] = rp("zs", 0, n_nl) - gamma * vsby_v
            gsst[0:1, ls * bt :] = rp("zs", ls, n) - gamma * 0.5 * (
                rp("vs12") + rp("vs13")
            )
            gsst[1:2, 0 : n_nr * bt] = ztau_v - gamma * 0.5 * (vt5_v + vt6_v)
            y1 = rp("zy") - gamma * (rp("vy") - bmat * vsby_v)

            # ---- prox_f: S1 Riccati backward ----
            gq[:, ls * bt :] = -gx[:, ls * bt :]
            for st in range(N - 2, -1, -1):
                m = msz[st]
                mb = m * bt
                po = off[st] * bt
                u_st = gu[:, po : po + mb]
                for k in range(d):
                    gst[k * nx : (k + 1) * nx, 0:mb] = gq[
                        :, (off[st + 1] + k * m) * bt
                        : (off[st + 1] + (k + 1) * m) * bt
                    ]
                qstk = gst[0 : d * nx, 0:mb]
                sum_d = _dot(BTall_ref[:], qstk)
                dvv = _dot(Rti_ref[st], u_st - sum_d)
                gs[:, po : po + mb] = dvv
                innerstk = _dot(PBstk_ref[st], dvv) + qstk
                qi = _dot(ABKTall_ref[st], innerstk) + _dot(
                    KstT_ref[st], dvv - u_st
                )
                gq[:, po : po + mb] = qi - gx[:, po : po + mb]
            # ---- S1 forward ----
            gx[:, 0:bt] = x0_ref[0]
            for st in range(N - 1):
                m = msz[st]
                mb = m * bt
                po = off[st] * bt
                x_st = gx[:, po : po + mb]
                dvv = gs[:, po : po + mb]
                gu[:, po : po + mb] = _dot(Kst_ref[st], x_st) + dvv
                gst[0:nx, 0:mb] = x_st
                gst[nx : nx + nu, 0:mb] = dvv
                gst2[:, 0:mb] = _dot(ABKBall_ref[st], gst[0 : nx + nu, 0:mb])
                for k in range(d):
                    gx[
                        :, (off[st + 1] + k * m) * bt
                        : (off[st + 1] + (k + 1) * m) * bt
                    ] = gst2[k * nx : (k + 1) * nx, 0:mb]
            # ---- S2 kernel projection ----
            gk[0:ny, :] = y1
            coff = 0
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                for k in range(d):
                    gk[ny + k : ny + k + 1, coff * bt : (coff + m) * bt] = (
                        gsst[0:1, (off[st] + k * m) * bt
                             : (off[st] + (k + 1) * m) * bt]
                    )
                    gk[
                        ny + d + k : ny + d + k + 1,
                        coff * bt : (coff + m) * bt,
                    ] = gsst[1:2, (lo + k * m) * bt : (lo + (k + 1) * m) * bt]
                coff += m
            kerm = ker_ref[:]
            mk_ = ny + 2 * d
            if kerm.shape == (mk_, mk_):
                gk2[:] = _dot(kerm, gk[:])
            else:
                # per-node projectors (lane-repeated [mker^2, n_nl*bt]):
                # static multiply-add contraction over [1, n_nl*bt] rows
                for i_ in range(mk_):
                    acc_ = kerm[i_ * mk_ : i_ * mk_ + 1, :] * gk[0:1, :]
                    for j_ in range(1, mk_):
                        acc_ = acc_ + (
                            kerm[i_ * mk_ + j_ : i_ * mk_ + j_ + 1, :]
                            * gk[j_ : j_ + 1, :]
                        )
                    gk2[i_ : i_ + 1, :] = acc_
            y_p = gk2[0:ny, :]
            wr(dst, "zs", gsst[0:1, 0:bt] - gamma, 0, 1)
            coff = 0
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                for k in range(d):
                    wr(
                        dst, "zs",
                        gk2[ny + k : ny + k + 1,
                            coff * bt : (coff + m) * bt],
                        off[st] + k * m, off[st] + (k + 1) * m,
                    )
                    wr(
                        dst, "ztau",
                        gk2[ny + d + k : ny + d + k + 1,
                            coff * bt : (coff + m) * bt],
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
            rid = jax.lax.broadcasted_iota(jnp.int32, wy.shape, dimension=0)
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
            bty = jnp.sum(bmat * ry, axis=0, keepdims=True)
            wsby = vsby_v * inv + (rs_nl - bty)
            wr(dst, "vsby", sigma * (wsby - jnp.maximum(wsby, 0.0)))
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1] * bt
                xp = 2.0 * gx[:, po : po + m * bt] - rp(
                    "zx", off[st - 1], off[st - 1] + m
                )
                up = 2.0 * gu[:, po : po + m * bt] - rp(
                    "zu", off[st - 1], off[st - 1] + m
                )
                qxp = _dot(sqrtQ, xp)
                rup = _dot(sqrtR, up)
                for k in range(d):
                    gqx[:, (lo + k * m) * bt : (lo + (k + 1) * m) * bt] = qxp
                    gru[:, (lo + k * m) * bt : (lo + (k + 1) * m) * bt] = rup
            wqx = rp("vqx") * inv + gqx[:]
            wru = rp("vru") * inv + gru[:]
            wt5 = vt5_v * inv + 0.5 * rtau - 0.5
            wt6 = vt6_v * inv + 0.5 * rtau + 0.5
            xn_sq = (
                jnp.sum(wqx * wqx, axis=0, keepdims=True)
                + jnp.sum(wru * wru, axis=0, keepdims=True)
                + wt5 * wt5
            )
            t_out, x_scale = _soc(wt6, xn_sq)
            wr(dst, "vt6", sigma * (wt6 - t_out))
            wr(dst, "vqx", sigma * (wqx - x_scale * wqx))
            wr(dst, "vru", sigma * (wru - x_scale * wru))
            wr(dst, "vt5", sigma * (wt5 - x_scale * wt5))
            rx_lf = 2.0 * gx[:, ls * bt :] - rp("zx", ls, n)
            wqNx = rp("vqNx") * inv + _dot(sqrtQN, rx_lf)
            ws12 = rp("vs12") * inv + 0.5 * rs_lf - 0.5
            ws13 = rp("vs13") * inv + 0.5 * rs_lf + 0.5
            xn_sq_l = (
                jnp.sum(wqNx * wqNx, axis=0, keepdims=True) + ws12 * ws12
            )
            tl_out, xl_scale = _soc(ws13, xn_sq_l)
            wr(dst, "vs13", sigma * (ws13 - tl_out))
            wr(dst, "vqNx", sigma * (wqNx - xl_scale * wqNx))
            wr(dst, "vs12", sigma * (ws12 - xl_scale * ws12))
            xmin = xmin_ref[:]
            xmax = xmax_ref[:]
            umin = umin_ref[:]
            umax = umax_ref[:]
            rx_nl = 2.0 * gx[:, : n_nl * bt] - rp("zx", 0, n_nl)
            wcx = rp("vcx") * inv + rx_nl
            wr(dst, "vcx", sigma * (wcx - jnp.clip(wcx, xmin, xmax)))
            wcu = rp("vcu") * inv + ru_
            wr(dst, "vcu", sigma * (wcu - jnp.clip(wcu, umin, umax)))
            wcxN = rp("vcxN") * inv + rx_lf
            wr(dst, "vcxN", sigma * (wcxN - jnp.clip(wcxN, xmin, xmax)))
            if nc:
                wpnl = rp("vpnl") * inv + _dot(pGx_ref[:], rx_nl) + _dot(
                    pGu_ref[:], ru_
                )
                plo = plo_ref[:]
                phi = phi_ref[:]
                wr(dst, "vpnl", sigma * (wpnl - jnp.clip(wpnl, plo, phi)))
            if ncL:
                wplf = rp("vplf") * inv + _dot(pGxN_ref[:], rx_lf)
                ploN = ploN_ref[:]
                phiN = phiN_ref[:]
                wr(dst, "vplf", sigma * (wplf - jnp.clip(wplf, ploN, phiN)))
            zero_pads(dst)

        # ------------------------------------------------------------------
        # metric accumulation at an evaluation point with sweep results in
        # dst: r = point - dst; accumulates <r, M r> into sacc[sum_row] and
        # the inf-norms of M r's halves into macc[mz_row]/macc[mv_row].
        # ------------------------------------------------------------------
        def metric_accum(rp, dst, sum_row, mz_row, mv_row):
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
            sadd(sum_row, ruy * mvy)
            mmax(mv_row, mvy)
            bty_rw = jnp.sum(bmat * rwy, axis=0, keepdims=True)
            mvsby = rusby - sigma * (res("zs", 0, n_nl) - bty_rw)
            sadd(sum_row, rusby * mvsby)
            mmax(mv_row, mvsby)
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1]
                qxp = _dot(sqrtQ, res("zx", po, po + m))
                rup = _dot(sqrtR, res("zu", po, po + m))
                for k in range(d):
                    a0, b0 = lo + k * m, lo + (k + 1) * m
                    mvqx = res("vqx", a0, b0) - sigma * qxp
                    mvru = res("vru", a0, b0) - sigma * rup
                    sadd(sum_row, res("vqx", a0, b0) * mvqx)
                    sadd(sum_row, res("vru", a0, b0) * mvru)
                    mmax(mv_row, mvqx)
                    mmax(mv_row, mvru)
            mvt5 = rut5 - sigma * 0.5 * rwtau
            mvt6 = rut6 - sigma * 0.5 * rwtau
            sadd(sum_row, rut5 * mvt5)
            sadd(sum_row, rut6 * mvt6)
            mmax(mv_row, mvt5)
            mmax(mv_row, mvt6)
            mvcx = res("vcx") - sigma * res("zx", 0, n_nl)
            mvcu = res("vcu") - sigma * res("zu")
            sadd(sum_row, res("vcx") * mvcx)
            sadd(sum_row, res("vcu") * mvcu)
            mmax(mv_row, mvcx)
            mmax(mv_row, mvcu)
            mvqNx = res("vqNx") - sigma * _dot(sqrtQN, res("zx", ls, n))
            mvs12 = rus12 - sigma * 0.5 * res("zs", ls, n)
            mvs13 = rus13 - sigma * 0.5 * res("zs", ls, n)
            mvcxN = res("vcxN") - sigma * res("zx", ls, n)
            sadd(sum_row, res("vqNx") * mvqNx)
            sadd(sum_row, rus12 * mvs12)
            sadd(sum_row, rus13 * mvs13)
            sadd(sum_row, res("vcxN") * mvcxN)
            mmax(mv_row, mvqNx)
            mmax(mv_row, mvs12)
            mmax(mv_row, mvs13)
            mmax(mv_row, mvcxN)
            if nc:
                mvpnl = res("vpnl") - sigma * (
                    _dot(pGx_ref[:], res("zx", 0, n_nl))
                    + _dot(pGu_ref[:], res("zu"))
                )
                sadd(sum_row, res("vpnl") * mvpnl)
                mmax(mv_row, mvpnl)
            if ncL:
                mvplf = res("vplf") - sigma * _dot(
                    pGxN_ref[:], res("zx", ls, n)
                )
                sadd(sum_row, res("vplf") * mvplf)
                mmax(mv_row, mvplf)

            # primal part: rw - gamma L' ru (accumulate L'ru in gmx/gmu)
            gmx[:, : n_nl * bt] = (
                res("vcx") + _dot(pGxT_ref[:], res("vpnl"))
                if nc else res("vcx")
            )
            gmx_lf = res("vcxN") + _dot(sqrtQNT_ref[:], res("vqNx"))
            if ncL:
                gmx_lf = gmx_lf + _dot(pGxNT_ref[:], res("vplf"))
            gmx[:, ls * bt :] = gmx_lf
            gmu[:] = (
                res("vcu") + _dot(pGuT_ref[:], res("vpnl"))
                if nc else res("vcu")
            )
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1] * bt
                gq[:, 0 : d * m * bt] = _dot(
                    sqrtQT_ref[:], res("vqx", lo, lo + d * m)
                )
                acc = gq[:, 0 : m * bt]
                for k in range(1, d):
                    acc = acc + gq[:, k * m * bt : (k + 1) * m * bt]
                gmx[:, po : po + m * bt] = gmx[:, po : po + m * bt] + acc
                gs[:, 0 : d * m * bt] = _dot(
                    sqrtRT_ref[:], res("vru", lo, lo + d * m)
                )
                accu = gs[:, 0 : m * bt]
                for k in range(1, d):
                    accu = accu + gs[:, k * m * bt : (k + 1) * m * bt]
                gmu[:, po : po + m * bt] = gmu[:, po : po + m * bt] + accu
            mzx = res("zx") - gamma * gmx[:]
            mzu = res("zu") - gamma * gmu[:]
            sadd(sum_row, res("zx") * mzx)
            sadd(sum_row, res("zu") * mzu)
            mmax(mz_row, mzx)
            mmax(mz_row, mzu)
            mzs_nl = res("zs", 0, n_nl) - gamma * rusby
            mzs_lf = res("zs", ls, n) - gamma * 0.5 * (rus12 + rus13)
            sadd(sum_row, res("zs", 0, n_nl) * mzs_nl)
            sadd(sum_row, res("zs", ls, n) * mzs_lf)
            mmax(mz_row, mzs_nl)
            mmax(mz_row, mzs_lf)
            mztau = rwtau - gamma * 0.5 * (rut5 + rut6)
            sadd(sum_row, rwtau * mztau)
            mmax(mz_row, mztau)
            mzy = rwy - gamma * (ruy - bmat * rusby)
            sadd(sum_row, rwy * mzy)
            mmax(mz_row, mzy)

        # ------------------------------------------------------------------
        # M d accumulation dotted with the candidate residual r~ = point - ow:
        # <r~, M d> into sacc[_R_RHO], inf-norms into macc[_M_NMDZ/_M_NMDV].
        # d lives in sd scratch.
        # ------------------------------------------------------------------
        def md_accum(rp_cand):
            def dseg(name, a=None, b_=None):
                return rd(sd_trio, name, a, b_)

            def rt_(name, a=None, b_=None):
                return rp_cand(name, a, b_) - rd(ow_trio, name, a, b_)

            dzy_v = dseg("zy")
            dztau_v = dseg("ztau")
            mdvy = dseg("vy") - sigma * dzy_v
            sadd(_R_RHO, rt_("vy") * mdvy)
            mmax(_M_NMDV, mdvy)
            bty_d = jnp.sum(bmat * dzy_v, axis=0, keepdims=True)
            mdvsby = dseg("vsby") - sigma * (dseg("zs", 0, n_nl) - bty_d)
            sadd(_R_RHO, rt_("vsby") * mdvsby)
            mmax(_M_NMDV, mdvsby)
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1]
                qxp_d = _dot(sqrtQ, dseg("zx", po, po + m))
                rup_d = _dot(sqrtR, dseg("zu", po, po + m))
                for k in range(d):
                    a0, b0 = lo + k * m, lo + (k + 1) * m
                    mdvqx = dseg("vqx", a0, b0) - sigma * qxp_d
                    mdvru = dseg("vru", a0, b0) - sigma * rup_d
                    sadd(_R_RHO, rt_("vqx", a0, b0) * mdvqx)
                    sadd(_R_RHO, rt_("vru", a0, b0) * mdvru)
                    mmax(_M_NMDV, mdvqx)
                    mmax(_M_NMDV, mdvru)
            mdvt5 = dseg("vt5") - sigma * 0.5 * dztau_v
            mdvt6 = dseg("vt6") - sigma * 0.5 * dztau_v
            sadd(_R_RHO, rt_("vt5") * mdvt5)
            sadd(_R_RHO, rt_("vt6") * mdvt6)
            mmax(_M_NMDV, mdvt5)
            mmax(_M_NMDV, mdvt6)
            mdvcx = dseg("vcx") - sigma * dseg("zx", 0, n_nl)
            mdvcu = dseg("vcu") - sigma * dseg("zu")
            sadd(_R_RHO, rt_("vcx") * mdvcx)
            sadd(_R_RHO, rt_("vcu") * mdvcu)
            mmax(_M_NMDV, mdvcx)
            mmax(_M_NMDV, mdvcu)
            mdvqNx = dseg("vqNx") - sigma * _dot(sqrtQN, dseg("zx", ls, n))
            mdvs12 = dseg("vs12") - sigma * 0.5 * dseg("zs", ls, n)
            mdvs13 = dseg("vs13") - sigma * 0.5 * dseg("zs", ls, n)
            mdvcxN = dseg("vcxN") - sigma * dseg("zx", ls, n)
            sadd(_R_RHO, rt_("vqNx") * mdvqNx)
            sadd(_R_RHO, rt_("vs12") * mdvs12)
            sadd(_R_RHO, rt_("vs13") * mdvs13)
            sadd(_R_RHO, rt_("vcxN") * mdvcxN)
            mmax(_M_NMDV, mdvqNx)
            mmax(_M_NMDV, mdvs12)
            mmax(_M_NMDV, mdvs13)
            mmax(_M_NMDV, mdvcxN)
            if nc:
                mdvpnl = dseg("vpnl") - sigma * (
                    _dot(pGx_ref[:], dseg("zx", 0, n_nl))
                    + _dot(pGu_ref[:], dseg("zu"))
                )
                sadd(_R_RHO, rt_("vpnl") * mdvpnl)
                mmax(_M_NMDV, mdvpnl)
            if ncL:
                mdvplf = dseg("vplf") - sigma * _dot(
                    pGxN_ref[:], dseg("zx", ls, n)
                )
                sadd(_R_RHO, rt_("vplf") * mdvplf)
                mmax(_M_NMDV, mdvplf)

            mdzy = dzy_v - gamma * (dseg("vy") - bmat * dseg("vsby"))
            sadd(_R_RHO, rt_("zy") * mdzy)
            mmax(_M_NMDZ, mdzy)
            mdzs_nl = dseg("zs", 0, n_nl) - gamma * dseg("vsby")
            mdzs_lf = dseg("zs", ls, n) - gamma * 0.5 * (
                dseg("vs12") + dseg("vs13")
            )
            sadd(_R_RHO, rt_("zs", 0, n_nl) * mdzs_nl)
            sadd(_R_RHO, rt_("zs", ls, n) * mdzs_lf)
            mmax(_M_NMDZ, mdzs_nl)
            mmax(_M_NMDZ, mdzs_lf)
            mdztau = dztau_v - gamma * 0.5 * (dseg("vt5") + dseg("vt6"))
            sadd(_R_RHO, rt_("ztau") * mdztau)
            mmax(_M_NMDZ, mdztau)
            ltd_lf = dseg("vcxN") + _dot(sqrtQNT_ref[:], dseg("vqNx"))
            if ncL:
                ltd_lf = ltd_lf + _dot(pGxNT_ref[:], dseg("vplf"))
            mdzx_lf = dseg("zx", ls, n) - gamma * ltd_lf
            sadd(_R_RHO, rt_("zx", ls, n) * mdzx_lf)
            mmax(_M_NMDZ, mdzx_lf)
            for st in range(1, N):
                m = msz[st - 1]
                lo = off[st] - 1
                po = off[st - 1]
                gq[:, 0 : d * m * bt] = _dot(
                    sqrtQT_ref[:], dseg("vqx", lo, lo + d * m)
                )
                acc = gq[:, 0 : m * bt]
                for k in range(1, d):
                    acc = acc + gq[:, k * m * bt : (k + 1) * m * bt]
                if nc:
                    acc = acc + _dot(pGxT_ref[:], dseg("vpnl", po, po + m))
                mdzx_st = dseg("zx", po, po + m) - gamma * (
                    dseg("vcx", po, po + m) + acc
                )
                sadd(_R_RHO, rt_("zx", po, po + m) * mdzx_st)
                mmax(_M_NMDZ, mdzx_st)
                gs[:, 0 : d * m * bt] = _dot(
                    sqrtRT_ref[:], dseg("vru", lo, lo + d * m)
                )
                accu = gs[:, 0 : m * bt]
                for k in range(1, d):
                    accu = accu + gs[:, k * m * bt : (k + 1) * m * bt]
                if nc:
                    accu = accu + _dot(pGuT_ref[:], dseg("vpnl", po, po + m))
                mdzu_st = dseg("zu", po, po + m) - gamma * (
                    dseg("vcu", po, po + m) + accu
                )
                sadd(_R_RHO, rt_("zu", po, po + m) * mdzu_st)
                mmax(_M_NMDZ, mdzu_st)

        # ==================================================================
        # phase 0: zero the accumulators
        # ==================================================================
        sacc[:] = jnp.zeros((16, WACC), dtp)
        macc[:] = jnp.zeros((8, WACC), dtp)

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
            if "metric" not in _skip:
                metric_accum(rp_z, sb_trio, _R_RNF, _M_NMZ, _M_NMV)

        # per-lane select: cached candidate results / fresh sweep
        repl(_P_CACHE, sc(_SC_CACHE))
        sbW[0] = bsel(_P_CACHE, cW[0], sbW[0])
        sbY[0] = bsel(_P_CACHE, cY[0], sbY[0])
        sbS[0] = bsel(_P_CACHE, cS[0], sbS[0])

        # ==================================================================
        # phase 2: residual, secant rows, Anderson direction
        # ==================================================================
        repl(_P_HP, sc(_SC_VALID1))
        repl(_P_V2, sc(_SC_VALID2))
        repl(_P_ACT, sc(_SC_ACTIVE))
        hp_v = sc(_SC_VALID1)
        v2_v = sc(_SC_VALID2)

        if "phase2" in _skip:
            for src, dsts in ((zW, (oyW, opW, orW)), (zY, (oyY, opY, orY)),
                              (zS, (oyS, opS, orS))):
                val = src[0]
                for dref in dsts:
                    dref[0] = val
            sdW[0] = zW[0]
            sdY[0] = zY[0]
            sdS[0] = zS[0]
        # r, y, p as whole-class expressions (pads are zero by construction)
        rW_v = zW[0] - sbW[0]
        rY_v = zY[0] - sbY[0]
        rS_v = zS[0] - sbS[0]
        if "phase2" in _skip:
            def bmul(row, a):  # noqa: F811 - profiling stub
                return a
        yW_v = rW_v - bmul(_P_HP, rpW[0])
        yY_v = rY_v - bmul(_P_HP, rpY[0])
        yS_v = rS_v - bmul(_P_HP, rpS[0])
        if "phase2" not in _skip:
            oyW[0] = yW_v
            oyY[0] = yY_v
            oyS[0] = yS_v
        pW_v = bmul(_P_HP, spW[0]) - yW_v
        pY_v = bmul(_P_HP, spY[0]) - yY_v
        pS_v = bmul(_P_HP, spS[0]) - yS_v
        if "phase2" not in _skip:
            opW[0] = pW_v
            opY[0] = pY_v
            opS[0] = pS_v
            # next r_prev: only active lanes advance their residual
            orW[0] = bsel(_P_ACT, rW_v, rpW[0])
            orY[0] = bsel(_P_ACT, rY_v, rpY[0])
            orS[0] = bsel(_P_ACT, rS_v, rpS[0])

        def acc_dot(row, aW, aY, aS, bW, bY, bS):
            sadd(row, aW * bW)
            sadd(row, aY * bY)
            sadd(row, aS * bS)

        a1r = (a1rW[0], a1rY[0], a1rS[0])
        a2r = (a2rW[0], a2rY[0], a2rS[0])
        if "gram" in _skip:
            acc_dot = lambda *a: None
        acc_dot(_R_G00, yW_v, yY_v, yS_v, yW_v, yY_v, yS_v)
        acc_dot(_R_G01, yW_v, yY_v, yS_v, *a1r)
        acc_dot(_R_G02, yW_v, yY_v, yS_v, *a2r)
        acc_dot(_R_G11, *a1r, *a1r)
        acc_dot(_R_G12, *a1r, *a2r)
        acc_dot(_R_G22, *a2r, *a2r)
        acc_dot(_R_C0, yW_v, yY_v, yS_v, rW_v, rY_v, rS_v)
        acc_dot(_R_C1, *a1r, rW_v, rY_v, rS_v)
        acc_dot(_R_C2, *a2r, rW_v, rY_v, rS_v)
        finish_sum()

        g00 = ssum(_R_G00)
        g01 = ssum(_R_G01) * hp_v
        g02 = ssum(_R_G02) * v2_v
        g11 = ssum(_R_G11) * hp_v
        g12 = ssum(_R_G12) * hp_v * v2_v
        g22 = ssum(_R_G22) * v2_v
        c0 = ssum(_R_C0)
        c1_ = ssum(_R_C1) * hp_v
        c2 = ssum(_R_C2) * v2_v
        rn_fresh = jnp.sqrt(jnp.maximum(ssum(_R_RNF), 0.0))

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
        gam1 = x1s * dinv * hp_v
        gam2 = x2s * dinv * v2_v
        repl(_P_G0, gam0)
        repl(_P_G1, gam1)
        repl(_P_G2, gam2)

        if "phase2" not in _skip:
            sdW[0] = (
                -rW_v - bmul(_P_G0, pW_v) - bmul(_P_G1, a1pW[0])
                - bmul(_P_G2, a2pW[0])
            )
            sdY[0] = (
                -rY_v - bmul(_P_G0, pY_v) - bmul(_P_G1, a1pY[0])
                - bmul(_P_G2, a2pY[0])
            )
            sdS[0] = (
                -rS_v - bmul(_P_G0, pS_v) - bmul(_P_G1, a1pS[0])
                - bmul(_P_G2, a2pS[0])
            )

        # re-zero the sum rows phase 3 accumulates into (finish_sum folded
        # stale partials across the whole row)
        sacc[_R_RT : _R_RT + 1, :] = jnp.zeros((1, WACC), dtp)
        sacc[_R_RHO : _R_RHO + 1, :] = jnp.zeros((1, WACC), dtp)

        # ==================================================================
        # phase 3: candidate sweep + metric + M d reductions at (z + tau d)
        # ==================================================================
        tau_v = sc(_SC_TAU)
        repl(_P_TAU, tau_v)

        def rp_cand(name, a=None, b_=None):
            return rd(z_trio, name, a, b_) + bmul(
                _P_TAU, rd(sd_trio, name, a, b_)
            )

        if "sweep2" not in _skip:
            sweep(rp_cand, ow_trio)
        else:
            owW[0] = zW[0]
            owY[0] = zY[0]
            owS[0] = zS[0]
        if "metric" not in _skip:
            metric_accum(rp_cand, ow_trio, _R_RT, _M_NMRWZ, _M_NMRWV)
        if "md" not in _skip:
            md_accum(rp_cand)
        finish_sum()
        finish_max()

        # ==================================================================
        # phase 4: K1/K2/fallback selection + state update (sp.jl:166-222)
        # ==================================================================
        act_v = sc(_SC_ACTIVE)
        cache_v = sc(_SC_CACHE)
        rn = jnp.where(cache_v > 0, sc(_SC_RNC), rn_fresh)
        nmz_sel = jnp.where(cache_v > 0, sc(_SC_NMZC), smax(_M_NMZ))
        nmv_sel = jnp.where(cache_v > 0, sc(_SC_NMVC), smax(_M_NMV))
        rtsq = jnp.maximum(ssum(_R_RT), 0.0)
        rho_dot = ssum(_R_RHO)
        nmrwz = smax(_M_NMRWZ)
        nmrwv = smax(_M_NMRWV)
        nmdz = smax(_M_NMDZ)
        nmdv = smax(_M_NMDV)
        rt = jnp.sqrt(rtsq)
        r_safe = sc(_SC_RSAFE)
        q_pow = sc(_SC_QPOW)
        act_b = act_v > 0
        k1 = act_b & (rn <= r_safe) & (rt <= c1 * rn)
        rho = rtsq - tau_v * rho_dot
        k2 = act_b & (~k1) & (rho >= sigma_k2 * rn * rt)
        coef = lam_sp * jnp.where(
            rtsq > 0, rho / jnp.where(rtsq > 0, rtsq, 1.0), 0.0
        )
        looping = act_b & (~k1) & (~k2)

        k1f = k1.astype(dtp)
        k2f = k2.astype(dtp)
        repl(_P_K1, k1f)
        repl(_P_K2, k2f)
        repl(_P_COEF, coef)

        def commit(zr, sdr, owr, sbr, ozr):
            z_v = zr[0]
            w_v = z_v + bmul(_P_TAU, sdr[0])
            zk2 = z_v - bmul(_P_COEF, w_v - owr[0])
            if lam == 1.0:
                zfb = sbr[0]
            else:
                zfb = lam * sbr[0] + (1.0 - lam) * z_v
            sel = bsel(_P_K1, w_v, bsel(_P_K2, zk2, zfb))
            ozr[0] = bsel(_P_ACT, sel, z_v)

        if "commit" in _skip:
            for src, dsts in ((zW, (oznW, osW)), (zY, (oznY, osY)),
                              (zS, (oznS, osS))):
                val = src[0]
                for dref in dsts:
                    dref[0] = val
        else:
            commit(zW, sdW, owW, sbW, oznW)
            commit(zY, sdY, owY, sbY, oznY)
            commit(zS, sdS, owS, sbS, oznS)
            # s_new: only active lanes advance the secant
            osW[0] = bsel(_P_ACT, oznW[0] - zW[0], spW[0])
            osY[0] = bsel(_P_ACT, oznY[0] - zY[0], spY[0])
            osS[0] = bsel(_P_ACT, oznS[0] - zS[0], spS[0])

        # scalars
        r_safe_new = jnp.where(k1, rt + q_pow, r_safe)
        xi1 = jnp.where(
            k1, tau_v * nmdz / gamma,
            jnp.where(k2, coef * nmrwz / gamma, lam * nmz_sel / gamma),
        )
        xi2 = jnp.where(
            k1, tau_v * nmdv / sigma,
            jnp.where(k2, coef * nmrwv / sigma, lam * nmv_sel / sigma),
        )

        def osc(slot, val):
            oscal[0, 0:1, slot * bt : (slot + 1) * bt] = val

        osc(_OC_K1, k1f)
        osc(_OC_K2, k2f)
        osc(_OC_LOOP, looping.astype(dtp))
        osc(_OC_RN, rn)
        osc(_OC_RT, rt)
        osc(_OC_RSAFE, r_safe_new)
        osc(_OC_XI1, xi1)
        osc(_OC_XI2, xi2)
        osc(_OC_NMRWZ, nmrwz)
        osc(_OC_NMRWV, nmrwv)
        osc(_OC_G0, gam0)
        osc(_OC_G1, gam1)
        osc(_OC_G2, gam2)
        oscal[0, 0:1, (_OC_G2 + 1) * bt :] = jnp.zeros(
            (1, (16 - (_OC_G2 + 1)) * bt), dtp
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
    """One fused SuperMann iteration (tau = 1 trial) on lane-packed trios.

    Returns (z_new_trio, w_trio, r_trio, s_trio, y_trio, p_trio,
    out_scal [B, 16]) — see the module docstring for what each is.
    """
    pk = pack_meta(meta)
    t = meta.tree
    nx, nu, ny = meta.nx, meta.nu, meta.ny
    n, n_nl, n_nr, n_lf = t.n, t.n_nonleaf, t.n - 1, t.n_leaf
    B = x0.shape[0]
    G = z_trio[2].shape[0]
    bt = B // G
    assert bt * G == B and trio_bt(meta, z_trio) == bt, (B, G, bt)
    grid = (G,)
    dtype = z_trio[2].dtype
    WWb, WYb, WSb = pk.WW * bt, pk.WY * bt, pk.WS * bt
    WACC = _next_pow2(WWb)

    segs = []
    o = 0
    for kind, dim in meta.dual_cone:
        segs.append((kind, o, o + dim))
        o += dim

    kernel = _make_step_kernel(
        meta, pk, bt, tuple(segs), float(c1), float(sigma_k2), float(lam),
        float(lam_sp),
    )

    # index maps under PrefetchScalarGridSpec receive the scalar-prefetch
    # refs as trailing arguments
    def lane(f_dim, w_dim):
        return pl.BlockSpec((1, f_dim, w_dim), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    trio_spec = [lane(pk.FW, WWb), lane(ny, WYb), lane(_S_ROWS, WSb)]
    trio_shape = [
        jax.ShapeDtypeStruct((G, pk.FW, WWb), dtype),
        jax.ShapeDtypeStruct((G, ny, WYb), dtype),
        jax.ShapeDtypeStruct((G, _S_ROWS, WSb), dtype),
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
    # per-node risk data is lane-repeated host-side so kernel rows line up
    # with packed columns (c = node*bt + lane)
    if b_arg.shape != (ny, 1):
        b_arg = jnp.repeat(b_arg, bt, axis=1)
    if ker_arg.shape != (mker, mker):
        ker_arg = jnp.repeat(ker_arg, bt, axis=1)
    # tiled identity for in-kernel lane broadcasts: T[i, w*bt + j] = (i == j)
    tile_id = jnp.tile(jnp.eye(bt, dtype=dtype), (1, pk.WW))

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
            const(tile_id.shape),
            const(Kst.shape), const(KstT.shape), const(Rti.shape),
            const(BTall.shape), const(PBstk.shape), const(ABKTall.shape),
            const(ABKBall.shape),
            const((nx, 1)), const((nx, 1)), const((nu, 1)), const((nu, 1)),
        ]
        + [const(a.shape) for a in poly_consts]
        + [
            lane(nx, bt),  # x0
            lane(1, 16 * bt),  # scalar pack
        ]
        + trio_spec * 8
    )
    out_specs = trio_spec * 6 + [lane(1, 16 * bt)]
    out_shape = trio_shape * 6 + [jax.ShapeDtypeStruct((G, 1, 16 * bt), dtype)]
    scratch = [
        pltpu.VMEM((1, pk.FW, WWb), dtype),  # sbW
        pltpu.VMEM((1, ny, WYb), dtype),  # sbY
        pltpu.VMEM((1, _S_ROWS, WSb), dtype),  # sbS
        pltpu.VMEM((1, pk.FW, WWb), dtype),  # sdW
        pltpu.VMEM((1, ny, WYb), dtype),  # sdY
        pltpu.VMEM((1, _S_ROWS, WSb), dtype),  # sdS
        pltpu.VMEM((nx, n * bt), dtype),  # gx
        pltpu.VMEM((nu, n_nl * bt), dtype),  # gu
        pltpu.VMEM((nx, n * bt), dtype),  # gq
        pltpu.VMEM((max(nu, 1), max(n_nl, n_lf) * bt), dtype),  # gs
        pltpu.VMEM((mker, n_nl * bt), dtype),  # gk
        pltpu.VMEM((mker, n_nl * bt), dtype),  # gk2
        pltpu.VMEM((2, n * bt), dtype),  # gsst (row 0 s-pre, row 1 tau-pre)
        pltpu.VMEM((nx, n_nr * bt), dtype),  # gqx
        pltpu.VMEM((max(nu, 1), n_nr * bt), dtype),  # gru
        pltpu.VMEM(
            (max(t.d * nx, nx + nu), max(n_lf // t.d, 1) * bt), dtype
        ),  # gst
        pltpu.VMEM((t.d * nx, max(n_lf // t.d, 1) * bt), dtype),  # gst2
        pltpu.VMEM((nx, n * bt), dtype),  # gmx
        pltpu.VMEM((nu, n_nl * bt), dtype),  # gmu
        pltpu.VMEM((16, WACC), dtype),  # sacc
        pltpu.VMEM((8, WACC), dtype),  # macc
        pltpu.VMEM((8, WWb), dtype),  # srep
    ]

    sc16 = jnp.concatenate(
        [scal_pack, jnp.zeros((B, 16 - scal_pack.shape[-1]), dtype)], axis=-1
    )
    # pack: col = slot*bt + lane
    sc16 = jax.lax.optimization_barrier(
        sc16.reshape(G, bt, 16).transpose(0, 2, 1).reshape(G, 1, 16 * bt)
    )
    x0p = jax.lax.optimization_barrier(
        x0.reshape(G, bt, nx).transpose(0, 2, 1)
    )  # [G, nx, bt]
    # per-tile "every lane cached" flag — controls the fresh-sweep skip
    tile_all_cached = jnp.min(
        scal_pack[:, 3].astype(jnp.int32).reshape(G, bt), axis=1
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
            dimension_semantics=(
                os.environ.get("SPOCK_DIMSEM", "parallel"),
            ),
            vmem_limit_bytes=int(
                os.environ.get("SPOCK_VMEM_LIMIT_MB", "110")
            ) * 1024 * 1024,
        ),
    )(
        tile_all_cached,
        jnp.stack([jnp.asarray(gamma, dtype), jnp.asarray(sigma, dtype)]),
        sQ, sR, sQN, sQ.T, sR.T, sQN.T,
        b_arg, ker_arg, tile_id,
        Kst, KstT, Rti, BTall, PBstk, ABKTall, ABKBall,
        data.x_min[:, None], data.x_max[:, None],
        data.u_min[:, None], data.u_max[:, None],
        *poly_consts,
        x0p,
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
    out_scal = (
        jax.lax.optimization_barrier(outs[18])
        .reshape(G, 16, bt).transpose(0, 2, 1).reshape(B, 16)
    )
    return z_new, w, r, s, y, p, out_scal


# ---------------------------------------------------------------------------
# fallback dispatch: SPOCK_LANE_PACK=0 restores the round-4 lane-tiled kernel
# (read at import; the layouts differ in the carried trios, so flipping
# mid-process is not supported)
# ---------------------------------------------------------------------------

if os.environ.get("SPOCK_LANE_PACK", "1") == "0":  # pragma: no cover
    from .pallas_spstep_lt import (  # noqa: F811
        PackMeta, pack_meta, pack_pair, unpack_pair, root_u, zero_trio,
        lane_rows, lane_mask, sp_step_fused, supported, enabled,
        _trio_padded, _pick_bt, _step_vmem_bytes,
    )
