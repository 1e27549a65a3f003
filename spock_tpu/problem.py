"""Problem specification and build step.

A :class:`ProblemSpec` mirrors the reference's problem-data layer
(``Cost``/``Dynamics``/``RiskMeasure``/``UniformRectangle`` +
``GENERIC_PROBLEM_DEFINITION``, cf. ``/root/reference/src/{cost,dynamics,
constraints}.jl`` and ``src/model.jl:46-55``) in stacked-array form.

:func:`build` performs the offline phase (Riccati factorization, kernel
projectors, ||L|| power iteration — cf. ``build_spock``,
``src/models/spock.jl:1-210``) and returns a :class:`ProblemData` pytree of
device arrays plus hashable static metadata.  Everything downstream
(:mod:`spock_tpu.ops`, :mod:`spock_tpu.algorithms`) is pure jitted JAX.

Memory design: per-node arrays admit a *broadcast* node dimension of size 1
when the data is uniform across nodes (the common case — e.g. server_heat).
With uniform data the Riccati matrices depend only on the stage, so the whole
offline factorization is O(N) matrices instead of O(d^N) — this is what makes
branching=3, N=15 (~10^7 node) trees fit on a chip.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .risks import ConeSpec, RiskSpec, dual_cone
from .tree import UniformTree


# ---------------------------------------------------------------------------
# User-facing spec (numpy, host side)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Cost:
    """Quadratic stage/terminal costs.

    Following the reference convention (``model_mosek.jl:16-26``): ``Q[j-1]``,
    ``R[j-1]`` weight the *parent's* (x, u) on the edge leading to non-root
    node ``j``; ``QN[i]`` weights leaf node ``leaf_start + i``'s state.

    Shapes: Q [n-1 | 1, nx, nx], R [n-1 | 1, nu, nu], QN [n_leaf | 1, nx, nx]
    (size-1 node dim == uniform over nodes).
    """

    Q: np.ndarray
    R: np.ndarray
    QN: np.ndarray


@dataclasses.dataclass(frozen=True)
class Dynamics:
    """d realizations of linear dynamics x+ = A[w] x + B[w] u.

    A: [d, nx, nx], B: [d, nx, nu].  (Reference: ``src/dynamics.jl``.)
    """

    A: np.ndarray
    B: np.ndarray


@dataclasses.dataclass(frozen=True)
class Box:
    """Rectangle constraints on states and inputs at every node
    (reference ``UniformRectangle``, ``src/constraints.jl:11-22``), with
    per-dimension bounds allowed.

    Scalars or [nx]/[nu] arrays; use +-inf for unconstrained dims.
    """

    x_min: Any
    x_max: Any
    u_min: Any
    u_max: Any


@dataclasses.dataclass(frozen=True)
class Polytope:
    """Two-sided polytopic constraints (extension beyond the reference, which
    only supports boxes):

        lo <= Gx x_i + Gu u_i <= hi   at every non-leaf node,
        loN <= GxN x_i <= hiN         at every leaf node.

    One-sided rows use -inf / +inf.  Enters the splitting as extra blocks of
    the operator L with a box prox — same mechanism as the reference's v7/v14
    blocks, with a general matrix instead of the identity.

    Shapes: Gx [nc, nx], Gu [nc, nu], lo/hi [nc]; GxN [ncN, nx], loN/hiN [ncN].
    """

    Gx: np.ndarray
    Gu: np.ndarray
    lo: np.ndarray
    hi: np.ndarray
    GxN: np.ndarray
    loN: np.ndarray
    hiN: np.ndarray


# ---------------------------------------------------------------------------
# Built problem (device pytrees + static meta)
# ---------------------------------------------------------------------------


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class RiccatiData:
    """Offline Riccati factorization for the dynamics projection (S1).

    Re-derivation of ``ricatti_offline`` (``implicit_l.jl:46-97``) in
    stage-batched form.  Each field is a tuple over stages t = 0..N-2 (except
    P over t = 0..N-1); the per-stage node dim is d^t, or 1 when the problem
    data is node-uniform (then the factorization is stage-uniform).

      P[t]:      [m_t | 1, nx, nx] cost-to-go-like projection matrices.
      K[t]:      [m_t | 1, nu, nx] feedback gains.
      Rtinv[t]:  [m_t | 1, nu, nu] inverse of I + sum_j B' P_j B (symmetrized).
      ABK[t]:    [m_t | 1, d, nx, nx] closed-loop A + B K per child edge.
      PB[t]:     [m_t | 1, d, nx, nu] P_j @ B[w_j] per child edge.
    """

    P: Tuple[Any, ...]
    K: Tuple[Any, ...]
    Rtinv: Tuple[Any, ...]
    ABK: Tuple[Any, ...]
    PB: Tuple[Any, ...]


@_register
@dataclasses.dataclass(frozen=True)
class ProblemData:
    """All device-resident numeric data needed by the solver (a pytree).

    Node dims may be 1 (uniform/broadcast) as described in the module doc.
    """

    # dynamics
    A: Any  # [d, nx, nx]
    B: Any  # [d, nx, nu]
    # costs (square roots, as applied inside L — cf. models/spock.jl:123-125)
    sqrtQ: Any  # [n-1 | 1, nx, nx]
    sqrtR: Any  # [n-1 | 1, nu, nu]
    sqrtQN: Any  # [n_leaf | 1, nx, nx]
    # risk measures
    E: Any  # [n_nonleaf | 1, ny, d]
    F: Any  # [n_nonleaf | 1, ny, nf]
    b: Any  # [n_nonleaf | 1, ny]
    # box constraints
    x_min: Any
    x_max: Any
    u_min: Any
    u_max: Any
    # offline factorizations
    ric: RiccatiData
    ker_proj: Any  # [n_nonleaf | 1, ny + 2d, ny + 2d] projector onto ker(M_i)
    # operator norm estimate: ||L||^2 (cf. L_norm, models/spock.jl:64)
    L_sq: Any  # scalar
    # polytopic constraints (None when absent)
    Gx: Any = None  # [nc, nx]
    Gu: Any = None  # [nc, nu]
    p_lo: Any = None  # [nc]
    p_hi: Any = None  # [nc]
    GxN: Any = None  # [ncN, nx]
    pN_lo: Any = None  # [ncN]
    pN_hi: Any = None  # [ncN]


@dataclasses.dataclass(frozen=True)
class ProblemMeta:
    """Hashable static metadata, safe to close over / pass statically."""

    tree: UniformTree
    nx: int
    nu: int
    ny: int
    nf: int
    cone: ConeSpec  # K (primal cone of the risk measure)
    nc_nl: int = 0  # polytope rows per non-leaf node (0 = no polytope)
    nc_lf: int = 0  # polytope rows per leaf node

    @property
    def dual_cone(self) -> ConeSpec:
        return dual_cone(self.cone)

    @property
    def nz(self) -> int:
        """Primal dimension (cf. get_nz, implicit_l.jl:5-15)."""
        t = self.tree
        return (
            t.n * self.nx
            + t.n_nonleaf * self.nu
            + t.n
            + (t.n - 1)
            + t.n_nonleaf * self.ny
        )

    @property
    def nv(self) -> int:
        """Dual dimension (cf. get_nv, implicit_l.jl:17-44)."""
        t = self.tree
        return (
            t.n_nonleaf * self.ny  # v1
            + t.n_nonleaf  # v2
            + (t.n - 1) * self.nx  # v3
            + (t.n - 1) * self.nu  # v4
            + (t.n - 1)  # v5
            + (t.n - 1)  # v6
            + t.n_nonleaf * (self.nx + self.nu)  # v7
            + t.n_leaf * self.nx  # v11
            + t.n_leaf  # v12
            + t.n_leaf  # v13
            + t.n_leaf * self.nx  # v14
            + t.n_nonleaf * self.nc_nl  # polytope (extension)
            + t.n_leaf * self.nc_lf
        )


@dataclasses.dataclass(frozen=True)
class Spec:
    """Full problem specification (host side)."""

    tree: UniformTree
    cost: Cost
    dynamics: Dynamics
    risk: RiskSpec
    constraints: Box
    polytope: Optional[Polytope] = None


# ---------------------------------------------------------------------------
# Offline phase
# ---------------------------------------------------------------------------


def _sqrtm_psd(M: np.ndarray) -> np.ndarray:
    """Symmetric PSD matrix square root, batched over leading dims."""
    w, V = np.linalg.eigh(M)
    w = np.clip(w, 0.0, None)
    return np.einsum("...ab,...b,...cb->...ac", V, np.sqrt(w), V)


def _riccati_offline(
    tree: UniformTree, A: np.ndarray, B: np.ndarray, uniform: bool
) -> RiccatiData:
    """Backward stage recursion computing the S1 projection factors.

    Mirrors the math of ``ricatti_offline`` (``implicit_l.jl:46-97``) with
    identity weights (P = I at leaves), batched per stage.  With ``uniform``
    data every stage batch has size 1 (broadcast).
    """
    N, d = tree.N, tree.d
    nx, nu = A.shape[-1], B.shape[-1]
    eye_x, eye_u = np.eye(nx), np.eye(nu)

    P = [None] * N  # P[t]: [m_t|1, nx, nx]
    K = [None] * (N - 1)
    Rtinv = [None] * (N - 1)
    ABK = [None] * (N - 1)  # ABK[t]: per child edge of stage-t nodes
    PB = [None] * (N - 1)

    m_leaf = 1 if uniform else tree.stage_size(N - 1)
    P[N - 1] = np.broadcast_to(eye_x, (m_leaf, nx, nx)).copy()

    for t in range(N - 2, -1, -1):
        m = 1 if uniform else tree.stage_size(t)
        if uniform:
            Pc = np.broadcast_to(P[t + 1][:, None], (1, d, nx, nx))
        else:
            Pc = P[t + 1].reshape(m, d, nx, nx)
        # sum_j B[w]' P_j B[w]  /  B[w]' P_j A[w]
        sum_r = np.einsum("dxu,mdxy,dyv->muv", B, Pc, B)
        sum_k = np.einsum("dxu,mdxy,dyv->muv", B, Pc, A)
        Rt = eye_u + 0.5 * (sum_r + np.swapaxes(sum_r, -1, -2))
        Rtinv[t] = np.linalg.inv(Rt)
        K[t] = -np.einsum("muv,mvx->mux", Rtinv[t], sum_k)
        ABK[t] = A[None] + np.einsum("dxu,muy->mdxy", B, K[t])
        PB[t] = np.einsum("mdxy,dyu->mdxu", Pc, B)
        P[t] = (
            eye_x
            + np.einsum("mux,muy->mxy", K[t], K[t])
            + np.einsum("mdxy,mdxw,mdwv->myv", ABK[t], Pc, ABK[t])
        )

    return RiccatiData(
        P=tuple(P), K=tuple(K), Rtinv=tuple(Rtinv), ABK=tuple(ABK), PB=tuple(PB)
    )


def _kernel_projectors(risk: RiskSpec, d: int, uniform: bool) -> np.ndarray:
    """Orthogonal projectors onto ker([E' -I -I; F' 0 0]) per non-leaf node.

    The reference builds U pinv(U) with U from svd(nullspace(M))
    (``models/spock.jl:72-82,129-132``); both equal the orthogonal projector
    V_null V_null' which we compute from a batched SVD directly.
    """
    E, F = risk.E, risk.F  # [n_nl, ny, d], [n_nl, ny, nf]
    if uniform:
        E, F = E[:1], F[:1]
    n_nl, ny, _ = E.shape
    nf = F.shape[-1]
    eye_d = np.eye(d)
    M = np.concatenate(
        [
            np.concatenate(
                [np.swapaxes(E, -1, -2), -np.broadcast_to(eye_d, (n_nl, d, d)),
                 -np.broadcast_to(eye_d, (n_nl, d, d))], axis=-1
            ),
            np.concatenate(
                [np.swapaxes(F, -1, -2), np.zeros((n_nl, nf, d)),
                 np.zeros((n_nl, nf, d))], axis=-1
            ),
        ],
        axis=-2,
    )  # [n_nl, d + nf, ny + 2d]
    _, sv, Vh = np.linalg.svd(M, full_matrices=True)
    tol = np.finfo(np.float64).eps * max(M.shape[-2:]) * (
        sv.max(initial=1.0)
    )
    ranks = (sv > tol).sum(axis=-1)
    r = int(ranks.max())
    if not (ranks == r).all():
        raise ValueError("Risk-measure kernel ranks differ across nodes.")
    Vn = np.swapaxes(Vh[:, r:, :], -1, -2)  # [n_nl, ny+2d, k]
    return np.einsum("nik,njk->nij", Vn, Vn)


def _is_uniform(a: np.ndarray) -> bool:
    return a.shape[0] == 1 or bool(np.all(a == a[:1]))


def build(
    spec: Spec,
    dtype: Any = jnp.float32,
    l_norm_iters: int = 50,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[ProblemData, ProblemMeta]:
    """Offline phase: factorize, estimate ||L||, ship everything on device.

    Unlike the reference, which hardcodes the step-size constant
    (``L_norm = 3.28``, ``models/spock.jl:63-64`` — an acknowledged TODO), we
    estimate ||L||^2 by power iteration on L'L at build time.
    """
    tree = spec.tree
    A = np.asarray(spec.dynamics.A, dtype=np.float64)
    B = np.asarray(spec.dynamics.B, dtype=np.float64)
    d, nx, nu = A.shape[0], A.shape[-1], B.shape[-1]
    assert d == tree.d, "dynamics realization count must equal branching factor"

    Q = np.asarray(spec.cost.Q, dtype=np.float64)
    R = np.asarray(spec.cost.R, dtype=np.float64)
    QN = np.asarray(spec.cost.QN, dtype=np.float64)
    # collapse uniform node dims to 1
    Q = Q[:1] if _is_uniform(Q) else Q
    R = R[:1] if _is_uniform(R) else R
    QN = QN[:1] if _is_uniform(QN) else QN

    risk = spec.risk
    E = np.asarray(risk.E, np.float64)
    F = np.asarray(risk.F, np.float64)
    b = np.asarray(risk.b, np.float64)
    risk_uniform = _is_uniform(E) and _is_uniform(F) and _is_uniform(b)
    if risk_uniform:
        E, F, b = E[:1], F[:1], b[:1]

    uniform = (
        Q.shape[0] == 1 and R.shape[0] == 1 and QN.shape[0] == 1 and risk_uniform
    )

    ric = _riccati_offline(tree, A, B, uniform=True)
    # NOTE: the S1 projection uses identity weights regardless of Q/R (the
    # reference's ricatti_offline does too — P=I at leaves, implicit_l.jl:67-69)
    # so the Riccati factors depend only on the dynamics => always uniform
    # per stage for uniform-branching trees.

    ker = _kernel_projectors(
        RiskSpec(E=E, F=F, b=b, cone=risk.cone), d, uniform=risk_uniform
    )

    poly = spec.polytope
    meta = ProblemMeta(
        tree=tree,
        nx=nx,
        nu=nu,
        ny=b.shape[-1],
        nf=F.shape[-1],
        cone=risk.cone,
        nc_nl=0 if poly is None else np.asarray(poly.Gx).shape[0],
        nc_lf=0 if poly is None else np.asarray(poly.GxN).shape[0],
    )

    cvt = lambda a: jnp.asarray(a, dtype=dtype)
    data = ProblemData(
        A=cvt(A),
        B=cvt(B),
        sqrtQ=cvt(_sqrtm_psd(Q)),
        sqrtR=cvt(_sqrtm_psd(R)),
        sqrtQN=cvt(_sqrtm_psd(QN)),
        E=cvt(E),
        F=cvt(F),
        b=cvt(b),
        x_min=cvt(np.broadcast_to(np.asarray(spec.constraints.x_min, np.float64), (nx,))),
        x_max=cvt(np.broadcast_to(np.asarray(spec.constraints.x_max, np.float64), (nx,))),
        u_min=cvt(np.broadcast_to(np.asarray(spec.constraints.u_min, np.float64), (nu,))),
        u_max=cvt(np.broadcast_to(np.asarray(spec.constraints.u_max, np.float64), (nu,))),
        ric=jax.tree_util.tree_map(cvt, ric),
        ker_proj=cvt(ker),
        L_sq=jnp.asarray(1.0, dtype=dtype),  # replaced below
        Gx=None if poly is None else cvt(poly.Gx),
        Gu=None if poly is None else cvt(poly.Gu),
        p_lo=None if poly is None else cvt(poly.lo),
        p_hi=None if poly is None else cvt(poly.hi),
        GxN=None if poly is None else cvt(poly.GxN),
        pN_lo=None if poly is None else cvt(poly.loN),
        pN_hi=None if poly is None else cvt(poly.hiN),
    )

    # ||L||^2 by power iteration on L'L (done in the solver's own dtype).
    from .ops import linop  # local import to avoid cycle

    l_sq = linop.estimate_L_sq(data, meta, iters=l_norm_iters, rng=rng)
    data = dataclasses.replace(data, L_sq=jnp.asarray(l_sq, dtype=dtype))
    return data, meta
