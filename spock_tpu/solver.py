"""User-facing solve API.

Replaces the reference's ``build_model`` / ``solve_model!`` pair
(``src/model.jl:273-310``, ``src/models/{cpock,spock}.jl``) with a
functional, batch-first interface:

    data, meta = spock_tpu.build(spec)
    solver = Solver(data, meta, algorithm="spock")
    res = solver.solve(x0)                      # cold start
    res = solver.solve(x0, z0=res.z, v0=res.v)  # warm start (explicit state)

Warm starting is explicit state-passing rather than hidden mutation of a
model struct (the reference's implicit mechanism, ``models/spock.jl:242-248``)
— this is what lets receding-horizon MPC thread solver state through
``lax.scan`` and shard batches of solves over a mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .algorithms import cp as cp_alg
from .algorithms import supermann as sp_alg
from .algorithms.common import SolveResult
from .problem import ProblemData, ProblemMeta
from .zv import Dual, Primal


def zero_primal(meta: ProblemMeta, batch: tuple = (), dtype=jnp.float32) -> Primal:
    t = meta.tree
    z = lambda *s: jnp.zeros(batch + s, dtype)
    return Primal(
        x=z(meta.nx, t.n),
        u=z(meta.nu, t.n_nonleaf),
        s=z(t.n),
        tau=z(t.n - 1),
        y=z(meta.ny, t.n_nonleaf),
    )


def zero_dual(meta: ProblemMeta, batch: tuple = (), dtype=jnp.float32) -> Dual:
    t = meta.tree
    z = lambda *s: jnp.zeros(batch + s, dtype)
    return Dual(
        y=z(meta.ny, t.n_nonleaf),
        sby=z(t.n_nonleaf),
        qx=z(meta.nx, t.n - 1),
        ru=z(meta.nu, t.n - 1),
        t5=z(t.n - 1),
        t6=z(t.n - 1),
        cx=z(meta.nx, t.n_nonleaf),
        cu=z(meta.nu, t.n_nonleaf),
        qNx=z(meta.nx, t.n_leaf),
        s12=z(t.n_leaf),
        s13=z(t.n_leaf),
        cxN=z(meta.nx, t.n_leaf),
        pnl=z(meta.nc_nl, t.n_nonleaf) if meta.nc_nl > 0 else None,
        plf=z(meta.nc_lf, t.n_leaf) if meta.nc_lf > 0 else None,
    )


@partial(
    jax.jit,
    static_argnames=(
        "meta", "algorithm", "max_iter", "lam", "supermann_opts", "constrain",
    ),
)
def _solve_jit(
    data,
    meta,
    x0,
    z0,
    v0,
    tol,
    algorithm: str,
    max_iter: int,
    lam: float,
    supermann_opts,
    constrain=None,
):
    if algorithm == "cp":
        return cp_alg.run_cp(
            data, meta, x0, z0, v0, tol=tol, max_iter=max_iter, lam=lam,
            constrain=constrain,
        )
    elif algorithm == "spock":
        return sp_alg.run_supermann(
            data,
            meta,
            x0,
            z0,
            v0,
            tol=tol,
            max_iter=max_iter,
            opts=supermann_opts,
            constrain=constrain,
        )
    raise ValueError(f"unknown algorithm {algorithm!r}")


@dataclasses.dataclass
class Solver:
    """Thin convenience wrapper; all heavy lifting is jitted free functions.

    algorithm: "spock" (CP + SuperMann + quasi-Newton, the reference's SPOCK,
    default) or "cp" (plain Chambolle-Pock, the reference's CPOCK).
    """

    data: ProblemData
    meta: ProblemMeta
    algorithm: str = "spock"
    max_iter: Optional[int] = None  # defaults: 1000 spock / 5000 cp, as in ref
    lam: float = 1.0
    supermann: "sp_alg.SuperMannOpts" = None  # type: ignore
    # optional sharding hook (parallel.mesh.node_constrainer) re-applied to
    # the iterates every loop iteration — the big-tree node-sharded path
    constrain: object = None

    def __post_init__(self):
        if self.max_iter is None:
            self.max_iter = 1000 if self.algorithm == "spock" else 5000
        if self.supermann is None:
            self.supermann = sp_alg.SuperMannOpts()

    @property
    def dtype(self):
        return self.data.A.dtype

    def solve(
        self,
        x0,
        z0: Optional[Primal] = None,
        v0: Optional[Dual] = None,
        tol: float = 1e-3,
    ) -> SolveResult:
        """x0: [nx] or [B, nx].  Returns batched SolveResult ([B] lanes; B=1
        squeezed back out for unbatched input)."""
        x0 = jnp.asarray(x0, self.dtype)
        unbatched = x0.ndim == 1
        if unbatched:
            x0 = x0[None]
        B = x0.shape[0]
        if z0 is None:
            z0 = zero_primal(self.meta, (B,), self.dtype)
        if v0 is None:
            v0 = zero_dual(self.meta, (B,), self.dtype)
        res = _solve_jit(
            self.data,
            self.meta,
            x0,
            z0,
            v0,
            jnp.asarray(tol, self.dtype),
            self.algorithm,
            int(self.max_iter),
            float(self.lam),
            self.supermann,
            self.constrain,
        )
        if unbatched:
            res = jax.tree_util.tree_map(lambda a: a[0], res)
        return res
