"""Receding-horizon MPC simulation with warm starting.

Counterpart of the reference's MPC driver loop (``examples/server_heat/
mpc_simulation.jl:38-183``): at each step solve the risk-averse problem from
the current state, apply the root input, advance the plant with a sampled
realization, and warm-start the next solve from the previous primal-dual
iterate (the reference does this implicitly by keeping z/v in the model
struct; here the state is threaded explicitly through ``lax.scan``).

Everything is batched: B independent plants/solvers advance in lockstep —
this is the unit of TPU parallelism.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .algorithms import supermann as sp_alg
from .algorithms import cp as cp_alg
from .problem import ProblemData, ProblemMeta
from .solver import zero_dual, zero_primal


@dataclasses.dataclass(frozen=True)
class MPCResult:
    xs: Any  # [T+1, B, nx] closed-loop states
    us: Any  # [T, B, nu] applied inputs
    iterations: Any  # [T, B] solver iterations per step
    status: Any  # [T, B]
    objective: Any  # [T, B] s_root per step


jax.tree_util.register_dataclass(
    MPCResult,
    data_fields=["xs", "us", "iterations", "status", "objective"],
    meta_fields=[],
)


@partial(
    jax.jit,
    static_argnames=("meta", "algorithm", "max_iter", "opts"),
)
def simulate(
    data: ProblemData,
    meta: ProblemMeta,
    x0,
    ws,
    tol,
    algorithm: str = "spock",
    max_iter: int = 1000,
    opts: sp_alg.SuperMannOpts = sp_alg.SuperMannOpts(),
) -> MPCResult:
    """Closed-loop simulation.

    x0: [B, nx] initial states; ws: [T, B] int realization indices drawn by
    the caller (the reference samples uniform w each step,
    ``mpc_simulation.jl:170-177``); tol: solver tolerance per step.
    """
    B = x0.shape[0]
    dtype = x0.dtype
    z = zero_primal(meta, (B,), dtype)
    v = zero_dual(meta, (B,), dtype)

    def step(carry, w):
        x, z, v = carry
        if algorithm == "spock":
            res = sp_alg.run_supermann(
                data, meta, x, z, v, tol=tol, max_iter=max_iter, opts=opts
            )
        else:
            res = cp_alg.run_cp(
                data, meta, x, z, v, tol=tol, max_iter=max_iter
            )
        u0 = res.z.u[:, :, 0]  # root input (u is [B, nu, n_nonleaf])
        # plant update x+ = A[w] x + B[w] u
        Aw = data.A[w]  # [B, nx, nx]
        Bw = data.B[w]
        x_next = jnp.einsum("bxy,by->bx", Aw, x) + jnp.einsum(
            "bxu,bu->bx", Bw, u0
        )
        out = (x_next, res.iterations, res.status, res.z.s[:, 0], u0)
        return (x_next, res.z, res.v), out

    (_, _, _), (xs, iters, status, obj, us) = jax.lax.scan(
        step, (x0, z, v), ws
    )
    return MPCResult(
        xs=jnp.concatenate([x0[None], xs], axis=0),
        us=us,
        iterations=iters,
        status=status,
        objective=obj,
    )
