"""Online dynamics projection (S1) via stage-batched Riccati sweeps.

Counterpart of ``projection_S1!`` (``/root/reference/src/model_dynamics/
implicit_l.jl:559-686``): the exact Euclidean projection of a stacked (x, u)
onto the affine subspace {x_root = x0, x_j = A_wj x_i + B_wj u_i}.

The reference walks the tree node-by-node with pointer chasing; here each
stage is one batched tensor op (all d^t nodes of the stage at once), and the
N-stage backward/forward recursions are unrolled at trace time (N is small
and static).  Layout is feature-major ([..., nx, nodes]); children of the
stage's nodes group as a trailing [m, d] reshape of the node axis.  The
offline factors (:class:`spock_tpu.problem.RiccatiData`) are stage-uniform,
so their node dim broadcasts (einsum strings without 'm').
"""

from __future__ import annotations

import jax.numpy as jnp

from ..problem import ProblemData, ProblemMeta


def _mat(M, x, eq: str, eq1: str):
    """Apply per-stage-node matrices with broadcastable node dim."""
    if M.shape[0] == 1:
        return jnp.einsum(eq1, M[0], x)
    return jnp.einsum(eq, M, x)


def project_dynamics(data: ProblemData, meta: ProblemMeta, x, u, x0):
    """Project (x, u) onto the dynamics subspace; returns (x_proj, u_proj).

    x: [..., nx, n] (targets), u: [..., nu, n_nonleaf], x0: [..., nx].
    """
    t = meta.tree
    N, d = t.N, t.d
    ric = data.ric
    B = data.B  # [d, nx, nu]

    # ---- backward sweep: build q (costate) and dvec (feedforward) ----
    q_next = -x[..., t.stage_offset(N - 1) :]  # [..., nx, m_leaf]
    dvecs = [None] * (N - 1)
    for st in range(N - 2, -1, -1):
        m = t.stage_size(st)
        sl = t.stage_slice(st)
        qc = q_next.reshape(q_next.shape[:-1] + (m, d))  # [..., nx, m, d]
        # sum over children of B[w]' q_child
        sum_d = jnp.einsum("dxu,...xmd->...um", B, qc)
        u_st = u[..., sl]
        rhs = u_st - sum_d
        dvec = _mat(ric.Rtinv[st], rhs, "muv,...vm->...um", "uv,...vm->...um")
        dvecs[st] = dvec
        # q_i = sum_j ABK_j' (P_j B_j d_i + q_j) + K_i' (d_i - u_i) - x_i
        inner = (
            _mat(ric.PB[st], dvec, "mdxu,...um->...xmd", "dxu,...um->...xmd")
            + qc
        )
        qi = _mat(ric.ABK[st], inner, "mdxy,...xmd->...ym", "dxy,...xmd->...ym")
        qi = qi + _mat(
            ric.K[st], dvec - u_st, "mux,...um->...xm", "ux,...um->...xm"
        )
        q_next = qi - x[..., sl]

    # ---- forward sweep: x_root = x0, closed-loop rollout ----
    x_st = x0[..., None]  # [..., nx, 1]
    xs = [x_st]
    us = []
    for st in range(N - 1):
        m = t.stage_size(st)
        u_st = (
            _mat(ric.K[st], x_st, "mux,...xm->...um", "ux,...xm->...um")
            + dvecs[st]
        )
        us.append(u_st)
        x_child = _mat(
            ric.ABK[st], x_st, "mdxy,...ym->...xmd", "dxy,...ym->...xmd"
        ) + jnp.einsum("dxu,...um->...xmd", B, dvecs[st])
        x_st = x_child.reshape(x_child.shape[:-2] + (m * d,))
        xs.append(x_st)

    return jnp.concatenate(xs, axis=-1), jnp.concatenate(us, axis=-1)
