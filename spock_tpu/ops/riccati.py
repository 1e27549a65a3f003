"""Online dynamics projection (S1) via stage-batched Riccati sweeps.

Counterpart of ``projection_S1!`` (``/root/reference/src/model_dynamics/
implicit_l.jl:559-686``): the exact Euclidean projection of a stacked (x, u)
onto the affine subspace {x_root = x0, x_j = A_wj x_i + B_wj u_i}.

The reference walks the tree node-by-node with pointer chasing; here each
stage is one batched tensor op (all d^t nodes of the stage at once), and the
N-stage backward/forward recursions are unrolled at trace time (N is small
and static).  Layout is feature-major ([..., nx, nodes]).

Child grouping exploits the sibling-major stage order (see tree.py): the
k-th children of all stage-t nodes are the contiguous block
``[k*m, (k+1)*m)`` of stage t+1 — plain static slices, unrolled over the
small static d.

The offline factors (:class:`spock_tpu.problem.RiccatiData`) are
stage-uniform (node dim 1); per-sibling matrices are indexed statically.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..problem import ProblemData, ProblemMeta


def _interleave(blocks, d):
    """blocks: list of d per-sibling arrays [..., m] -> the sibling-major
    stage block [..., d*m] (just a concat)."""
    return jnp.concatenate(blocks, axis=-1)


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
        sl = t.stage_slice(st)
        Rt = ric.Rtinv[st][0]  # [nu, nu] (stage-uniform)
        Kt = ric.K[st][0]  # [nu, nx]
        ABKt = ric.ABK[st][0]  # [d, nx, nx]
        PBt = ric.PB[st][0]  # [d, nx, nu]
        m = t.stage_size(st)
        # children of stage-st nodes: sibling block k is q_next[..., k*m:(k+1)*m]
        qks = [q_next[..., k * m : (k + 1) * m] for k in range(d)]
        # sum over children of B[w]' q_child
        sum_d = None
        for k in range(d):
            term = jnp.einsum("xu,...xm->...um", B[k], qks[k])
            sum_d = term if sum_d is None else sum_d + term
        u_st = u[..., sl]
        dvec = jnp.einsum("uv,...vm->...um", Rt, u_st - sum_d)
        dvecs[st] = dvec
        # q_i = sum_k ABK_k' (P_k B_k d_i + q_k) + K' (d_i - u_i) - x_i
        qi = None
        for k in range(d):
            inner = jnp.einsum("xu,...um->...xm", PBt[k], dvec) + qks[k]
            term = jnp.einsum("xy,...xm->...ym", ABKt[k], inner)
            qi = term if qi is None else qi + term
        qi = qi + jnp.einsum("ux,...um->...xm", Kt, dvec - u_st)
        q_next = qi - x[..., sl]

    # ---- forward sweep: x_root = x0, closed-loop rollout ----
    x_st = x0[..., None]  # [..., nx, 1]
    xs = [x_st]
    us = []
    for st in range(N - 1):
        Kt = ric.K[st][0]
        ABKt = ric.ABK[st][0]
        u_st = jnp.einsum("ux,...xm->...um", Kt, x_st) + dvecs[st]
        us.append(u_st)
        x_children = [
            jnp.einsum("xy,...ym->...xm", ABKt[k], x_st)
            + jnp.einsum("xu,...um->...xm", B[k], dvecs[st])
            for k in range(d)
        ]
        x_st = _interleave(x_children, d)
        xs.append(x_st)

    return jnp.concatenate(xs, axis=-1), jnp.concatenate(us, axis=-1)
