"""Restarted (modified) Broyden quasi-Newton direction with Powell damping.

Counterpart of ``restarted_broyden!`` (``/root/reference/src/model_algorithms/
qnewton_directions/restarted_broyden.jl``).  Note the reference ships this as
effectively dead code (its state fields and call site are commented out —
SURVEY.md C16); here it is a fully working direction choice
(``SuperMannOpts(direction="broyden")``).

Secant pair per iteration: s = z_k - z_{k-1}, ybar = r_k - r_{k-1} (the
reference's intended ``update_sy!`` quantities).  All inner products are in
the SuperMann metric M ("Ps" = M s), matching the reference.  History is a
fixed [B, MAX_K, K] ring that restarts (logically clears) every MAX_K
iterations, exactly like the reference's k counter (``:141-163``).

Memory note: three history buffers of MAX_K * (nz + nv) floats per lane —
prefer Anderson (window 3) for large batches; Broyden is provided for
capability parity and small/medium problems.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .common import register

THETA_BAR = 0.5  # Powell damping threshold (restarted_broyden.jl:9)


@register
@dataclasses.dataclass(frozen=True)
class BroydenState:
    S: Any  # [B, MAX_K, K] past s vectors
    St: Any  # [B, MAX_K, K] past damped stilde vectors
    Ps: Any  # [B, MAX_K, K] past M s vectors
    k: Any  # [B] int32 — per-lane history length (lanes restart independently)


def init(B: int, K: int, max_k: int, dtype) -> BroydenState:
    z = jnp.zeros((B, max_k, K), dtype)
    return BroydenState(S=z, St=z, Ps=z, k=jnp.zeros((B,), jnp.int32))


def direction(
    state: BroydenState, r_flat, s_flat, y_flat, ps_flat, max_k: int
):
    """Returns (d_flat [B, K], new_state).

    r_flat: current residual; s_flat / y_flat: secant pair; ps_flat: M s.
    """
    B, K = r_flat.shape

    d = -r_flat
    st = y_flat

    def hist_step(i, carry):
        st, d = carry
        active = (i < state.k)[:, None]  # [B, 1] per-lane history length
        Ps_i, S_i, St_i = state.Ps[:, i], state.S[:, i], state.St[:, i]
        diff = S_i - St_i
        denom = jnp.sum(Ps_i * St_i, axis=-1)
        safe = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
        dot_st = jnp.sum(Ps_i * st, axis=-1) / safe
        dot_d = jnp.sum(Ps_i * d, axis=-1) / safe
        upd_st = st + dot_st[:, None] * diff
        upd_d = d + dot_d[:, None] * diff
        st = jnp.where(active, upd_st, st)
        d = jnp.where(active, upd_d, d)
        return st, d

    st, d = jax.lax.fori_loop(0, max_k, hist_step, (st, d))

    # Powell damping (restarted_broyden.jl:101-125)
    num = jnp.sum(st * ps_flat, axis=-1)
    den = jnp.sum(s_flat * ps_flat, axis=-1)
    gamma = num / jnp.where(jnp.abs(den) > 0, den, 1.0)
    theta = jnp.where(
        jnp.abs(gamma) >= THETA_BAR,
        1.0,
        jnp.where(
            gamma == 0.0,
            1.0 - THETA_BAR,
            (1.0 - jnp.sign(gamma) * THETA_BAR) / (1.0 - gamma),
        ),
    )
    st = (1.0 - theta)[:, None] * s_flat + theta[:, None] * st

    coef_num = jnp.sum(ps_flat * d, axis=-1)
    coef_den = jnp.sum(ps_flat * st, axis=-1)
    coef = coef_num / jnp.where(jnp.abs(coef_den) > 0, coef_den, 1.0)
    d = d + coef[:, None] * (s_flat - st)

    # ring update with restart (restarted_broyden.jl:141-163): push while
    # k < MAX_K, else clear history — per lane (lanes in an async farm are at
    # different solve phases; a shared restart clock would be wrong).
    do_push = state.k < max_k  # [B]
    idx = jnp.where(do_push, state.k, 0)
    hot = (jnp.arange(max_k, dtype=idx.dtype)[None, :] == idx[:, None]) & (
        do_push[:, None]
    )  # [B, MAX_K] one-hot row selector

    def set_row(buf, row):
        return jnp.where(hot[:, :, None], row[:, None, :], buf)

    new_state = BroydenState(
        S=set_row(state.S, s_flat),
        St=set_row(state.St, st),
        Ps=set_row(state.Ps, ps_flat),
        k=jnp.where(do_push, state.k + 1, 0),
    )
    return d, new_state
