"""Headline benchmark: warm-started server_heat MPC solves/s per chip.

Matches the driver metric in BASELINE.json: server_heat tree (nx = nu = 20,
N = 10, d = 2 — the reference's mpc_simulation.jl configuration), tolerance
eps = 1e-3, warm-started receding-horizon steps, measured in steady state.
North-star target: >= 1e3 solves/s per v5e chip (BASELINE.json "north_star");
``vs_baseline`` is reported against that target.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import os

    # Persistent compilation cache: tunnel-side compiles are slow (minutes);
    # cache them across bench runs.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from spock_tpu import build
    from spock_tpu.algorithms import supermann as sp_alg
    from spock_tpu.models import server_heat
    from spock_tpu.solver import zero_dual, zero_primal

    B = int(__import__("os").environ.get("SPOCK_BENCH_B", "512"))
    alg = __import__("os").environ.get("SPOCK_BENCH_ALG", "spock")
    N, nx, d = 10, 20, 2
    tol = 1e-3

    spec = server_heat.make_spec(N=N, nx=nx, d=d)
    data, meta = build(spec, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.6, 0.6, (B, meta.nx)), jnp.float32)
    ws = np.asarray(rng.integers(0, d, size=(64, B)))

    import functools

    from spock_tpu.algorithms import cp as cp_alg

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def mpc_step(x, z, v, w):
        if alg == "cp":
            res = cp_alg.run_cp(
                data, meta, x, z, v,
                tol=jnp.asarray(tol, jnp.float32), max_iter=5000,
            )
        else:
            res = sp_alg.run_supermann(
                data, meta, x, z, v,
                tol=jnp.asarray(tol, jnp.float32), max_iter=1000,
            )
        u0 = res.z.u[:, :, 0]
        Aw, Bw = data.A[w], data.B[w]
        x_next = jnp.einsum("bxy,by->bx", Aw, x) + jnp.einsum(
            "bxu,bu->bx", Bw, u0
        )
        return x_next, res.z, res.v, res.iterations, res.status

    z = zero_primal(meta, (B,), jnp.float32)
    v = zero_dual(meta, (B,), jnp.float32)
    x = x0

    # warm-up: compile + 3 steps so the solver is in warm-start steady state
    for t in range(3):
        x, z, v, iters, status = mpc_step(x, z, v, jnp.asarray(ws[t]))
    jax.block_until_ready(x)
    n_fail = int(jnp.sum(status != 0))

    timed_steps = 8
    t0 = time.perf_counter()
    iters_sum = 0.0
    for t in range(3, 3 + timed_steps):
        x, z, v, iters, status = mpc_step(x, z, v, jnp.asarray(ws[t]))
        iters_sum += float(iters.mean())
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0

    solves_per_s = B * timed_steps / dt
    target = 1e3  # north-star solves/s per chip
    print(
        json.dumps(
            {
                "metric": "warm_mpc_solves_per_s",
                "value": round(solves_per_s, 2),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_s / target, 4),
                "detail": {
                    "B": B,
                    "config": f"server_heat nx={nx} N={N} d={d} tol={tol} alg={alg}",
                    "mean_iters_per_solve": round(iters_sum / timed_steps, 2),
                    "unconverged_lanes_warmup": n_fail,
                    "step_time_s": round(dt / timed_steps, 4),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
