"""Horizon-scaling benchmark (counterpart of ``examples/server_heat/
scaling.jl``: nx = 50, d = 2, N = 3..15, tol = 1e-3, per-solver cutoff).

Reports wall time and iterations per horizon for SPOCK and CP.

Usage: python examples/scaling.py [--cpu] [--nx 50] [--nmax 15]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nx", type=int, default=50)
    ap.add_argument("--nmin", type=int, default=3)
    ap.add_argument("--nmax", type=int, default=15)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--plot", action="store_true",
                    help="write a runtime-vs-horizon PNG to examples/output/")
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    from spock_tpu import build
    from spock_tpu.models import server_heat
    from spock_tpu.solver import Solver

    rng = np.random.default_rng(0)
    rows = []
    for N in range(args.nmin, args.nmax + 1):
        spec = server_heat.make_spec(N=N, nx=args.nx, d=2)
        data, meta = build(spec, dtype=dtype)
        x0 = jnp.asarray(rng.uniform(-0.1, 0.1, meta.nx), dtype)
        for alg in ["spock", "cp"]:
            solver = Solver(data, meta, algorithm=alg)
            res = solver.solve(x0, tol=args.tol)  # compile + run
            jax.block_until_ready(res.z)
            t0 = time.perf_counter()
            res = solver.solve(x0, tol=args.tol)
            jax.block_until_ready(res.z)
            dt = time.perf_counter() - t0
            rows.append(
                {
                    "N": N,
                    "nodes": meta.tree.n,
                    "alg": alg,
                    "wall_s": round(dt, 4),
                    "iters": int(res.iterations),
                    "converged": bool(res.converged),
                }
            )
            print(json.dumps(rows[-1]))

    if args.plot:
        from plotting import SERIES, new_axes, save

        fig, ax = new_axes(
            f"Cold-solve runtime vs horizon (server_heat nx={args.nx}, "
            f"d=2, tol={args.tol:g})",
            "horizon N",
            "wall time per solve [s]",
        )
        for alg in ["spock", "cp"]:
            pts = [(r["N"], r["wall_s"]) for r in rows if r["alg"] == alg]
            s = SERIES[alg]
            ax.semilogy(
                [p[0] for p in pts], [p[1] for p in pts], color=s["color"],
                ls=s["ls"], lw=2, marker="o", ms=4, label=s["label"],
            )
        ax.legend(fontsize=9, frameon=False)
        print(json.dumps({"png": save(fig, "scaling.png")}))


if __name__ == "__main__":
    main()
