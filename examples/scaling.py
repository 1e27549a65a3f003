"""Horizon-scaling benchmark (counterpart of ``examples/server_heat/
scaling.jl:9-110``: nx = 50, d = 2, N = 3..15, tol = 1e-3, per-solver
cutoff).

Races the JAX engine (SPOCK + CP) against the independent baseline tiers —
the native C++ solver (SPOCK + CP, float64) and the sparse conic ADMM
reference — the role the reference fills with six JuMP solver backends, with
the same 150 s-style per-solver cutoff.  Also automates the optimal-value
cross-check the reference left commented out (``scaling.jl:76``): per
horizon, every converged solver's objective s_1 must agree with the JAX
SPOCK value.

Usage: python examples/scaling.py [--cpu] [--nx 50] [--nmax 15]
    [--cutoff 150] [--plot] [--skip-admm]
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
    ap.add_argument("--cutoff", type=float, default=150.0,
                    help="per-solver wall-time cutoff [s]; a solver that "
                    "exceeds it stops racing larger horizons (scaling.jl:57)")
    ap.add_argument("--obj-c", type=float, default=50.0,
                    help="s_1 agreement bound vs the tight-tolerance oracle, "
                    "as a multiple of the race tolerance: |s1 - s1*| <= "
                    "C * tol * (1 + |s1*|).  Solvers stop at residual tol, "
                    "not objective tol — measured objective error at "
                    "tol=1e-3 is ~10x tol, while real bugs (wrong cone, "
                    "sign flip) show O(1) gaps")
    ap.add_argument("--skip-admm", action="store_true")
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
    from spock_tpu.baselines import admm_ref, native
    from spock_tpu.models import server_heat
    from spock_tpu.solver import Solver

    rng = np.random.default_rng(0)
    rows = []
    # solvers drop out of the race once they blow the cutoff
    dropped = set()
    if args.skip_admm:
        dropped.add("admm")
    mismatches = []
    for N in range(args.nmin, args.nmax + 1):
        spec = server_heat.make_spec(N=N, nx=args.nx, d=2)
        data, meta = build(spec, dtype=dtype)
        x0_np = rng.uniform(-0.1, 0.1, meta.nx)
        x0 = jnp.asarray(x0_np, dtype)
        objs = {}

        def rec(alg, dt, iters, conv, obj):
            rows.append(
                {
                    "N": N,
                    "nodes": meta.tree.n,
                    "alg": alg,
                    "wall_s": round(dt, 4),
                    "iters": int(iters),
                    "converged": bool(conv),
                }
            )
            if conv:
                rows[-1]["objective"] = round(float(obj), 6)
                objs[alg] = float(obj)
            print(json.dumps(rows[-1]), flush=True)
            if dt > args.cutoff:
                dropped.add(alg)

        for alg in ["spock", "cp"]:
            if alg in dropped:
                continue
            solver = Solver(data, meta, algorithm=alg)
            res = solver.solve(x0, tol=args.tol)  # compile + run
            jax.block_until_ready(res.z)
            t0 = time.perf_counter()
            res = solver.solve(x0, tol=args.tol)
            jax.block_until_ready(res.z)
            rec(alg, time.perf_counter() - t0, res.iterations,
                res.converged, res.z.s[0])

        for alg, nat_alg in [("native_sp", "spock"), ("native_cp", "cp")]:
            if alg in dropped:
                continue
            nsol = native.NativeSolver(spec)
            t0 = time.perf_counter()
            out = nsol.solve(
                x0_np, tol=args.tol,
                max_iter=5000 if nat_alg == "cp" else 1000,
                warm_start=False, algorithm=nat_alg,
            )
            rec(alg, time.perf_counter() - t0, out["iterations"],
                out["converged"], out["s"][0])

        if "admm" not in dropped:
            t0 = time.perf_counter()
            # oracle-grade tolerance would be 1e-8; at the race tolerance
            # ADMM plays the role of the reference's first-order conic
            # backends (SCS/COSMO)
            out = admm_ref.solve(spec, x0_np, tol=args.tol, max_iter=100_000)
            rec("admm", time.perf_counter() - t0, out["iterations"],
                out.get("converged", True), out["s"][0])

        # ---- optimal-value cross-check (scaling.jl:76, automated) ----
        # oracle: the native f64 SuperMann solve at tight tolerance (the
        # role Mosek plays in the reference's commented check)
        try:
            t0 = time.perf_counter()
            oracle = native.NativeSolver(spec).solve(
                x0_np, tol=min(1e-6, args.tol), max_iter=20_000,
                warm_start=False, algorithm="spock",
            )
            s1_star = float(oracle["s"][0])
            rows.append({"N": N, "alg": "oracle_native_sp_1e-6",
                         "wall_s": round(time.perf_counter() - t0, 4),
                         "iters": int(oracle["iterations"]),
                         "converged": bool(oracle["converged"]),
                         "objective": round(s1_star, 8)})
            print(json.dumps(rows[-1]), flush=True)
        except Exception as e:  # oracle itself timing out is not a mismatch
            print(json.dumps({"oracle_failed": str(e)}), flush=True)
            s1_star = None
        if s1_star is not None:
            bound = args.obj_c * args.tol * (1.0 + abs(s1_star))
            for alg, val in objs.items():
                if abs(val - s1_star) > bound:
                    mismatches.append(
                        {"N": N, "alg": alg, "objective": val,
                         "oracle": s1_star, "bound": bound}
                    )
                    print(json.dumps({"OBJECTIVE_MISMATCH": mismatches[-1]}),
                          flush=True)

    outdir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "output")
    _os.makedirs(outdir, exist_ok=True)
    payload = {
        "config": {"nx": args.nx, "d": 2, "tol": args.tol,
                   "cutoff_s": args.cutoff,
                   "backend": jax.default_backend(),
                   "dtype": str(dtype.__name__ if hasattr(dtype, "__name__")
                                else dtype)},
        "rows": rows,
        "objective_cross_check": {
            "bound": "C*tol*(1+|s1*|)", "C": args.obj_c,
            "mismatches": mismatches,
        },
    }
    with open(_os.path.join(outdir, "scaling.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"wrote": "scaling.json",
                      "mismatches": len(mismatches)}), flush=True)

    if args.plot:
        from plotting import SERIES, new_axes, save

        fig, ax = new_axes(
            f"Cold-solve runtime vs horizon (server_heat nx={args.nx}, "
            f"d=2, tol={args.tol:g})",
            "horizon N",
            "wall time per solve [s]",
        )
        styles = {
            "spock": SERIES["spock"],
            "cp": SERIES["cp"],
            "native_sp": {"color": "#7b3294", "ls": "--",
                          "label": "native C++ SPOCK (f64)"},
            "native_cp": {"color": "#c2a5cf", "ls": "--",
                          "label": "native C++ CP (f64)"},
            "admm": {"color": "#008837", "ls": ":",
                     "label": "sparse conic ADMM (f64)"},
        }
        for alg, s in styles.items():
            pts = [(r["N"], r["wall_s"]) for r in rows if r["alg"] == alg]
            if not pts:
                continue
            ax.semilogy(
                [p[0] for p in pts], [p[1] for p in pts], color=s["color"],
                ls=s["ls"], lw=2, marker="o", ms=4, label=s["label"],
            )
        ax.legend(fontsize=9, frameon=False)
        print(json.dumps({"png": save(fig, "scaling.png")}))

    if mismatches:
        raise SystemExit(f"{len(mismatches)} objective mismatches")


if __name__ == "__main__":
    main()
