"""Single-solve profiling driver (counterpart of the reference's
``src/main_profiling.jl``: timed SPOCK solve on the 2-state car model,
N=10, d=2, tol=1e-3) with optional jax.profiler tracing.

Usage: python examples/profile_solve.py [--cpu] [--trace DIR]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args()

    if args.cpu:
        _os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from spock_tpu import build
    from spock_tpu.models import car
    from spock_tpu.solver import Solver
    from spock_tpu.utils import profiling

    spec = car.make_spec(N=args.horizon, d=2)
    data, meta = build(spec, dtype=jnp.float32)
    solver = Solver(data, meta, algorithm="spock")
    x0 = np.array([0.1, 0.1])

    wall = profiling.time_fn(
        lambda: jax.block_until_ready(solver.solve(x0, tol=args.tol).z)
    )
    res = solver.solve(x0, tol=args.tol)
    out = {
        "model": f"car N={args.horizon} d=2",
        "iters": int(res.iterations),
        "converged": bool(res.converged),
        "wall_s": round(wall, 5),
    }
    if args.trace:
        with profiling.trace(args.trace):
            jax.block_until_ready(solver.solve(x0, tol=args.tol).z)
        out["trace_dir"] = args.trace
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
