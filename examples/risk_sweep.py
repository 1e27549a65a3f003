"""Risk-measure sweep on a fixed tree (BASELINE.json config 3):
AV@R(alpha) grid + EVaR + TV + risk-neutral, branching d=3, horizon N=12.

Reports objective value, solve iterations and wall time per risk measure.
Usage: python examples/risk_sweep.py [--cpu] [--small]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true", help="N=4 quick mode")
    ap.add_argument("--nx", type=int, default=6)
    ap.add_argument("--tol", type=float, default=1e-4)
    args = ap.parse_args()

    if args.cpu:
        _os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from spock_tpu import build, risks
    from spock_tpu.models import server_heat
    from spock_tpu.solver import Solver

    N, d = (4, 3) if args.small else (12, 3)
    base = server_heat.make_spec(N=N, nx=args.nx, d=d)
    nnl = base.tree.n_nonleaf
    rng = np.random.default_rng(0)
    p = risks.rand_probvec(rng, d)
    x0 = rng.uniform(-0.5, 0.5, args.nx)

    sweep = [("risk_neutral", risks.risk_neutral(p, nnl))]
    for alpha in [0.99, 0.9, 0.5, 0.1]:
        sweep.append((f"avar[{alpha}]", risks.avar(p, alpha, nnl)))
    sweep.append(("tv[0.3]", risks.total_variation(p, 0.3, nnl)))
    sweep.append(("evar[0.5]", risks.evar(p, 0.5, nnl)))

    rows = []
    for name, risk in sweep:
        spec = dataclasses.replace(base, risk=risk)
        data, meta = build(spec, dtype=jnp.float32)
        solver = Solver(data, meta, algorithm="spock", max_iter=4000)
        res = solver.solve(x0, tol=args.tol)  # compile+run
        jax.block_until_ready(res.z)
        t0 = time.perf_counter()
        res = solver.solve(x0, tol=args.tol)
        jax.block_until_ready(res.z)
        rows.append(
            {
                "risk": name,
                "objective": round(float(res.z.s[0]), 6),
                "iters": int(res.iterations),
                "converged": bool(res.converged),
                "wall_s": round(time.perf_counter() - t0, 4),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    outdir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "output")
    _os.makedirs(outdir, exist_ok=True)
    name = "risk_sweep_n12.json" if not args.small else "risk_sweep_small.json"
    path = _os.path.join(outdir, name)
    with open(path, "w") as f:
        json.dump(
            {
                "config": {"N": N, "d": d, "nx": args.nx, "tol": args.tol,
                           "backend": jax.default_backend(),
                           "n_nodes": int(base.tree.n)},
                "rows": rows,
                "note": (
                    "BASELINE config 3: risk-neutral + AV@R grid + TV + EVaR "
                    f"on the fixed branching-{d} N={N} tree "
                    f"({base.tree.n} nodes), float32, SPOCK, cold "
                    f"solves to tol={args.tol} on the "
                    f"{jax.default_backend()} backend"
                ),
            },
            f, indent=1,
        )
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
