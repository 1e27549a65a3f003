"""Three-tier oracle cross-check at the headline configuration.

Solves the same risk-averse OCP instances (server_heat, N=10, nx=20, d=2 —
2047 nodes, the headline bench config) with three independent code paths and
reports pairwise control/objective agreement:

1. the JAX engine (SuperMann, float32 on the default device — the chip when
   run under the axon platform, the production configuration);
2. the native C++ CP/SuperMann tier (float64, same splitting math,
   independent implementation);
3. the sparse conic ADMM oracle (float64, independent *method family*:
   explicit sparse standard form + cached LU + cone projections —
   ``baselines/admm_ref.py``, the role of the reference's Mosek/SCS
   backends, ``model_mosek.jl:133-511``).

Usage: python examples/oracle_check.py [--cpu] [--n-instances 3]
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
    ap.add_argument("--n-instances", type=int, default=2)
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args()

    if args.cpu:
        _os.environ["JAX_PLATFORMS"] = "cpu"
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from spock_tpu import build
    from spock_tpu.baselines import admm_ref
    from spock_tpu.baselines.native import NativeSolver
    from spock_tpu.models import server_heat
    from spock_tpu.solver import Solver

    spec = server_heat.make_spec(N=10, nx=20, d=2)
    data, meta = build(spec, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    K = args.n_instances
    x0 = np.asarray(rng.uniform(-0.6, 0.6, (K, meta.nx)), np.float32)

    s = Solver(data, meta, algorithm="spock")
    res = s.solve(jnp.asarray(x0), tol=args.tol)
    jax.block_until_ready(res)
    u_jax = np.asarray(res.z.u)[:, :, 0]
    obj_jax = np.asarray(res.z.s)[:, 0]

    rows = []
    for i in range(K):
        nat = NativeSolver(spec).solve(
            np.asarray(x0[i], np.float64), tol=1e-6, max_iter=50000,
            algorithm="spock", warm_start=False,
        )
        adm = admm_ref.solve(
            spec, np.asarray(x0[i], np.float64), tol=1e-8, max_iter=20000
        )
        rows.append(
            {
                "instance": i,
                "jax_converged": bool(res.status[i] == 0),
                "native_converged": bool(nat["converged"]),
                "admm_converged": bool(adm["converged"]),
                "u0_err_jax_vs_native": float(
                    np.max(np.abs(u_jax[i] - nat["u"][0]))
                ),
                "u0_err_jax_vs_admm": float(
                    np.max(np.abs(u_jax[i] - adm["u"][0]))
                ),
                "u0_err_native_vs_admm": float(
                    np.max(np.abs(nat["u"][0] - adm["u"][0]))
                ),
                "obj": {
                    "jax": float(obj_jax[i]),
                    "native": float(nat["objective"]),
                    "admm": float(adm["objective"]),
                },
            }
        )
        print(json.dumps(rows[-1]))

    worst = max(r["u0_err_native_vs_admm"] for r in rows)
    print(
        json.dumps(
            {
                "summary": "independent-oracle agreement (native vs admm)",
                "worst_u0_err": worst,
                "ok": worst < 1e-4,
            }
        )
    )


if __name__ == "__main__":
    main()
