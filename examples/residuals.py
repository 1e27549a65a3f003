"""Residual-vs-work benchmark (counterpart of ``examples/server_heat/
residuals.jl``: nx = 5, N = 7, d = 2, tol = 1e-5): CP vs SPOCK residual
traces, with SuperMann backtracks counted as extra operator applications.

Writes CSV traces to examples/output/ and prints a summary.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nx", type=int, default=5)
    ap.add_argument("--horizon", type=int, default=7)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--plot", action="store_true",
                    help="write a residual-vs-work PNG to examples/output/")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64

    from spock_tpu import build
    from spock_tpu.algorithms import cp as cp_alg
    from spock_tpu.algorithms import supermann as sp_alg
    from spock_tpu.models import server_heat
    from spock_tpu.solver import zero_dual, zero_primal

    spec = server_heat.make_spec(N=args.horizon, nx=args.nx, d=2)
    data, meta = build(spec, dtype=dtype)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.1, 0.1, (1, meta.nx)), dtype)
    z0, v0 = zero_primal(meta, (1,), dtype), zero_dual(meta, (1,), dtype)
    tol = jnp.asarray(args.tol, dtype)

    res_cp = cp_alg.run_cp(
        data, meta, x0, z0, v0, tol=tol, max_iter=5000, record=True
    )
    res_sp = sp_alg.run_supermann(
        data, meta, x0, z0, v0, tol=tol, max_iter=1000, record=True
    )

    outdir = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(outdir, exist_ok=True)

    n_cp = int(res_cp.iterations[0])
    n_sp = int(res_sp.iterations[0])
    cp_trace = np.asarray(res_cp.residuals)[:n_cp, 0, :]  # [it, (xi1, xi2)]
    sp_trace = np.asarray(res_sp.residuals)[:n_sp, 0, :]  # [it, (xi1, xi2, bt)]

    # operator-call accounting: CP ~4 L-applications / iter; SPOCK ~8 + extra
    # candidate sweeps per backtrack (cf. residuals.jl counting L calls)
    cp_calls = 4 * np.arange(1, n_cp + 1)
    sp_calls = np.cumsum(12 + 4 * np.maximum(sp_trace[:, 2], 0))

    np.savetxt(
        os.path.join(outdir, "residuals_cp.csv"),
        np.column_stack([cp_calls, cp_trace]),
        header="op_calls,xi1,xi2",
        delimiter=",",
    )
    np.savetxt(
        os.path.join(outdir, "residuals_spock.csv"),
        np.column_stack([sp_calls, sp_trace]),
        header="op_calls,xi1,xi2,backtracks",
        delimiter=",",
    )
    png = None
    if args.plot:
        from plotting import SERIES, new_axes, save

        fig, ax = new_axes(
            f"Residual vs operator calls (server_heat nx={args.nx} "
            f"N={args.horizon}, tol={args.tol:g})",
            "operator (L / L') applications",
            "termination residual  max(ξ₁, ξ₂)",
        )
        for key, calls, trace in (
            ("cp", cp_calls, cp_trace),
            ("spock", sp_calls, sp_trace),
        ):
            s = SERIES[key]
            ax.semilogy(
                calls, trace[:, :2].max(axis=1), color=s["color"],
                ls=s["ls"], lw=2, label=s["label"],
            )
        ax.axhline(args.tol, color="0.6", lw=1, ls=":")
        ax.legend(fontsize=9, frameon=False)
        png = save(fig, "residuals.png")

    print(
        json.dumps(
            {
                "cp_iters": n_cp,
                "spock_iters": n_sp,
                "cp_final_xi": [float(res_cp.xi1[0]), float(res_cp.xi2[0])],
                "spock_final_xi": [float(res_sp.xi1[0]), float(res_sp.xi2[0])],
                "csv_dir": outdir,
                "png": png,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
