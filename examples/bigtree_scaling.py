"""Big-tree node-sharding scaling: per-iteration wall vs device count.

Runs the node-sharded solvers (CP and SuperMann, parallel/bigtree) on a
branching-3 tree with polytopic state constraints for a fixed iteration
budget at 1/2/4/8 mesh devices and reports the per-iteration wall — the
scaling evidence behind BASELINE config 4 ("large single tree ...
polytopic state constraints").

Run on the virtual CPU mesh (no multi-chip hardware needed):

    JAX_PLATFORMS=cpu JAX_ENABLE_X64=0 \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/bigtree_scaling.py

Env: SPOCK_BIGTREE_N (default 10), SPOCK_BIGTREE_ITERS (default 30).
Writes examples/output/bigtree_scaling.json.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import dataclasses
import json
import os
import time

import numpy as np


def main():
    import jax

    # virtual-mesh example: force the CPU platform regardless of the
    # environment's pinned default (the env var alone does not switch it
    # once sitecustomize has imported jax — CLAUDE.md)
    if os.environ.get("SPOCK_BIGTREE_DEVICE", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu":
            try:  # version-sensitive API: moved across jax releases
                import jax.extend.backend

                jax.extend.backend.clear_backends()
            except (ImportError, AttributeError) as e:
                raise RuntimeError(
                    "cannot re-init the JAX backend after switching "
                    f"platforms ({e}); run with JAX_PLATFORMS=cpu"
                ) from e
        assert jax.default_backend() == "cpu", jax.default_backend()

    import jax.numpy as jnp

    from spock_tpu import build, problem
    from spock_tpu.algorithms import supermann as sp_alg
    from spock_tpu.models import server_heat
    from spock_tpu.parallel import bigtree, mesh as pmesh

    N = int(os.environ.get("SPOCK_BIGTREE_N", "10"))
    iters = int(os.environ.get("SPOCK_BIGTREE_ITERS", "30"))
    nx, d = 4, 3
    dtype = jnp.float32

    spec = server_heat.make_spec(N=N, nx=nx, d=d)
    Gx = np.ones((1, nx))
    poly = problem.Polytope(
        Gx=Gx, Gu=np.zeros((1, nx)), lo=np.array([-2.0]), hi=np.array([2.0]),
        GxN=Gx, loN=np.array([-2.0]), hiN=np.array([2.0]),
    )
    spec = dataclasses.replace(spec, polytope=poly)
    data, meta = build(spec, dtype=dtype)
    x0 = jnp.asarray([[0.3, -0.2, 0.1, 0.05][:nx]], dtype)
    print(
        f"tree: N={N} d={d} n={meta.tree.n} nodes, polytope rows "
        f"nc_nl={meta.nc_nl} nc_lf={meta.nc_lf}; devices available: "
        f"{jax.device_count()}",
        flush=True,
    )

    rows = []
    ndevs_env = os.environ.get("SPOCK_BIGTREE_NDEVS", "1,2,4,8")
    algos_env = os.environ.get("SPOCK_BIGTREE_ALGOS", "cp,spock").split(",")
    ndevs = [
        n for n in (int(s) for s in ndevs_env.split(","))
        if n <= jax.device_count()
    ]
    for ndev in ndevs:
        mesh = pmesh.make_mesh(ndev, axis="node")
        for algo, runner in (
            ("cp", lambda m, st: bigtree.run_cp_sharded(
                data, meta, x0, tol=jnp.asarray(0.0, dtype),
                max_iter=iters, mesh=m, stats=st,
            )),
            ("spock", lambda m, st: bigtree.run_sp_sharded(
                data, meta, x0, tol=jnp.asarray(0.0, dtype),
                max_iter=iters, mesh=m, stats=st,
                record=os.environ.get("SPOCK_BIGTREE_RECORD", "0") == "1",
            )),
        ):
            if algo not in algos_env:
                continue
            # collective accounting from the compiled program: bytes moved
            # per iteration vs the iterate footprint (the quantitative side
            # of the sharding story — measurable on a virtual mesh even
            # though shared-core wall times are not a speedup signal)
            comm = {}
            t0 = time.perf_counter()
            res, (zp, vp) = runner(mesh, comm)  # compile + run
            jax.block_until_ready(zp)
            wall = time.perf_counter() - t0
            if os.environ.get("SPOCK_BIGTREE_ONESHOT", "0") != "1":
                # re-run for compile-free timing (skipped at the largest
                # configs where a second multi-GB run doubles the wall)
                t0 = time.perf_counter()
                res, (zp, vp) = runner(mesh, None)
                jax.block_until_ready(zp)
                wall = time.perf_counter() - t0
            per_iter = wall / iters
            iterate_bytes = sum(
                a.size * a.dtype.itemsize
                for a in jax.tree_util.tree_leaves((zp, vp))
            )
            xi_trace = None
            if res.residuals is not None:
                tr = np.asarray(res.residuals)[:, 0, :2]
                xi_trace = [[round(float(a), 6) for a in r] for r in tr]
            rows.append(
                dict(ndev=ndev, algo=algo, iters=iters,
                     wall_s=round(wall, 3),
                     ms_per_iter=round(per_iter * 1e3, 2),
                     xi1=float(np.asarray(res.xi1)[0]),
                     xi2=float(np.asarray(res.xi2)[0]),
                     xi_trace_per_iter=xi_trace,
                     iterate_bytes=iterate_bytes,
                     collectives_per_iter=comm.get("count"),
                     collective_bytes_per_iter=comm.get("bytes"),
                     collective_frac_of_iterate=(
                         round(comm["bytes"] / iterate_bytes, 4)
                         if comm.get("bytes") is not None else None
                     ),
                     collectives_by_kind=comm.get("by_kind"))
            )
            print(
                f"ndev={ndev} {algo:5s}: {per_iter*1e3:8.2f} ms/iter "
                f"({iters} iters, wall {wall:.2f}s); collectives/iter: "
                f"{comm.get('count')} moving {comm.get('bytes', 0)/1e6:.2f} "
                f"MB (= {comm.get('bytes', 0)/max(iterate_bytes,1):.3f}x "
                f"iterate)",
                flush=True,
            )

    out = dict(
        config=dict(N=N, d=d, nx=nx, n=meta.tree.n, iters=iters,
                    dtype=str(dtype.__name__), backend=jax.default_backend()),
        rows=rows,
    )
    os.makedirs(os.path.join(os.path.dirname(__file__), "output"),
                exist_ok=True)
    path = os.path.join(
        os.path.dirname(__file__), "output",
        os.environ.get("SPOCK_BIGTREE_OUT", "bigtree_scaling.json"),
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
