"""On-chip (real Mosaic) validation of the fused Pallas paths.

Interpret-mode tests (tests/test_fused_step.py, tests/test_pallas_sweep.py)
share float semantics with the XLA path, so they cannot catch Mosaic-specific
numerics (MXU dot precision, scratch staging, per-lane cached selection).
This script runs the real kernels on the default device (the TPU chip under
the axon platform) and compares against the pure-jnp reference path compiled
for the SAME device and dtype:

1. ``sp_body_fused`` (whole-iteration SuperMann kernel) vs ``sp_body``
   (XLA-composed body, Pallas paths forced off), iterate-by-iterate from a
   common cold start — 3 iterations cover the fresh-sweep, cached-sweep and
   full-history phases.
2. ``cp_sweep_metric_fused`` / ``candidate_sweep_fused`` with two-sided
   polytope rows vs the jnp reference (the round-3 supported() widening).

Writes one JSON (default ``examples/output/chip_kernels.json``) with the
worst relative errors per check; exits nonzero when any check exceeds its
bound.

Usage: python examples/chip_kernels_check.py [--json-out PATH]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import json


def _leaf_errs(got, ref, atol_floor=1e-3):
    """Worst (abs, hybrid) error across two matching pytrees.

    hybrid = max over elements of |g - r| / (atol_floor + |r|) — the usual
    allclose shape.  The floor is 1e-3 because the iterates are O(1)-scale
    f32 data: roundoff-level absolute noise (~1e-7..1e-5) on entries that
    happen to be tiny is not a relative error in any meaningful sense
    (measured on chip: correct kernels show abs errs 2e-7..6e-5)."""
    import jax
    import numpy as np

    worst_abs, worst_hyb = 0.0, 0.0
    for g, r in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(ref)):
        g = np.asarray(g, np.float64)
        r = np.asarray(r, np.float64)
        if g.size == 0:
            continue
        d = np.abs(g - r)
        worst_abs = max(worst_abs, float(np.max(d)))
        worst_hyb = max(worst_hyb, float(np.max(d / (atol_floor + np.abs(r)))))
    return worst_abs, worst_hyb


def check_fused_step(report):
    """sp_body_fused on real Mosaic vs sp_body with Pallas forced off."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spock_tpu import build
    from spock_tpu.algorithms import supermann as sp_alg
    from spock_tpu.models import server_heat
    from spock_tpu.ops import pallas_spstep
    from spock_tpu.solver import zero_dual, zero_primal

    spec = server_heat.make_spec(N=10, nx=20, d=2)
    data, meta = build(spec, dtype=jnp.float32)
    assert pallas_spstep.supported(meta, data)
    B = 8
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-0.6, 0.6, (B, meta.nx)), jnp.float32)
    z0 = zero_primal(meta, (B,), jnp.float32)
    v0 = zero_dual(meta, (B,), jnp.float32)
    opts = sp_alg.SuperMannOpts()
    tol = jnp.asarray(1e-9, jnp.float32)  # never terminates in 3 iters

    # reference: XLA body with every Pallas dispatch off.  The dispatch env
    # vars are read at TRACE time, so each path's iterations run (eagerly
    # jitted via the first call) entirely inside its env setting.
    _os.environ["SPOCK_PALLAS_SWEEP"] = "0"
    _os.environ["SPOCK_FUSED_STEP"] = "0"
    body_ref = jax.jit(sp_alg.sp_body(data, meta, tol, opts))
    c_ref = sp_alg.sp_init(meta, x0, z0, v0, opts, max_iter=10)
    refs = []
    for _ in range(3):
        c_ref = jax.block_until_ready(body_ref(c_ref))
        refs.append(c_ref)

    _os.environ["SPOCK_PALLAS_SWEEP"] = "1"
    _os.environ["SPOCK_FUSED_STEP"] = "1"
    bodies = [
        jax.jit(
            sp_alg.sp_body_fused(data, meta, tol, opts, phase=ph, max_iter=10)
        )
        for ph in range(3)
    ]
    c_f = sp_alg.sp_init_fused(meta, x0, z0, v0, opts, max_iter=10)
    rows = []
    for it in range(3):
        c_f = jax.block_until_ready(bodies[it % 3](c_f))
        z_f, v_f = pallas_spstep.unpack_pair(meta, c_f.zv)
        za, zr = _leaf_errs((z_f, v_f), (refs[it].z, refs[it].v))
        xa, _ = _leaf_errs(
            (c_f.xi1, c_f.xi2, c_f.rnorm_c),
            (refs[it].xi1, refs[it].xi2, refs[it].rnorm_c),
        )
        rows.append(
            {"iter": it + 1, "zv_hybrid_err": zr, "zv_abs_err": za,
             "scal_abs_err": xa}
        )
    # gate on the FIRST iteration (a clean single-application comparison,
    # before SuperMann's chaotic K1/K2 branch amplification compounds
    # reduction-order noise — measured growth is ~40x/iter even between two
    # correct implementations); report the drift of the later ones.
    report["fused_step_vs_xla_body"] = {
        "iters": rows,
        "first_iter_abs_err": rows[0]["zv_abs_err"],
        "first_iter_hybrid_err": rows[0]["zv_hybrid_err"],
        # one fused application on real Mosaic matches the XLA body to f32
        # roundoff (measured 1.8e-7 abs); the round-3 failure mode (wrong
        # math on-chip) would be >1e-2 absolute
        "ok": bool(
            rows[0]["zv_abs_err"] < 1e-4 and rows[0]["zv_hybrid_err"] < 1e-2
        ),
    }


def check_polytope_sweep(report):
    """Polytope-row megakernels on real Mosaic vs the pure-jnp reference."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spock_tpu import build, problem
    from spock_tpu.algorithms import common
    from spock_tpu.models import server_heat
    from spock_tpu.ops import pallas_sweep
    from spock_tpu.solver import zero_dual, zero_primal
    from spock_tpu.zv import tmap

    nx = 4
    spec = server_heat.make_spec(N=4, nx=nx, d=2)
    Gx = np.array([[1.0, 0.5, 0.0, 0.0], [0.0, 0.0, 1.0, -0.3]])
    poly = problem.Polytope(
        Gx=Gx,
        Gu=np.array([[0.2, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.1]]),
        lo=np.array([-1.5, -1.0]),
        hi=np.array([1.5, 1.0]),
        GxN=Gx[:1],
        loN=np.array([-1.2]),
        hiN=np.array([1.2]),
    )
    spec = dc.replace(spec, polytope=poly)
    data, meta = build(spec, dtype=jnp.float32)
    assert pallas_sweep.supported(meta, data)

    B = 8
    rng = np.random.default_rng(7)

    def randlike(t):
        return tmap(
            lambda a: jnp.asarray(
                rng.standard_normal(a.shape), jnp.float32
            ),
            t,
        )

    z = randlike(zero_primal(meta, (B,), jnp.float32))
    v = randlike(zero_dual(meta, (B,), jnp.float32))
    dz = randlike(z)
    dv = randlike(v)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, nx)), jnp.float32)
    tau = jnp.asarray(rng.uniform(0.3, 1.0, (B,)), jnp.float32)
    gamma, sigma = 0.15, 0.2

    ref_m = common.cp_sweep_metric_ref(data, meta, z, v, gamma, sigma, x0)
    ref_c = common.candidate_sweep_ref(
        data, meta, z, v, dz, dv, tau, gamma, sigma, x0
    )
    interp = jax.default_backend() == "cpu"  # CPU smoke runs use interpret
    fus_m = pallas_sweep.cp_sweep_metric_fused(
        data, meta, z, v, gamma, sigma, x0, interpret=interp
    )
    fus_c = pallas_sweep.candidate_sweep_fused(
        data, meta, z, v, dz, dv, tau, gamma, sigma, x0, interpret=interp
    )
    ma, mr = _leaf_errs(fus_m, ref_m)
    ca, cr = _leaf_errs(fus_c, ref_c)
    report["polytope_sweep_vs_jnp_on_chip"] = {
        "sweep_metric_abs_err": ma,
        "sweep_metric_hybrid_err": mr,
        "candidate_abs_err": ca,
        "candidate_hybrid_err": cr,
        # single application, same device, same dtype: f32 roundoff scale
        # (the reductions accumulate O(100)-scale intermediates, so abs
        # errs of ~1e-5..1e-4 are eps-level)
        "ok": bool(ma < 1e-3 and ca < 1e-3 and mr < 1e-2 and cr < 1e-2),
    }


def check_polytope_converged_solve(report):
    """A polytope config solved TO TOLERANCE through the fused paths on the
    default device, controls/objective vs the float64 sparse-ADMM oracle
    (advisor r3: interpret-mode parity can't catch a Mosaic compile failure
    or numeric divergence of the polytope megakernel on hardware)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spock_tpu import build, problem
    from spock_tpu.algorithms import supermann as sp_alg
    from spock_tpu.baselines import admm_ref
    from spock_tpu.models import server_heat
    from spock_tpu.solver import zero_dual, zero_primal

    nx = 4
    spec = server_heat.make_spec(N=4, nx=nx, d=2)
    Gx = np.array([[1.0, 0.5, 0.0, 0.0], [0.0, 0.0, 1.0, -0.3]])
    poly = problem.Polytope(
        Gx=Gx,
        Gu=np.array([[0.2, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.1]]),
        lo=np.array([-0.6, -0.5]),
        hi=np.array([0.6, 0.5]),
        GxN=Gx[:1],
        loN=np.array([-0.55]),
        hiN=np.array([0.55]),
    )
    spec = dc.replace(spec, polytope=poly)
    data, meta = build(spec, dtype=jnp.float32)
    _os.environ["SPOCK_PALLAS_SWEEP"] = "1"
    _os.environ["SPOCK_FUSED_STEP"] = "1"
    assert sp_alg.use_fused_step(data, meta, sp_alg.SuperMannOpts())

    B = 8
    rng = np.random.default_rng(3)
    x0 = np.asarray(rng.uniform(-0.4, 0.4, (B, nx)), np.float32)
    res = sp_alg.run_supermann(
        data, meta, jnp.asarray(x0),
        zero_primal(meta, (B,), jnp.float32),
        zero_dual(meta, (B,), jnp.float32),
        tol=jnp.asarray(1e-4, jnp.float32), max_iter=2000,
    )
    jax.block_until_ready(res.status)
    conv = bool(jnp.all(res.status == 0))
    u0 = np.asarray(res.z.u)[:, :, 0]
    s1 = np.asarray(res.z.s)[:, 0]
    errs_u, errs_s = [], []
    for i in range(2):  # two oracle instances keep the run bounded
        ref = admm_ref.solve(
            spec, np.asarray(x0[i], np.float64), tol=1e-8, max_iter=20000
        )
        assert ref["converged"]
        errs_u.append(float(np.max(np.abs(u0[i] - ref["u"][0]))))
        errs_s.append(float(abs(s1[i] - ref["objective"])))
    report["polytope_converged_solve_on_chip"] = {
        "converged": conv,
        "iters": np.asarray(res.iterations).tolist(),
        "worst_u0_err_vs_admm": max(errs_u),
        "worst_obj_err_vs_admm": max(errs_s),
        "ok": bool(conv and max(errs_u) < 1e-3 and max(errs_s) < 1e-3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--json-out",
        default=_os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "output",
            "chip_kernels.json",
        ),
    )
    ap.add_argument("--skip", default="",
                    help="comma list: step,poly,polysolve")
    args = ap.parse_args()

    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    report = {"device": str(jax.devices()[0])}
    skip = set(args.skip.split(",")) if args.skip else set()
    if "step" not in skip:
        check_fused_step(report)
    if "poly" not in skip:
        check_polytope_sweep(report)
    if "polysolve" not in skip:
        check_polytope_converged_solve(report)
    ok = all(
        v.get("ok", True) for v in report.values() if isinstance(v, dict)
    )
    report["ok"] = ok
    _os.makedirs(_os.path.dirname(args.json_out), exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
