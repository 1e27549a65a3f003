"""Fused whole-iteration SuperMann step (ops/pallas_spstep) vs the XLA path.

Runs the fused kernel in Pallas interpret mode on CPU (float64) — the same
math as the XLA-composed sp_body up to reduction order, so solutions agree
to tight tolerances and iteration counts match.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spock_tpu import build, mpc
from spock_tpu.algorithms import supermann as sp_alg
from spock_tpu.models import server_heat
from spock_tpu.ops import pallas_spstep
from spock_tpu.solver import Solver, zero_dual, zero_primal

from tests.test_core_ops import rand_dual, rand_primal


def _built(N=4, nx=4):
    spec = server_heat.make_spec(N=N, nx=nx, d=2)
    data, meta = build(spec, dtype=jnp.float64)
    return spec, data, meta


def test_pack_unpack_roundtrip():
    _, data, meta = _built()
    rng = np.random.default_rng(0)
    z = rand_primal(rng, meta, batch=(3,))
    v = rand_dual(rng, meta, batch=(3,))
    trio = pallas_spstep.pack_pair(meta, z, v)
    z2, v2 = pallas_spstep.unpack_pair(meta, trio)
    for a, b in zip(
        jax.tree_util.tree_leaves((z, v)), jax.tree_util.tree_leaves((z2, v2))
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # root_u slices the same u_1
    np.testing.assert_array_equal(
        np.asarray(pallas_spstep.root_u(meta, trio)), np.asarray(z.u[:, :, 0])
    )


def test_fused_step_supported_on_headline_class():
    _, data, meta = _built()
    assert pallas_spstep.supported(meta, data)


def test_fused_iterations_match_xla_body_exactly(monkeypatch):
    """Fixed number of iterations from identical state: the fused kernel and
    the XLA-composed body are the same algorithm, so with no
    convergence-boundary effects the iterates must agree to float64
    reduction-order noise (~1e-10), across K2/fallback (cold) and K1-cached
    (warm) regimes."""
    _, data, meta = _built()
    B = 4
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    opts = sp_alg.SuperMannOpts()
    tol = jnp.asarray(1e-12)  # never triggers: all lanes stay active
    z0 = zero_primal(meta, (B,), x0.dtype)
    v0 = zero_dual(meta, (B,), x0.dtype)

    for n_it in (1, 2, 6):
        c = sp_alg.sp_init(meta, x0, z0, v0, opts)
        body = sp_alg.sp_body(data, meta, tol, opts)
        for _ in range(n_it):
            c = body(c)

        monkeypatch.setenv("SPOCK_FUSED_STEP", "1")
        cf = sp_alg.sp_init_fused(meta, x0, z0, v0, opts)
        for ph in range(n_it):
            bodyf = sp_alg.sp_body_fused(
                data, meta, tol, opts, phase=ph % 3, max_iter=10_000
            )
            cf = bodyf(cf)
        monkeypatch.delenv("SPOCK_FUSED_STEP")

        from spock_tpu.ops import pallas_spstep

        zf, vf = pallas_spstep.unpack_pair(meta, cf.zv)
        for a, b in zip(
            jax.tree_util.tree_leaves((zf, vf)),
            jax.tree_util.tree_leaves((c.z, c.v)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10,
                err_msg=f"n_it={n_it}",
            )
        np.testing.assert_allclose(
            np.asarray(cf.r_safe), np.asarray(c.r_safe), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(cf.xi1), np.asarray(c.xi1), rtol=1e-6, atol=1e-12
        )
        np.testing.assert_array_equal(
            np.asarray(cf.niter), np.asarray(c.niter)
        )


def _built_poly(N=4, nx=4):
    import dataclasses as dc

    from spock_tpu import problem

    spec = server_heat.make_spec(N=N, nx=nx, d=2)
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
    data, meta = build(spec, dtype=jnp.float64)
    assert meta.nc_nl == 2 and meta.nc_lf == 1
    return spec, data, meta


def test_fused_step_supports_polytopes_and_matches_xla(monkeypatch):
    """Round-4 coverage closure: two-sided polytope rows pack as extra
    W-class segments, so the fused-step and polytope features compose (the
    round-3 gap: a polytope headline config silently fell back to per-op
    kernels).  Same fixed-iteration exactness bar as the box-only test."""
    _, data, meta = _built_poly()
    assert pallas_spstep.supported(meta, data)
    B = 4
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    opts = sp_alg.SuperMannOpts()
    tol = jnp.asarray(1e-12)
    z0 = zero_primal(meta, (B,), x0.dtype)
    v0 = zero_dual(meta, (B,), x0.dtype)

    n_it = 5
    c = sp_alg.sp_init(meta, x0, z0, v0, opts)
    body = sp_alg.sp_body(data, meta, tol, opts)
    for _ in range(n_it):
        c = body(c)

    monkeypatch.setenv("SPOCK_FUSED_STEP", "1")
    cf = sp_alg.sp_init_fused(meta, x0, z0, v0, opts)
    for ph in range(n_it):
        bodyf = sp_alg.sp_body_fused(
            data, meta, tol, opts, phase=ph % 3, max_iter=10_000
        )
        cf = bodyf(cf)

    zf, vf = pallas_spstep.unpack_pair(meta, cf.zv)
    assert vf.pnl is not None and vf.plf is not None
    for a, b in zip(
        jax.tree_util.tree_leaves((zf, vf)),
        jax.tree_util.tree_leaves((c.z, c.v)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10
        )
    np.testing.assert_array_equal(np.asarray(cf.niter), np.asarray(c.niter))


def test_fused_step_supports_nonuniform_risk_and_matches_xla(monkeypatch):
    """Per-node risk data on the fused-step kernel (same closure as the
    sweep megakernel's nonuniform support)."""
    import dataclasses as dc

    from spock_tpu import risks

    spec = server_heat.make_spec(N=4, nx=4, d=2)
    _, meta0 = build(spec, dtype=jnp.float64)
    rng = np.random.default_rng(13)
    n_nl = meta0.tree.n_nonleaf
    ps = rng.dirichlet(np.ones(2), size=n_nl)
    alphas = rng.uniform(0.7, 0.99, n_nl)
    spec = dc.replace(spec, risk=risks.avar_nonuniform(ps, alphas))
    data, meta = build(spec, dtype=jnp.float64)
    assert data.b.shape[0] == n_nl
    assert pallas_spstep.supported(meta, data)

    B = 3
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    opts = sp_alg.SuperMannOpts()
    tol = jnp.asarray(1e-12)
    z0 = zero_primal(meta, (B,), x0.dtype)
    v0 = zero_dual(meta, (B,), x0.dtype)

    n_it = 4
    c = sp_alg.sp_init(meta, x0, z0, v0, opts)
    body = sp_alg.sp_body(data, meta, tol, opts)
    for _ in range(n_it):
        c = body(c)

    monkeypatch.setenv("SPOCK_FUSED_STEP", "1")
    cf = sp_alg.sp_init_fused(meta, x0, z0, v0, opts)
    for ph in range(n_it):
        bodyf = sp_alg.sp_body_fused(
            data, meta, tol, opts, phase=ph % 3, max_iter=10_000
        )
        cf = bodyf(cf)
    zf, vf = pallas_spstep.unpack_pair(meta, cf.zv)
    for a, b in zip(
        jax.tree_util.tree_leaves((zf, vf)),
        jax.tree_util.tree_leaves((c.z, c.v)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10
        )
    np.testing.assert_array_equal(np.asarray(cf.niter), np.asarray(c.niter))


def test_fused_solve_matches_xla_path(monkeypatch):
    _, data, meta = _built()
    B = 4
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    tol = jnp.asarray(1e-5)
    z0 = zero_primal(meta, (B,), x0.dtype)
    v0 = zero_dual(meta, (B,), x0.dtype)

    res_xla = sp_alg.run_supermann(
        data, meta, x0, z0, v0, tol=tol, max_iter=600
    )
    assert not sp_alg.use_fused_step(data, meta, sp_alg.SuperMannOpts())

    monkeypatch.setenv("SPOCK_FUSED_STEP", "1")
    assert sp_alg.use_fused_step(data, meta, sp_alg.SuperMannOpts())
    res_f = sp_alg.run_supermann(
        data, meta, x0, z0, v0, tol=tol, max_iter=600
    )
    assert bool(jnp.all(res_f.status == 0))
    assert bool(jnp.all(res_xla.status == 0))
    # same algorithm, different reduction order: K1-boundary flips drift the
    # iteration counts a few % over ~300 iterations, but both converge to
    # the same solution within tolerance
    it_f = np.asarray(res_f.iterations).astype(float)
    it_x = np.asarray(res_xla.iterations).astype(float)
    assert np.all(np.abs(it_f - it_x) <= 0.05 * it_x + 3)
    np.testing.assert_allclose(
        np.asarray(res_f.z.u), np.asarray(res_xla.z.u), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_f.z.s[:, 0]), np.asarray(res_xla.z.s[:, 0]), atol=1e-4
    )


def test_fused_warm_start_and_farm_match_xla(monkeypatch):
    _, data, meta = _built()
    B, T = 3, 3
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    ws = jnp.asarray(rng.integers(0, meta.tree.d, (T, B)))
    res_xla = mpc.simulate_async(data, meta, x0, ws, tol=1e-5, n_steps=T)

    monkeypatch.setenv("SPOCK_FUSED_STEP", "1")
    res_f = mpc.simulate_async(data, meta, x0, ws, tol=1e-5, n_steps=T)
    assert bool(jnp.all(res_f.steps_done == T))
    np.testing.assert_allclose(
        np.asarray(res_f.us), np.asarray(res_xla.us), atol=1e-4
    )
    it_f = np.asarray(res_f.iters_per_step).astype(float)
    it_x = np.asarray(res_xla.iters_per_step).astype(float)
    assert abs(it_f.sum() - it_x.sum()) <= 0.05 * it_x.sum() + 3


def test_fused_record_mode(monkeypatch):
    _, data, meta = _built()
    B = 2
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    monkeypatch.setenv("SPOCK_FUSED_STEP", "1")
    z0 = zero_primal(meta, (B,), x0.dtype)
    v0 = zero_dual(meta, (B,), x0.dtype)
    res = sp_alg.run_supermann(
        data, meta, x0, z0, v0, tol=jnp.asarray(1e-4), max_iter=300,
        record=True,
    )
    assert bool(jnp.all(res.status == 0))
    tr = np.asarray(res.residuals)
    it0 = int(res.iterations[0])
    # recorded xi1 at the last iteration of lane 0 is below tolerance-ish
    assert np.isfinite(tr[: it0, 0]).all()


def test_fused_backtracking_retrial_path_matches_xla(monkeypatch):
    """The packed kernel's tau-retrial backtracking (the TPU path: rejected
    lanes re-invoke the SAME kernel at shrunken per-lane tau) against the
    XLA-composed geometric backtracking, on a tiny problem with acceptance
    rigged so every lane backtracks to the CP fallback: c1 ~ 0 kills K1 and
    sigma_k2 huge kills K2 (sp.jl:371 semantics)."""
    from spock_tpu.models import car

    spec = car.make_spec(N=3, d=2)
    data, meta = build(spec, dtype=jnp.float64)
    B = 2
    rng = np.random.default_rng(23)
    x0 = jnp.asarray(rng.uniform(-0.3, 0.3, (B, meta.nx)))
    opts = sp_alg.SuperMannOpts(c1=1e-9, sigma_k2=1e9, max_backtracks=3)
    tol = jnp.asarray(1e-12)
    z0 = zero_primal(meta, (B,), x0.dtype)
    v0 = zero_dual(meta, (B,), x0.dtype)

    n_it = 2
    c = sp_alg.sp_init(meta, x0, z0, v0, opts)
    body = sp_alg.sp_body(data, meta, tol, opts)
    for _ in range(n_it):
        c = body(c)

    monkeypatch.setenv("SPOCK_FUSED_STEP", "1")
    monkeypatch.setenv("SPOCK_FORCE_RETRIAL", "1")
    cf = sp_alg.sp_init_fused(meta, x0, z0, v0, opts)
    for ph in range(n_it):
        bodyf = sp_alg.sp_body_fused(
            data, meta, tol, opts, phase=ph % 3, max_iter=10_000
        )
        cf = bodyf(cf)

    zf, vf = pallas_spstep.unpack_pair(meta, cf.zv)
    for a, b in zip(
        jax.tree_util.tree_leaves((zf, vf)),
        jax.tree_util.tree_leaves((c.z, c.v)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10
        )
    np.testing.assert_allclose(
        np.asarray(cf.xi1), np.asarray(c.xi1), rtol=1e-6, atol=1e-12
    )
    np.testing.assert_array_equal(np.asarray(cf.niter), np.asarray(c.niter))
