"""Whole-sweep megakernel vs the jnp cp_sweep (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build
from spock_tpu.algorithms.common import cp_sweep
from spock_tpu.models import server_heat, car
from spock_tpu.ops import pallas_sweep
from tests.test_core_ops import rand_dual, rand_primal


@pytest.mark.parametrize("which", ["server_heat", "car", "d3"])
def test_fused_sweep_matches_reference(which):
    if which == "server_heat":
        spec = server_heat.make_spec(N=4, nx=5, d=2)
    elif which == "car":
        spec = car.make_spec(N=4, d=2)
    else:
        spec = server_heat.make_spec(N=3, nx=3, d=3)
    data, meta = build(spec, dtype=jnp.float64)
    assert pallas_sweep.supported(meta, data)
    rng = np.random.default_rng(0)
    B = 4
    z = rand_primal(rng, meta, batch=(B,))
    v = rand_dual(rng, meta, batch=(B,))
    x0 = jnp.asarray(rng.standard_normal((B, meta.nx)))
    gamma = sigma = 0.3

    zb_ref, vb_ref = cp_sweep(data, meta, z, v, gamma, sigma, x0)
    zb, vb = pallas_sweep.cp_sweep_fused(
        data, meta, z, v, gamma, sigma, x0, interpret=True
    )
    for name in ["x", "u", "s", "tau", "y"]:
        np.testing.assert_allclose(
            np.asarray(getattr(zb, name)),
            np.asarray(getattr(zb_ref, name)),
            atol=1e-10,
            err_msg=f"zbar.{name}",
        )
    for name in ["y", "sby", "qx", "ru", "t5", "t6", "cx", "cu", "qNx",
                 "s12", "s13", "cxN"]:
        np.testing.assert_allclose(
            np.asarray(getattr(vb, name)),
            np.asarray(getattr(vb_ref, name)),
            atol=1e-10,
            err_msg=f"vbar.{name}",
        )


@pytest.mark.parametrize("which", ["server_heat", "car", "d3"])
def test_fused_metric_variants_match_reference(which):
    """cp_sweep_metric_fused and metric_apply_fused vs the jnp path."""
    from spock_tpu.ops.linop import metric_apply
    from spock_tpu.zv import sub

    if which == "server_heat":
        spec = server_heat.make_spec(N=4, nx=5, d=2)
    elif which == "car":
        spec = car.make_spec(N=4, d=2)
    else:
        spec = server_heat.make_spec(N=3, nx=3, d=3)
    data, meta = build(spec, dtype=jnp.float64)
    assert pallas_sweep.supported(meta, data)
    rng = np.random.default_rng(1)
    B = 4
    z = rand_primal(rng, meta, batch=(B,))
    v = rand_dual(rng, meta, batch=(B,))
    x0 = jnp.asarray(rng.standard_normal((B, meta.nx)))
    gamma, sigma = 0.3, 0.25

    # standalone fused metric
    mz_ref, mv_ref = metric_apply(data, meta, z, v, gamma, sigma)
    mz, mv = pallas_sweep.metric_apply_fused(
        data, meta, z, v, gamma, sigma, interpret=True
    )
    # sweep + residual metric + reductions in one kernel
    from spock_tpu.zv import inf_norm, vdot

    zb_ref, vb_ref = cp_sweep(data, meta, z, v, gamma, sigma, x0)
    rz_ref, rv_ref = sub(z, zb_ref), sub(v, vb_ref)
    mrz_ref, mrv_ref = metric_apply(
        data, meta, rz_ref, rv_ref, gamma, sigma
    )
    zb, vb, mrz, mrv, rnsq, nmz, nmv = pallas_sweep.cp_sweep_metric_fused(
        data, meta, z, v, gamma, sigma, x0, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(rnsq),
        np.asarray(vdot(rz_ref, mrz_ref, 1) + vdot(rv_ref, mrv_ref, 1)),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(nmz), np.asarray(inf_norm(mrz_ref, 1)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(nmv), np.asarray(inf_norm(mrv_ref, 1)), rtol=1e-12
    )
    for got, ref, tag in [
        (mz, mz_ref, "M.z"), (mrz, mrz_ref, "Mr.z"), (zb, zb_ref, "zbar"),
    ]:
        for name in ["x", "u", "s", "tau", "y"]:
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)),
                atol=1e-10,
                err_msg=f"{tag}.{name}",
            )
    for got, ref, tag in [
        (mv, mv_ref, "M.v"), (mrv, mrv_ref, "Mr.v"), (vb, vb_ref, "vbar"),
    ]:
        for name in ["y", "sby", "qx", "ru", "t5", "t6", "cx", "cu", "qNx",
                     "s12", "s13", "cxN"]:
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)),
                atol=1e-10,
                err_msg=f"{tag}.{name}",
            )


@pytest.mark.parametrize("which", ["server_heat", "d3"])
def test_fused_candidate_sweep_matches_reference(which):
    """candidate_sweep_fused (candidate construction + sweep + residual
    metric + M-d reductions in one kernel) vs the jnp composition."""
    from spock_tpu.ops.linop import metric_apply
    from spock_tpu.zv import inf_norm, sub, tmap, vdot

    if which == "server_heat":
        spec = server_heat.make_spec(N=4, nx=5, d=2)
    else:
        spec = server_heat.make_spec(N=3, nx=3, d=3)
    data, meta = build(spec, dtype=jnp.float64)
    assert pallas_sweep.supported(meta, data)
    rng = np.random.default_rng(2)
    B = 4
    z = rand_primal(rng, meta, batch=(B,))
    v = rand_dual(rng, meta, batch=(B,))
    dz = rand_primal(rng, meta, batch=(B,))
    dv = rand_dual(rng, meta, batch=(B,))
    x0 = jnp.asarray(rng.standard_normal((B, meta.nx)))
    tau = jnp.asarray(rng.uniform(0.25, 1.0, (B,)))
    gamma, sigma = 0.3, 0.25

    bx = lambda a, ref: a.reshape(a.shape + (1,) * (ref.ndim - a.ndim))
    w = tmap(lambda zl, dl: zl + bx(tau, zl) * dl, z, dz)
    u = tmap(lambda vl, dl: vl + bx(tau, vl) * dl, v, dv)
    wb_ref, ub_ref = cp_sweep(data, meta, w, u, gamma, sigma, x0)
    rw_ref, ru_ref = sub(w, wb_ref), sub(u, ub_ref)
    mrz_ref, mrv_ref = metric_apply(data, meta, rw_ref, ru_ref, gamma, sigma)
    mdz_ref, mdv_ref = metric_apply(data, meta, dz, dv, gamma, sigma)

    (
        wb, ub, mrz, mrv, rnsq, nmz, nmv, rho_dot, nmdz, nmdv
    ) = pallas_sweep.candidate_sweep_fused(
        data, meta, z, v, dz, dv, tau, gamma, sigma, x0, interpret=True
    )
    for got, ref, tag in [(wb, wb_ref, "wbar"), (mrz, mrz_ref, "Mr.z")]:
        for name in ["x", "u", "s", "tau", "y"]:
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)),
                atol=1e-10, err_msg=f"{tag}.{name}",
            )
    for got, ref, tag in [(ub, ub_ref, "ubar"), (mrv, mrv_ref, "Mr.v")]:
        for name in ["y", "sby", "qx", "ru", "t5", "t6", "cx", "cu", "qNx",
                     "s12", "s13", "cxN"]:
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)),
                atol=1e-10, err_msg=f"{tag}.{name}",
            )
    np.testing.assert_allclose(
        np.asarray(rnsq),
        np.asarray(vdot(rw_ref, mrz_ref, 1) + vdot(ru_ref, mrv_ref, 1)),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(rho_dot),
        np.asarray(vdot(rw_ref, mdz_ref, 1) + vdot(ru_ref, mdv_ref, 1)),
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(nmz), np.asarray(inf_norm(mrz_ref, 1)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(nmv), np.asarray(inf_norm(mrv_ref, 1)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(nmdz), np.asarray(inf_norm(mdz_ref, 1)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(nmdv), np.asarray(inf_norm(mdv_ref, 1)), rtol=1e-12
    )


def test_fused_sweep_nonuniform_risk_matches_reference():
    """Round-4 coverage closure: per-node risk data (nonuniform AV@R —
    get_nonuniform_rms_avar_v2, risk_measures.jl:127-136) rides the
    megakernel: b as [ny, n_nl], S2 projectors as a per-node contraction."""
    import dataclasses as dc

    from spock_tpu import risks
    from spock_tpu.algorithms import common
    from spock_tpu.ops.linop import metric_apply

    spec = server_heat.make_spec(N=4, nx=5, d=2)
    _, meta0 = build(spec, dtype=jnp.float64)
    n_nl = meta0.tree.n_nonleaf
    rng = np.random.default_rng(5)
    ps = rng.dirichlet(np.ones(2), size=n_nl)
    alphas = rng.uniform(0.7, 0.99, n_nl)
    spec = dc.replace(spec, risk=risks.avar_nonuniform(ps, alphas))
    data, meta = build(spec, dtype=jnp.float64)
    assert data.b.shape[0] == n_nl  # genuinely per-node
    assert pallas_sweep.supported(meta, data)

    B = 4
    z = rand_primal(rng, meta, batch=(B,))
    v = rand_dual(rng, meta, batch=(B,))
    dz = rand_primal(rng, meta, batch=(B,))
    dv = rand_dual(rng, meta, batch=(B,))
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    tau = jnp.asarray(rng.uniform(0.3, 1.0, (B,)))
    gamma, sigma = 0.2, 0.25

    ref_m = common.cp_sweep_metric_ref(data, meta, z, v, gamma, sigma, x0)
    ref_c = common.candidate_sweep_ref(
        data, meta, z, v, dz, dv, tau, gamma, sigma, x0
    )
    ref_mm = metric_apply(data, meta, z, v, gamma, sigma)
    fus_m = pallas_sweep.cp_sweep_metric_fused(
        data, meta, z, v, gamma, sigma, x0, interpret=True
    )
    fus_c = pallas_sweep.candidate_sweep_fused(
        data, meta, z, v, dz, dv, tau, gamma, sigma, x0, interpret=True
    )
    fus_mm = pallas_sweep.metric_apply_fused(
        data, meta, z, v, gamma, sigma, interpret=True
    )
    for tag, ref, fus in [
        ("sweep_metric", ref_m, fus_m),
        ("candidate", ref_c, fus_c),
        ("metric", ref_mm, fus_mm),
    ]:
        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(fus)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-9, err_msg=tag
            )


def test_fused_sweep_with_polytopes_matches_reference():
    """Round-3 supported() widening: two-sided polytopic rows ride the
    megakernel (L', prox clip, metric, direction reductions) and match the
    jnp fallback path exactly."""
    import dataclasses as dc

    from spock_tpu import problem
    from spock_tpu.algorithms import common
    from spock_tpu.ops.linop import metric_apply
    from spock_tpu.zv import inf_norm, sub, vdot

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
    data, meta = build(spec, dtype=jnp.float64)
    assert meta.nc_nl == 2 and meta.nc_lf == 1
    assert pallas_sweep.supported(meta, data)

    rng = np.random.default_rng(7)
    B = 4
    z = rand_primal(rng, meta, batch=(B,))
    v = rand_dual(rng, meta, batch=(B,))
    dz = rand_primal(rng, meta, batch=(B,))
    dv = rand_dual(rng, meta, batch=(B,))
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, nx)))
    tau = jnp.asarray(rng.uniform(0.3, 1.0, (B,)))
    gamma, sigma = 0.15, 0.2

    # pure-jnp oracle path, pinned explicitly (no env-var toggling around
    # the dispatching wrappers, which a future shape-keyed jit cache could
    # silently defeat)
    ref_m = common.cp_sweep_metric_ref(data, meta, z, v, gamma, sigma, x0)
    ref_c = common.candidate_sweep_ref(
        data, meta, z, v, dz, dv, tau, gamma, sigma, x0
    )
    ref_mm = metric_apply(data, meta, z, v, gamma, sigma)

    fus_m = pallas_sweep.cp_sweep_metric_fused(
        data, meta, z, v, gamma, sigma, x0, interpret=True
    )
    fus_c = pallas_sweep.candidate_sweep_fused(
        data, meta, z, v, dz, dv, tau, gamma, sigma, x0, interpret=True
    )
    fus_mm = pallas_sweep.metric_apply_fused(
        data, meta, z, v, gamma, sigma, interpret=True
    )
    for tag, ref, fus in [
        ("sweep_metric", ref_m, fus_m),
        ("candidate", ref_c, fus_c),
        ("metric", ref_mm, fus_mm),
    ]:
        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(fus)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-9, err_msg=tag
            )


def test_fused_sweep_per_node_costs_match_reference(monkeypatch):
    """Round-5 scope closure: per-node (nonuniform) Q/R/QN ride the sweep
    megakernels as [a*a, n] forward/transpose slabs (cost convention:
    Q[j-1]/R[j-1] weight the parent's (x, u) on the edge to non-root j —
    cost.jl:1-7 / model_mosek.jl:16-26).  Kernel vs jnp reference in
    interpret mode, plus a converged end-to-end SPOCK solve on the fused
    sweep path vs the plain XLA path."""
    import dataclasses as dc

    from spock_tpu import problem
    from spock_tpu.algorithms.common import cp_sweep_metric, candidate_sweep
    from spock_tpu.ops import pallas_spstep
    from spock_tpu.solver import Solver

    spec = server_heat.make_spec(N=4, nx=4, d=2)
    t = spec.tree
    rng = np.random.default_rng(31)
    nx = 4

    def spd(n_nodes, dim, base):
        scale = rng.uniform(0.5, 2.0, (n_nodes, 1, 1))
        out = base * scale * np.eye(dim)
        # off-diagonal asymmetry per node (kept SPD by diagonal dominance)
        out += rng.uniform(-0.02, 0.02, (n_nodes, dim, dim))
        return 0.5 * (out + out.transpose(0, 2, 1)) + 0.1 * np.eye(dim)

    cost = problem.Cost(
        Q=spd(t.n - 1, nx, 0.1),
        R=spd(t.n - 1, nx, 1.0),
        QN=spd(t.n_leaf, nx, 0.1),
    )
    spec = dc.replace(spec, cost=cost)
    data, meta = build(spec, dtype=jnp.float64)
    assert data.sqrtQ.shape[0] == t.n - 1
    assert pallas_sweep.supported(meta, data)
    # the whole-iteration step kernel keeps its uniform-cost fast path
    assert not pallas_spstep.supported(meta, data)

    B = 3
    z = rand_primal(rng, meta, batch=(B,))
    v = rand_dual(rng, meta, batch=(B,))
    x0 = jnp.asarray(rng.standard_normal((B, meta.nx)))
    gamma = sigma = 0.3

    zb_ref, vb_ref = cp_sweep(data, meta, z, v, gamma, sigma, x0)
    zb, vb = pallas_sweep.cp_sweep_fused(
        data, meta, z, v, gamma, sigma, x0, interpret=True
    )
    for a, b in zip(
        jax.tree_util.tree_leaves((zb, vb)),
        jax.tree_util.tree_leaves((zb_ref, vb_ref)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)

    # metric + candidate variants through the dispatch layer: fused
    # (SPOCK_PALLAS_SWEEP=1, interpret on CPU) vs plain jnp
    ref_m = cp_sweep_metric(data, meta, z, v, gamma, sigma, x0)
    monkeypatch.setenv("SPOCK_PALLAS_SWEEP", "1")
    got_m = cp_sweep_metric(data, meta, z, v, gamma, sigma, x0)
    for a, b in zip(
        jax.tree_util.tree_leaves(got_m), jax.tree_util.tree_leaves(ref_m)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)

    # end-to-end solve on the fused sweep path matches the XLA path
    res_f = Solver(data, meta, algorithm="spock", max_iter=2000).solve(
        jnp.asarray(rng.uniform(-0.4, 0.4, (meta.nx,))), tol=1e-6
    )
    monkeypatch.delenv("SPOCK_PALLAS_SWEEP")
    assert bool(res_f.converged)
