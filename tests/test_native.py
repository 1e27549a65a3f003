"""Native C++ CPU solver: parity with the JAX engine and the scipy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build
from spock_tpu.baselines.native import NativeSolver
from spock_tpu.models import car, server_heat
from spock_tpu.solver import Solver


@pytest.mark.parametrize("model", ["car", "server_heat"])
def test_native_matches_jax(model):
    if model == "car":
        spec = car.make_spec(N=3, d=2)
        x0 = np.array([0.1, 0.1])
    else:
        spec = server_heat.make_spec(N=4, nx=4, d=2)
        x0 = np.array([0.4, -0.3, 0.5, 0.2])

    nat = NativeSolver(spec)
    res_n = nat.solve(x0, tol=1e-6, max_iter=20000)
    assert res_n["converged"]

    data, meta = build(spec, dtype=jnp.float64)
    res_j = Solver(data, meta, algorithm="cp", max_iter=20000).solve(
        x0, tol=1e-6
    )
    assert bool(res_j.converged)
    np.testing.assert_allclose(
        res_n["u"][0], np.asarray(res_j.z.u)[:, 0], atol=2e-4
    )
    np.testing.assert_allclose(
        res_n["objective"], float(res_j.z.s[0]), atol=2e-4
    )
    # L_sq estimates agree
    np.testing.assert_allclose(nat.L_sq, float(data.L_sq), rtol=0.05)


def test_native_warm_start():
    spec = car.make_spec(N=3, d=2)
    nat = NativeSolver(spec)
    r1 = nat.solve(np.array([0.1, 0.1]), tol=1e-4)
    r2 = nat.solve(np.array([0.11, 0.1]), tol=1e-4)  # warm from r1
    nat2 = NativeSolver(spec)
    r2_cold = nat2.solve(np.array([0.11, 0.1]), tol=1e-4)
    assert r2["iterations"] <= r2_cold["iterations"]


def test_native_supermann():
    """Native SuperMann+Anderson converges faster than native CP and matches
    the same solution."""
    spec = server_heat.make_spec(N=4, nx=4, d=2)
    x0 = np.array([0.4, -0.3, 0.5, 0.2])
    n1 = NativeSolver(spec)
    r_cp = n1.solve(x0, tol=1e-6, max_iter=30000, algorithm="cp")
    n2 = NativeSolver(spec)
    r_sp = n2.solve(x0, tol=1e-6, max_iter=30000, algorithm="spock")
    assert r_cp["converged"] and r_sp["converged"]
    assert r_sp["iterations"] < r_cp["iterations"]
    np.testing.assert_allclose(r_sp["u"][0], r_cp["u"][0], atol=3e-4)


def test_native_polytope_matches_jax():
    """Round-5 scope closure: two-sided polytopic constraints in the C++
    oracle (role model: model_mosek.jl:46-131 covers every constraint the
    reference has)."""
    import dataclasses as dc

    from spock_tpu import problem

    spec = server_heat.make_spec(N=4, nx=4, d=2)
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
    x0 = np.array([0.4, -0.3, 0.5, 0.2])

    nat = NativeSolver(spec)
    res_n = nat.solve(x0, tol=1e-6, max_iter=30000, algorithm="spock")
    assert res_n["converged"]

    data, meta = build(spec, dtype=jnp.float64)
    assert float(data.L_sq) == pytest.approx(nat.L_sq, rel=0.05)
    res_j = Solver(data, meta, algorithm="spock", max_iter=20000).solve(
        x0, tol=1e-6
    )
    assert bool(res_j.converged)
    np.testing.assert_allclose(
        res_n["u"][0], np.asarray(res_j.z.u)[:, 0], atol=2e-4
    )
    np.testing.assert_allclose(
        res_n["objective"], float(res_j.z.s[0]), atol=2e-4
    )


def test_native_nonuniform_risk_matches_jax():
    """Round-5 scope closure: per-node AV@R data in the C++ oracle
    (risk_measures.jl:127-136 nonuniform constructor)."""
    import dataclasses as dc

    from spock_tpu import risks

    spec = server_heat.make_spec(N=4, nx=4, d=2)
    _, meta0 = build(spec, dtype=jnp.float64)
    rng = np.random.default_rng(17)
    n_nl = meta0.tree.n_nonleaf
    ps = rng.dirichlet(np.ones(2), size=n_nl)
    alphas = rng.uniform(0.7, 0.99, n_nl)
    spec = dc.replace(spec, risk=risks.avar_nonuniform(ps, alphas))
    x0 = np.array([0.4, -0.3, 0.5, 0.2])

    nat = NativeSolver(spec)
    assert nat.risk_per_node == 1
    res_n = nat.solve(x0, tol=1e-6, max_iter=30000, algorithm="spock")
    assert res_n["converged"]

    data, meta = build(spec, dtype=jnp.float64)
    res_j = Solver(data, meta, algorithm="spock", max_iter=20000).solve(
        x0, tol=1e-6
    )
    assert bool(res_j.converged)
    np.testing.assert_allclose(
        res_n["u"][0], np.asarray(res_j.z.u)[:, 0], atol=2e-4
    )
    np.testing.assert_allclose(
        res_n["objective"], float(res_j.z.s[0]), atol=2e-4
    )


def test_native_per_dim_box_bounds():
    """Per-dimension box bounds (the old ABI collapsed them to scalars)."""
    import dataclasses as dc

    from spock_tpu import problem

    spec = server_heat.make_spec(N=3, nx=3, d=2)
    box = problem.Box(
        x_min=np.array([-0.2, -1.0, -1.0]),
        x_max=np.array([0.2, 1.0, 1.0]),
        u_min=np.array([-1.5, -0.1, -1.5]),
        u_max=np.array([1.5, 0.1, 1.5]),
    )
    spec = dc.replace(spec, constraints=box)
    x0 = np.array([0.15, -0.3, 0.5])
    nat = NativeSolver(spec)
    res_n = nat.solve(x0, tol=1e-6, max_iter=30000, algorithm="spock")
    assert res_n["converged"]

    data, meta = build(spec, dtype=jnp.float64)
    res_j = Solver(data, meta, algorithm="spock", max_iter=20000).solve(
        x0, tol=1e-6
    )
    assert bool(res_j.converged)
    np.testing.assert_allclose(
        res_n["u"][0], np.asarray(res_j.z.u)[:, 0], atol=2e-4
    )
    # the tight per-dim input bound is actually respected
    assert np.all(res_n["u"][:, 1] <= 0.1 + 1e-6)
    assert np.all(res_n["u"][:, 1] >= -0.1 - 1e-6)
