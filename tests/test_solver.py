"""End-to-end solver tests: CP and SPOCK on the reference's tiny car problem
and server_heat, checked for solution structure (exact dynamics, exact risk
coupling — the reference's integration tests) and against the independent
scipy conic oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build
from spock_tpu.baselines import scipy_ref
from spock_tpu.models import car, server_heat
from spock_tpu.solver import Solver


@pytest.fixture(scope="module")
def car_built():
    spec = car.make_spec(N=3, d=2)
    data, meta = build(spec, dtype=jnp.float64)
    return spec, data, meta


@pytest.fixture(scope="module")
def car_oracle(car_built):
    spec, _, _ = car_built
    return scipy_ref.solve(spec, x0=np.array([0.1, 0.1]))


@pytest.mark.parametrize("algorithm", ["cp", "spock"])
def test_solution_structure(car_built, algorithm):
    """Reference tests at test/model_dynamics/implicit_L.jl:59-78."""
    spec, data, meta = car_built
    t = meta.tree
    solver = Solver(data, meta, algorithm=algorithm)
    res = solver.solve(np.array([0.1, 0.1]), tol=1e-5)
    assert bool(res.converged)
    x, u = np.asarray(res.z.x), np.asarray(res.z.u)
    A, B = np.asarray(data.A), np.asarray(data.B)

    # dynamics hold exactly at every node (x is [nx, n] feature-major)
    for j in range(1, t.n):
        i, w = t.parent(j), t.w(j)
        np.testing.assert_allclose(
            x[:, j], A[w] @ x[:, i] + B[w] @ u[:, i], atol=1e-10
        )

    # E' y = tau_child + s_child holds exactly
    E = np.asarray(data.E)
    y, s, tau = np.asarray(res.z.y), np.asarray(res.z.s), np.asarray(res.z.tau)
    for i in range(t.n_nonleaf):
        Ei = E[0] if E.shape[0] == 1 else E[i]
        kids = list(t.children(i))
        rhs = np.array([tau[j - 1] + s[j] for j in kids])
        np.testing.assert_allclose(Ei.T @ y[:, i], rhs, atol=1e-10)


@pytest.mark.parametrize("algorithm", ["cp", "spock"])
def test_matches_oracle(car_built, car_oracle, algorithm):
    """Controls and objective match the independent conic solver."""
    spec, data, meta = car_built
    solver = Solver(data, meta, algorithm=algorithm)
    res = solver.solve(np.array([0.1, 0.1]), tol=1e-6)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.z.u)[:, 0], car_oracle["u"][0], atol=2e-4
    )
    np.testing.assert_allclose(
        float(res.z.s[0]), car_oracle["objective"], atol=2e-4
    )


def test_spock_not_slower_than_cp(car_built):
    spec, data, meta = car_built
    x0 = np.array([0.1, 0.1])
    it_cp = int(Solver(data, meta, algorithm="cp").solve(x0, tol=1e-5).iterations)
    it_sp = int(
        Solver(data, meta, algorithm="spock").solve(x0, tol=1e-5).iterations
    )
    # SuperMann+AA should converge in (far) fewer iterations
    assert it_sp < it_cp


def test_warm_start_reduces_iterations(car_built):
    spec, data, meta = car_built
    solver = Solver(data, meta, algorithm="spock")
    x0 = np.array([0.1, 0.1])
    res1 = solver.solve(x0, tol=1e-4)
    # nearby initial state, warm-started from previous solution
    x0b = x0 + 0.01
    cold = solver.solve(x0b, tol=1e-4)
    import jax

    expand = lambda tree: jax.tree_util.tree_map(lambda a: a[None], tree)
    warm = solver.solve(x0b, z0=expand(res1.z), v0=expand(res1.v), tol=1e-4)
    assert int(warm.iterations) <= int(cold.iterations)


def test_batched_solve(car_built):
    """Each lane of a batched solve matches its standalone solve.

    Iteration counts may differ slightly: reduction vectorization differs
    between batch shapes, and SuperMann's accept logic is branch-sensitive;
    the converged solutions must still agree to solver tolerance.
    """
    spec, data, meta = car_built
    solver = Solver(data, meta, algorithm="spock")
    x0s = np.array([[0.1, 0.1], [0.2, -0.1], [-0.3, 0.25]])
    res_b = solver.solve(x0s, tol=1e-5)
    assert bool(np.all(np.asarray(res_b.status) == 0))
    for i in range(3):
        res_i = solver.solve(x0s[i], tol=1e-5)
        np.testing.assert_allclose(
            np.asarray(res_b.z.u)[i], np.asarray(res_i.z.u), atol=1e-4
        )


def test_server_heat_oracle_parity():
    """server_heat N=3 (CPU-runnable reference config, BASELINE.json[0])."""
    spec = server_heat.make_spec(N=3, nx=3, d=2)
    data, meta = build(spec, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-0.8, 0.8, size=3)
    ora = scipy_ref.solve(spec, x0=x0)
    res = Solver(data, meta, algorithm="spock").solve(x0, tol=1e-6)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.z.u)[:, 0], ora["u"][0], atol=2e-4)
    np.testing.assert_allclose(
        float(res.z.s[0]), ora["objective"], atol=2e-4
    )


import jax as _jax


def test_broyden_and_residual_directions(car_built):
    """All direction providers converge to the same solution; Broyden and
    Anderson should both beat the plain residual direction."""
    from spock_tpu.algorithms.supermann import SuperMannOpts

    spec, data, meta = car_built
    x0 = np.array([0.1, 0.1])
    iters = {}
    sols = {}
    for direction in ["anderson", "broyden", "residual"]:
        s = Solver(
            data,
            meta,
            algorithm="spock",
            supermann=SuperMannOpts(direction=direction, broyden_mem=10),
        )
        res = s.solve(x0, tol=1e-5)
        assert bool(res.converged), direction
        iters[direction] = int(res.iterations)
        sols[direction] = np.asarray(res.z.u)
    np.testing.assert_allclose(sols["anderson"], sols["broyden"], atol=1e-3)
    np.testing.assert_allclose(sols["anderson"], sols["residual"], atol=1e-3)
    assert iters["broyden"] <= iters["residual"]


def test_k0_blind_updates(car_built, car_oracle):
    """K0 blind updates (SuperMannOpts(k0=True)) — disabled in the reference
    (``should_perform_k0`` ends in ``&& false``, sp.jl:80) but a real option
    here: it must still converge to the oracle solution."""
    from spock_tpu.algorithms.supermann import SuperMannOpts

    spec, data, meta = car_built
    s = Solver(data, meta, algorithm="spock", supermann=SuperMannOpts(k0=True))
    res = s.solve(np.array([0.1, 0.1]), tol=1e-6)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.z.u)[:, 0], car_oracle["u"][0], atol=2e-4
    )
    np.testing.assert_allclose(
        float(res.z.s[0]), car_oracle["objective"], atol=2e-4
    )


def test_solution_invariants(car_built):
    """The reference's latent test plan (commented testsets at
    test/runtests.jl:39-165): y in K*, b'y <= s, stage cost <= tau,
    terminal cost <= s at the converged solution."""
    spec, data, meta = car_built
    t = meta.tree
    res = Solver(data, meta, algorithm="spock").solve(
        np.array([0.1, 0.1]), tol=1e-7
    )
    assert bool(res.converged)
    tol = 1e-4
    x = np.asarray(res.z.x)  # [nx, n]
    u = np.asarray(res.z.u)
    s = np.asarray(res.z.s)
    tau = np.asarray(res.z.tau)
    y = np.asarray(res.z.y)  # [ny, n_nl]
    Q = np.asarray(spec.cost.Q)[0]
    R = np.asarray(spec.cost.R)[0]
    QN = np.asarray(spec.cost.QN)[0]
    b = np.asarray(spec.risk.b)[0]

    # y in K* (AVaR: nonneg on first 2d components, free last)
    d = t.d
    assert np.all(y[: 2 * d, :] >= -tol)
    # b'y <= s_i per non-leaf
    for i in range(t.n_nonleaf):
        assert b @ y[:, i] <= s[i] + tol
    # stage cost of parent's (x, u) <= tau_j per non-root j
    for j in range(1, t.n):
        i = t.parent(j)
        c = x[:, i] @ Q @ x[:, i] + u[:, i] @ R @ u[:, i]
        assert c <= tau[j - 1] + tol
    # terminal cost <= s at leaves
    for k in range(t.n_leaf):
        i = t.leaf_start + k
        assert x[:, i] @ QN @ x[:, i] <= s[i] + tol


def test_residual_recording(car_built):
    """record=True keeps per-iteration residual traces (the reference's LOG
    verbose mode, cp.jl:82-97 / sp.jl:299-317)."""
    from spock_tpu.algorithms import cp as cp_alg
    from spock_tpu.algorithms import supermann as sp_alg
    from spock_tpu.solver import zero_dual, zero_primal

    spec, data, meta = car_built
    x0 = jnp.asarray([[0.1, 0.1]], jnp.float64)
    z0, v0 = zero_primal(meta, (1,), jnp.float64), zero_dual(meta, (1,), jnp.float64)
    rc = cp_alg.run_cp(data, meta, x0, z0, v0, tol=1e-4, max_iter=2000, record=True)
    n = int(rc.iterations[0])
    tr = np.asarray(rc.residuals)[:n, 0]
    assert tr.shape[1] == 2 and np.all(tr > 0)
    # last recorded residuals match the reported finals
    np.testing.assert_allclose(tr[-1, 0], float(rc.xi1[0]), rtol=1e-9)

    rs = sp_alg.run_supermann(
        data, meta, x0, z0, v0, tol=1e-4, max_iter=1000, record=True
    )
    ns = int(rs.iterations[0])
    trs = np.asarray(rs.residuals)[:ns, 0]
    assert trs.shape[1] == 3  # xi1, xi2, backtracks
    assert ns < n  # SuperMann converges in fewer iterations
