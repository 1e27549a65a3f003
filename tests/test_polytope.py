"""Polytopic-constraint extension (BASELINE.json config 4): two-sided
Gx x + Gu u bounds enter the splitting as extra L blocks with a clip prox.
Cross-checked against the scipy oracle."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from spock_tpu import build, problem
from spock_tpu.baselines import scipy_ref
from spock_tpu.models import server_heat
from spock_tpu.solver import Solver


def _poly_spec():
    spec = server_heat.make_spec(N=3, nx=3, d=2)
    nx = nu = 3
    # constrain sums: |1' x| <= 1.2, |x1 - x2 + 0.5 u1| <= 0.8, leaf |1' x| <= 1.0
    Gx = np.array([[1.0, 1.0, 1.0], [1.0, -1.0, 0.0]])
    Gu = np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    lo = np.array([-1.2, -0.8])
    hi = np.array([1.2, 0.8])
    GxN = np.ones((1, nx))
    poly = problem.Polytope(
        Gx=Gx, Gu=Gu, lo=lo, hi=hi,
        GxN=GxN, loN=np.array([-1.0]), hiN=np.array([1.0]),
    )
    return dataclasses.replace(spec, polytope=poly)


def test_polytope_feasible_and_matches_oracle():
    spec = _poly_spec()
    data, meta = build(spec, dtype=jnp.float64)
    assert meta.nc_nl == 2 and meta.nc_lf == 1
    x0 = np.array([0.7, -0.4, 0.6])
    res = Solver(data, meta, algorithm="spock").solve(x0, tol=1e-6)
    assert bool(res.converged)

    x, u = np.asarray(res.z.x), np.asarray(res.z.u)
    t = meta.tree
    # feasibility of the polytope rows (to solver tolerance); x is [nx, n]
    for i in range(t.n_nonleaf):
        g = spec.polytope.Gx @ x[:, i] + spec.polytope.Gu @ u[:, i]
        assert np.all(g <= spec.polytope.hi + 1e-4)
        assert np.all(g >= spec.polytope.lo - 1e-4)
    for k in range(t.n_leaf):
        g = spec.polytope.GxN @ x[:, t.leaf_start + k]
        assert np.all(np.abs(g) <= 1.0 + 1e-4)

    ora = scipy_ref.solve(spec, x0=x0)
    np.testing.assert_allclose(np.asarray(res.z.u)[:, 0], ora["u"][0], atol=3e-4)
    np.testing.assert_allclose(float(res.z.s[0]), ora["objective"], atol=3e-4)


def test_polytope_changes_solution():
    """The polytope must actually bind for this x0 (guards against the
    blocks being silently dropped)."""
    spec_p = _poly_spec()
    spec_0 = dataclasses.replace(spec_p, polytope=None)
    x0 = np.array([0.7, -0.4, 0.6])
    rp = Solver(*build(spec_p, dtype=jnp.float64), algorithm="spock").solve(
        x0, tol=1e-7
    )
    r0 = Solver(*build(spec_0, dtype=jnp.float64), algorithm="spock").solve(
        x0, tol=1e-7
    )
    assert float(rp.z.s[0]) > float(r0.z.s[0]) + 1e-4
