"""Risk-measure sweep (BASELINE.json config 3): AV@R(alpha) grid, total
variation, risk-neutral — all cross-checked against the scipy conic oracle
on a fixed small tree."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build, risks
from spock_tpu.baselines import scipy_ref
from spock_tpu.models import server_heat
from spock_tpu.solver import Solver


def _spec_with_risk(risk):
    spec = server_heat.make_spec(N=3, nx=3, d=2)
    return dataclasses.replace(spec, risk=risk)


def _check(spec, x0, tol_sol=3e-4):
    data, meta = build(spec, dtype=jnp.float64)
    res = Solver(data, meta, algorithm="spock").solve(x0, tol=1e-6)
    assert bool(res.converged)
    ora = scipy_ref.solve(spec, x0=x0)
    np.testing.assert_allclose(
        np.asarray(res.z.u)[:, 0], ora["u"][0], atol=tol_sol
    )
    np.testing.assert_allclose(
        float(res.z.s[0]), ora["objective"], atol=tol_sol
    )
    return res


X0 = np.array([0.4, -0.3, 0.5])


@pytest.mark.parametrize("alpha", [0.3, 0.7, 0.95, 1.0])
def test_avar_grid(alpha):
    tree_nnl = server_heat.make_spec(N=3, nx=3, d=2).tree.n_nonleaf
    risk = risks.avar(np.array([0.3, 0.7]), alpha, tree_nnl)
    _check(_spec_with_risk(risk), X0)


def test_total_variation():
    tree_nnl = server_heat.make_spec(N=3, nx=3, d=2).tree.n_nonleaf
    risk = risks.total_variation(np.array([0.3, 0.7]), 0.2, tree_nnl)
    _check(_spec_with_risk(risk), X0)


def test_risk_neutral_vs_worst_case_ordering():
    """Risk-neutral objective <= AV@R(0.5) objective <= worst-case-ish
    AV@R(0.05) objective (more risk aversion costs more)."""
    nnl = server_heat.make_spec(N=3, nx=3, d=2).tree.n_nonleaf
    p = np.array([0.3, 0.7])
    objs = {}
    for name, alpha in [("neutral", 1.0), ("mid", 0.5), ("averse", 0.05)]:
        spec = _spec_with_risk(risks.avar(p, alpha, nnl))
        data, meta = build(spec, dtype=jnp.float64)
        res = Solver(data, meta, algorithm="spock").solve(X0, tol=1e-7)
        assert bool(res.converged)
        objs[name] = float(res.z.s[0])
    # slack ~ solve accuracy: objectives can coincide when one branch dominates
    assert objs["neutral"] <= objs["mid"] + 1e-4
    assert objs["mid"] <= objs["averse"] + 1e-4
    assert objs["neutral"] < objs["averse"] - 1e-4


def test_nonuniform_avar():
    """Per-node (nonuniform) AV@R data exercises the non-broadcast paths."""
    spec0 = server_heat.make_spec(N=3, nx=3, d=2)
    nnl = spec0.tree.n_nonleaf
    rng = np.random.default_rng(3)
    ps = np.stack([risks.rand_probvec(rng, 2) for _ in range(nnl)])
    alphas = rng.uniform(0.4, 0.95, nnl)
    risk = risks.avar_nonuniform(ps, alphas)
    _check(_spec_with_risk(risk), X0)


def test_nonuniform_costs():
    """Per-node Q/R/QN exercise the non-broadcast cost paths in L/L'."""
    spec0 = server_heat.make_spec(N=3, nx=3, d=2)
    t = spec0.tree
    rng = np.random.default_rng(9)

    def spd_batch(k, n, scale):
        # random diagonal SPD matrices
        return np.stack([np.diag(rng.uniform(0.5, 1.5, n)) * scale for _ in range(k)])

    from spock_tpu.problem import Cost

    cost = Cost(
        Q=spd_batch(t.n - 1, 3, 0.1),
        R=spd_batch(t.n - 1, 3, 1.0),
        QN=spd_batch(t.n_leaf, 3, 0.1),
    )
    spec = dataclasses.replace(spec0, cost=cost)
    data, meta = build(spec, dtype=jnp.float64)
    res = Solver(data, meta, algorithm="spock").solve(X0, tol=1e-6)
    assert bool(res.converged)
    ora = scipy_ref.solve(spec, x0=X0)
    np.testing.assert_allclose(
        np.asarray(res.z.u)[:, 0], ora["u"][0], atol=3e-4
    )
    np.testing.assert_allclose(float(res.z.s[0]), ora["objective"], atol=3e-4)
