"""EVaR risk measure (exponential-cone, KL-ball ambiguity) — extension
beyond the reference.  Validated three ways: the exp-cone projection against
fixed known points, the solved EVaR value against the independent
log-sum-exp oracle, and the AVaR/EVaR/worst-case ordering."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build, risks
from spock_tpu.baselines import scipy_ref
from spock_tpu.models import server_heat
from spock_tpu.ops.cones import _project_exp_cone
from spock_tpu.solver import Solver


def test_exp_cone_projection_points():
    """Fixed cases covering all branches (validated against a scipy-based
    boundary-search oracle offline)."""
    cases = [
        # v, expected projection
        ([0.0, 1.0, 2.0], [0.0, 1.0, 2.0]),  # interior
        ([-1.0, 0.5, 3.0], [-1.0, 0.5, 3.0]),  # interior
        ([-2.531, -1.247, 0.083], [-2.531, 0.0, 0.083]),  # face
        ([-4.65, -0.438, -2.492], [-4.65, 0.0, 0.0]),  # face
        ([2.0, 0.1, -3.0], [0.0, 0.0, 0.0]),  # polar
    ]
    for v, want in cases:
        got = np.asarray(
            _project_exp_cone(jnp.asarray(v, jnp.float64)[:, None])
        )[:, 0]
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_exp_cone_projection_properties():
    """Idempotency + firm nonexpansiveness of the projection on random data."""
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((3, 64)) * 2.0)
    p1 = _project_exp_cone(v)
    p2 = _project_exp_cone(p1)
    np.testing.assert_allclose(p1, p2, atol=1e-5)
    # projection onto a convex set is firmly nonexpansive
    w = jnp.asarray(rng.standard_normal((3, 64)) * 2.0)
    q1 = _project_exp_cone(w)
    lhs = jnp.sum((p1 - q1) * (v - w))
    rhs = jnp.sum((p1 - q1) ** 2)
    assert float(lhs) >= float(rhs) - 1e-6


def test_evar_matches_oracle():
    spec0 = server_heat.make_spec(N=3, nx=2, d=2)
    risk = risks.evar(np.array([0.3, 0.7]), alpha=0.7, n_nonleaf=spec0.tree.n_nonleaf)
    spec = dataclasses.replace(spec0, risk=risk)
    data, meta = build(spec, dtype=jnp.float64)
    x0 = np.array([0.5, -0.4])
    res = Solver(data, meta, algorithm="spock").solve(x0, tol=1e-7)
    assert bool(res.converged)
    ora = scipy_ref.solve(spec, x0=x0)
    np.testing.assert_allclose(
        float(res.z.s[0]), ora["objective"], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.z.u)[:, 0], ora["u"][0], atol=5e-4
    )


def test_evar_between_mean_and_avar():
    """For the same alpha: E[X] <= EVaR_a(X) and EVaR is more conservative
    than the mean, less than worst case.  Check objective ordering:
    risk-neutral <= EVaR(a) <= AVaR(tiny a ~ worst case)."""
    spec0 = server_heat.make_spec(N=3, nx=2, d=2)
    nnl = spec0.tree.n_nonleaf
    p = np.array([0.3, 0.7])
    x0 = np.array([0.5, -0.4])
    objs = {}
    for name, risk in [
        ("neutral", risks.risk_neutral(p, nnl)),
        ("evar", risks.evar(p, 0.2, nnl)),
        ("worst", risks.avar(p, 1e-3, nnl)),
    ]:
        spec = dataclasses.replace(spec0, risk=risk)
        data, meta = build(spec, dtype=jnp.float64)
        res = Solver(data, meta, algorithm="spock").solve(x0, tol=1e-7)
        assert bool(res.converged), name
        objs[name] = float(res.z.s[0])
    assert objs["neutral"] <= objs["evar"] + 1e-5
    assert objs["evar"] <= objs["worst"] + 1e-5
