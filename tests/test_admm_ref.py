"""Independent sparse conic ADMM oracle: parity against the other tiers.

The ADMM oracle (``baselines/admm_ref.py``) is the production-scale
comparator (the role of ``model_mosek.jl:133-511``'s conic backends): an
explicit sparse-matrix first-order method sharing no code or algorithmic
structure with the engine's implicit-operator splitting.  Here it is
cross-checked on small trees against SLSQP and the JAX engine; the headline
N=10 nx=20 cross-check runs chip-side (examples/oracle_check.py) and as the
opt-in slow test below.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build
from spock_tpu.baselines import admm_ref, scipy_ref
from spock_tpu.models import server_heat
from spock_tpu.risks import total_variation
from spock_tpu.solver import Solver


def test_admm_matches_slsqp_avar():
    spec = server_heat.make_spec(N=4, nx=3, d=2)
    x0 = np.array([0.4, -0.2, 0.1])
    ref = scipy_ref.solve(spec, x0)
    res = admm_ref.solve(spec, x0, tol=1e-9, max_iter=60000)
    assert res["converged"]
    np.testing.assert_allclose(res["objective"], ref["objective"], atol=1e-5)
    np.testing.assert_allclose(res["u"][0], ref["u"][0], atol=1e-4)
    np.testing.assert_allclose(res["x"], ref["x"], atol=1e-4)


def test_admm_matches_engine_tv_risk():
    """Different risk family (TV) and a d=3 tree, against the JAX engine."""
    spec = server_heat.make_spec(N=3, nx=4, d=3)
    spec = type(spec)(
        tree=spec.tree,
        cost=spec.cost,
        dynamics=spec.dynamics,
        risk=total_variation(
            np.array([0.2, 0.5, 0.3]), 0.4, spec.tree.n_nonleaf
        ),
        constraints=spec.constraints,
    )
    x0 = np.array([0.3, -0.4, 0.2, 0.5])
    res = admm_ref.solve(spec, x0, tol=1e-9, max_iter=60000)
    assert res["converged"]
    data, meta = build(spec, dtype=jnp.float64)
    rj = Solver(data, meta, algorithm="spock", max_iter=20000).solve(
        x0, tol=1e-8
    )
    assert bool(rj.converged)
    np.testing.assert_allclose(
        res["objective"], float(rj.z.s[0]), atol=2e-4
    )
    np.testing.assert_allclose(
        res["u"][0], np.asarray(rj.z.u)[:, 0], atol=2e-4
    )


@pytest.mark.skipif(
    os.environ.get("SPOCK_SLOW_TESTS") != "1",
    reason="headline-scale oracle run (~3 min); set SPOCK_SLOW_TESTS=1",
)
def test_admm_headline_config_matches_engine():
    """The production-scale cross-check: N=10 nx=20 d=2 (2047 nodes) —
    the config the headline bench runs — engine (float64 CPU) vs the
    independent sparse conic ADMM oracle."""
    spec = server_heat.make_spec(N=10, nx=20, d=2)
    x0 = np.random.default_rng(0).uniform(-0.6, 0.6, 20)
    res = admm_ref.solve(spec, x0, tol=1e-8, max_iter=20000)
    assert res["converged"]
    data, meta = build(spec, dtype=jnp.float64)
    rj = Solver(data, meta, algorithm="spock", max_iter=50000).solve(
        x0, tol=1e-9
    )
    assert bool(rj.converged)
    np.testing.assert_allclose(res["objective"], float(rj.z.s[0]), atol=1e-4)
    np.testing.assert_allclose(
        res["u"][0], np.asarray(rj.z.u)[:, 0], atol=1e-4
    )
