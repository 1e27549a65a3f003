"""Node-axis (big-tree) sharding: iterates sharded along the tree-node axis
over the virtual mesh, solves matching the unsharded path, and shardings
surviving the iteration loop (no silent all-gather).

The reference handles deep horizons purely sequentially in RAM
(``examples/server_heat/scaling.jl:9-24``); sharding the node axis is this
framework's mechanism for trees larger than one chip (SURVEY.md §5
"deep-horizon / big trees").  Stage sizes are powers of d, so the sharded
carry is node-padded to mesh multiples (``parallel.bigtree``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build
from spock_tpu.models import server_heat
from spock_tpu.parallel import bigtree, mesh as pmesh
from spock_tpu.solver import Solver, zero_primal


def _node_mesh(n_dev=None):
    n_dev = n_dev or min(8, jax.device_count())
    assert n_dev >= 2
    return pmesh.make_mesh(n_dev, axis="node"), n_dev


def _is_node_sharded(arr, ndev, min_nodes=8):
    """Leaf's last axis is actually split across devices."""
    if arr.shape[-1] < max(min_nodes, ndev):
        return True  # small leaves legitimately replicated
    spec = arr.sharding.spec
    return len(spec) == arr.ndim and spec[-1] == "node"


@pytest.mark.parametrize("d", [2, 3])
def test_node_sharded_cp_matches_local(d):
    """Padded node-sharded CP == single-device CP, and the final carry is
    still node-sharded.  (Fixed iteration budget: plain CP needs more than
    the d=3 budget to hit 1e-6; trajectory equality is the point here.)"""
    spec = server_heat.make_spec(N=6, nx=4, d=d)
    data, meta = build(spec, dtype=jnp.float64)
    mesh, n_dev = _node_mesh()

    B = 2
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))

    max_iter = 600
    res_local = Solver(data, meta, algorithm="cp", max_iter=max_iter).solve(
        x0, tol=1e-6
    )
    res_shard, (zp, vp) = bigtree.run_cp_sharded(
        data, meta, x0, tol=1e-6, max_iter=max_iter, mesh=mesh
    )
    # identical math (pads never enter it) => identical iteration counts
    np.testing.assert_array_equal(
        np.asarray(res_shard.iterations), np.asarray(res_local.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(res_shard.z.u), np.asarray(res_local.z.u), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(res_shard.z.s[:, 0]),
        np.asarray(res_local.z.s[:, 0]),
        atol=1e-10,
    )
    # the constraint held through the while loop: the final padded carry is
    # node-sharded, not silently gathered
    for leaf in jax.tree_util.tree_leaves((zp, vp)):
        assert _is_node_sharded(leaf, n_dev), leaf.shape


def test_node_sharded_memory_is_distributed():
    """Per-device bytes of a padded node-sharded iterate are ~1/n_dev of the
    total (the point of the exercise: trees larger than one device)."""
    spec = server_heat.make_spec(N=7, nx=4, d=3)  # leaf stage 729
    data, meta = build(spec, dtype=jnp.float64)
    mesh, n_dev = _node_mesh()
    z = pmesh.shard_nodes(
        bigtree.pad_nodes(zero_primal(meta, (1,), jnp.float64), n_dev), mesh
    )
    x = z.x  # [1, nx, n_pad]
    shard_bytes = max(s.data.nbytes for s in x.addressable_shards)
    assert shard_bytes <= (x.nbytes // n_dev) + 1024


def _run_worker(mode, tmp_path):
    """Run ``node_sharding_worker.py`` in a fresh process and load its npz.

    Process isolation works around a deterministic XLA:CPU segfault when the
    ``run_sp_sharded`` while-loop program is compiled into a process that has
    already compiled much of the suite (round-3 finding; the same compile
    succeeds in a clean process)."""
    import subprocess
    import sys

    out = tmp_path / f"{mode}.npz"
    worker = os.path.join(os.path.dirname(__file__), "node_sharding_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    proc = subprocess.run(
        [sys.executable, worker, mode, str(out)],
        capture_output=True,
        timeout=900,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    return np.load(out)


def test_node_sharded_supermann_matches_local(tmp_path):
    """SuperMann (the headline algorithm) with node-sharded iterates solves
    the same problem as single-device SuperMann — possible since the
    quasi-Newton state is structured (leafwise Gram, no node-axis concat).

    Asserted: both converge; root controls / objective agree at the
    solution-determinacy scale; the sharded solution satisfies the dynamics
    to iterate accuracy; shardings survive the loop.  NOT asserted:
    trajectory equality — SuperMann's discrete K1/K2/backtracking decisions
    chaotically amplify reduction-order noise (measured: a 1e-13 x0
    perturbation on the LOCAL solver alone moves iteration counts by ~30%
    and deep-tree controls by ~0.1, and a tol=1e-4 solution is itself only
    determined to ~7e-3 in root controls vs a tol=1e-7 one).  CP, a
    nonexpansive smooth map, does support trajectory equality — see
    test_node_sharded_cp_matches_local."""
    got = _run_worker("supermann", tmp_path)
    assert np.all(got["status"] == 0)
    assert np.all(got["status_local"] == 0)
    # root control and objective at the measured determinacy scale (3x slack)
    np.testing.assert_allclose(
        got["u_root"], got["u_root_local"], atol=2e-2
    )
    np.testing.assert_allclose(got["s1"], got["s1_local"], atol=2e-2)
    # sharded final iterate respects the dynamics like the local one does
    assert got["dyn_res"] <= 10 * max(float(got["dyn_res_local"]), 1e-4)
    assert bool(got["sharded"])


def test_big_tree_converged_solve_with_polytopes(tmp_path):
    """BASELINE config 4 semantics at virtual-mesh scale: branching-3 tree
    (N=8, 9841 nodes) with two-sided polytopic state constraints,
    node-sharded SuperMann run TO TOLERANCE (a full converged solve, not a
    smoke test).  The same path at N=15 is exercised by the gated test
    below and measured by examples/bigtree_scaling.py."""
    got = _run_worker("polytope", tmp_path)
    assert np.all(got["status"] == 0), "did not converge to 1e-3"
    g = got["g"]
    assert np.all(g <= 2.0 + 1e-2) and np.all(g >= -2.0 - 1e-2)
    assert bool(got["sharded"])


@pytest.mark.skipif(
    os.environ.get("SPOCK_BIG_TESTS", "0") != "1",
    reason="multi-GB big-tree test; set SPOCK_BIG_TESTS=1",
)
def test_big_tree_n15_d3_node_sharded():
    """The reference's scaling.jl upper end (N=15), branching 3 (7.2M nodes):
    the node-sharded CP solve compiles, executes across the mesh, and the
    residual is finite after a few iterations.  (Round-1 gap: this config
    exceeded the single-chip remote compiler; node sharding is the fix.)"""
    spec = server_heat.make_spec(N=15, nx=2, d=3)
    data, meta = build(spec, dtype=jnp.float32)
    mesh, n_dev = _node_mesh()
    x0 = jnp.asarray([[0.3, -0.2]], jnp.float32)
    res, (zp, vp) = bigtree.run_cp_sharded(
        data, meta, x0, tol=jnp.float32(1e-3), max_iter=5, mesh=mesh
    )
    jax.block_until_ready(zp)
    assert int(res.iterations[0]) == 5
    assert np.isfinite(float(res.xi1[0]))
    for leaf in jax.tree_util.tree_leaves((zp, vp)):
        assert _is_node_sharded(leaf, n_dev)
