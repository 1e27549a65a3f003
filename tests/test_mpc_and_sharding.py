"""MPC closed-loop simulation and multi-device sharded solves (on the
virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from spock_tpu import build
from spock_tpu.models import server_heat
from spock_tpu import mpc
from spock_tpu.parallel import mesh as pmesh
from spock_tpu.solver import Solver, zero_dual, zero_primal


def _built(N=4, nx=4):
    spec = server_heat.make_spec(N=N, nx=nx, d=2)
    data, meta = build(spec, dtype=jnp.float64)
    return spec, data, meta


def test_mpc_simulation_runs_and_warm_start_pays():
    spec, data, meta = _built()
    B, T = 4, 6
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    ws = jnp.asarray(rng.integers(0, meta.tree.d, (T, B)))
    res = mpc.simulate(data, meta, x0, ws, tol=1e-4)
    assert res.xs.shape == (T + 1, B, meta.nx)
    assert res.us.shape == (T, B, meta.nu)
    assert bool(jnp.all(res.status == 0))
    # inputs respect the box
    assert float(jnp.max(jnp.abs(res.us))) <= 1.5 + 1e-6
    # warm-started later steps should generally need fewer iterations than
    # the cold first step
    assert float(res.iterations[1:].mean()) < float(
        res.iterations[0].mean()
    )


def test_sharded_batch_solve_matches_single_device():
    spec, data, meta = _built()
    n_dev = min(8, jax.device_count())
    assert n_dev >= 2, "tests expect virtual multi-device CPU"
    B = 2 * n_dev
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))

    solver = Solver(data, meta, algorithm="spock")
    res_local = solver.solve(x0, tol=1e-4)

    m = pmesh.make_mesh(n_dev)
    data_r = pmesh.replicate(data, m)
    x0_s = pmesh.shard_batch(x0, m)
    z0 = pmesh.shard_batch(zero_primal(meta, (B,), x0.dtype), m)
    v0 = pmesh.shard_batch(zero_dual(meta, (B,), x0.dtype), m)
    solver_s = Solver(data_r, meta, algorithm="spock")
    res_shard = solver_s.solve(x0_s, z0=z0, v0=v0, tol=1e-4)

    # identical problems, but reduction order and per-lane stopping iteration
    # differ across shardings — agreement is to solver tolerance, not ulps
    np.testing.assert_allclose(
        np.asarray(res_shard.z.u), np.asarray(res_local.z.u), atol=1e-3, rtol=0
    )
    assert bool(jnp.all(res_shard.status == 0))


def test_async_mpc_matches_sync():
    """The async farm produces a valid closed loop: same per-lane control
    sequences as the synchronous simulate (same w draws, same tolerance)."""
    spec, data, meta = _built()
    B, T = 4, 5
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    ws = jnp.asarray(rng.integers(0, meta.tree.d, (T, B)))

    res_s = mpc.simulate(data, meta, x0, ws, tol=1e-5)
    res_a = mpc.simulate_async(data, meta, x0, ws, tol=1e-5, n_steps=T)

    assert bool(jnp.all(res_a.steps_done == T))
    # applied controls match to solver tolerance at every step
    np.testing.assert_allclose(
        np.asarray(res_a.us), np.asarray(res_s.us), atol=5e-4
    )
    # final states match
    np.testing.assert_allclose(
        np.asarray(res_a.xs), np.asarray(res_s.xs[-1]), atol=5e-3
    )
    # total while iterations is comparable to the sum of per-step maxima
    # (the sync cost); exact counts differ slightly because per-lane
    # solver trajectories (AA history, warm starts) are not identical
    sync_total = int(np.asarray(res_s.iterations).max(axis=1).sum())
    assert int(res_a.total_iterations) <= int(1.1 * sync_total) + T


def test_async_mpc_sharded():
    """Async MPC farm with the lane axis sharded over the virtual mesh
    (pod-scale batch execution model, BASELINE config 5)."""
    spec, data, meta = _built()
    n_dev = min(8, jax.device_count())
    B, T = 2 * n_dev, 3
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    ws = jnp.asarray(rng.integers(0, meta.tree.d, (T, B)))

    m = pmesh.make_mesh(n_dev)
    data_r = pmesh.replicate(data, m)
    x0_s = pmesh.shard_batch(x0, m)
    res = mpc.simulate_async(data_r, meta, x0_s, ws, tol=1e-4, n_steps=T)
    assert bool(jnp.all(res.steps_done == T))
    res_local = mpc.simulate_async(data, meta, x0, ws, tol=1e-4, n_steps=T)
    np.testing.assert_allclose(
        np.asarray(res.us), np.asarray(res_local.us), atol=1e-3
    )


def test_async_farm_matches_standalone_warm_solves():
    """Per-solve iteration counts in the async farm EXACTLY match a sequence
    of standalone warm-started solves: lane refill fully resets the
    per-solve solver state (r_prev/s_prev, quasi-Newton history, r_safe,
    eta, res0).

    Exactness holds because the AA history is newest-first rotated (row j =
    inserted j iterations ago, valid iff j <= niter): a refilled lane sees
    the same row layout, the same validity set, and therefore the same
    Gram/gamma/direction — bitwise — as a standalone warm solve.  (The old
    batch-global ring slot permuted rows for refilled lanes, which was only
    permutation-equivalent in exact arithmetic.)"""
    from spock_tpu.algorithms import supermann as sp_alg

    spec, data, meta = _built()
    B, T = 3, 4
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    ws = jnp.asarray(rng.integers(0, meta.tree.d, (T, B)))
    tol = 1e-5
    res_a = mpc.simulate_async(data, meta, x0, ws, tol=tol, n_steps=T)

    z = zero_primal(meta, (B,), x0.dtype)
    v = zero_dual(meta, (B,), x0.dtype)
    x = x0
    iters = []
    us = []
    for t in range(T):
        res = sp_alg.run_supermann(
            data, meta, x, z, v, tol=jnp.asarray(tol), max_iter=1000
        )
        assert bool(jnp.all(res.status == 0))
        iters.append(np.asarray(res.iterations))
        z, v = res.z, res.v
        u0 = res.z.u[:, :, 0]
        us.append(np.asarray(u0))
        Aw, Bw = data.A[ws[t]], data.B[ws[t]]
        x = jnp.einsum("bxy,by->bx", Aw, x) + jnp.einsum(
            "bxu,bu->bx", Bw, u0
        )
    got = np.asarray(res_a.iters_per_step)
    ref = np.stack(iters)
    np.testing.assert_array_equal(got, ref)
    # the applied controls are bitwise equal too
    np.testing.assert_array_equal(
        np.asarray(res_a.us), np.stack(us)
    )


def test_async_mpc_chunked_launches():
    """Chunked (bounded-launch) async farm gives the same results as a
    single launch."""
    spec, data, meta = _built()
    B, T = 4, 4
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)))
    ws = jnp.asarray(rng.integers(0, meta.tree.d, (T, B)))
    r1 = mpc.simulate_async(data, meta, x0, ws, tol=1e-4, n_steps=T)
    r2 = mpc.simulate_async(
        data, meta, x0, ws, tol=1e-4, n_steps=T, iters_per_launch=25
    )
    assert bool(jnp.all(r2.steps_done == T))
    np.testing.assert_allclose(np.asarray(r1.us), np.asarray(r2.us), atol=1e-10)
    assert int(r1.total_iterations) == int(r2.total_iterations)
