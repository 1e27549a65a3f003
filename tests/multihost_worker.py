"""Worker for the 2-process multi-host smoke test (test_multihost.py).

Each process owns 2 virtual CPU devices; the pair forms a 4-device global dp
mesh via ``jax.distributed`` (the DCN-analogue path on real pods).  A batched
SPOCK solve runs with the lane axis sharded across BOTH processes; process 0
writes the gathered controls for the parent test to compare against a
single-process solve.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out>
"""

import os
import sys

pid, nproc, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spock_tpu.parallel.mesh import init_distributed

init_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc  # global device view

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spock_tpu import build
from spock_tpu.models import server_heat
from spock_tpu.solver import Solver, zero_dual, zero_primal

spec = server_heat.make_spec(N=3, nx=3, d=2)
data, meta = build(spec, dtype=jnp.float64)
mesh = Mesh(np.array(jax.devices()), ("dp",))

B = 8
rng = np.random.default_rng(0)  # same seed on every process
x0_full = rng.uniform(-0.5, 0.5, (B, meta.nx))


def make_global(arr, spec_):
    arr = np.asarray(arr)
    sh = NamedSharding(mesh, spec_)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def shard_dp(tree):
    return jax.tree_util.tree_map(
        lambda a: make_global(a, P("dp", *([None] * (np.ndim(a) - 1)))), tree
    )


def replicate(tree):
    return jax.tree_util.tree_map(lambda a: make_global(a, P()), tree)


x0 = shard_dp(x0_full)
data_g = replicate(data)
z0 = shard_dp(zero_primal(meta, (B,), jnp.float64))
v0 = shard_dp(zero_dual(meta, (B,), jnp.float64))

solver = Solver(data_g, meta, algorithm="spock")
res = solver.solve(x0, z0=z0, v0=v0, tol=1e-6)
status = multihost_utils.process_allgather(res.status, tiled=True)
u = multihost_utils.process_allgather(res.z.u, tiled=True)
s0 = multihost_utils.process_allgather(res.z.s[:, 0], tiled=True)

if pid == 0:
    np.savez(out_path, u=np.asarray(u), s0=np.asarray(s0),
             status=np.asarray(status))
print(f"proc {pid}: ok", flush=True)
