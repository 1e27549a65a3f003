"""Per-iteration cost of the fused farm body vs the standalone fused-step
kernel — separates kernel time from farm-loop glue.

Runs the async MPC farm to warm steady state, then times extra iteration
budget increments of the SAME compiled program (the carry round-trips
device-side), and finally times sp_step_fused standalone in the same
process.  SPOCK_LANE_PACK selects the kernel flavor.

    setsid nohup env PYTHONPATH=/root/repo:/root/.axon_site \
        python examples/profile_body.py > /tmp/pb.log 2>&1 &
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("SPOCK_FUSED_STEP", "1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spock_tpu import build, mpc
from spock_tpu.algorithms import supermann as sp_alg
from spock_tpu.models import server_heat


def main():
    B = int(os.environ.get("B", "128"))
    spec = server_heat.make_spec(N=10, nx=20, d=2)
    data, meta = build(spec, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)), jnp.float32)
    T = 4000
    ws = jnp.asarray(rng.integers(0, meta.tree.d, (T, B)))
    opts = sp_alg.SuperMannOpts()
    assert sp_alg.use_fused_step(data, meta, opts)
    tol = jnp.asarray(1e-3, jnp.float32)
    n_steps = jnp.asarray(T, jnp.int32)

    state = dict(
        sp=sp_alg.sp_init_fused(meta, x0, mpc.zero_primal(meta, (B,),
                                                          jnp.float32),
                                mpc.zero_dual(meta, (B,), jnp.float32), opts),
        step_idx=jnp.zeros((B,), jnp.int32),
        iters_rec=jnp.zeros((T, B), jnp.int32),
        us_rec=jnp.zeros((T, B, meta.nu), jnp.float32),
        total=jnp.zeros((), jnp.int32),
    )
    t0 = time.time()
    # warm to steady state: 400 iterations
    res, state = mpc._simulate_async_jit(
        data, meta, ws, tol, n_steps, opts,
        jnp.asarray(400, jnp.int32), state, fused=True,
    )
    jax.block_until_ready(res.steps_done)
    print(f"compile+warm: {time.time() - t0:.1f}s "
          f"(total_iters={int(res.total_iterations)})", flush=True)

    # timed: 3 x 150 more iterations of the same program
    for rep in range(3):
        budget = jnp.asarray(400 + (rep + 1) * 150, jnp.int32)
        t0 = time.perf_counter()
        res, state = mpc._simulate_async_jit(
            data, meta, ws, tol, n_steps, opts, budget, state, fused=True,
        )
        jax.block_until_ready(res.steps_done)
        dt = time.perf_counter() - t0
        print(f"farm: {dt / 150 * 1e3:.3f} ms/iteration "
              f"(total={int(res.total_iterations)})", flush=True)


if __name__ == "__main__":
    main()
