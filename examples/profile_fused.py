"""On-chip micro-profile of ONE fused SuperMann step launch (pallas_spstep).

Times sp_step_fused alone at the headline config in the warm steady-state
regime (all lanes cached -> fresh sweep skipped), so the number is the
kernel + its dispatch only, no farm glue.  SPOCK_PROF_SKIP bisects kernel
phases (see pallas_spstep._make_step_kernel); SPOCK_LANE_PACK=0 measures
the round-4 lane-tiled kernel for comparison.

    setsid nohup env PYTHONPATH=/root/repo:/root/.axon_site \
        SPOCK_PROF_SKIP=md python examples/profile_fused.py > /tmp/pf.log 2>&1 &
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

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spock_tpu import build
from spock_tpu.models import server_heat
from spock_tpu.ops import pallas_spstep
from spock_tpu.zv import tmap
from tests.test_core_ops import rand_dual, rand_primal


def main():
    B = int(os.environ.get("B", "128"))
    N = int(os.environ.get("N", "10"))
    nx = int(os.environ.get("NX", "20"))
    cached = os.environ.get("CACHED", "1") == "1"
    spec = server_heat.make_spec(N=N, nx=nx, d=2)
    data, meta = build(spec, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    to32 = lambda t: tmap(lambda a: a.astype(jnp.float32), t)

    def rtrio():
        z = to32(rand_primal(rng, meta, batch=(B,)))
        v = to32(rand_dual(rng, meta, batch=(B,)))
        return pallas_spstep.pack_pair(meta, z, v)

    trios = [rtrio() for _ in range(8)]
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)), jnp.float32)
    f1 = 1.0 if cached else 0.0
    scal = jnp.asarray(
        np.broadcast_to(
            np.asarray([1.0, 1.0, 1.0, f1, 1e3, 0.5, 1.0, 1.0, 1.0, 1.0],
                       np.float32),
            (B, 10),
        )
    )
    gamma = sigma = jnp.float32(0.5)
    bt = pallas_spstep._pick_bt(meta, B)
    print(
        f"device={jax.devices()[0]} B={B} bt={bt} cached={cached} "
        f"lane_pack={os.environ.get('SPOCK_LANE_PACK', '1')} "
        f"skip={os.environ.get('SPOCK_PROF_SKIP', '')!r} "
        f"vmem_est={pallas_spstep._step_vmem_bytes(meta, bt) / 2**20:.1f}MiB",
        flush=True,
    )

    def step():
        return pallas_spstep.sp_step_fused(
            data, meta, trios[0], trios[1], trios[2], trios[3],
            trios[4], trios[5], trios[6], trios[7],
            x0, scal, gamma, sigma,
            c1=0.99, sigma_k2=0.1, lam=1.0, lam_sp=1.0,
        )

    t0 = time.time()
    out = step()
    jax.block_until_ready(out)
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"fused step: {dt * 1e3:.3f} ms/launch  "
          f"({dt / B * 1e6:.1f} us/lane)", flush=True)


if __name__ == "__main__":
    main()
