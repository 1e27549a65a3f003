"""Micro-benchmark: fused Pallas cp_sweep vs jnp cp_sweep on the chip.

Measures (a) numerical agreement and (b) per-sweep wall time for both paths
on the headline server_heat config.  Run on the TPU:

    setsid nohup python examples/sweep_bench.py > /tmp/sweep_bench.log 2>&1 &
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
from spock_tpu.ops import pallas_sweep
from spock_tpu.ops.linop import apply_L, apply_LT
from spock_tpu.ops.prox import prox_f, prox_h_conj
from spock_tpu.zv import lincomb, tmap
from tests.test_core_ops import rand_dual, rand_primal


def jnp_sweep(data, meta, z, v, gamma, sigma, x0):
    z1 = tmap(lambda a, b: a - gamma * b, z, apply_LT(data, meta, v))
    zbar = prox_f(data, meta, z1, gamma, x0)
    z_refl = lincomb(2.0, zbar, -1.0, z)
    v1 = tmap(lambda a, b: a + sigma * b, v, apply_L(data, meta, z_refl))
    return zbar, prox_h_conj(data, meta, v1, sigma)


def flat_err(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    return max(
        float(np.max(np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))))
        for x, y in zip(la, lb)
    )


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    N, nx, d = (
        int(os.environ.get("N", "10")),
        int(os.environ.get("NX", "20")),
        int(os.environ.get("D", "2")),
    )
    B = int(os.environ.get("B", "128"))
    print(f"device={jax.devices()[0]} N={N} nx={nx} d={d} B={B}", flush=True)

    spec = server_heat.make_spec(N=N, nx=nx, d=d)
    data, meta = build(spec, dtype=jnp.float32)
    print(f"supported={pallas_sweep.supported(meta, data)}", flush=True)

    rng = np.random.default_rng(0)
    to32 = lambda t: tmap(lambda a: a.astype(jnp.float32), t)
    z = to32(rand_primal(rng, meta, batch=(B,)))
    v = to32(rand_dual(rng, meta, batch=(B,)))
    x0 = jnp.asarray(
        rng.uniform(-0.5, 0.5, (B, meta.nx)), jnp.float32
    )
    gamma = jnp.asarray(0.3, jnp.float32)
    sigma = jnp.asarray(0.3, jnp.float32)

    f_jnp = jax.jit(lambda z, v: jnp_sweep(data, meta, z, v, gamma, sigma, x0))
    f_pl = jax.jit(
        lambda z, v: pallas_sweep.cp_sweep_fused(
            data, meta, z, v, gamma, sigma, x0
        )
    )

    t0 = time.perf_counter()
    out_j = f_jnp(z, v)
    jax.block_until_ready(out_j)
    print(f"jnp compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out_p = f_pl(z, v)
    jax.block_until_ready(out_p)
    print(f"pallas compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    ez = flat_err(out_j[0], out_p[0])
    ev = flat_err(out_j[1], out_p[1])
    print(f"max err zbar={ez:.2e} vbar={ev:.2e}", flush=True)

    # float64 CPU oracle: which path is closer to the true sweep?
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(), jax.default_device(cpu):
        to64 = lambda t: tmap(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
        )
        data64, _ = build(spec, dtype=jnp.float64)
        ref = jnp_sweep(
            data64, meta, to64(z), to64(v),
            jnp.float64(0.3), jnp.float64(0.3),
            jnp.asarray(np.asarray(x0), jnp.float64),
        )
        scale = max(
            float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(ref)
        )
    to_np = lambda t: tmap(lambda a: np.asarray(a), t)
    ref_np = to_np(ref)
    for name, out in [("jnp", out_j), ("pallas", out_p)]:
        e0 = flat_err(to_np(out[0]), ref_np[0])
        e1 = flat_err(to_np(out[1]), ref_np[1])
        print(
            f"{name} vs f64 oracle: zbar={e0:.2e} vbar={e1:.2e} "
            f"(scale {scale:.1e})",
            flush=True,
        )

    tj, _ = timeit(f_jnp, z, v)
    tp, _ = timeit(f_pl, z, v)
    print(
        f"jnp sweep: {tj*1e3:.3f} ms   pallas sweep: {tp*1e3:.3f} ms   "
        f"speedup {tj/tp:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
