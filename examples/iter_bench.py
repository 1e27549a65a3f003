"""On-chip breakdown of one SuperMann iteration: sweep, metric, direction,
full body.  Honors SPOCK_PALLAS_SWEEP (read at import).

    setsid nohup env PYTHONPATH=/root/repo:/root/.axon_site \
        SPOCK_PALLAS_SWEEP=1 python examples/iter_bench.py > /tmp/ib.log 2>&1 &
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
from spock_tpu.algorithms import supermann
from spock_tpu.algorithms.common import cp_sweep
from spock_tpu.models import server_heat
from spock_tpu.ops.linop import metric_apply
from spock_tpu.zv import tmap
from tests.test_core_ops import rand_dual, rand_primal


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(os.environ.get("B", "128"))
    print(
        f"device={jax.devices()[0]} B={B} "
        f"pallas_sweep={os.environ.get('SPOCK_PALLAS_SWEEP', '0')}",
        flush=True,
    )
    spec = server_heat.make_spec(N=10, nx=20, d=2)
    data, meta = build(spec, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    to32 = lambda t: tmap(lambda a: a.astype(jnp.float32), t)
    z = to32(rand_primal(rng, meta, batch=(B,)))
    v = to32(rand_dual(rng, meta, batch=(B,)))
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, meta.nx)), jnp.float32)
    step = float(0.99 / np.sqrt(float(data.L_sq)))
    gamma = sigma = jnp.float32(step)
    tol = jnp.float32(1e-3)

    from spock_tpu.algorithms.common import cp_sweep_metric, metric_pair
    from spock_tpu.algorithms import anderson
    from spock_tpu.zv import inf_norm, sub, vdot

    f_sweep = jax.jit(
        lambda z, v: cp_sweep(data, meta, z, v, gamma, sigma, x0)
    )
    f_metric = jax.jit(
        lambda z, v: metric_apply(data, meta, z, v, gamma, sigma)
    )
    f_swm = jax.jit(
        lambda z, v: cp_sweep_metric(data, meta, z, v, gamma, sigma, x0)
    )
    f_mpair = jax.jit(
        lambda z, v: metric_pair(data, meta, z, v, gamma, sigma)
    )

    # Anderson direction exactly as sp_body runs it: ravel + per-lane one-hot
    # history writes (both buffers) + Gram/solve/combine + unravel
    from spock_tpu.algorithms.supermann import _ravel_pair, _unravel_pair

    K = _ravel_pair(z, v).shape[-1]
    MRf = jnp.asarray(rng.standard_normal((B, 3, K)), jnp.float32)
    MPf = jnp.asarray(rng.standard_normal((B, 3, K)), jnp.float32)
    r_prev = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)

    def aa(zz, vv, slot_lane, MRf, MPf, r_prev):
        r_flat = _ravel_pair(zz, vv)
        y_flat = r_flat - r_prev
        hot = (jnp.arange(3)[None, :] == slot_lane[:, None])[:, :, None]
        MR = jnp.where(hot, y_flat[:, None, :], MRf)
        MP = jnp.where(hot, (r_prev - y_flat)[:, None, :], MPf)
        d_flat = anderson.direction_flat(MR, MP, r_flat)
        return _unravel_pair(None, d_flat, zz, vv)

    f_aa = jax.jit(aa)
    f_ravel = jax.jit(lambda zz, vv: _ravel_pair(zz, vv))
    f_norms = jax.jit(
        lambda z, v: (inf_norm(z, 1), inf_norm(v, 1),
                      vdot(z, z, 1) + vdot(v, v, 1))
    )

    body = supermann.sp_body(data, meta, tol)
    carry0 = supermann.sp_init(meta, x0, z, v)
    f_body = jax.jit(body)

    # fused whole-iteration step (3 phases; time one phase)
    opts = supermann.SuperMannOpts()
    t_fused = None
    if supermann.use_fused_step(data, meta, opts):
        carryf0 = supermann.sp_init_fused(meta, x0, z, v, opts)
        bodyf = jax.jit(
            supermann.sp_body_fused(
                data, meta, tol, opts, phase=0, max_iter=1_000_000
            )
        )
        cf1 = bodyf(carryf0)
        jax.block_until_ready(cf1)
        t_fused = timeit(bodyf, cf1)

    slots = jnp.asarray(rng.integers(0, 3, B), jnp.int32)
    t_sweep = timeit(f_sweep, z, v)
    t_metric = timeit(f_metric, z, v)
    t_swm = timeit(f_swm, z, v)
    t_mpair = timeit(f_mpair, z, v)
    t_aa = timeit(f_aa, z, v, slots, MRf, MPf, r_prev)
    t_ravel = timeit(f_ravel, z, v)
    t_norms = timeit(f_norms, z, v)
    c1 = f_body(carry0)
    t_body = timeit(f_body, c1)

    print(f"cp_sweep:        {t_sweep*1e3:8.3f} ms", flush=True)
    print(f"metric_apply:    {t_metric*1e3:8.3f} ms", flush=True)
    print(f"cp_sweep_metric: {t_swm*1e3:8.3f} ms", flush=True)
    print(f"metric_pair:     {t_mpair*1e3:8.3f} ms", flush=True)
    print(f"aa_direction:    {t_aa*1e3:8.3f} ms", flush=True)
    print(f"ravel_pair:      {t_ravel*1e3:8.3f} ms", flush=True)
    print(f"norms+dot pass:  {t_norms*1e3:8.3f} ms", flush=True)
    print(f"sp_body:         {t_body*1e3:8.3f} ms", flush=True)
    print(
        f"glue (body - swm - mpair - swm - aa): "
        f"{(t_body - 2*t_swm - t_mpair - t_aa)*1e3:8.3f} ms",
        flush=True,
    )
    if t_fused is not None:
        print(f"sp_body_fused:   {t_fused*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
