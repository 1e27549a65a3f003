"""Whole-sweep megakernel vs the jnp cp_sweep (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build
from spock_tpu.algorithms.common import cp_sweep
from spock_tpu.models import server_heat, car
from spock_tpu.ops import pallas_sweep
from tests.test_core_ops import rand_dual, rand_primal


@pytest.mark.parametrize("which", ["server_heat", "car", "d3"])
def test_fused_sweep_matches_reference(which):
    if which == "server_heat":
        spec = server_heat.make_spec(N=4, nx=5, d=2)
    elif which == "car":
        spec = car.make_spec(N=4, d=2)
    else:
        spec = server_heat.make_spec(N=3, nx=3, d=3)
    data, meta = build(spec, dtype=jnp.float64)
    assert pallas_sweep.supported(meta, data)
    rng = np.random.default_rng(0)
    B = 4
    z = rand_primal(rng, meta, batch=(B,))
    v = rand_dual(rng, meta, batch=(B,))
    x0 = jnp.asarray(rng.standard_normal((B, meta.nx)))
    gamma = sigma = 0.3

    zb_ref, vb_ref = cp_sweep(data, meta, z, v, gamma, sigma, x0)
    zb, vb = pallas_sweep.cp_sweep_fused(
        data, meta, z, v, gamma, sigma, x0, interpret=True
    )
    for name in ["x", "u", "s", "tau", "y"]:
        np.testing.assert_allclose(
            np.asarray(getattr(zb, name)),
            np.asarray(getattr(zb_ref, name)),
            atol=1e-10,
            err_msg=f"zbar.{name}",
        )
    for name in ["y", "sby", "qx", "ru", "t5", "t6", "cx", "cu", "qNx",
                 "s12", "s13", "cxN"]:
        np.testing.assert_allclose(
            np.asarray(getattr(vb, name)),
            np.asarray(getattr(vb_ref, name)),
            atol=1e-10,
            err_msg=f"vbar.{name}",
        )


@pytest.mark.parametrize("which", ["server_heat", "car", "d3"])
def test_fused_metric_variants_match_reference(which):
    """cp_sweep_metric_fused and metric_apply_fused vs the jnp path."""
    from spock_tpu.ops.linop import metric_apply
    from spock_tpu.zv import sub

    if which == "server_heat":
        spec = server_heat.make_spec(N=4, nx=5, d=2)
    elif which == "car":
        spec = car.make_spec(N=4, d=2)
    else:
        spec = server_heat.make_spec(N=3, nx=3, d=3)
    data, meta = build(spec, dtype=jnp.float64)
    assert pallas_sweep.supported(meta, data)
    rng = np.random.default_rng(1)
    B = 4
    z = rand_primal(rng, meta, batch=(B,))
    v = rand_dual(rng, meta, batch=(B,))
    x0 = jnp.asarray(rng.standard_normal((B, meta.nx)))
    gamma, sigma = 0.3, 0.25

    # standalone fused metric
    mz_ref, mv_ref = metric_apply(data, meta, z, v, gamma, sigma)
    mz, mv = pallas_sweep.metric_apply_fused(
        data, meta, z, v, gamma, sigma, interpret=True
    )
    # sweep + residual metric in one kernel
    zb_ref, vb_ref = cp_sweep(data, meta, z, v, gamma, sigma, x0)
    mrz_ref, mrv_ref = metric_apply(
        data, meta, sub(z, zb_ref), sub(v, vb_ref), gamma, sigma
    )
    zb, vb, mrz, mrv = pallas_sweep.cp_sweep_metric_fused(
        data, meta, z, v, gamma, sigma, x0, interpret=True
    )
    for got, ref, tag in [
        (mz, mz_ref, "M.z"), (mrz, mrz_ref, "Mr.z"), (zb, zb_ref, "zbar"),
    ]:
        for name in ["x", "u", "s", "tau", "y"]:
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)),
                atol=1e-10,
                err_msg=f"{tag}.{name}",
            )
    for got, ref, tag in [
        (mv, mv_ref, "M.v"), (mrv, mrv_ref, "Mr.v"), (vb, vb_ref, "vbar"),
    ]:
        for name in ["y", "sby", "qx", "ru", "t5", "t6", "cx", "cu", "qNx",
                     "s12", "s13", "cxN"]:
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)),
                atol=1e-10,
                err_msg=f"{tag}.{name}",
            )
