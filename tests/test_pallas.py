"""Pallas fused kernels vs the jnp reference implementations (interpret mode
on CPU; the same code compiles for TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build
from spock_tpu.models import server_heat
from spock_tpu.ops import pallas_kernels, prox
from tests.test_core_ops import rand_dual


def test_fused_prox_h_matches_reference():
    spec = server_heat.make_spec(N=4, nx=5, d=2)
    data, meta = build(spec, dtype=jnp.float64)
    assert pallas_kernels.supported(meta)
    rng = np.random.default_rng(0)
    v = rand_dual(rng, meta, batch=(4,))
    sigma = 0.37
    ref = prox.prox_h_conj(data, meta, v, sigma)
    got = pallas_kernels.prox_h_conj_fused(
        data, meta, v, sigma, interpret=True
    )
    for name in ["y", "sby", "qx", "ru", "t5", "t6", "cx", "cu", "qNx",
                 "s12", "s13", "cxN"]:
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            atol=1e-12,
            err_msg=name,
        )
