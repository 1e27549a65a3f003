"""Utility-module tests: reference-layout flattening round-trips and
checkpoint save/load."""

import os

import jax.numpy as jnp
import numpy as np

from spock_tpu import build
from spock_tpu.models import car
from spock_tpu.utils import checkpoint, refvec
from tests.test_core_ops import rand_dual, rand_primal


def _built():
    spec = car.make_spec(N=3, d=2)
    return build(spec, dtype=jnp.float64)


def test_refvec_roundtrip():
    data, meta = _built()
    rng = np.random.default_rng(0)
    z = rand_primal(rng, meta)
    v = rand_dual(rng, meta)

    zf = refvec.primal_to_ref(z)
    assert zf.shape == (meta.nz,)
    z2 = refvec.primal_from_ref(meta, zf)
    for a, b in zip(
        [z.x, z.u, z.s, z.tau, z.y], [z2.x, z2.u, z2.s, z2.tau, z2.y]
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    vf = refvec.dual_to_ref(meta, v)
    assert vf.shape == (meta.nv,)
    v2 = refvec.dual_from_ref(meta, vf)
    np.testing.assert_allclose(np.asarray(v.qx), np.asarray(v2.qx))
    np.testing.assert_allclose(np.asarray(v.cx), np.asarray(v2.cx))
    np.testing.assert_allclose(np.asarray(v.s13), np.asarray(v2.s13))


def test_refvec_layout_matches_reference_convention():
    """z layout must be [x; u; s; tau; y] node-major (implicit_l.jl:106-158):
    z[0:nx] is node 0's state, etc."""
    data, meta = _built()
    rng = np.random.default_rng(1)
    z = rand_primal(rng, meta)
    zf = refvec.primal_to_ref(z)
    x = np.asarray(z.x)  # [nx, n]
    np.testing.assert_allclose(zf[: meta.nx], x[:, 0])
    np.testing.assert_allclose(
        zf[meta.nx : 2 * meta.nx], x[:, 1]
    )
    t = meta.tree
    s_off = t.n * meta.nx + t.n_nonleaf * meta.nu
    np.testing.assert_allclose(
        zf[s_off : s_off + t.n], np.asarray(z.s)
    )


def test_checkpoint_roundtrip(tmp_path):
    data, meta = _built()
    rng = np.random.default_rng(2)
    z = rand_primal(rng, meta)
    v = rand_dual(rng, meta)
    path = os.path.join(tmp_path, "state.npz")
    checkpoint.save_state(path, z, v, step=np.int32(7))
    z2, v2, extras = checkpoint.load_state(path)
    np.testing.assert_allclose(np.asarray(z.x), z2.x)
    np.testing.assert_allclose(np.asarray(v.qNx), v2.qNx)
    assert int(extras["step"]) == 7
    assert v2.pnl is None
