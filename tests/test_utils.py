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

    zf = refvec.primal_to_ref(meta, z)
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
    """z layout must be [x; u; s; tau; y] node-major in the REFERENCE's node
    numbering (implicit_l.jl:106-158 + scenario_tree.jl:83-87): ref node
    r's state sits at zf[r*nx:(r+1)*nx] and equals our node inv[r]."""
    data, meta = _built()
    t = meta.tree
    rng = np.random.default_rng(1)
    z = rand_primal(rng, meta)
    zf = refvec.primal_to_ref(meta, z)
    x = np.asarray(z.x)  # [nx, n] in OUR numbering
    perm = t.perm_to_reference()  # perm[our] = ref
    for our in range(t.n):
        r = perm[our]
        np.testing.assert_allclose(zf[r * meta.nx : (r + 1) * meta.nx], x[:, our])
    s_off = t.n * meta.nx + t.n_nonleaf * meta.nu
    s = np.asarray(z.s)
    for our in range(t.n):
        np.testing.assert_allclose(zf[s_off + perm[our]], s[our])

    # the permutation respects tree structure: ref child k of ref parent p
    # corresponds to our child k of our parent (reference child order is
    # interleaved: ref children of p are {p_stagelocal*d + k})
    for our in range(t.n_nonleaf):
        kids = t.children(our)
        for k, j in enumerate(kids):
            st = t.stage_of(j)
            ref_par_loc = perm[our] - t.stage_offset(st - 1)
            assert perm[j] == t.stage_offset(st) + ref_par_loc * t.d + k


def test_hlo_collective_stats_counts_async_pairs_once():
    """Async collectives lower to a -start/-done pair describing ONE
    transfer; the parser must count each pair once (and not the -done
    half), alongside plain sync ops."""
    from spock_tpu.utils.profiling import hlo_collective_stats

    hlo = """
  %ag.1 = f32[4,128]{1,0} all-gather-start(f32[1,128] %p0), dimensions={0}
  %ag.2 = f32[4,128]{1,0} all-gather-done(f32[4,128] %ag.1)
  %ar.1 = f32[2]{0} all-reduce(f32[2] %p1), to_apply=%add
  %cp.1 = f32[8]{0} collective-permute-start(f32[8] %p2)
  %cp.2 = f32[8]{0} collective-permute-done(f32[8] %cp.1)
"""
    stats = hlo_collective_stats(hlo)
    assert stats["count"] == 3, stats
    assert stats["by_kind"]["all-gather"]["count"] == 1
    assert stats["by_kind"]["all-gather"]["bytes"] == 4 * 128 * 4
    assert stats["by_kind"]["all-reduce"]["count"] == 1
    assert stats["by_kind"]["collective-permute"]["count"] == 1
    assert stats["by_kind"]["collective-permute"]["bytes"] == 8 * 4


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
