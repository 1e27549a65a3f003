"""Core operator/prox property tests.

These mirror the reference's latent test plan (SURVEY.md §4): adjointness of
L/L', projection idempotency + firm nonexpansiveness of the proxes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build, zv
from spock_tpu.models import car, server_heat
from spock_tpu.ops import linop, prox


def rand_primal(rng, meta, batch=()):
    t = meta.tree
    r = lambda *s: jnp.asarray(rng.standard_normal(batch + s))
    return zv.Primal(
        x=r(meta.nx, t.n),
        u=r(meta.nu, t.n_nonleaf),
        s=r(t.n),
        tau=r(t.n - 1),
        y=r(meta.ny, t.n_nonleaf),
    )


def rand_dual(rng, meta, batch=()):
    t = meta.tree
    r = lambda *s: jnp.asarray(rng.standard_normal(batch + s))
    return zv.Dual(
        y=r(meta.ny, t.n_nonleaf),
        sby=r(t.n_nonleaf),
        qx=r(meta.nx, t.n - 1),
        ru=r(meta.nu, t.n - 1),
        t5=r(t.n - 1),
        t6=r(t.n - 1),
        cx=r(meta.nx, t.n_nonleaf),
        cu=r(meta.nu, t.n_nonleaf),
        qNx=r(meta.nx, t.n_leaf),
        s12=r(t.n_leaf),
        s13=r(t.n_leaf),
        cxN=r(meta.nx, t.n_leaf),
        pnl=r(meta.nc_nl, t.n_nonleaf) if meta.nc_nl > 0 else None,
        plf=r(meta.nc_lf, t.n_leaf) if meta.nc_lf > 0 else None,
    )


@pytest.fixture(scope="module", params=["car", "server_heat"])
def built(request):
    if request.param == "car":
        spec = car.make_spec(N=3, d=2)
    else:
        spec = server_heat.make_spec(N=4, nx=5, d=2)
    data, meta = build(spec, dtype=jnp.float64)
    return data, meta


def test_sizes(built):
    """nz/nv counting vs the reference formulas (implicit_l.jl:5-44)."""
    data, meta = built
    t = meta.tree
    nz = (
        t.n * meta.nx
        + t.n_nonleaf * meta.nu
        + t.n
        + (t.n - 1)
        + t.n_nonleaf * meta.ny
    )
    assert meta.nz == nz
    # reference example: car N=3, d=2, nx=2, nu=1 has z dims 14/3/7/6/15
    if meta.nx == 2:
        assert t.n == 7 and t.n_nonleaf == 3 and t.n_leaf == 4
        assert meta.nz == 14 + 3 + 7 + 6 + 15


def test_adjointness(built):
    """<L z, v> == <z, L' v> for random z, v."""
    data, meta = built
    rng = np.random.default_rng(1)
    for _ in range(3):
        z = rand_primal(rng, meta)
        v = rand_dual(rng, meta)
        lhs = zv.vdot(linop.apply_L(data, meta, z), v)
        rhs = zv.vdot(z, linop.apply_LT(data, meta, v))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_L_norm_power_iteration(built):
    """Power-iteration estimate matches the dense operator norm."""
    data, meta = built
    # materialize L densely via JVPs on basis vectors (small problems only)
    z0 = zv.zeros_like(
        rand_primal(np.random.default_rng(0), meta)
    )
    flat0 = zv.ravel(z0)
    nz = flat0.shape[0]
    if nz > 200:
        pytest.skip("dense check only for tiny problems")

    import jax.flatten_util as fu

    zflat, unravel = fu.ravel_pytree(z0)

    def Lf(zf):
        return zv.ravel(linop.apply_L(data, meta, unravel(zf)))

    J = jax.jacfwd(Lf)(zflat)
    true_sq = np.linalg.norm(np.asarray(J), ord=2) ** 2
    est = float(data.L_sq)
    assert true_sq <= est <= true_sq * 1.10


def test_prox_f_firmly_nonexpansive(built):
    """Reference test (test/model_algorithms/prox.jl:53-67)."""
    data, meta = built
    rng = np.random.default_rng(2)
    gamma = 0.1
    x0 = jnp.zeros(meta.nx) + 0.1
    pf = jax.jit(lambda z: prox.prox_f(data, meta, z, gamma, x0))
    for _ in range(5):
        z1, z2 = rand_primal(rng, meta), rand_primal(rng, meta)
        p1, p2 = pf(z1), pf(z2)
        dp = zv.sub(p1, p2)
        dz = zv.sub(z1, z2)
        assert zv.vdot(dp, dz) >= zv.vdot(dp, dp) - 1e-9


def test_prox_h_conj_firmly_nonexpansive(built):
    """Reference test (test/model_algorithms/prox.jl:69-81)."""
    data, meta = built
    rng = np.random.default_rng(3)
    sigma = 0.1
    ph = jax.jit(lambda v: prox.prox_h_conj(data, meta, v, sigma))
    for _ in range(10):
        v1, v2 = rand_dual(rng, meta), rand_dual(rng, meta)
        p1, p2 = ph(v1), ph(v2)
        dp = zv.sub(p1, p2)
        dv = zv.sub(v1, v2)
        assert zv.vdot(dp, dv) >= zv.vdot(dp, dp) - 1e-9


def test_projection_S1_exact_dynamics(built):
    """After S1 projection the dynamics hold exactly at every node and
    x_root == x0 (cf. test/model_dynamics/implicit_L.jl:59-66)."""
    data, meta = built
    t = meta.tree
    rng = np.random.default_rng(4)
    z = rand_primal(rng, meta)
    x0 = jnp.asarray(rng.standard_normal(meta.nx))
    from spock_tpu.ops.riccati import project_dynamics

    xp, up = project_dynamics(data, meta, z.x, z.u, x0)
    np.testing.assert_allclose(xp[:, 0], x0, atol=1e-12)
    A, B = np.asarray(data.A), np.asarray(data.B)
    xp, up = np.asarray(xp), np.asarray(up)
    for j in range(1, t.n):
        i = t.parent(j)
        w = t.w(j)
        np.testing.assert_allclose(
            xp[:, j], A[w] @ xp[:, i] + B[w] @ up[:, i], atol=1e-8
        )


def test_projection_S1_idempotent_and_projection(built):
    """S1 is an orthogonal projection: idempotent and <z - Pz, Pz - w> = 0
    for any w in the subspace."""
    data, meta = built
    rng = np.random.default_rng(5)
    from spock_tpu.ops.riccati import project_dynamics

    z = rand_primal(rng, meta)
    x0 = jnp.asarray(rng.standard_normal(meta.nx))
    xp, up = project_dynamics(data, meta, z.x, z.u, x0)
    xp2, up2 = project_dynamics(data, meta, xp, up, x0)
    np.testing.assert_allclose(xp, xp2, atol=1e-8)
    np.testing.assert_allclose(up, up2, atol=1e-8)

    # another feasible point from a different target
    z2 = rand_primal(rng, meta)
    xw, uw = project_dynamics(data, meta, z2.x, z2.u, x0)
    inner = jnp.sum((z.x - xp) * (xp - xw)) + jnp.sum((z.u - up) * (up - uw))
    np.testing.assert_allclose(float(inner), 0.0, atol=1e-7)


def test_projection_S2_properties(built):
    """S2 is an orthogonal projection onto ker(M): idempotent, and output
    satisfies E'y = tau_child + s_child, F'y = 0 exactly."""
    data, meta = built
    t = meta.tree
    rng = np.random.default_rng(6)
    z = rand_primal(rng, meta)
    s_p, tau_p, y_p = prox.project_risk_kernel(
        data, meta, z.s[1:], z.tau, z.y
    )
    s_p2, tau_p2, y_p2 = prox.project_risk_kernel(data, meta, s_p, tau_p, y_p)
    np.testing.assert_allclose(s_p, s_p2, atol=1e-10)
    np.testing.assert_allclose(y_p, y_p2, atol=1e-10)

    E, F = np.asarray(data.E), np.asarray(data.F)
    y_np, s_np, tau_np = np.asarray(y_p), np.asarray(s_p), np.asarray(tau_p)
    for i in range(t.n_nonleaf):
        Ei = E[0] if E.shape[0] == 1 else E[i]
        Fi = F[0] if F.shape[0] == 1 else F[i]
        kids = [j - 1 for j in t.children(i)]  # non-root index
        np.testing.assert_allclose(
            Ei.T @ y_np[:, i], tau_np[kids] + s_np[kids], atol=1e-8
        )
        np.testing.assert_allclose(Fi.T @ y_np[:, i], 0.0, atol=1e-8)


def test_batched_consistency(built):
    """Batched (leading-dim) evaluation equals per-lane evaluation."""
    data, meta = built
    rng = np.random.default_rng(7)
    zb = rand_primal(rng, meta, batch=(3,))
    vb = rand_dual(rng, meta, batch=(3,))
    Lzb = linop.apply_L(data, meta, zb)
    for i in range(3):
        zi = zv.tmap(lambda a: a[i], zb)
        Lzi = linop.apply_L(data, meta, zi)
        for a, b in zip(
            jax.tree_util.tree_leaves(Lzi),
            jax.tree_util.tree_leaves(Lzb),
        ):
            np.testing.assert_allclose(a, b[i], atol=1e-12)
