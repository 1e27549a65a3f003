"""ctypes bindings for the native C++ CPU solver (native/spock_cpu.cpp).

The native tier plays the role of the reference's external baseline solvers
(Mosek/Ipopt/... via JuMP, ``model_mosek.jl``) but is self-contained: the
same splitting in double precision on one CPU core, with the offline
factorization supplied by the Python build step.  Supports uniform problem
data (shared Q/R/QN and risk measure across nodes) without polytopes; use
the JAX engine or scipy oracle otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import numpy as np

from .. import problem as prob
from ..risks import dual_cone
from ..tree import UniformTree

_KIND_CODE = {"zero": 0, "nonneg": 1, "nonpos": 2, "reals": 3, "soc": 4}

_LIB = None


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    so = os.path.join(root, "native", "libspock_cpu.so")
    if not os.path.exists(so):
        subprocess.run(
            ["sh", os.path.join(root, "native", "build.sh")], check=True
        )
    lib = ctypes.CDLL(so)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    argtypes = (
        [ctypes.c_int] * 5
        + [dp] * 11
        + [ctypes.c_double] * 4
        + [ip, ip, ctypes.c_int]
        + [dp]
        + [ctypes.c_double] * 3
        + [ctypes.c_long]
        + [dp, dp]
    )
    lib.spock_cpu_solve_cp.restype = ctypes.c_long
    lib.spock_cpu_solve_cp.argtypes = argtypes
    lib.spock_cpu_solve_sp.restype = ctypes.c_long
    lib.spock_cpu_solve_sp.argtypes = argtypes
    _LIB = lib
    return lib


class NativeSolver:
    """Chambolle-Pock solve on the native CPU backend."""

    def __init__(self, spec: prob.Spec):
        if spec.polytope is not None:
            raise NotImplementedError("native backend: no polytopes yet")
        t: UniformTree = spec.tree
        self.tree = t
        A = np.ascontiguousarray(spec.dynamics.A, dtype=np.float64)
        B = np.ascontiguousarray(spec.dynamics.B, dtype=np.float64)
        self.nx, self.nu = A.shape[-1], B.shape[-1]

        for name, arr in [("Q", spec.cost.Q), ("R", spec.cost.R), ("QN", spec.cost.QN)]:
            a = np.asarray(arr)
            if a.shape[0] != 1 and not np.all(a == a[:1]):
                raise NotImplementedError(
                    f"native backend: per-node {name} not supported"
                )
        E, F, b = spec.risk.E, spec.risk.F, spec.risk.b
        if b.shape[0] != 1 and not (
            np.all(E == E[:1]) and np.all(F == F[:1]) and np.all(b == b[:1])
        ):
            raise NotImplementedError("native backend: nonuniform risk")
        self.ny = b.shape[-1]

        self.sqrtQ = prob._sqrtm_psd(np.asarray(spec.cost.Q[:1], np.float64))[0]
        self.sqrtR = prob._sqrtm_psd(np.asarray(spec.cost.R[:1], np.float64))[0]
        self.sqrtQN = prob._sqrtm_psd(np.asarray(spec.cost.QN[:1], np.float64))[0]
        self.b = np.ascontiguousarray(b[0], np.float64)
        self.ker = np.ascontiguousarray(
            prob._kernel_projectors(
                type(spec.risk)(E=E[:1], F=F[:1], b=b[:1], cone=spec.risk.cone),
                t.d,
                uniform=True,
            )[0],
            np.float64,
        )
        ric = prob._riccati_offline(t, A, B, uniform=True)
        self.Kfac = np.ascontiguousarray(np.stack([k[0] for k in ric.K]))
        self.Rtinv = np.ascontiguousarray(np.stack([r[0] for r in ric.Rtinv]))
        self.ABK = np.ascontiguousarray(np.stack([a[0] for a in ric.ABK]))
        self.PB = np.ascontiguousarray(np.stack([a[0] for a in ric.PB]))
        self.A, self.B = A, B

        dc = dual_cone(spec.risk.cone)
        self.cone_kinds = np.asarray(
            [_KIND_CODE[k] for k, _ in dc], np.int32
        )
        self.cone_dims = np.asarray([d_ for _, d_ in dc], np.int32)

        self.box = (
            float(np.min(spec.constraints.x_min)),
            float(np.max(spec.constraints.x_max)),
            float(np.min(spec.constraints.u_min)),
            float(np.max(spec.constraints.u_max)),
        )

        # ||L||^2 from the JAX power iteration would need device code; use a
        # numpy power iteration on the same operator instead.
        self.L_sq = self._power_iteration()

        self.nz = (
            t.n * self.nx
            + t.n_nonleaf * self.nu
            + t.n
            + (t.n - 1)
            + t.n_nonleaf * self.ny
        )
        self.nv = (
            t.n_nonleaf * self.ny
            + t.n_nonleaf
            + (t.n - 1) * (self.nx + self.nu + 2)
            + t.n_nonleaf * (self.nx + self.nu)
            + t.n_leaf * (2 * self.nx + 2)
        )
        self.z = np.zeros(self.nz)
        self.v = np.zeros(self.nv)

    def _power_iteration(self, iters: int = 60) -> float:
        """numpy estimate of ||L||^2 (same math as ops.linop.estimate_L_sq)."""
        t = self.tree
        rng = np.random.default_rng(0)
        nx, nu, ny, d = self.nx, self.nu, self.ny, t.d
        x = rng.standard_normal((t.n, nx))
        u = rng.standard_normal((t.n_nonleaf, nu))
        s = rng.standard_normal(t.n)
        tau = rng.standard_normal(t.n - 1)
        y = rng.standard_normal((t.n_nonleaf, ny))
        lam = 1.0
        for _ in range(iters):
            # L
            xp = np.repeat(x[: t.n_nonleaf], d, axis=0)
            up = np.repeat(u, d, axis=0)
            v1 = y
            v2 = s[: t.n_nonleaf] - y @ self.b
            v3 = xp @ self.sqrtQ.T
            v4 = up @ self.sqrtR.T
            v5 = v6 = 0.5 * tau
            v7x, v7u = x[: t.n_nonleaf], u
            v11 = x[t.leaf_start :] @ self.sqrtQN.T
            v12 = v13 = 0.5 * s[t.leaf_start :]
            v14 = x[t.leaf_start :]
            # L'
            xn = v7x + (v3 @ self.sqrtQ).reshape(t.n_nonleaf, d, nx).sum(1)
            xl = v14 + v11 @ self.sqrtQN
            un = v7u + (v4 @ self.sqrtR).reshape(t.n_nonleaf, d, nu).sum(1)
            yn = v1 - np.outer(v2, self.b)
            taun = 0.5 * (v5 + v6)
            sn = np.concatenate([v2, 0.5 * (v12 + v13)])
            w = (np.concatenate([xn, xl]), un, sn, taun, yn)
            nrm_sq = sum(float(np.sum(a * a)) for a in w)
            dot = (
                float(np.sum(w[0] * x))
                + float(np.sum(w[1] * u))
                + float(np.sum(w[2] * s))
                + float(np.sum(w[3] * tau))
                + float(np.sum(w[4] * y))
            )
            denom = (
                float(np.sum(x * x))
                + float(np.sum(u * u))
                + float(np.sum(s * s))
                + float(np.sum(tau * tau))
                + float(np.sum(y * y))
            )
            lam = dot / max(denom, 1e-30)
            nrm = np.sqrt(max(nrm_sq, 1e-30))
            x, u, s, tau, y = (a / nrm for a in w)
        return lam * 1.02

    def solve(
        self,
        x0,
        tol: float = 1e-3,
        max_iter: int = 5000,
        warm_start: bool = True,
        algorithm: str = "cp",
    ):
        """Returns dict(x, u, s, tau, y, iterations, converged).  z/v persist
        across calls (implicit warm start, like the reference).
        algorithm: "cp" or "spock" (SuperMann + Anderson)."""
        lib = _lib()
        t = self.tree
        if not warm_start:
            self.z[:] = 0.0
            self.v[:] = 0.0
        step = 0.99 / np.sqrt(self.L_sq)
        x0 = np.ascontiguousarray(x0, np.float64)
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int32)
        as_dp = lambda a: a.ctypes.data_as(dp)
        fn = (
            lib.spock_cpu_solve_sp
            if algorithm == "spock"
            else lib.spock_cpu_solve_cp
        )
        it = fn(
            t.N,
            t.d,
            self.nx,
            self.nu,
            self.ny,
            as_dp(self.A),
            as_dp(self.B),
            as_dp(np.ascontiguousarray(self.sqrtQ)),
            as_dp(np.ascontiguousarray(self.sqrtR)),
            as_dp(np.ascontiguousarray(self.sqrtQN)),
            as_dp(self.b),
            as_dp(self.ker),
            as_dp(self.Kfac),
            as_dp(self.Rtinv),
            as_dp(self.ABK),
            as_dp(self.PB),
            *self.box,
            self.cone_kinds.ctypes.data_as(ip),
            self.cone_dims.ctypes.data_as(ip),
            len(self.cone_dims),
            as_dp(x0),
            step,
            step,
            tol,
            max_iter,
            as_dp(self.z),
            as_dp(self.v),
        )
        converged = it >= 0
        iters = it if converged else -1 - it
        nx, nu, ny = self.nx, self.nu, self.ny
        ox, ou = 0, t.n * nx
        os_, ot = ou + t.n_nonleaf * nu, ou + t.n_nonleaf * nu + t.n
        oy = ot + t.n - 1
        return {
            "x": self.z[ox:ou].reshape(t.n, nx).copy(),
            "u": self.z[ou:os_].reshape(t.n_nonleaf, nu).copy(),
            "s": self.z[os_:ot].copy(),
            "tau": self.z[ot:oy].copy(),
            "y": self.z[oy:].reshape(t.n_nonleaf, ny).copy(),
            "iterations": iters,
            "converged": converged,
            "objective": float(self.z[os_]),
        }
