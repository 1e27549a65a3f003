"""Multi-host execution smoke test: 2 ``jax.distributed`` processes (the
DCN-analogue path, SURVEY.md §7 step 7) solving one dp-sharded batch whose
lane axis spans both processes.  Verifies ``parallel.mesh.init_distributed``
plus cross-process sharded solves against a single-process reference."""

import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from spock_tpu import build
from spock_tpu.models import server_heat
from spock_tpu.solver import Solver


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(
    os.environ.get("SPOCK_SKIP_MULTIHOST", "0") == "1",
    reason="multi-process test disabled",
)
def test_two_process_distributed_solve(tmp_path):
    port = _free_port()
    out = tmp_path / "mh_out.npz"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(out)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    got = np.load(out)
    assert np.all(got["status"] == 0)

    # single-process reference (this test process runs the plain CPU path)
    spec = server_heat.make_spec(N=3, nx=3, d=2)
    data, meta = build(spec, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-0.5, 0.5, (8, meta.nx))
    ref = Solver(data, meta, algorithm="spock").solve(x0, tol=1e-6)
    np.testing.assert_allclose(
        got["u"], np.asarray(ref.z.u), atol=1e-5
    )
    np.testing.assert_allclose(
        got["s0"], np.asarray(ref.z.s[:, 0]), atol=1e-5
    )
