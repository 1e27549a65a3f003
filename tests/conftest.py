"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip logic is exercised on host-platform virtual devices
(xla_force_host_platform_device_count) so tests don't need TPU hardware;
float64 gives us clean oracles for the numerical property tests.
"""

import os

# The container pins JAX_PLATFORMS=axon (tunneled TPU); tests must run on
# host CPU with virtual devices, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already with platforms=axon; force cpu.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
