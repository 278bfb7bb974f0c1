"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are validated
against XLA's host-platform device virtualization instead.
"""

import os
import sys

# Env vars must be set before the XLA backend is created. Note that installed
# pytest plugins may import jax before this conftest runs, so we also update the
# live jax config below (effective as long as no backend has been initialized).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
