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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU collectives CHECK-fail (SIGABRT) if the virtual devices' threads
# don't all reach a rendezvous within 40 s. On a 1-core box under load the
# 8 mesh threads are scheduled serially and can legitimately take longer —
# raise the hard kill to 20 min (warn stays informative at 2 min).
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
