"""Multi-host initialization.

Single-host slices need nothing; on a multi-host TPU pod each process must
join the global runtime before building meshes. All mesh/sharding code in this
package is written against ``jax.devices()`` (global view), so after
``initialize()`` the same training/inference code runs unchanged — data
parallelism rides ICI within a slice and DCN across hosts, laid out by
``make_mesh`` device order.

Exercised in a REAL multi-process run (two OS processes, 4 virtual devices
each, gradient all-reduce over the TCP-coordinated distributed runtime — the
DCN stand-in) in tests/test_multihost.py; multi-host TPU hardware itself is
not available in dev (tracked in PARITY.md).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host JAX runtime (no-op on single-host).

    With no arguments, jax auto-detects TPU pod metadata; explicit values (or
    the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    env vars) override.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single-host / already initialized
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def per_host_batch_slice(global_batch: int) -> slice:
    """The slice of a globally sharded batch this host should feed."""
    import jax

    n = jax.process_count()
    idx = jax.process_index()
    if global_batch % n:
        raise ValueError(
            f"global_batch={global_batch} is not divisible by the "
            f"{n} participating hosts — the tail samples would silently "
            f"never be fed; pad or trim the batch to a multiple of {n}")
    per = global_batch // n
    return slice(idx * per, (idx + 1) * per)
