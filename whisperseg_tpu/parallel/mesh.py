"""Device mesh + sharding layout.

This module is the rebuild's entire "distributed communication backend". The
reference's multi-device story is host-side: ``nn.DataParallel`` replicas + NCCL
for training (reference train.py:132) and one Python thread per GPU for inference
(reference model.py:169-189). Here the equivalent is declarative: a
``jax.sharding.Mesh`` with axes ``("data", "model")`` and PartitionSpecs; XLA GSPMD
inserts the all-reduces/all-gathers over ICI. No hand-written collectives.

Supported layouts:
  * data parallelism ("data" axis): batches sharded, gradients all-reduced —
    covers the reference's DataParallel training and threaded inference fan-out.
  * tensor parallelism ("model" axis): attention heads and MLP hidden dim sharded
    across chips — beyond the reference's capability, useful to fit/accelerate
    whisper-large decoding on small chips.
  * optional FSDP-style parameter sharding over "data" for memory-limited training.

Pipeline/sequence/expert parallelism are intentionally absent: the architecture has
no MoE, and long audio is handled algorithmically by windowing (SURVEY §2.12,
reference model.py:127-166), not by sequence-parallel attention.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import WhisperConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """A (dp, tp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_pspecs(params, cfg: WhisperConfig, tp: bool = False, fsdp: bool = False,
                 data_size: int = 0):
    """PartitionSpec pytree for the parameter pytree.

    tp=True shards attention projections by head and the MLP hidden dim over the
    "model" axis (column-parallel q/k/v/fc1, row-parallel o/fc2 — the standard
    Megatron layout, expressed purely as shardings). fsdp=True additionally shards
    the remaining large leaves over "data" (weights are all-gathered on use by
    GSPMD). ``data_size`` (the data-axis extent, when known) restricts fsdp
    sharding to dims it divides — a leaf with no such dim stays replicated
    rather than erroring (e.g. a 3-way mesh over power-of-two dims).
    """
    def spec_for(path: str, leaf) -> P:
        ndim = np.ndim(leaf)
        if tp:
            name = path.split(".")[-1]
            if name in ("q_w", "k_w", "v_w", "fc1_w", "xq_w", "xk_w", "xv_w"):
                return P(*([None] * (ndim - 1)), MODEL_AXIS)      # column parallel
            if name in ("o_w", "fc2_w", "xo_w"):
                return P(*([None] * (ndim - 2)), MODEL_AXIS, None)  # row parallel
            if name in ("q_b", "v_b", "fc1_b", "xq_b", "xv_b"):
                return P(*([None] * (ndim - 1)), MODEL_AXIS)
        if fsdp and ndim >= 2:
            # shard the largest data_size-divisible dim over "data"
            order = np.argsort(np.shape(leaf))[::-1]
            for axis in order:
                if data_size <= 1 or np.shape(leaf)[axis] % data_size == 0:
                    spec = [None] * ndim
                    spec[int(axis)] = DATA_AXIS
                    return P(*spec)
        return P()

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}.{k}" if prefix else k)
                    for k, v in tree.items()}
        return spec_for(prefix, tree)

    return walk(params)


def param_shardings(mesh: Mesh, params, cfg: WhisperConfig, tp: bool = False,
                    fsdp: bool = False):
    specs = param_pspecs(params, cfg, tp=tp, fsdp=fsdp,
                         data_size=int(mesh.shape.get(DATA_AXIS, 0)))
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params, cfg: WhisperConfig, tp: bool = False,
                 fsdp: bool = False):
    """Place a parameter pytree onto the mesh with the chosen layout."""
    shardings = param_shardings(mesh, params, cfg, tp=tp, fsdp=fsdp)
    return jax.tree.map(jax.device_put, params, shardings)
