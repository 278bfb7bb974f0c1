"""Checkpoint save/load.

One self-contained directory per checkpoint (replacing the reference's dual
HF-checkpoint + CTranslate2-export layout, reference model.py:59-74,
convert_hf_to_ct2.py): ``config.json`` carries the architecture plus the
segmentation metadata the reference stores inside the HF config
(total_spec_columns, cluster_codebook, default_segmentation_config,
current_step), and ``params.npz`` carries the flat pytree of weights.
The same checkpoint serves training resume and fast inference.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Optional, Tuple

import numpy as np

from .models.config import WhisperConfig

_SEP = "."


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(
    directory: str,
    params,
    config: WhisperConfig,
    step: Optional[int] = None,
    dtype: Optional[str] = None,
) -> str:
    """Write params + config to ``directory``. ``dtype`` optionally narrows storage
    (e.g. 'bfloat16' halves checkpoint size; params are restored as float32)."""
    os.makedirs(directory, exist_ok=True)
    if step is not None:
        config.current_step = int(step)
    flat = _flatten(params)
    if dtype is not None:
        import jax.numpy as jnp

        flat = {k: np.asarray(v.astype(jnp.dtype(dtype))).view(np.uint16)
                if dtype == "bfloat16" else np.asarray(v, dtype=dtype)
                for k, v in flat.items()}
    np.savez(os.path.join(directory, "params.npz"), **flat)
    meta = config.to_dict()
    meta["__storage_dtype__"] = dtype or "float32"
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return directory


def load_checkpoint(directory: str, as_jax: bool = True) -> Tuple[dict, WhisperConfig]:
    with open(os.path.join(directory, "config.json")) as f:
        meta = json.load(f)
    storage_dtype = meta.pop("__storage_dtype__", "float32")
    config = WhisperConfig.from_dict(meta)
    with np.load(os.path.join(directory, "params.npz")) as z:
        flat = {k: z[k] for k in z.files}
    if storage_dtype == "bfloat16":
        import jax.numpy as jnp

        flat = {k: np.asarray(v.view(jnp.bfloat16), dtype=np.float32)
                for k, v in flat.items()}
    params = _unflatten(flat)
    if as_jax:
        import jax
        import jax.numpy as jnp

        params = jax.tree.map(jnp.asarray, params)
    return params, config


# ------------------------------------------------- training checkpoint lifecycle


def save_training_checkpoint(
    model_folder: str,
    params,
    config: WhisperConfig,
    step: int,
    max_to_keep: int = -1,
    keep_step: Optional[int] = None,
) -> str:
    """Write ``model_folder/checkpoint-{step}`` and prune oldest beyond
    ``max_to_keep`` (reference model.py:59-74).

    ``keep_step`` (the current best-validation step) is exempt from pruning so
    max_to_keep rotation cannot delete the checkpoint that
    :func:`finalize_best_checkpoint` is later supposed to promote."""
    path = os.path.join(model_folder, f"checkpoint-{step}")
    save_checkpoint(path, params, config, step=step)
    if max_to_keep is not None and max_to_keep > 0:
        protected = (os.path.join(model_folder, f"checkpoint-{keep_step}")
                     if keep_step is not None else None)
        ckpts = [c for c in list_checkpoints(model_folder) if c != protected]
        for old in ckpts[:-max_to_keep]:
            shutil.rmtree(old, ignore_errors=True)
    return path


def list_checkpoints(model_folder: str):
    """checkpoint-* dirs sorted by step number."""
    out = []
    if not os.path.isdir(model_folder):
        return out
    for name in os.listdir(model_folder):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(model_folder, name)))
    out.sort()
    return [p for _, p in out]


def finalize_best_checkpoint(model_folder: str, best_step: Optional[int]) -> Optional[str]:
    """Copy the winning checkpoint to ``final_checkpoint`` and delete the rest
    (reference train.py:293-308). ``best_step`` None -> newest checkpoint."""
    ckpts = list_checkpoints(model_folder)
    if not ckpts:
        return None
    if best_step is not None:
        src = os.path.join(model_folder, f"checkpoint-{best_step}")
        if src not in ckpts:
            print(f"Warning: best-validation checkpoint-{best_step} no longer "
                  f"exists (pruned?); falling back to {ckpts[-1]}")
            src = ckpts[-1]
    else:
        src = ckpts[-1]
    dst = os.path.join(model_folder, "final_checkpoint")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    for c in ckpts:
        shutil.rmtree(c, ignore_errors=True)
    return dst
