"""Model resolution & caching (counterpart of reference model.py:37-56).

``download_model`` resolves a model name to a local checkpoint directory:
local paths pass through; built-in names resolve to checkpoints shipped under
``<repo>/pretrained/`` (the counterpart of the reference's two hardcoded
ready-to-use hub entries, reference scripts/backend.py:368-375); otherwise
the name is looked up in the cache directory (``$WHISPERSEG_MODEL_CACHE``,
default ``~/.cache/whisperseg_tpu_models/``) under a sha256 of the name,
attempting a HuggingFace Hub snapshot download on a miss when the hub is
reachable (this build environment has no egress — the cache-first path is the
production path)."""

from __future__ import annotations

import hashlib
import os


def pretrained_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pretrained")


def builtin_models() -> dict:
    """{name: checkpoint path} for ready-to-use models shipped in-repo —
    every ``pretrained/<name>/`` directory containing a checkpoint."""
    out = {}
    root = pretrained_dir()
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            path = os.path.join(root, name)
            if os.path.exists(os.path.join(path, "config.json")):
                out[name] = path
    return out


def default_pretrained_model() -> str | None:
    """Path of the default ready model (the multi-species generalist), or
    the first builtin, or None."""
    models = builtin_models()
    for name in ("whisperseg-base-animal-vad",):
        if name in models:
            return models[name]
    return next(iter(models.values()), None)


def model_cache_dir() -> str:
    return os.environ.get(
        "WHISPERSEG_MODEL_CACHE",
        os.path.expanduser("~/.cache/whisperseg_tpu_models/"),
    )


def download_model(model_name: str, ignore_cache: bool = False) -> str:
    """Local path passthrough, else cache lookup, else hub snapshot download."""
    if os.path.exists(model_name):
        return model_name
    builtin = builtin_models().get(model_name)
    if builtin is not None:
        return builtin
    digest = hashlib.sha256(model_name.encode()).hexdigest()
    target = os.path.join(model_cache_dir(), digest)
    if os.path.isdir(target) and os.listdir(target) and not ignore_cache:
        return target
    try:
        import shutil

        from huggingface_hub import snapshot_download

        # download into a sibling temp dir and promote atomically: an
        # interrupted download must not leave a partial tree that the
        # non-empty-dir cache check above then serves forever
        tmp = target + ".partial"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        snapshot_download(model_name, local_dir=tmp)
        shutil.rmtree(target, ignore_errors=True)
        os.replace(tmp, target)
        return target
    except Exception as e:
        raise FileNotFoundError(
            f"model {model_name!r} is neither a local path nor cached under "
            f"{target}, and hub download failed ({type(e).__name__}: {e})"
        )
