"""Model resolution & caching (counterpart of reference model.py:37-56).

``download_model`` resolves a model name to a local checkpoint directory:
local paths pass through; otherwise the name is looked up in the cache directory
(``$WHISPERSEG_MODEL_CACHE``, default ``~/.cache/whisperseg_tpu_models/``) under a
sha256 of the name, attempting a HuggingFace Hub snapshot download on a miss when
the hub is reachable (this build environment has no egress — the cache-first path
is the production path)."""

from __future__ import annotations

import hashlib
import os


def model_cache_dir() -> str:
    return os.environ.get(
        "WHISPERSEG_MODEL_CACHE",
        os.path.expanduser("~/.cache/whisperseg_tpu_models/"),
    )


def download_model(model_name: str, ignore_cache: bool = False) -> str:
    """Local path passthrough, else cache lookup, else hub snapshot download."""
    if os.path.exists(model_name):
        return model_name
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
