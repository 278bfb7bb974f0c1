#!/usr/bin/env python
"""Bundle (and, with network access, publish) a trained model.

Counterpart of the reference's ``scripts/Upload_Model.ipynb``, which pushes
a finetuned checkpoint + tokenizer to the HuggingFace hub. This script:

  1. exports the checkpoint to HF layout (scripts/export_hf.py semantics),
  2. writes a model card (README.md) with the species presets and the
     checkpoint's own fitted segmentation defaults,
  3. optionally pushes to the hub (``--repo_id``; requires network egress
     and a ``HF_TOKEN`` — skipped gracefully when offline).

    python scripts/push_model.py --model_path ./ckpt/final_checkpoint \
        --output_dir ./bundle [--repo_id user/whisperseg-finetune]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CARD_TEMPLATE = """---
tags:
- whisperseg
- voice-activity-detection
- audio-segmentation
library_name: transformers
---

# {name}

A WhisperSeg vocal-segmentation model trained with the WhisperSeg-TPU
framework ({steps} training steps). Loads with HuggingFace ``transformers``
(``WhisperForConditionalGeneration`` + ``WhisperTokenizer`` from this
directory) or natively with ``whisperseg_tpu`` (``scripts/convert_hf.py``
imports it back losslessly, frame head included).

## Default segmentation configuration

These values ride inside ``config.json`` as
``default_segmentation_config`` and are applied automatically by
``segment()``:

```json
{dsc}
```

## Cluster codebook

```json
{codebook}
```
"""


def write_bundle(model_path: str, output_dir: str, name: str = None) -> str:
    from whisperseg_tpu.checkpoint import load_checkpoint
    from whisperseg_tpu.models.export_hf import export_hf_checkpoint

    params, cfg = load_checkpoint(model_path, as_jax=False)
    export_hf_checkpoint(params, cfg, output_dir)

    name = name or os.path.basename(os.path.abspath(output_dir))
    card = CARD_TEMPLATE.format(
        name=name, steps=cfg.current_step,
        dsc=json.dumps(cfg.default_segmentation_config, indent=2),
        codebook=json.dumps(cfg.cluster_codebook, indent=2))
    with open(os.path.join(output_dir, "README.md"), "w") as f:
        f.write(card)
    return output_dir


def push_to_hub(output_dir: str, repo_id: str) -> bool:
    """Upload the bundle. Returns False (with a message) when offline or
    huggingface_hub is unavailable — the bundle is still complete on disk."""
    try:
        from huggingface_hub import HfApi
    except ImportError:
        print("huggingface_hub not installed; bundle left on disk at "
              f"{output_dir}", file=sys.stderr)
        return False
    try:
        api = HfApi()
        api.create_repo(repo_id, exist_ok=True)
        api.upload_folder(folder_path=output_dir, repo_id=repo_id)
        return True
    except Exception as e:  # noqa: BLE001 - network/auth errors -> offline
        print(f"hub upload failed ({type(e).__name__}: {e}); bundle left "
              f"on disk at {output_dir}", file=sys.stderr)
        return False


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--name", default=None, help="model card title")
    parser.add_argument("--repo_id", default=None,
                        help="HF hub repo to push to (needs network+token)")
    args = parser.parse_args(argv)

    from whisperseg_tpu.runtime import respect_jax_platforms_env

    respect_jax_platforms_env()

    write_bundle(args.model_path, args.output_dir, args.name)
    print(f"Bundled {args.model_path} -> {args.output_dir}")
    if args.repo_id:
        if push_to_hub(args.output_dir, args.repo_id):
            print(f"Pushed to https://huggingface.co/{args.repo_id}")


if __name__ == "__main__":
    main()
