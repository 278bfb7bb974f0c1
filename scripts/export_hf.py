#!/usr/bin/env python
"""Export a WhisperSeg-TPU checkpoint to a HuggingFace Whisper directory.

The reverse of scripts/convert_hf.py: the output directory loads with
``transformers.WhisperForConditionalGeneration.from_pretrained`` + the
bundled tokenizer, carrying the WhisperSeg config metadata the reference
reads off the config object (reference model.py:625-644) — so a reference
user can consume a WhisperSeg-TPU finetune directly.

    python scripts/export_hf.py --model_path ./ckpt/final_checkpoint \
        --output_dir ./hf_export
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", required=True,
                        help="WhisperSeg-TPU checkpoint directory")
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args(argv)

    from whisperseg_tpu.runtime import respect_jax_platforms_env

    respect_jax_platforms_env()

    from whisperseg_tpu.checkpoint import load_checkpoint
    from whisperseg_tpu.models.export_hf import export_hf_checkpoint

    params, cfg = load_checkpoint(args.model_path, as_jax=False)
    export_hf_checkpoint(params, cfg, args.output_dir)
    print(f"Exported {args.model_path} -> {args.output_dir} (HF layout)")


if __name__ == "__main__":
    main()
