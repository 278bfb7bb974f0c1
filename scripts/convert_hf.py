#!/usr/bin/env python
"""Convert a HuggingFace Whisper checkpoint into a WhisperSeg-TPU checkpoint.

The counterpart of the reference's ``convert_hf_to_ct2.py`` (which exports to
CTranslate2 with int8_float16). Here no separate inference format exists — one
checkpoint serves training and inference — so this script only performs the
one-time HF -> pytree import, optionally narrowing storage to bfloat16.

    python scripts/convert_hf.py --model /path/to/hf_whisper \
        --output_dir ./converted --storage_dtype bfloat16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True, help="HF checkpoint directory")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--total_spec_columns", type=int, default=None,
                        help="default: the checkpoint's own stamped value "
                             "(1000 when the config carries none)")
    parser.add_argument("--storage_dtype", default=None,
                        choices=[None, "float32", "bfloat16"],
                        help="checkpoint storage dtype (bfloat16 halves size)")
    # accepted for CLI compatibility with convert_hf_to_ct2.py; quantization in
    # this framework happens at load time (Segmenter inference_dtype='int8')
    parser.add_argument("--quantization", default=None)
    args = parser.parse_args(argv)

    from whisperseg_tpu.runtime import respect_jax_platforms_env

    respect_jax_platforms_env()

    from whisperseg_tpu.checkpoint import save_checkpoint
    from whisperseg_tpu.models.convert_hf import import_hf_checkpoint

    params, cfg = import_hf_checkpoint(args.model, args.total_spec_columns)
    save_checkpoint(args.output_dir, params, cfg, dtype=args.storage_dtype)
    print(f"Converted {args.model} -> {args.output_dir}")


if __name__ == "__main__":
    main()
