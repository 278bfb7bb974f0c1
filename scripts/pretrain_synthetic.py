#!/usr/bin/env python
"""Synthetic task pretraining CLI — manufacture a pretrained initialization.

The in-environment substitute for the reference's pretrained-Whisper loading
(reference model.py:76-115): randomized synthetic vocalization corpora at the
production presets' frontend configs, trained with the exact finetuning
objective (timestamp decoding + frame head). Device-resident data pool +
scanned multi-step updates (see whisperseg_tpu/pretrain.py).

    python scripts/pretrain_synthetic.py --model base \
        --model_folder /tmp/pt/model --steps 40000

The resulting final_checkpoint feeds train.py --initial_model_path directly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisperseg_tpu.pretrain import PoolSpec, PretrainArgs, run_pretraining  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="base")
    ap.add_argument("--model_folder", required=True)
    ap.add_argument("--steps", type=int, default=40000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--pool_items", type=int, default=1536)
    ap.add_argument("--refresh_every", type=int, default=2500)
    ap.add_argument("--steps_per_call", type=int, default=100)
    ap.add_argument("--learning_rate", type=float, default=5e-4)
    ap.add_argument("--warmup_steps", type=int, default=500)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max_clusters", type=int, default=5)
    ap.add_argument("--save_every", type=int, default=10000)
    ap.add_argument("--total_spec_columns", type=int, default=1000)
    ap.add_argument("--max_length", type=int, default=100)
    args = ap.parse_args(argv)

    spec = PoolSpec(total_spec_columns=args.total_spec_columns,
                    max_length=args.max_length)
    run_pretraining(PretrainArgs(
        model=args.model, model_folder=args.model_folder, steps=args.steps,
        batch_size=args.batch_size, pool_items=args.pool_items,
        refresh_every=args.refresh_every, steps_per_call=args.steps_per_call,
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        dropout=args.dropout, seed=args.seed, max_clusters=args.max_clusters,
        save_every=args.save_every, spec=spec))


if __name__ == "__main__":
    main()
