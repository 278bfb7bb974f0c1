#!/usr/bin/env python
"""Evaluate ONE model across SEVERAL labeled corpora in one process.

The multi-corpus held-out protocol (RESULTS.md per-species tables) previously
ran scripts/evaluate.py once per folder, re-paying model load and every jit
compile each time — expensive over a remote-compile tunnel (DEVNOTES.md).
This loads the Segmenter once and reuses its compiled programs across
folders, printing one JSON object {name: scores} plus a readable table.

    python scripts/evaluate_many.py --model_path CKPT --frame_mode 1 \
        --ignore_cluster 1 --datasets zf=/tmp/gen/test_zf ms=/tmp/ms/test \
        --output_path /tmp/evals.json

Counterpart of running the reference's evaluate.py over its dataset list
(reference evaluate.py:53-84 iterates one folder; the reference README's
result tables are produced by repeated invocations).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisperseg_tpu.runtime import respect_jax_platforms_env  # noqa: E402

respect_jax_platforms_env()

from whisperseg_tpu.evaluate import evaluate_dataset  # noqa: E402
from whisperseg_tpu.segmenter import Segmenter  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--datasets", nargs="+", required=True,
                    metavar="NAME=FOLDER",
                    help="one or more name=folder pairs to score")
    # defaults match scripts/evaluate.py (the single-corpus protocol and the
    # reference's production knobs, reference model.py:398-425) so decode-mode
    # scores from this batch tool agree with it; under --frame_mode 1 both
    # knobs are unused by construction (no autoregressive decode runs)
    ap.add_argument("--num_trials", type=int, default=3)
    ap.add_argument("--num_beams", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_length", type=int, default=None)
    ap.add_argument("--compute_type", default="bfloat16")
    ap.add_argument("--frame_mode", type=int, default=0)
    ap.add_argument("--ignore_cluster", type=int, default=0)
    ap.add_argument("--label_tolerance", type=int, default=0)
    ap.add_argument("--output_path", default=None)
    args = ap.parse_args()

    pairs = []
    for spec in args.datasets:
        if "=" not in spec:
            raise SystemExit(f"--datasets entries are NAME=FOLDER, got {spec!r}")
        name, folder = spec.split("=", 1)
        if not os.path.isdir(folder):
            raise SystemExit(f"{folder} is not a directory")
        pairs.append((name, folder))

    segmenter = Segmenter.from_pretrained(args.model_path,
                                          inference_dtype=args.compute_type)
    results = {}
    for name, folder in pairs:
        print(f"=== {name}: {folder}", flush=True)
        results[name] = evaluate_dataset(
            folder, args.model_path,
            num_trials=args.num_trials, num_beams=args.num_beams,
            batch_size=args.batch_size, max_length=args.max_length,
            frame_mode=bool(args.frame_mode),
            ignore_cluster=bool(args.ignore_cluster),
            label_tolerance=bool(args.label_tolerance),
            segmenter=segmenter)
        seg = results[name]["segment_wise_scores"]
        fr = results[name]["frame_wise_scores"]
        print(f"  segment F1 {seg['F1']:.4f}  frame F1 {fr['F1']:.4f}", flush=True)

    print(json.dumps(results))
    if args.output_path:
        with open(args.output_path, "w") as f:
            json.dump(results, f, indent=1)
    print(f"{'set':12s} {'seg-P':>7s} {'seg-R':>7s} {'seg-F1':>7s} "
          f"{'frm-P':>7s} {'frm-R':>7s} {'frm-F1':>7s}")
    for name, res in results.items():
        s, fr = res["segment_wise_scores"], res["frame_wise_scores"]
        print(f"{name:12s} {s['precision']:7.4f} {s['recall']:7.4f} "
              f"{s['F1']:7.4f} {fr['precision']:7.4f} {fr['recall']:7.4f} "
              f"{fr['F1']:7.4f}")


if __name__ == "__main__":
    main()
