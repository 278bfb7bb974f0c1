#!/usr/bin/env python
"""Decode a test folder ONCE, then score raw + energy-refined predictions at
several search widths — isolates the boundary-refinement contribution without
re-running the model.

    python scripts/eval_refine_sweep.py --dataset_folder /tmp/zf/test \
        --model_path /tmp/zf/w4/final_checkpoint --max_length 100
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset_folder", required=True)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--num_trials", type=int, default=1)
    ap.add_argument("--max_length", type=int, default=100)
    ap.add_argument("--num_beams", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--widths_ms", type=float, nargs="+",
                    default=[20.0, 30.0, 40.0, 60.0])
    ap.add_argument("--split_db", type=float, nargs="+", default=[],
                    help="also score energy-valley splitting at these dB "
                         "drops, alone and combined with each refine width")
    ap.add_argument("--merge_gap_ms", type=float, nargs="+", default=[],
                    help="also score small-gap merging at these thresholds, "
                         "alone and combined with each split dB")
    ap.add_argument("--compute_type", default="bfloat16")
    args = ap.parse_args(argv)

    from whisperseg_tpu.audio.io import load_audio
    from whisperseg_tpu.data import get_audio_and_label_paths, read_label
    from whisperseg_tpu.refine import (merge_small_gaps, refine_prediction,
                                       split_merged_segments)
    from whisperseg_tpu.segmenter import Segmenter

    audio_paths, label_paths = get_audio_and_label_paths(args.dataset_folder)
    seg = Segmenter.from_pretrained(args.model_path,
                                    inference_dtype=args.compute_type)

    cases = {"raw": []}
    for w in args.widths_ms:
        cases[f"refine_{w:g}ms"] = []
    for d in args.split_db:
        cases[f"split_{d:g}db"] = []
        for w in args.widths_ms:
            cases[f"split_{d:g}db+refine_{w:g}ms"] = []
    for g in args.merge_gap_ms:
        cases[f"merge_{g:g}ms"] = []
        for d in args.split_db:
            cases[f"merge_{g:g}ms+split_{d:g}db"] = []
    labels = []
    for ap_, lp in zip(audio_paths, label_paths):
        label = read_label(lp)
        audio, sr = load_audio(ap_, sr=label.get("sr", None))
        label["sr"] = sr
        labels.append(label)
        pred = seg.segment(audio, sr=sr,
                           min_frequency=label.get("min_frequency", None),
                           spec_time_step=label.get("spec_time_step", None),
                           num_trials=args.num_trials,
                           num_beams=args.num_beams,
                           batch_size=args.batch_size,
                           max_length=args.max_length,
                           # sweep from RAW decodes: explicitly disable any
                           # fitted combo stored in the checkpoint
                           merge_gap_ms=0, split_merged_db=0,
                           refine_boundaries_ms=0)
        cases["raw"].append(pred)
        for w in args.widths_ms:
            cases[f"refine_{w:g}ms"].append(
                refine_prediction(pred, audio, sr, search_ms=w))
        for d in args.split_db:
            sp = split_merged_segments(pred, audio, sr, drop_db=d)
            cases[f"split_{d:g}db"].append(sp)
            for w in args.widths_ms:
                cases[f"split_{d:g}db+refine_{w:g}ms"].append(
                    refine_prediction(sp, audio, sr, search_ms=w))
        for g in args.merge_gap_ms:
            mg = merge_small_gaps(pred, gap_s=g / 1000.0)
            cases[f"merge_{g:g}ms"].append(mg)
            for d in args.split_db:
                cases[f"merge_{g:g}ms+split_{d:g}db"].append(
                    split_merged_segments(mg, audio, sr, drop_db=d))
        print(f"decoded {os.path.basename(ap_)}: {len(pred['onset'])} "
              f"segments", file=sys.stderr, flush=True)

    out = {}
    for name, preds in cases.items():
        seg_tp = seg_p = seg_l = fr_tp = fr_p = fr_l = 0
        for pred, label in zip(preds, labels):
            tp, p, l = seg.segment_score(pred, label)[:3]
            seg_tp += tp; seg_p += p; seg_l += l
            tp, p, l = seg.frame_score(pred, label)[:3]
            fr_tp += tp; fr_p += p; fr_l += l

        def f1(tp, p, l):
            pr, rc = tp / max(p, 1e-9), tp / max(l, 1e-9)
            return round(2 * pr * rc / max(pr + rc, 1e-9), 4)

        out[name] = {"segment_F1": f1(seg_tp, seg_p, seg_l),
                     "frame_F1": f1(fr_tp, fr_p, fr_l)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
