#!/usr/bin/env python
"""Boundary-error diagnostic: decode a test folder, match predictions to
ground truth by temporal overlap, and report WHERE segment-wise F1 is lost —
boundary jitter (fixable by refinement/finer training) vs structural
split/merge errors (not fixable post hoc).

    JAX_PLATFORMS=cpu python scripts/diagnose_boundaries.py \
        --dataset_folder /tmp/zf/test --model_path ... --max_length 100
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from whisperseg_tpu.runtime import respect_jax_platforms_env
    respect_jax_platforms_env()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset_folder", required=True)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--max_length", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--refine_boundaries_ms", type=float, default=None)
    ap.add_argument("--compute_type", default="bfloat16")
    args = ap.parse_args(argv)

    import numpy as np

    from whisperseg_tpu.audio.io import load_audio
    from whisperseg_tpu.data import get_audio_and_label_paths, read_label
    from whisperseg_tpu.segmenter import Segmenter

    audio_paths, label_paths = get_audio_and_label_paths(args.dataset_folder)
    seg = Segmenter.from_pretrained(args.model_path,
                                    inference_dtype=args.compute_type)

    on_err, off_err = [], []
    n_gt = n_pred = 0
    gt_split = 0       # GT segments overlapped by >= 2 predictions
    gt_missed = 0      # GT segments with no overlapping prediction
    pred_merge = 0     # predictions overlapping >= 2 GT segments
    pred_spurious = 0  # predictions overlapping no GT segment

    for ap_, lp in zip(audio_paths, label_paths):
        label = read_label(lp)
        audio, sr = load_audio(ap_, sr=label.get("sr", None))
        # explicit zeros: checkpoint-FITTED post-processing knobs
        # (fit_postprocess --write) must not silently activate inside a
        # diagnostic of the RAW decode; only the flag under study applies
        pred = seg.segment(audio, sr=sr,
                           min_frequency=label.get("min_frequency", None),
                           spec_time_step=label.get("spec_time_step", None),
                           num_trials=1, num_beams=1,
                           batch_size=args.batch_size,
                           max_length=args.max_length,
                           refine_boundaries_ms=args.refine_boundaries_ms or 0,
                           merge_gap_ms=0, split_merged_db=0,
                           frame_split=0, frame_refine_ms=0, frame_filter=0)
        P = np.array([pred["onset"], pred["offset"]]).T.reshape(-1, 2)
        G = np.array([label["onset"], label["offset"]]).T.reshape(-1, 2)
        n_gt += len(G)
        n_pred += len(P)
        if not len(P) or not len(G):
            gt_missed += len(G)
            pred_spurious += len(P)
            continue
        # overlap matrix
        ov = (np.minimum(P[:, None, 1], G[None, :, 1])
              - np.maximum(P[:, None, 0], G[None, :, 0])).clip(min=0)
        gt_hits = (ov > 0).sum(axis=0)
        pred_hits = (ov > 0).sum(axis=1)
        gt_split += int((gt_hits >= 2).sum())
        gt_missed += int((gt_hits == 0).sum())
        pred_merge += int((pred_hits >= 2).sum())
        pred_spurious += int((pred_hits == 0).sum())
        # one-to-one pairs: GT matched by exactly one pred that matches only it
        for gi in np.where(gt_hits == 1)[0]:
            pi = int(np.argmax(ov[:, gi]))
            if pred_hits[pi] == 1:
                on_err.append(P[pi, 0] - G[gi, 0])
                off_err.append(P[pi, 1] - G[gi, 1])

    on_err = np.asarray(on_err)
    off_err = np.asarray(off_err)

    def stats(e):
        if not len(e):
            return {}
        a = np.abs(e) * 1000
        return {"bias_ms": round(float(np.mean(e)) * 1000, 2),
                "abs_p50_ms": round(float(np.percentile(a, 50)), 2),
                "abs_p90_ms": round(float(np.percentile(a, 90)), 2),
                "pct_within_10ms": round(float((a <= 10).mean()) * 100, 1)}

    both = (np.abs(on_err) <= 0.01) & (np.abs(off_err) <= 0.01) \
        if len(on_err) else np.array([])
    print(json.dumps({
        "n_gt": n_gt, "n_pred": n_pred,
        "one_to_one_pairs": len(on_err),
        "gt_split_by_multiple_preds": gt_split,
        "gt_missed": gt_missed,
        "pred_merging_multiple_gt": pred_merge,
        "pred_spurious": pred_spurious,
        "onset_error": stats(on_err),
        "offset_error": stats(off_err),
        "pairs_with_both_within_10ms_pct":
            round(float(both.mean()) * 100, 1) if len(on_err) else 0.0,
    }, indent=1))


if __name__ == "__main__":
    main()
