#!/usr/bin/env python
"""Decode a test folder ONCE, then score raw + energy-refined predictions at
several search widths — isolates the boundary-refinement contribution without
re-running the model.

    python scripts/eval_refine_sweep.py --dataset_folder /tmp/zf/test \
        --model_path /tmp/zf/w4/final_checkpoint --max_length 100

Scoring uses each label's own tolerance / time_per_frame_for_scoring (the
same resolutions scripts/fit_postprocess.py fits with), and each stage is
gated at the min-segment-length segment() deploys, so the table's numbers are
directly comparable with the fitter's and with deployed behavior.
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
    ap.add_argument("--frame_split", type=float, nargs="+", default=[],
                    help="also score frame-head split thresholds (alone and "
                         "with each frame snap; needs a --frame_head model)")
    ap.add_argument("--frame_refine_ms", type=float, nargs="+", default=[],
                    help="also score frame-head boundary snapping")
    ap.add_argument("--frame_filter", type=float, nargs="+", default=[],
                    help="also score the frame-head hallucination filter "
                         "(alone and with each frame split/snap)")
    ap.add_argument("--compute_type", default="bfloat16")
    args = ap.parse_args(argv)

    from whisperseg_tpu.audio.io import load_audio
    from whisperseg_tpu.constants import fft_time_delta
    from whisperseg_tpu.data import get_audio_and_label_paths, read_label
    from whisperseg_tpu.refine import (_scoring_resolutions,
                                       apply_frame_postprocess,
                                       band_envelope_db, merge_small_gaps,
                                       micro_f1, refine_prediction,
                                       split_merged_segments)
    from whisperseg_tpu.segmenter import Segmenter

    def grid(vals, name):
        """0 means OFF for every stage (the raw row already covers it) —
        treating 0 as an active threshold would e.g. shred predictions at
        split_db=0; dedupe keeps combo lists aligned with the file loop."""
        out = []
        for v in vals:
            if v == 0.0:
                print(f"note: dropping 0 from --{name} (0 = stage off; "
                      f"see the 'raw' row)", file=sys.stderr)
            elif v not in out:
                out.append(v)
        return out

    args.widths_ms = grid(args.widths_ms, "widths_ms")
    args.split_db = grid(args.split_db, "split_db")
    args.merge_gap_ms = grid(args.merge_gap_ms, "merge_gap_ms")
    args.frame_split = grid(args.frame_split, "frame_split")
    args.frame_refine_ms = grid(args.frame_refine_ms, "frame_refine_ms")
    args.frame_filter = grid(args.frame_filter, "frame_filter")

    audio_paths, label_paths = get_audio_and_label_paths(args.dataset_folder)
    seg = Segmenter.from_pretrained(args.model_path,
                                    inference_dtype=args.compute_type)
    want_frames = args.frame_split or args.frame_refine_ms or args.frame_filter
    if want_frames and "frame_head" not in seg.params:
        raise SystemExit("frame knobs requested but the model has no frame head")

    # frame-knob combos: every (filter, split, snap) point with 0 = off,
    # skipping the all-off point (that's "raw")
    frame_combos = []
    for ff in [0.0] + args.frame_filter:
        for fs in [0.0] + args.frame_split:
            for fm in [0.0] + args.frame_refine_ms:
                if ff or fs or fm:
                    frame_combos.append((ff, fs, fm))

    def frame_name(ff, fs, fm):
        parts = []
        if ff:
            parts.append(f"ffilt_{ff:g}")
        if fs:
            parts.append(f"fsplit_{fs:g}")
        if fm:
            parts.append(f"fsnap_{fm:g}ms")
        return "+".join(parts)

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
    for ff, fs, fm in frame_combos:
        cases[frame_name(ff, fs, fm)] = []
    labels = []
    for ap_, lp in zip(audio_paths, label_paths):
        label = read_label(lp)
        audio, sr = load_audio(ap_, sr=label.get("sr", None))
        label["sr"] = sr
        labels.append(label)
        # gate split pieces at the SAME minimum length segment() deploys
        # (min_segment_length = spec_time_step * 2)
        step = label.get("spec_time_step",
                         seg.default_segmentation_config.get(
                             "spec_time_step", 0.0025))
        min_len = step * 2
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
                           refine_boundaries_ms=0, frame_split=0,
                           frame_refine_ms=0, frame_filter=0)
        cases["raw"].append(pred)
        # one band-energy envelope per file, shared by every refine/split case
        env = band_envelope_db(audio, sr) \
            if (args.widths_ms or args.split_db) else None
        if frame_combos:
            tracks = seg.frame_probs(
                audio, sr, spec_time_step=label.get("spec_time_step", None),
                min_frequency=label.get("min_frequency", None),
                batch_size=args.batch_size)
            td = fft_time_delta(sr)
            for ff, fs, fm in frame_combos:
                cases[frame_name(ff, fs, fm)].append(apply_frame_postprocess(
                    pred, tracks, td, frame_split=fs, frame_refine_ms=fm,
                    frame_filter=ff, min_len_s=min_len))
        for w in args.widths_ms:
            cases[f"refine_{w:g}ms"].append(
                refine_prediction(pred, audio, sr, search_ms=w, env=env))
        for d in args.split_db:
            sp = split_merged_segments(pred, audio, sr, drop_db=d,
                                       min_len_s=min_len, env=env)
            cases[f"split_{d:g}db"].append(sp)
            for w in args.widths_ms:
                cases[f"split_{d:g}db+refine_{w:g}ms"].append(
                    refine_prediction(sp, audio, sr, search_ms=w, env=env))
        for g in args.merge_gap_ms:
            mg = merge_small_gaps(pred, gap_s=g / 1000.0)
            cases[f"merge_{g:g}ms"].append(mg)
            for d in args.split_db:
                cases[f"merge_{g:g}ms+split_{d:g}db"].append(
                    split_merged_segments(mg, audio, sr, drop_db=d,
                                          min_len_s=min_len, env=env))
        print(f"decoded {os.path.basename(ap_)}: {len(pred['onset'])} "
              f"segments", file=sys.stderr, flush=True)

    # per-label tolerance / frame resolution — the same micro scoring the
    # fitter uses, so the two tools' tables are directly comparable
    tols, tpfs = _scoring_resolutions(labels)
    out = {}
    for name, preds in cases.items():
        seg_f1, fr_f1 = micro_f1(preds, labels, tols, tpfs)
        out[name] = {"segment_F1": round(seg_f1, 4),
                     "frame_F1": round(fr_f1, 4)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
