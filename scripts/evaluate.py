#!/usr/bin/env python
"""Evaluate a checkpoint on a labeled dataset folder.

    python scripts/evaluate.py --dataset_folder data/test \
        --model_path ./model/final_checkpoint --num_trials 3
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from whisperseg_tpu.runtime import respect_jax_platforms_env
    respect_jax_platforms_env()

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_folder", required=True)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--num_trials", type=int, default=3)
    parser.add_argument("--max_length", type=int, default=None,
                        help="decode token budget; default = the checkpoint's "
                             "trained budget (else 448)")
    parser.add_argument("--num_beams", type=int, default=4)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--compute_type", default="bfloat16",
                        choices=["float32", "bfloat16", "int8", "int4"])
    parser.add_argument("--merge_gap_ms", type=float, default=None,
                        help="opt-in merge of same-cluster predictions whose "
                             "gap is below this many ms")
    parser.add_argument("--split_merged_db", type=float, default=None,
                        help="opt-in energy-valley split of merged segments")
    parser.add_argument("--refine_boundaries_ms", type=float, default=None,
                        help="opt-in energy-edge boundary refinement: search "
                             "half-width in ms (see whisperseg_tpu/refine.py)")
    parser.add_argument("--frame_split", type=float, default=None,
                        help="opt-in frame-head split of decoder merges "
                             "(cut threshold 0..1; needs --frame_head model)")
    parser.add_argument("--frame_refine_ms", type=float, default=None,
                        help="opt-in frame-head boundary snap (search ms; "
                             "needs --frame_head model)")
    parser.add_argument("--frame_filter", type=float, default=None,
                        help="opt-in frame-head hallucination filter (min "
                             "mean vocal prob 0..1; needs --frame_head model)")
    parser.add_argument("--ignore_cluster", type=int, default=0,
                        help="1: flatten label clusters to 'Vocal' before "
                             "scoring — use when evaluating a VAD model "
                             "trained with --ignore_cluster 1 against "
                             "clustered labels")
    parser.add_argument("--frame_mode", type=int, default=0,
                        help="1: score the decoder-free frame-VAD path "
                             "(Segmenter.segment_from_frames; requires a "
                             "model trained with --frame_head)")
    parser.add_argument("--frame_vocal_threshold", type=float, default=None,
                        help="frame-mode vocal threshold override (default: "
                             "per-label value, else the checkpoint's fitted)")
    parser.add_argument("--frame_cut_threshold", type=float, default=None)
    parser.add_argument("--frame_boundary_snap", type=int, default=None)
    parser.add_argument("--frame_gap_cut", type=int, default=None,
                        help="frame-mode sub-floor pause cut radius override")
    parser.add_argument("--label_tolerance", type=int, default=0,
                        help="1: score with each label's own 'tolerance' / "
                             "'time_per_frame_for_scoring' fields instead of "
                             "the reference default (model spec_time_step*4) "
                             "— matches the objective the fit_* scripts "
                             "optimize")
    parser.add_argument("--output_path", default=None,
                        help="also write the scores JSON to this file "
                             "(stdout is unchanged)")
    args = parser.parse_args(argv)

    from whisperseg_tpu.evaluate import evaluate_dataset

    res = evaluate_dataset(
        args.dataset_folder, args.model_path, num_trials=args.num_trials,
        max_length=args.max_length, num_beams=args.num_beams,
        batch_size=args.batch_size, inference_dtype=args.compute_type,
        refine_boundaries_ms=args.refine_boundaries_ms,
        split_merged_db=args.split_merged_db,
        merge_gap_ms=args.merge_gap_ms,
        ignore_cluster=bool(args.ignore_cluster),
        frame_mode=bool(args.frame_mode),
        frame_vocal_threshold=args.frame_vocal_threshold,
        frame_cut_threshold=args.frame_cut_threshold,
        frame_boundary_snap=args.frame_boundary_snap,
        frame_gap_cut=args.frame_gap_cut,
        frame_split=args.frame_split,
        frame_refine_ms=args.frame_refine_ms,
        frame_filter=args.frame_filter,
        label_tolerance=bool(args.label_tolerance),
    )
    print(json.dumps(res, indent=2))
    if args.output_path:
        with open(args.output_path, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
