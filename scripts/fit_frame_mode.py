#!/usr/bin/env python
"""Grid-fit the frame-VAD mode thresholds (vocal_threshold / cut_threshold /
boundary_snap) on a LABELED dataset — intended to be the TRAINING folder —
and optionally write the winners into the checkpoint's
``default_segmentation_config`` (``frame_vocal_threshold`` /
``frame_cut_threshold`` / ``frame_boundary_snap``) so
``segment_from_frames`` / ``--frame_mode`` use them by default.

    python scripts/fit_frame_mode.py --model_path ckpt --dataset_folder TRAIN \
        --write 1

Computes the frame-head tracks once per file (the only device work), then
scores every threshold combination host-side (refine.fit_frame_mode).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--dataset_folder", required=True,
                    help="labeled folder to fit on (use the TRAINING folder)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--compute_type", default="bfloat16")
    ap.add_argument("--vocal_threshold", type=float, nargs="+",
                    default=[0.2, 0.3, 0.4, 0.5, 0.6])
    ap.add_argument("--cut_threshold", type=float, nargs="+",
                    default=[0.3, 0.5, 0.7])
    ap.add_argument("--boundary_snap", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--gap_cut", type=int, nargs="+", default=[0, 2, 5, 10],
                    help="sub-floor pause-cut radii (grid positions) to grid "
                         "over; 0 = same-position cuts only")
    ap.add_argument("--write", type=int, default=0,
                    help="1: store fitted thresholds in the checkpoint's "
                         "default_segmentation_config (config.json)")
    ap.add_argument("--ignore_cluster", type=int, default=0,
                    help="1: flatten label clusters to 'Vocal' before "
                         "scoring (fit a VAD model trained with "
                         "--ignore_cluster 1 on clustered labels)")
    args = ap.parse_args(argv)

    from whisperseg_tpu.runtime import respect_jax_platforms_env
    respect_jax_platforms_env()
    from whisperseg_tpu.audio.io import load_audio
    from whisperseg_tpu.constants import fft_time_delta
    from whisperseg_tpu.data import get_audio_and_label_paths, read_label
    from whisperseg_tpu.refine import FRAME_MODE_KEYS, fit_frame_mode
    from whisperseg_tpu.segmenter import Segmenter

    audio_paths, label_paths = get_audio_and_label_paths(args.dataset_folder)
    if not audio_paths:
        raise SystemExit(f"no labeled audio in {args.dataset_folder}")
    seg = Segmenter.from_pretrained(args.model_path,
                                    inference_dtype=args.compute_type)
    if "frame_head" not in seg.params:
        raise SystemExit("checkpoint has no frame head")

    tracks_list, labels, durations, deltas = [], [], [], []
    for ap_, lp in zip(audio_paths, label_paths):
        label = read_label(lp, ignore_cluster=bool(args.ignore_cluster))
        audio, sr = load_audio(ap_, sr=label.get("sr", None))
        label["sr"] = sr
        tracks_list.append(seg.frame_probs(
            audio, sr, spec_time_step=label.get("spec_time_step", None),
            min_frequency=label.get("min_frequency", None),
            batch_size=args.batch_size))
        labels.append(label)
        durations.append(len(audio) / sr)
        deltas.append(fft_time_delta(sr))
        print(f"tracked {os.path.basename(ap_)}", file=sys.stderr, flush=True)

    params, table = fit_frame_mode(
        tracks_list, labels, durations, deltas, seg.inverse_cluster_codebook,
        vocal_threshold=args.vocal_threshold,
        cut_threshold=args.cut_threshold, boundary_snap=args.boundary_snap,
        gap_cut=args.gap_cut)

    default_name = "vt_0.5+ct_0.5+snap_2+gap_0"
    vt = params.get("frame_vocal_threshold", 0.5)
    ct = params.get("frame_cut_threshold", 0.5)
    bs = params.get("frame_boundary_snap", 2)
    gc = params.get("frame_gap_cut", 0)
    fitted_name = f"vt_{vt:g}+ct_{ct:g}+snap_{bs:g}+gap_{gc:g}"

    if args.write:
        cfg_path = os.path.join(args.model_path, "config.json")
        with open(cfg_path) as f:
            cfg = json.load(f)
        dsc = cfg.setdefault("default_segmentation_config", {})
        for k in FRAME_MODE_KEYS:
            dsc.pop(k, None)
        dsc.update(params)
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=1)

    print(json.dumps({
        "fitted_params": params,
        "train_default": table.get(default_name),
        "train_fitted": table.get(fitted_name),
        "written": bool(args.write),
        "table": table,
    }, indent=1))


if __name__ == "__main__":
    main()
