#!/usr/bin/env python
"""Fit the post-processing knobs (merge_gap_ms / split_merged_db /
refine_boundaries_ms) on a LABELED dataset — intended to be the TRAINING
folder, so held-out evaluation of the fitted combination is honest — and
optionally write the winner into the checkpoint's
``default_segmentation_config`` so it activates by default at ``segment()``
time (same precedence chain as the reference's segmentation defaults,
reference model.py:415-425).

    python scripts/fit_postprocess.py --model_path /tmp/zf/m/final_checkpoint \
        --dataset_folder /tmp/zf/train --write 1

Decodes each file once, grid-searches the chain offline (refine.fit_postprocess),
prints the fitted params + train scores as JSON.
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
    ap.add_argument("--num_trials", type=int, default=1)
    ap.add_argument("--max_length", type=int, default=100)
    ap.add_argument("--num_beams", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--compute_type", default="bfloat16")
    ap.add_argument("--merge_gap_ms", type=float, nargs="+",
                    default=[0.0, 5.0, 10.0])
    ap.add_argument("--split_db", type=float, nargs="+",
                    default=[0.0, 10.0, 12.0, 15.0])
    ap.add_argument("--widths_ms", type=float, nargs="+",
                    default=[0.0, 20.0, 30.0, 40.0, 60.0])
    ap.add_argument("--frame_split", type=float, nargs="+",
                    default=[0.0, 0.3, 0.5],
                    help="frame-head split-threshold grid (used only when the "
                         "model has a frame head)")
    ap.add_argument("--frame_refine_ms", type=float, nargs="+",
                    default=[0.0, 10.0, 20.0, 40.0],
                    help="frame-head boundary-snap search grid in ms (used "
                         "only when the model has a frame head)")
    ap.add_argument("--frame_filter", type=float, nargs="+",
                    default=[0.0, 0.3, 0.5],
                    help="frame-head hallucination-filter grid (min mean "
                         "vocal prob; used only when the model has a head)")
    ap.add_argument("--write", type=int, default=0,
                    help="1: store the fitted params in the checkpoint's "
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
    from whisperseg_tpu.refine import fit_postprocess
    from whisperseg_tpu.segmenter import Segmenter

    audio_paths, label_paths = get_audio_and_label_paths(args.dataset_folder)
    if not audio_paths:
        raise SystemExit(f"no labeled audio in {args.dataset_folder}")
    seg = Segmenter.from_pretrained(args.model_path,
                                    inference_dtype=args.compute_type)
    has_head = "frame_head" in seg.params

    preds, labels, audios, srs = [], [], [], []
    tracks, deltas = ([] if has_head else None), ([] if has_head else None)
    for ap_, lp in zip(audio_paths, label_paths):
        label = read_label(lp, ignore_cluster=bool(args.ignore_cluster))
        audio, sr = load_audio(ap_, sr=label.get("sr", None))
        label["sr"] = sr
        pred = seg.segment(
            audio, sr=sr,
            min_frequency=label.get("min_frequency", None),
            spec_time_step=label.get("spec_time_step", None),
            num_trials=args.num_trials, num_beams=args.num_beams,
            batch_size=args.batch_size, max_length=args.max_length,
            # fit on RAW decodes: disable any already-stored combination
            merge_gap_ms=0, split_merged_db=0, refine_boundaries_ms=0,
            frame_split=0, frame_refine_ms=0, frame_filter=0,
        )
        preds.append(pred)
        labels.append(label)
        audios.append(audio)
        srs.append(sr)
        if has_head:
            tracks.append(seg.frame_probs(
                audio, sr, spec_time_step=label.get("spec_time_step", None),
                min_frequency=label.get("min_frequency", None),
                batch_size=args.batch_size))
            deltas.append(fft_time_delta(sr))
        print(f"decoded {os.path.basename(ap_)}: {len(pred['onset'])} segments",
              file=sys.stderr, flush=True)

    # gate split pieces at the SAME minimum length segment() will use at
    # inference (min_segment_length = spec_time_step * 2), so the fitted
    # combination behaves identically when deployed
    import numpy as _np

    # labels without an explicit spec_time_step resolve to the CHECKPOINT's
    # default at segment() time — fall back to the same value here so the
    # fitted gate matches deployment for every label shape
    _default_step = seg.default_segmentation_config.get("spec_time_step",
                                                        0.0025)
    min_len_s = float(_np.median(
        [lab.get("spec_time_step", _default_step) for lab in labels])) * 2

    params, table = fit_postprocess(
        preds, labels, audios, srs, merge_gap_ms=args.merge_gap_ms,
        split_db=args.split_db, widths_ms=args.widths_ms,
        min_len_s=min_len_s,
        frame_tracks=tracks, time_deltas=deltas,
        frame_split=args.frame_split, frame_refine_ms=args.frame_refine_ms,
        frame_filter=args.frame_filter)

    def combo_name(p):
        name = (f"merge_{p.get('merge_gap_ms', 0):g}"
                f"+split_{p.get('split_merged_db', 0):g}"
                f"+refine_{p.get('refine_boundaries_ms', 0):g}")
        if has_head:
            name += (f"+fsplit_{p.get('frame_split', 0):g}"
                     f"+fsnap_{p.get('frame_refine_ms', 0):g}"
                     f"+ffilt_{p.get('frame_filter', 0):g}")
        return name

    raw = table[combo_name({})]
    fitted = table[combo_name(params)]

    if args.write:
        cfg_path = os.path.join(args.model_path, "config.json")
        with open(cfg_path) as f:
            cfg = json.load(f)
        dsc = cfg.setdefault("default_segmentation_config", {})
        for k in ("merge_gap_ms", "split_merged_db", "refine_boundaries_ms",
                  "frame_split", "frame_refine_ms", "frame_filter"):
            dsc.pop(k, None)
        dsc.update(params)
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=1)

    print(json.dumps({"fitted_params": params, "train_raw": raw,
                      "train_fitted": fitted, "written": bool(args.write),
                      "table": table}, indent=1))


if __name__ == "__main__":
    main()
