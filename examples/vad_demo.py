#!/usr/bin/env python
"""Voice-activity-detection demo over the multi-species example corpus
(counterpart of the reference's docs/WhisperSeg_Voice_Activity_Detection_Demo
.ipynb): for every species folder under --dataset_root, segment each labeled
file with its per-file configuration (sr / min_frequency / spec_time_step read
from the label JSON, reference docs/DatasetProcessing.md:86-96) and print the
predicted segments plus segment-wise and frame-wise P/R/F1.

    python examples/vad_demo.py --model_path ./model/final_checkpoint \
        --dataset_root /root/reference/data/example_subset

Options mirror the notebook's knobs: --num_trials 3 (the multi-trial
consolidation the paper uses), --species to restrict folders, --frame_mode 1
to drive the decoder-free frame-VAD path on a --frame_head model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from whisperseg_tpu.runtime import respect_jax_platforms_env
    respect_jax_platforms_env()

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", default=None,
                        help="checkpoint path or built-in model name; "
                             "default = the shipped multi-species generalist "
                             "(pretrained/whisperseg-base-animal-vad)")
    parser.add_argument("--dataset_root",
                        default="/root/reference/data/example_subset",
                        help="root with per-species subfolders of paired "
                             "wav+json (reference data/example_subset layout)")
    parser.add_argument("--species", nargs="*", default=None,
                        help="restrict to these species folder names")
    parser.add_argument("--num_trials", type=int, default=3)
    parser.add_argument("--num_beams", type=int, default=4)
    parser.add_argument("--max_length", type=int, default=None,
                        help="decode token budget; default = the checkpoint's "
                             "trained budget (else 448)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_rows", type=int, default=8,
                        help="prediction rows to print per file")
    parser.add_argument("--compute_type", default="bfloat16",
                        choices=["float32", "bfloat16", "int8", "int4"])
    parser.add_argument("--frame_mode", type=int, default=0,
                        help="1: decoder-free frame-VAD segmentation "
                             "(needs a --frame_head model)")
    args = parser.parse_args(argv)

    from whisperseg_tpu.audio.io import load_audio
    from whisperseg_tpu.data import get_audio_and_label_paths, read_label
    from whisperseg_tpu.segmenter import Segmenter

    if args.model_path is None:
        from whisperseg_tpu.hub import default_pretrained_model

        args.model_path = default_pretrained_model()
        if args.model_path is None:
            raise SystemExit("no --model_path given and no built-in model "
                             "under pretrained/ — train one or pass a path")
        print(f"using the shipped default model: {args.model_path}")
    segmenter = Segmenter.from_pretrained(
        args.model_path, inference_dtype=args.compute_type)

    species_dirs = []
    for name in sorted(os.listdir(args.dataset_root)):
        if args.species and name not in args.species:
            continue
        path = os.path.join(args.dataset_root, name)
        if not os.path.isdir(path):
            continue
        # species folders nest the actual split folders (test, test_adults,
        # ...) but may also hold paired files directly; scan both — folders
        # without paired files are skipped by the loop below.
        species_dirs.append((name, path))
        for sub in sorted(os.listdir(path)):
            subpath = os.path.join(path, sub)
            if os.path.isdir(subpath):
                species_dirs.append((f"{name}/{sub}", subpath))

    for title, folder in species_dirs:
        audio_paths, label_paths = get_audio_and_label_paths(folder)
        if not audio_paths:
            continue
        print(f"\n=== {title} ({len(audio_paths)} files)")
        for audio_path, label_path in zip(audio_paths, label_paths):
            label = read_label(label_path)
            try:
                # labels may omit sr: load at the native rate and record it
                # (same policy as evaluate_dataset, whisperseg_tpu/evaluate.py)
                audio, sr = load_audio(audio_path, sr=label.get("sr", None))
                label["sr"] = sr
            except (OSError, ValueError) as exc:  # stripped large blobs etc.
                print(f"  {os.path.basename(audio_path)}: unreadable ({exc})")
                continue
            common = dict(
                sr=label["sr"],
                min_frequency=label.get("min_frequency", None),
                spec_time_step=label.get("spec_time_step", None),
                batch_size=args.batch_size,
            )
            if args.frame_mode:
                prediction = segmenter.segment_from_frames(audio, **common)
            else:
                prediction = segmenter.segment(
                    audio, num_trials=args.num_trials,
                    num_beams=args.num_beams, max_length=args.max_length,
                    **common)
            n = len(prediction["onset"])
            print(f"  {os.path.basename(audio_path)}: {n} segments")
            for i in range(min(n, args.max_rows)):
                print(f"    {prediction['onset'][i]:>9.3f} "
                      f"{prediction['offset'][i]:>9.3f}  "
                      f"{prediction['cluster'][i]}")
            if n > args.max_rows:
                print(f"    ... ({n - args.max_rows} more)")
            seg = segmenter.segment_score(prediction, label)
            fr = segmenter.frame_score(prediction, label)
            print(f"    segment P/R/F1 = {seg[3]:.4f}/{seg[4]:.4f}/{seg[5]:.4f}"
                  f"   frame P/R/F1 = {fr[3]:.4f}/{fr[4]:.4f}/{fr[5]:.4f}")


if __name__ == "__main__":
    main()
