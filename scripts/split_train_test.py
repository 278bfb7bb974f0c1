#!/usr/bin/env python
"""Split a labeled dataset folder into train/ and test/ folders of paired
wav+json files (the counterpart of the reference's
scripts/Split_train_test.ipynb): load every audio with its annotation, apply
the per-file random head/tail split of ``train_val_split`` at --val_ratio,
and write each part back out as ``audio_%d.wav`` + ``audio_%d.json``.

    python scripts/split_train_test.py --dataset_folder raw/ \
        --train_folder train/ --test_folder test/ --val_ratio 0.1 --seed 100

The emitted json carries the label's full configuration (sr, species,
spec_time_step, ...) minus the in-memory-only ``cluster_id`` array, exactly
like the notebook, so the output folders feed train.py / evaluate.py
directly.

NOTE (reference-faithful quirk): the split operates on ``load_data``'s
FFT-blur-WIDENED boundaries (±n_fft/2/sr, reference datautils.py:121-126)
and writes those widened values out, exactly as the notebook does — so
training on the output applies the widening a second time (~n_fft/2/sr per
boundary). Splitting a corpus once through this tool matches the
reference's published pipeline; re-splitting already-split output would
compound the widening.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisperseg_tpu.audio.io import save_wav  # noqa: E402
from whisperseg_tpu.data import (  # noqa: E402
    determine_default_config,
    get_audio_and_label_paths,
    get_cluster_codebook,
    load_data,
    train_val_split,
)


def _write_split(folder, audio_list, label_list):
    os.makedirs(folder, exist_ok=True)
    for count, (audio, label) in enumerate(zip(audio_list, label_list)):
        label = dict(label)
        label.pop("cluster_id", None)
        label["onset"] = [float(t) for t in label["onset"]]
        label["offset"] = [float(t) for t in label["offset"]]
        save_wav(os.path.join(folder, f"audio_{count}.wav"), audio, label["sr"])
        with open(os.path.join(folder, f"audio_{count}.json"), "w") as f:
            json.dump(label, f)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_folder", required=True,
                        help="folder of paired audio+label files to split")
    parser.add_argument("--train_folder", required=True)
    parser.add_argument("--test_folder", required=True)
    parser.add_argument("--val_ratio", type=float, default=0.1,
                        help="fraction of each file carved into the test split")
    parser.add_argument("--seed", type=int, default=100,
                        help="the notebook pins np.random.seed(100)")
    parser.add_argument("--tail_test", type=int, default=0,
                        help="1: deterministic split — train is always the "
                             "HEAD (1 - val_ratio) of each file, test the "
                             "tail. The notebook's random head/tail choice "
                             "can hand a sparse region to the test side "
                             "(observed: a 27%% marmoset tail split that "
                             "kept only 6 of 191 segments for test)")
    parser.add_argument("--n_threads", type=int, default=1)
    args = parser.parse_args(argv)

    audio_paths, label_paths = get_audio_and_label_paths(args.dataset_folder)
    if not audio_paths:
        raise SystemExit(f"no paired audio+label files in {args.dataset_folder}")
    cluster_codebook = get_cluster_codebook(label_paths, {})
    # labels may omit sr / spec_time_step: fill from the dataset-derived
    # defaults, exactly as train.py does
    default_config = determine_default_config(
        audio_paths, label_paths, total_spec_columns=1000)
    audio_list, label_list = load_data(
        audio_paths, label_paths, cluster_codebook, n_threads=args.n_threads,
        default_config=default_config)

    np.random.seed(args.seed)
    if args.tail_test:
        from whisperseg_tpu.data import split_audio_and_label

        train_a, train_l, test_a, test_l = [], [], [], []
        for audio, label in zip(audio_list, label_list):
            (ta, tl), (va, vl) = split_audio_and_label(
                audio, label, 1 - args.val_ratio)
            if ta is not None:
                train_a.append(ta)
                train_l.append(tl)
            if va is not None:
                test_a.append(va)
                test_l.append(vl)
    else:
        (train_a, train_l), (test_a, test_l) = train_val_split(
            audio_list, label_list, args.val_ratio)

    _write_split(args.train_folder, train_a, train_l)
    _write_split(args.test_folder, test_a, test_l)
    print(f"wrote {len(train_a)} train file(s) -> {args.train_folder}, "
          f"{len(test_a)} test file(s) -> {args.test_folder}")


if __name__ == "__main__":
    main()
