#!/usr/bin/env python
"""End-to-end training pipeline demo (counterpart of the reference's
docs/WhisperSeg_Training_Pipeline.ipynb): generate a synthetic tone dataset,
finetune a model, evaluate it, and segment a file.

Runs on CPU in a few minutes with the default tiny geometry:

    JAX_PLATFORMS=cpu python examples/training_pipeline.py --workdir /tmp/ws_demo

On a TPU VM drop JAX_PLATFORMS and raise --model_size / --iterations.
"""

import argparse
import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_wav(path, y, sr):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


def make_tone_dataset(folder, n_files, sr=16000, dur=2.0, seed=0):
    os.makedirs(folder, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n_files):
        n = int(sr * dur)
        t = np.arange(n) / sr
        y = 0.005 * rng.randn(n)
        onsets, offsets = [], []
        pos = 0.2
        while pos < dur - 0.5:
            length = rng.uniform(0.15, 0.3)
            onsets.append(round(pos, 3))
            offsets.append(round(pos + length, 3))
            seg = slice(int(pos * sr), int((pos + length) * sr))
            y[seg] += 0.7 * np.sin(2 * np.pi * 2000 * t[seg])
            pos += length + rng.uniform(0.2, 0.4)
        write_wav(os.path.join(folder, f"f{i}.wav"), y, sr)
        json.dump({"onset": onsets, "offset": offsets,
                   "cluster": ["Vocal"] * len(onsets), "sr": sr,
                   "spec_time_step": 0.01, "min_frequency": 0},
                  open(os.path.join(folder, f"f{i}.json"), "w"))
    return folder


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default="/tmp/whisperseg_tpu_demo")
    parser.add_argument("--model_size", default=None,
                        help="tiny/base/... (default: a custom small geometry)")
    parser.add_argument("--iterations", type=int, default=1200)
    parser.add_argument("--total_spec_columns", type=int, default=200)
    args = parser.parse_args()

    import jax

    from whisperseg_tpu.audio.io import load_audio
    from whisperseg_tpu.checkpoint import save_checkpoint
    from whisperseg_tpu.data import get_audio_and_label_paths, read_label
    from whisperseg_tpu.evaluate import evaluate
    from whisperseg_tpu.models import WhisperConfig, init_params
    from whisperseg_tpu.segmenter import Segmenter
    from whisperseg_tpu.training import TrainArgs, run_training

    os.makedirs(args.workdir, exist_ok=True)
    print("1) synthesizing dataset ...")
    train_dir = make_tone_dataset(os.path.join(args.workdir, "train"), 6)
    test_dir = make_tone_dataset(os.path.join(args.workdir, "test"), 2, seed=100)

    if args.model_size:
        initial = args.model_size
    else:
        cfg = WhisperConfig(
            d_model=96, encoder_layers=2, decoder_layers=2, num_heads=4,
            d_ff=192, max_source_positions=args.total_spec_columns // 2,
            max_target_positions=64,
            total_spec_columns=args.total_spec_columns,
            compute_dtype="float32",
        )
        initial = os.path.join(args.workdir, "init_model")
        save_checkpoint(initial, init_params(jax.random.PRNGKey(0), cfg), cfg)

    print("2) training ...")
    final = run_training(TrainArgs(
        initial_model_path=initial,
        model_folder=os.path.join(args.workdir, "model"),
        train_dataset_folder=train_dir,
        total_spec_columns=args.total_spec_columns,
        max_length=48, batch_size=8, learning_rate=1e-3, warmup_steps=20,
        max_num_iterations=args.iterations, min_num_iterations=args.iterations,
        print_every=200, save_every=args.iterations, seed=13,
    ))

    print("3) evaluating ...")
    segmenter = Segmenter.from_pretrained(final)
    audio_paths, label_paths = get_audio_and_label_paths(test_dir)
    audios, labels = [], []
    for a, l in zip(audio_paths, label_paths):
        lab = read_label(l)
        y, _ = load_audio(a, sr=lab["sr"])
        audios.append(y)
        labels.append(lab)
    res = evaluate(audios, labels, segmenter, batch_size=4, max_length=48,
                   num_trials=1, num_beams=1)
    print(f"   segment F1: {res['segment_wise'][-1]:.4f}, "
          f"frame F1: {res['frame_wise'][-1]:.4f}")

    print("4) segmenting one file ...")
    pred = segmenter.segment(audios[0], labels[0]["sr"],
                             spec_time_step=labels[0]["spec_time_step"])
    for onset, offset, cluster in zip(pred["onset"], pred["offset"],
                                      pred["cluster"]):
        print(f"   {onset:8.3f} {offset:8.3f}  {cluster}")
    print("Done. Checkpoint at:", final)


if __name__ == "__main__":
    main()
