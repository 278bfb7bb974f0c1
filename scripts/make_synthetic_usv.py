#!/usr/bin/env python
"""Generate a synthetic 300 kHz mouse-USV dataset at the exact mouse preset.

The reference's real mouse wav is stripped from this snapshot
(data/example_subset/Mouse/test has only the json), so quality runs on the
numerically hardest frontend configuration (sr 300 000, n_fft 4096,
spec_time_step 0.5 ms, min_frequency 35 000 — reference
config/segment_config.json, docs/Evaluation.md:16-37) use synthetic
ultrasonic vocalizations:

  * the TEST file synthesizes audio UNDER THE REAL 133-segment annotation
    (mouse_Rfem_Afem01_0.json), so held-out timing statistics are the real
    ones;
  * TRAIN files sample syllable durations/gaps from the real annotation's
    empirical distribution (durations 12-90 ms, gaps 45-86 ms).

Each syllable is a frequency-modulated chirp in the 45-80 kHz band (where
real mouse USVs live) over a broadband noise floor, with a Hann onset/offset
ramp. Labels carry the reference mouse json's full field set (tolerance,
time_per_frame_for_scoring, eps, min_segment_length).

    python scripts/make_synthetic_usv.py --out /tmp/ms --n_train 10
"""

import argparse
import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REAL_JSON = ("/root/reference/data/example_subset/Mouse/test/"
             "mouse_Rfem_Afem01_0.json")

SR = 300000
LABEL_FIELDS = {
    "species": "mouse", "sr": SR, "min_frequency": 35000,
    "spec_time_step": 0.0005, "min_segment_length": 0.01, "tolerance": 0.01,
    "time_per_frame_for_scoring": 0.001, "eps": 0.02,
}


def synth_audio(onsets, offsets, duration, rng, noise=0.004):
    n = int(duration * SR)
    y = rng.standard_normal(n).astype(np.float32) * noise
    t_all = np.arange(n) / SR
    for onset, offset in zip(onsets, offsets):
        a, b = int(onset * SR), int(offset * SR)
        if b <= a or a >= n:
            continue
        b = min(b, n)
        m = b - a
        t = np.arange(m) / SR
        f0 = rng.uniform(45000, 72000)
        f1 = np.clip(f0 + rng.uniform(-15000, 15000), 40000, 80000)
        # linear FM chirp
        phase = 2 * np.pi * (f0 * t + (f1 - f0) / (2 * t[-1] + 1e-9) * t ** 2)
        env = np.hanning(max(m, 3))[:m] ** 0.5
        y[a:b] += (rng.uniform(0.25, 0.5) * env
                   * np.sin(phase)).astype(np.float32)
    return np.clip(y, -1, 1)


def random_segments(duration, rng, durs, gaps):
    """Sample (onset, offset) lists bootstrap-resampled from real stats."""
    onsets, offsets = [], []
    t = rng.uniform(0.1, 0.4)
    while True:
        d = float(rng.choice(durs))
        if t + d > duration - 0.1:
            break
        onsets.append(round(t, 6))
        offsets.append(round(t + d, 6))
        t += d + float(rng.choice(gaps))
    return onsets, offsets


def write_wav(path, y, sr=SR):
    pcm = np.clip(np.round(y * 32767), -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def write_label(path, onsets, offsets):
    lab = dict(LABEL_FIELDS)
    lab["onset"] = list(onsets)
    lab["offset"] = list(offsets)
    lab["cluster"] = ["mouse_syllable"] * len(onsets)
    json.dump(lab, open(path, "w"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=10)
    ap.add_argument("--train_seconds", type=float, default=12.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    real = json.load(open(REAL_JSON))
    on = np.asarray(real["onset"])
    off = np.asarray(real["offset"])
    durs = off - on
    gaps = np.clip(on[1:] - off[:-1], 0.02, 0.5)

    train_dir = os.path.join(args.out, "train")
    test_dir = os.path.join(args.out, "test")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)

    # test: the real annotation's own timing
    dur = float(off.max()) + 0.5
    y = synth_audio(on, off, dur, rng)
    write_wav(os.path.join(test_dir, "usv_real_annotation.wav"), y)
    write_label(os.path.join(test_dir, "usv_real_annotation.json"), on, off)
    print(f"test: {len(on)} segments / {dur:.1f}s (real annotation timing)")

    for i in range(args.n_train):
        onsets, offsets = random_segments(args.train_seconds, rng, durs, gaps)
        y = synth_audio(onsets, offsets, args.train_seconds, rng)
        write_wav(os.path.join(train_dir, f"usv_{i:02d}.wav"), y)
        write_label(os.path.join(train_dir, f"usv_{i:02d}.json"),
                    onsets, offsets)
        print(f"train {i}: {len(onsets)} segments")


if __name__ == "__main__":
    main()
