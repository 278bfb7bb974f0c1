#!/usr/bin/env python
"""Generate a reproducible MULTI-CLUSTER synthetic dataset: tone bursts in
three frequency bands, cluster = band name. Exercises the cluster channels
end-to-end (codec digit tokens for the decoder, frame-head cluster logits +
majority vote for the frame-VAD mode) — every real corpus in the snapshot
with audio is single-cluster (RESULTS.md), so this is the multi-cluster
acceptance fixture.

    python scripts/make_multicluster_tones.py --out /tmp/mc --n_train 10 --n_test 3
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLUSTERS = {"low": 1000.0, "mid": 3000.0, "high": 6000.0}


def make_file(path_stem: str, rng: np.random.RandomState, sr: int = 16000,
              dur: float = 4.0):
    n = int(sr * dur)
    t = np.arange(n) / sr
    y = 0.004 * rng.randn(n).astype(np.float32)
    onsets, offsets, clusters = [], [], []
    pos = 0.2
    names = list(CLUSTERS)
    while pos < dur - 0.5:
        name = names[rng.randint(len(names))]
        length = rng.uniform(0.08, 0.25)
        onsets.append(round(pos, 3))
        offsets.append(round(pos + length, 3))
        clusters.append(name)
        seg = slice(int(pos * sr), int((pos + length) * sr))
        y[seg] += 0.6 * np.sin(2 * np.pi * CLUSTERS[name] * t[seg]).astype(
            np.float32)
        pos += length + rng.uniform(0.1, 0.35)
    import wave

    with wave.open(path_stem + ".wav", "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())
    json.dump({"onset": onsets, "offset": offsets, "cluster": clusters,
               "sr": sr, "spec_time_step": 0.005, "min_frequency": 0,
               "tolerance": 0.02},
              open(path_stem + ".json", "w"))
    return len(onsets)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=10)
    ap.add_argument("--n_test", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    total = 0
    for split, count in (("train", args.n_train), ("test", args.n_test)):
        d = os.path.join(args.out, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            total += make_file(os.path.join(d, f"mc{i}"), rng)
    print(json.dumps({"out": args.out, "clusters": list(CLUSTERS),
                      "total_segments": total}))


if __name__ == "__main__":
    main()
