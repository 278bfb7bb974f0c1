#!/usr/bin/env python
"""Generate a reproducible MULTI-CLUSTER synthetic dataset: tone bursts in
three frequency bands, cluster = band name. Exercises the cluster channels
end-to-end (codec digit tokens for the decoder, frame-head cluster logits +
majority vote for the frame-VAD mode) — every real corpus in the snapshot
with audio is single-cluster (RESULTS.md), so this is the multi-cluster
acceptance fixture.

    python scripts/make_multicluster_tones.py --out /tmp/mc --n_train 10 --n_test 3

The scaled round-4 acceptance configuration (VERDICT r03 item 1 — decode-path
cluster-resolved quality at TPU budget) is

    python scripts/make_multicluster_tones.py --out /tmp/mc5 \
        --n_clusters 5 --n_train 30 --n_test 8

which adds amplitude jitter and a mild per-burst FM sweep so the bands are
not trivially separable by a single spectrogram row.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cluster_bands(n_clusters: int) -> dict:
    """n cluster names -> center frequencies, log-spaced in 900..6500 Hz
    (inside the sr=16 k Nyquist with headroom for the FM sweep)."""
    if n_clusters == 3:
        return {"low": 1000.0, "mid": 3000.0, "high": 6000.0}  # legacy fixture
    freqs = np.geomspace(900.0, 6500.0, n_clusters)
    return {f"c{i}": float(f) for i, f in enumerate(freqs)}


def make_file(path_stem: str, rng: np.random.RandomState, clusters_map: dict,
              sr: int = 16000, dur: float = 4.0):
    n = int(sr * dur)
    t = np.arange(n) / sr
    y = 0.004 * rng.randn(n).astype(np.float32)
    onsets, offsets, clusters = [], [], []
    pos = 0.2
    names = list(clusters_map)
    legacy = set(names) == {"low", "mid", "high"}
    while pos < dur - 0.5:
        name = names[rng.randint(len(names))]
        length = rng.uniform(0.08, 0.25)
        onsets.append(round(pos, 3))
        offsets.append(round(pos + length, 3))
        clusters.append(name)
        seg = slice(int(pos * sr), int((pos + length) * sr))
        f0 = clusters_map[name]
        if legacy:
            tone = np.sin(2 * np.pi * f0 * t[seg])
            amp = 0.6
        else:
            # mild FM sweep (+-8% of f0 across the burst) + amplitude jitter:
            # the bands stay >20% apart so the task is unambiguous, but a
            # single spectrogram row no longer identifies the cluster
            sweep = f0 * rng.uniform(-0.08, 0.08)
            tt = t[seg] - t[seg][0]
            phase = 2 * np.pi * (f0 * tt + 0.5 * sweep * tt**2 / max(tt[-1], 1e-6))
            tone = np.sin(phase)
            amp = rng.uniform(0.3, 0.7)
        y[seg] += (amp * tone).astype(np.float32)
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
    ap.add_argument("--n_clusters", type=int, default=3)
    ap.add_argument("--dur", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    clusters_map = cluster_bands(args.n_clusters)
    total = 0
    for split, count in (("train", args.n_train), ("test", args.n_test)):
        d = os.path.join(args.out, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            total += make_file(os.path.join(d, f"mc{i}"), rng, clusters_map,
                               dur=args.dur)
    print(json.dumps({"out": args.out, "clusters": list(clusters_map),
                      "total_segments": total}))


if __name__ == "__main__":
    main()
