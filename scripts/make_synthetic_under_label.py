#!/usr/bin/env python
"""Synthesize audio UNDER a real annotation whose wav is stripped from the
snapshot (`/root/reference/data/example_subset/.MISSING_LARGE_BLOBS`), so the
pipeline can be exercised end-to-end at that label's exact preset with REAL
timing/cluster statistics. Same idea as scripts/make_synthetic_usv.py's test
file (round 2), generalized to any label JSON:

* every (onset, offset, cluster) triple becomes an audible event at its exact
  annotated time;
* each distinct cluster gets a distinct acoustic signature, so multi-cluster
  labels (e.g. the marmoset ts/ek/tr call types,
  /root/reference/data/example_subset/Marmoset/test/*.json) remain a genuine
  cluster-classification task;
* the label JSON is copied next to the wav, so the folder feeds train.py /
  evaluate.py directly with the original preset (sr, spec_time_step,
  min_segment_length, eps, tolerance) intact.

Styles:
  tone      per-cluster log-spaced center frequencies with mild per-event FM
            and amplitude jitter (animal-call-like)
  harmonic  f0~160 Hz harmonic stack with slow f0 drift and a 4 Hz syllabic
            AM (speech-like; for the human_SPEECH AVA labels)

    python scripts/make_synthetic_under_label.py --out_dir /tmp/hu/raw \
        --style harmonic --labels .../Human_AVA_Speech/test/*.json
"""

import argparse
import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cluster_signatures(names, sr):
    """distinct center frequencies per cluster: log-spaced in a band that
    stays inside Nyquist with FM headroom"""
    lo = max(400.0, 0.04 * sr)
    hi = 0.30 * sr
    freqs = np.geomspace(lo, hi, max(len(names), 1))
    return {n: float(f) for n, f in zip(sorted(names), freqs)}


def synth_tone(rng, sr, n, f0):
    t = np.arange(n) / sr
    sweep = f0 * rng.uniform(-0.08, 0.08)
    dur = max(t[-1], 1e-6) if n > 1 else 1e-6
    phase = 2 * np.pi * (f0 * t + 0.5 * sweep * t * t / dur)
    env = np.minimum(1.0, np.minimum(t, t[::-1] if n > 1 else t) * 200.0)
    return (rng.uniform(0.3, 0.7) * env * np.sin(phase)).astype(np.float32)


def synth_harmonic(rng, sr, n, sig_f0):
    t = np.arange(n) / sr
    # per-cluster fundamental: golden-ratio fold of the cluster's signature
    # frequency (log scale) into the speech band, so distinct clusters keep
    # well-separated f0 (plus small per-event jitter)
    f0 = 120.0 + 100.0 * ((np.log2(max(float(sig_f0), 1.0))
                           * 0.6180339887) % 1.0) + rng.uniform(-5.0, 5.0)
    drift = 1.0 + 0.1 * np.sin(2 * np.pi * rng.uniform(0.3, 1.0) * t)
    y = np.zeros(n, dtype=np.float64)
    for h in range(1, 13):
        fh = f0 * h
        if fh >= sr / 2:
            break
        y += (1.0 / h) * np.sin(2 * np.pi * fh * drift * t
                                + rng.uniform(0, 2 * np.pi))
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t + rng.uniform(0, 2 * np.pi))
    edge = np.minimum(1.0, np.minimum(t, t[::-1] if n > 1 else t) * 50.0)
    y *= am * edge
    peak = np.abs(y).max() or 1.0
    return (0.5 * y / peak).astype(np.float32)


def make_wav(label_path, out_dir, style, rng):
    label = json.load(open(label_path))
    sr = int(label["sr"])
    end = max(label["offset"], default=1.0) + 0.5
    n = int(end * sr)
    y = 0.004 * rng.randn(n).astype(np.float32)
    clusters = label.get("cluster") or ["Vocal"] * len(label["onset"])
    sigs = cluster_signatures(set(clusters), sr)
    synth = synth_harmonic if style == "harmonic" else synth_tone
    for on, off, cl in zip(label["onset"], label["offset"], clusters):
        a, b = int(on * sr), min(int(off * sr), n)
        if b - a < 8:
            continue
        y[a:b] += synth(rng, sr, b - a, sigs[cl])
    stem = os.path.splitext(os.path.basename(label_path))[0]
    os.makedirs(out_dir, exist_ok=True)
    with wave.open(os.path.join(out_dir, stem + ".wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())
    with open(os.path.join(out_dir, stem + ".json"), "w") as f:
        json.dump(label, f)
    return len(label["onset"]), end


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--labels", nargs="+", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--style", choices=["tone", "harmonic"], default="tone")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    for p in args.labels:
        n, dur = make_wav(p, args.out_dir, args.style, rng)
        print(json.dumps({"label": os.path.basename(p), "segments": n,
                          "duration_s": round(dur, 2)}))


if __name__ == "__main__":
    main()
