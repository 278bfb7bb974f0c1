#!/usr/bin/env python
"""Bootstrap a multi-file synthetic corpus from a REAL annotation's timing
statistics.

The snapshot's bengalese-finch corpus has exactly ONE labeled file (19
segments, 1.8 s — reference data/example_subset/Bengalese_finch/test), far
too few held-out events to anchor a quality claim against the reference's
published bengalese golden (seg F1 0.9623, reference
docs/WhisperSeg_Training_Pipeline.ipynb cell 14, scored on ~hundreds of
segments). This tool scales the protocol: it resamples the real label's
empirical (duration, cluster) pairs and inter-event gaps into new label
sequences of any length, then synthesizes audio under them with
``make_synthetic_under_label``'s per-cluster acoustics — a corpus with REAL
timing/rhythm statistics and unbounded segment count.

    python scripts/make_synthetic_from_stats.py \
        --source .../bengalese_finch_..._0.json \
        --out_dir /tmp/bfs/raw --n_files 12 --duration 6.0 --seed 0
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.make_synthetic_under_label import make_wav  # noqa: E402


def bootstrap_label(rng: np.random.RandomState, source: dict,
                    duration: float) -> dict:
    """One label of ~``duration`` seconds resampled from ``source``'s
    empirical statistics: (dur, cluster) jointly, gaps independently."""
    on = np.asarray(source["onset"], dtype=np.float64)
    off = np.asarray(source["offset"], dtype=np.float64)
    clusters = list(source.get("cluster") or ["Vocal"] * len(on))
    durs = off - on
    gaps = (on[1:] - off[:-1]) if len(on) > 1 else np.asarray([0.05])
    gaps = np.maximum(gaps, 1e-3)
    first = float(on[0]) if len(on) else 0.1

    onset_l, offset_l, cluster_l = [], [], []
    cursor = first * rng.uniform(0.5, 1.5)
    while True:
        i = rng.randint(len(durs))
        d = float(durs[i]) * rng.uniform(0.9, 1.1)  # mild jitter, keeps the
        #                                             empirical distribution
        if cursor + d > duration:
            break
        onset_l.append(round(cursor, 6))
        offset_l.append(round(cursor + d, 6))
        cluster_l.append(clusters[i])
        cursor += d + float(gaps[rng.randint(len(gaps))]) * rng.uniform(0.9, 1.1)

    label = {k: v for k, v in source.items()
             if k not in ("onset", "offset", "cluster")}
    label.update({"onset": onset_l, "offset": offset_l, "cluster": cluster_l})
    return label


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True,
                    help="real annotation json to bootstrap from")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--n_files", type=int, default=12)
    ap.add_argument("--duration", type=float, default=6.0,
                    help="target duration (s) of each synthetic file")
    ap.add_argument("--style", choices=["tone", "harmonic"], default="tone")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    with open(args.source) as f:
        source = json.load(f)
    rng = np.random.RandomState(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    total = 0
    for i in range(args.n_files):
        label = bootstrap_label(rng, source, args.duration)
        lp = os.path.join(args.out_dir, f"synth_{i}.json")
        with open(lp, "w") as f:
            json.dump(label, f)
        n, dur = make_wav(lp, args.out_dir, args.style, rng)
        total += n
        print(json.dumps({"file": f"synth_{i}", "segments": n,
                          "duration_s": round(dur, 2)}))
    print(json.dumps({"total_segments": total}), file=sys.stderr)


if __name__ == "__main__":
    main()
