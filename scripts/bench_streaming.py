#!/usr/bin/env python
"""Measure the streaming-ingest memory claim: peak RSS of
``Segmenter.segment_streaming`` vs ``segment(load_audio(...))`` on a long
WAV, plus wall time for both (they should match — the device work is
identical; only host buffering differs).

The reference (and our in-memory path) holds the full recording as float32
before features start (reference datautils.py:116, segment_service.py:76-80);
streaming holds O(chunk). Each mode runs in a fresh subprocess so RSS is not
polluted by the other's allocations.

Prints ONE JSON line:
  {"minutes", "in_memory_rss_mb", "streaming_rss_mb", "rss_ratio",
   "in_memory_s", "streaming_s", "equal_output"}
"""

import argparse
import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

WORKER = r"""
import json, os, resource, sys, time
from whisperseg_tpu.runtime import respect_jax_platforms_env
respect_jax_platforms_env()
from whisperseg_tpu.segmenter import Segmenter

mode, model_path, wav, sr, frame_mode = sys.argv[1:6]
sr = int(sr)
seg = Segmenter.from_pretrained(model_path)
kw = dict(num_trials=1, num_beams=1, batch_size=8,
          frame_mode=frame_mode == "1")
t0 = time.perf_counter()
if mode == "stream":
    out = seg.segment_streaming(wav, sr=sr, chunk_seconds=30, **kw)
else:
    from whisperseg_tpu.audio.io import load_audio
    y, _ = load_audio(wav, sr=sr)
    if kw.pop("frame_mode"):
        out = seg.segment_from_frames(y, sr)
    else:
        out = seg.segment(y, sr, **kw)
dt = time.perf_counter() - t0
# ru_maxrss is KiB on linux
peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
import hashlib
digest = hashlib.sha256(json.dumps(
    [out["onset"], out["offset"], out["cluster"]]).encode()).hexdigest()
print(json.dumps({"rss_mb": round(peak_mb, 1), "seconds": round(dt, 2),
                  "n_segments": len(out["onset"]),
                  "output_sha256": digest}))
"""


def run_mode(mode, args):
    env = dict(os.environ)
    # the worker imports whisperseg_tpu from the (not-installed) repo tree;
    # the parent's sys.path does not propagate to `python -c`
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", WORKER, mode, args.model_path, args.wav,
         str(args.sr), "1" if args.frame_mode else "0"],
        capture_output=True, text=True, env=env, timeout=3600)
    if out.returncode != 0:
        raise SystemExit(f"{mode} worker failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--wav", required=True,
                   help="long WAV to segment (see --synthesize_minutes)")
    p.add_argument("--sr", type=int, default=32000)
    p.add_argument("--frame_mode", type=int, default=0)
    p.add_argument("--synthesize_minutes", type=float, default=0,
                   help="if >0, tile --wav to this many minutes first "
                        "(written next to the source as <name>_long.wav)")
    args = p.parse_args()

    if args.synthesize_minutes:
        import numpy as np

        from whisperseg_tpu.audio.io import load_audio, save_wav

        y, sr = load_audio(args.wav, sr=args.sr)
        reps = int(np.ceil(args.synthesize_minutes * 60 * sr / len(y)))
        long_path = os.path.splitext(args.wav)[0] + "_long.wav"
        save_wav(long_path, np.tile(y, reps), sr)
        args.wav = long_path

    mem = run_mode("memory", args)
    stream = run_mode("stream", args)
    from whisperseg_tpu.audio.io import get_audio_duration

    minutes = get_audio_duration(args.wav) / 60.0
    print(json.dumps({
        "minutes": round(minutes, 1),
        "in_memory_rss_mb": mem["rss_mb"],
        "streaming_rss_mb": stream["rss_mb"],
        "rss_ratio": round(mem["rss_mb"] / stream["rss_mb"], 2),
        "in_memory_s": mem["seconds"],
        "streaming_s": stream["seconds"],
        "equal_output": mem["output_sha256"] == stream["output_sha256"]
        and mem["n_segments"] == stream["n_segments"],
    }))


if __name__ == "__main__":
    main()
