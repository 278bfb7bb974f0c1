#!/usr/bin/env python
"""Frame-VAD vs seq2seq segmentation throughput on a trained frame-head
checkpoint (real audio, end-to-end `Segmenter` calls, honest device sync —
the tracks/tokens come back to the host inside each call).

    python scripts/bench_frames.py --model_path /tmp/zf/fh2500/final_checkpoint \
        --audio_folder /tmp/zf/test --max_length 100

Prints ONE JSON line with audio-seconds/second for both paths and the ratio.
The frame path runs one encoder pass per window (no autoregressive decode),
so the ratio is the measured cost of decoding.
"""

import argparse
import json
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--audio_folder", required=True)
    parser.add_argument("--max_length", type=int, default=100)
    parser.add_argument("--num_beams", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--spec_time_step", type=float, default=None)
    parser.add_argument("--compute_type", default="bfloat16")
    parser.add_argument("--passes", type=int, default=3,
                        help="timed passes per path (after a compile pass)")
    args = parser.parse_args(argv)

    from whisperseg_tpu.runtime import respect_jax_platforms_env
    respect_jax_platforms_env()
    from whisperseg_tpu.audio.io import load_audio
    from whisperseg_tpu.segmenter import Segmenter

    seg = Segmenter.from_pretrained(args.model_path,
                                    inference_dtype=args.compute_type)
    if "frame_head" not in seg.params:
        raise SystemExit("checkpoint has no frame head")

    wavs = sorted(sum((glob(os.path.join(args.audio_folder, p))
                       for p in ("*.wav", "*.flac")), []))
    if not wavs:
        raise SystemExit(f"no audio in {args.audio_folder}")
    audios = [load_audio(w) for w in wavs]
    total_audio_s = sum(len(a) / sr for a, sr in audios)

    def run_frames():
        for a, sr in audios:
            seg.segment_from_frames(a, sr, spec_time_step=args.spec_time_step,
                                    batch_size=args.batch_size)

    def run_decode():
        for a, sr in audios:
            seg.segment(a, sr, spec_time_step=args.spec_time_step,
                        num_trials=1, num_beams=args.num_beams,
                        batch_size=args.batch_size,
                        max_length=args.max_length,
                        merge_gap_ms=0, split_merged_db=0,
                        refine_boundaries_ms=0, frame_split=0,
                        frame_refine_ms=0, frame_filter=0)

    def timed(fn):
        fn()  # compile + cache warm
        times = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_frames = timed(run_frames)
    t_decode = timed(run_decode)

    print(json.dumps({
        "audio_seconds": round(total_audio_s, 2),
        "n_files": len(wavs),
        "frame_vad_s": round(t_frames, 3),
        "seq2seq_s": round(t_decode, 3),
        "frame_vad_audio_s_per_s": round(total_audio_s / t_frames, 1),
        "seq2seq_audio_s_per_s": round(total_audio_s / t_decode, 1),
        "speedup": round(t_decode / t_frames, 2),
    }))


if __name__ == "__main__":
    main()
