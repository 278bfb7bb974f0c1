"""Segmentation CLI (flag/CSV-compatible with reference scripts/segment.py).

Supports a single --audio_path (``-`` = audio bytes on stdin), or an
--audio_folder (wav/flac/mp3/ogg, prepending a ``filename`` column), writing
CSV to a path or to stdout with ``--csv_save_path buffer``. The reference's
--device/--device_ids GPU flags are accepted for compatibility; device
placement on TPU is automatic.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from glob import glob


from ..runtime import respect_jax_platforms_env

respect_jax_platforms_env()


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path")
    parser.add_argument("--audio_path", default=None,
                        help="Path to a .wav file, or '-' for wav bytes on stdin")
    parser.add_argument("--audio_folder", default=None,
                        help="Folder of .wav files (used when audio_path is None)")
    parser.add_argument("--csv_save_path",
                        help="Output .csv path, or 'buffer' for stdout")
    parser.add_argument("--device", default="tpu", help="accepted for compat")
    parser.add_argument("--device_ids", type=int, nargs="+", default=[0],
                        help="accepted for compat")
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--min_frequency", default=None, type=int)
    parser.add_argument("--spec_time_step", default=None, type=float)
    parser.add_argument("--num_trials", default=1, type=int)
    parser.add_argument("--num_beams", default=4, type=int)
    parser.add_argument("--draft_model_path", default=None,
                        help="Small checkpoint for greedy speculative "
                             "decoding (requires --num_beams 1)")
    parser.add_argument("--spec_k", default=4, type=int,
                        help="Draft tokens per speculative step")
    parser.add_argument("--merge_gap_ms", default=None, type=float,
                        help="opt-in merge of same-cluster predictions whose "
                             "gap is below this (spurious splits; refine.py)")
    parser.add_argument("--split_merged_db", default=None, type=float,
                        help="opt-in energy-valley split of merged segments "
                             "(dB drop below both flanks; see refine.py)")
    parser.add_argument("--refine_boundaries_ms", default=None, type=float,
                        help="opt-in energy-edge boundary refinement: search "
                             "half-width in ms (see whisperseg_tpu/refine.py)")
    parser.add_argument("--frame_split", default=None, type=float,
                        help="opt-in frame-head split of decoder merges: "
                             "event-track cut threshold 0..1 (needs a model "
                             "trained with --frame_head; refine.py)")
    parser.add_argument("--frame_refine_ms", default=None, type=float,
                        help="opt-in frame-head boundary snap: search "
                             "half-width in ms (needs --frame_head model)")
    parser.add_argument("--frame_filter", default=None, type=float,
                        help="opt-in frame-head hallucination filter: drop "
                             "segments whose mean vocal probability is below "
                             "this (0..1; needs --frame_head model)")
    parser.add_argument("--frame_mode", default=0, type=int,
                        help="1: decoder-free frame-VAD segmentation "
                             "(Segmenter.segment_from_frames; needs a "
                             "--frame_head model — see RESULTS.md)")
    parser.add_argument("--max_length", default=None, type=int,
                        help="decode token budget; default = the budget the "
                             "checkpoint was trained at (stamped by train.py "
                             "--max_length), else the reference's 448 "
                             "(reference model.py:411). 448-token programs "
                             "compile ~10x slower and buy nothing for models "
                             "finetuned at 100.")
    parser.add_argument("--compute_type", default="bfloat16",
                        choices=["float32", "bfloat16", "int8", "int4"],
                        help="Inference weight precision (int8 = CT2 "
                             "int8_float16 counterpart; int4 = w4a16)")
    return parser


def main(argv=None):
    import pandas as pd
    from tqdm import tqdm

    from ..audio.io import load_audio
    from ..segmenter import Segmenter

    args = build_parser().parse_args(argv)
    assert args.csv_save_path.endswith(".csv") or args.csv_save_path == "buffer", \
        "csv_save_path must end with .csv or be 'buffer'"

    segmenter = Segmenter.from_pretrained(
        args.model_path, inference_dtype=args.compute_type)
    if args.draft_model_path:
        segmenter.set_draft_model(args.draft_model_path, spec_k=args.spec_k)

    def run(audio, sr):
        if args.frame_mode:
            return segmenter.segment_from_frames(
                audio, sr, min_frequency=args.min_frequency,
                spec_time_step=args.spec_time_step,
                batch_size=args.batch_size,
            )
        return segmenter.segment(
            audio, sr, min_frequency=args.min_frequency,
            spec_time_step=args.spec_time_step, num_trials=args.num_trials,
            batch_size=args.batch_size, num_beams=args.num_beams,
            max_length=args.max_length,
            refine_boundaries_ms=args.refine_boundaries_ms,
            split_merged_db=args.split_merged_db,
            merge_gap_ms=args.merge_gap_ms,
            frame_split=args.frame_split,
            frame_refine_ms=args.frame_refine_ms,
            frame_filter=args.frame_filter,
        )

    if args.audio_path is None:
        assert args.audio_folder is not None, \
            "Either audio_path or audio_folder needs to be specified!"
        paths = sorted(sum((glob(os.path.join(args.audio_folder, pat))
                            for pat in ("*.wav", "*.WAV", "*.flac", "*.mp3",
                                        "*.ogg")), []))
        overall = {"filename": [], "onset": [], "offset": [], "cluster": []}
        for path in tqdm(paths):
            audio, sr = load_audio(path)
            res = run(audio, sr)
            overall["filename"] += [os.path.basename(path)] * len(res["onset"])
            overall["onset"] += res["onset"]
            overall["offset"] += res["offset"]
            overall["cluster"] += res["cluster"]
        df = pd.DataFrame(overall)
    else:
        if args.audio_path == "-":
            audio, sr = load_audio(sys.stdin.buffer.read())
        else:
            audio, sr = load_audio(args.audio_path)
        df = pd.DataFrame(run(audio, sr))

    if args.csv_save_path == "buffer":
        buf = io.StringIO()
        df.to_csv(buf, index=False)
        print(buf.getvalue())
    else:
        df.to_csv(args.csv_save_path, index=False)


if __name__ == "__main__":
    main()
