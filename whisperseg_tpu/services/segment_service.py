"""Single-model segmentation microservice (behavioral port of reference
segment_service.py).

``POST /segment`` with JSON body ``{audio_file_base64_string, sr,
min_frequency?, spec_time_step?, min_segment_length?, eps?, num_trials? (default
3), channel_id?, adobe_audition_compatible?}`` -> 201 with
``{onset, offset, cluster}`` (key order preserved). Any failure returns an empty
prediction (reference segment_service.py:84-91). A global semaphore serializes
requests on the model (reference segment_service.py:58-60,110). The Adobe
Audition mode reshapes the output into a cue-sheet table with a BOM'd Name column
and decimal H:MM:SS.mmm times (reference segment_service.py:27-47,93-108).
"""

from __future__ import annotations

import argparse
import base64
import io
import threading

from .http_util import JsonHTTPServer, Request


def decimal_to_seconds(decimal_time: str) -> float:
    splits = decimal_time.split(":")
    if len(splits) == 2:
        hours, (minutes, seconds) = 0, splits
    elif len(splits) == 3:
        hours, minutes, seconds = splits
    else:
        raise ValueError(decimal_time)
    return int(hours) * 3600 + int(minutes) * 60 + float(seconds)


def seconds_to_decimal(seconds: float) -> str:
    # Deliberate fix over the reference (segment_service.py:39-47), which
    # omits the % 3600 and prints 3661 s as "1:61:01.000" — invalid H:MM:SS
    # that its own decimal_to_seconds inverts to 7261 s.
    hours = int(seconds // 3600)
    minutes = int(seconds % 3600 // 60)
    seconds = seconds % 60
    if hours > 0:
        return "%d:%02d:%06.3f" % (hours, minutes, seconds)
    return "%d:%06.3f" % (minutes, seconds)


def adobe_audition_format(prediction: dict) -> dict:
    starts = [seconds_to_decimal(s) for s in prediction["onset"]]
    durations = [
        seconds_to_decimal(e - s)
        for s, e in zip(prediction["onset"], prediction["offset"])
    ]
    n = len(starts)
    return {
        "﻿Name": [""] * n,
        "Start": starts,
        "Duration": durations,
        "Time Format": ["decimal"] * n,
        "Type": ["Cue"] * n,
        "Description": [""] * n,
    }


def build_app(segmenter, batch_size: int = 8,
              serialize: bool = True) -> JsonHTTPServer:
    """``serialize=False`` admits concurrent requests (use with a
    BatchingSegmenter, which batches their windows into shared device calls —
    replacing the reference's global one-request-at-a-time semaphore)."""
    app = JsonHTTPServer()
    sem = threading.Semaphore(1 if serialize else 1024)

    @app.route("/segment", methods=["POST"])
    def segment(req: Request):
        from ..audio.io import load_audio

        with sem:
            adobe = False
            info = {}
            stats = None
            try:
                info = {k: v for k, v in req.json.items() if v is not None}
                audio_b64 = info["audio_file_base64_string"]
                sr = info["sr"]
                adobe = info.get("adobe_audition_compatible", False)
                audio, _ = load_audio(
                    io.BytesIO(base64.b64decode(audio_b64)), sr=sr, mono=False,
                    channel_id=info.get("channel_id", 0),
                )
                if audio.ndim == 2:
                    audio = audio[info.get("channel_id", 0)]
                if info.get("frame_mode", False):
                    # decoder-free frame-VAD path (needs a frame-head model)
                    prediction = segmenter.segment_from_frames(
                        audio, sr=sr,
                        min_frequency=info.get("min_frequency", None),
                        spec_time_step=info.get("spec_time_step", None),
                        batch_size=batch_size,
                    )
                else:
                    prediction = segmenter.segment(
                        audio, sr=sr,
                        min_frequency=info.get("min_frequency", None),
                        spec_time_step=info.get("spec_time_step", None),
                        min_segment_length=info.get("min_segment_length",
                                                    None),
                        eps=info.get("eps", None),
                        num_trials=info.get("num_trials", 3),
                        batch_size=batch_size,
                        # beyond the reference's request schema (which fixes
                        # these server-side): optional decode knobs
                        num_beams=info.get("num_beams", 4),
                        max_length=info.get("max_length", None),
                        top_p=info.get("top_p", 1.0),
                        refine_boundaries_ms=info.get("refine_boundaries_ms",
                                                      None),
                        split_merged_db=info.get("split_merged_db", None),
                        merge_gap_ms=info.get("merge_gap_ms", None),
                        frame_split=info.get("frame_split", None),
                        frame_refine_ms=info.get("frame_refine_ms", None),
                        frame_filter=info.get("frame_filter", None),
                    )
                    stats = getattr(segmenter, "last_consolidation_stats",
                                    None)
            except Exception:
                print("Segmentation Error! Returning an empty prediction ...")
                prediction = {"onset": [], "offset": [], "cluster": []}
                adobe = False
            if adobe:
                prediction = adobe_audition_format(prediction)
            # additive response metadata (reference schema keeps its keys):
            # surface cross-trial disagreement so clients learn when the
            # production num_trials=3 default is collapsing recall
            if stats and stats.get("low_agreement"):
                prediction = dict(prediction)
                prediction["warnings"] = [
                    f"low cross-trial agreement: consolidation discarded "
                    f"{stats['n_noise']}/{stats['n_input']} segments "
                    f"({stats['noise_fraction']:.0%}); consider "
                    f"num_trials=1"]
            return prediction, 201

    @app.route("/status", methods=["GET"])
    def status(req: Request):
        return {"status": "ready"}, 200

    return app


def main(argv=None):
    from ..runtime import respect_jax_platforms_env
    respect_jax_platforms_env()

    from ..segmenter import Segmenter

    parser = argparse.ArgumentParser()
    parser.add_argument("--port", "--flask_port", dest="port", default=8050, type=int)
    parser.add_argument("--model_path", default=None,
                        help="checkpoint path or built-in model name; "
                             "default = the shipped multi-species generalist")
    parser.add_argument("--device", default="tpu", help="accepted for compat")
    parser.add_argument("--device_ids", type=int, nargs="+", default=[0])
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--continuous_batching", type=int, default=0,
                        help="admit concurrent requests and batch their "
                             "windows into shared device calls")
    parser.add_argument("--draft_model_path", default=None,
                        help="Small checkpoint enabling greedy speculative "
                             "decoding (Segmenter.set_draft_model)")
    parser.add_argument("--spec_k", default=4, type=int)
    parser.add_argument("--warmup", type=int, default=1,
                        help="pre-compile the model's default configuration "
                             "at startup (first-request latency)")
    parser.add_argument("--compute_type", default="bfloat16",
                        choices=["float32", "bfloat16", "int8", "int4"],
                        help="serving weight precision (int8 = CT2 "
                             "int8_float16 counterpart; int4 = w4a16)")
    args = parser.parse_args(argv)

    if args.model_path is None:
        from ..hub import default_pretrained_model

        args.model_path = default_pretrained_model()
        if args.model_path is None:
            raise SystemExit("no --model_path given and no built-in model "
                             "under pretrained/ — train one or pass a path")
        print(f"using the shipped default model: {args.model_path}")

    if args.continuous_batching:
        from .batching import BatchingSegmenter

        # from_pretrained resolves everything the plain path does (our
        # checkpoint dirs, reference-style HF checkpoints, hub names) —
        # loading params.npz directly here broke HF/hub model paths under
        # --continuous_batching only
        segmenter = BatchingSegmenter.from_pretrained(
            args.model_path, inference_dtype=args.compute_type)
        segmenter.max_batch_size = args.batch_size
        app = build_app(segmenter, args.batch_size, serialize=False)
    else:
        segmenter = Segmenter.from_pretrained(
            args.model_path, inference_dtype=args.compute_type)
        app = build_app(segmenter, args.batch_size)
    if args.draft_model_path:
        segmenter.set_draft_model(args.draft_model_path, spec_k=args.spec_k)
    if args.warmup:
        sr = segmenter.default_segmentation_config.get("sr", 32000)
        try:
            print("Warming up (pre-compiling the serving computation) ...")
            segmenter.warmup(sr, batch_size=args.batch_size)
        except Exception as e:
            print(f"warmup skipped: {type(e).__name__}: {e}")
    print("Waiting for requests...")
    app.serve("0.0.0.0", args.port)


if __name__ == "__main__":
    main()
