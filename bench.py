#!/usr/bin/env python
"""Headline benchmark: audio-seconds segmented per wall-clock second per chip.

Two rows are measured every run (VERDICT r03 item 5 — round-over-round
comparability):

1. **Headline** — the shipped production model
   (pretrained/whisperseg-base-animal-vad) with early-exit greedy decode on
   real audio: trained-model serving, not random weights.
2. **Reference row** — the fixed apples-to-apples configuration: the
   reference's own architecture (whisper-large MHA) with int8 weights,
   forced 32-token budget, batch 64 — directly comparable across rounds
   (r01/r02 measured ~130 audio-s/s here) and against the CT2-GPU baseline.

Setup mirrors the reference's production path on its own terms: zebra-finch
configuration (sr=32 kHz, spec_time_step=2.5 ms -> 2.5 s windows of 1000
spectrogram columns), greedy decoding with a realistic per-window transcript
budget (~6 segments -> 32 tokens, calibrated from the reference's zebra-finch
golden prediction of 17 segments / 7.2 s audio, README.md:324).

Baseline: the CTranslate2-GPU path. Derivation (BENCH.md): the reference
records 5.1 files/s eval throughput for whisper-BASE-ct2 on ~3.9 s
bengalese-finch files (~20 audio-s/s incl. scoring); whisper-large is ~5-6x
the compute -> ~4 audio-s/s. vs_baseline compares against the baseline of the
MEASURED model size (large 4.0, base 20.0).

Prints ONE JSON line: the headline {"metric", "value", "unit", "vs_baseline",
"config"} plus a "secondary" field carrying the reference row's dict.
Environment overrides (BENCH_MODEL/BENCH_MODEL_PATH/BENCH_GQA/...) select a
single explicit configuration and skip the secondary row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# audio-seconds/sec of the reference's CTranslate2-GPU path, by model size
# (BENCH.md): whisper-large derived at 4.0; whisper-base measured in the
# reference's own training notebook at ~5.1 files/s x 3.9 s ~= 20 (cell 14,
# docs/WhisperSeg_Training_Pipeline.ipynb — includes scoring, so generous
# to the baseline).
BASELINE_RTF_BY_MODEL = {"large": 4.0, "base": 20.0}

SR = 32000
SPEC_TIME_STEP = 0.0025


def measure(model_size="large", model_path=None, gqa_kv_heads=0, batch=64,
            max_length=32, audio_seconds=120.0, early_exit=False,
            frame_mode=False, quant="int8", int8_kv=None, bench_dp=1,
            audio_path=None):
    """Run one benchmark configuration; returns the result dict.

    Mirrors the reference's hot path (reference model.py:127-166 slicing +
    model.py:704-746 CT2 generate) as one fused jitted computation per batch.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisperseg_tpu.audio.frontend import Frontend
    from whisperseg_tpu.decode import generate
    from whisperseg_tpu.models import init_params, make_config

    if model_path:
        # real trained checkpoint: enables the production configuration
        # (early exit stops at EOT like deployments do; see BENCH.md
        # "Real-model early-exit decode")
        from whisperseg_tpu.checkpoint import load_checkpoint

        params, cfg = load_checkpoint(model_path)
        if max_length == 0:
            # the checkpoint's trained token budget (stamped by train.py) —
            # early-exit stops at EOT, so this is a cap, not the cost
            max_length = int(cfg.default_segmentation_config.get(
                "max_length", 448))
    else:
        cfg = make_config(model_size, total_spec_columns=1000,
                          num_kv_heads=gqa_kv_heads or 0,
                          frame_head=frame_mode, frame_head_clusters=2)
        params = init_params(jax.random.PRNGKey(0), cfg)
    # inference weights: int8 projections + bf16 rest by default (the decode
    # loop is HBM-bound on the weight stream; see Segmenter.inference_dtype)
    if quant in ("int8", "int4"):
        from whisperseg_tpu.ops.quant import cast_float_leaves, quantize_params

        params = cast_float_leaves(
            quantize_params(params, bits=8 if quant == "int8" else 4),
            "bfloat16")
    else:
        params = jax.tree.map(lambda x: x.astype(jnp.dtype(quant)), params)

    mesh = None
    if bench_dp > 1:
        from whisperseg_tpu.parallel import (batch_sharding, make_mesh,
                                             replicated)

        if batch % bench_dp:
            raise SystemExit(f"BENCH_BATCH={batch} not divisible by "
                             f"BENCH_DP={bench_dp}")
        mesh = make_mesh(bench_dp)
        params = jax.device_put(params, replicated(mesh))
        batch_shard = batch_sharding(mesh)

    clip_duration = 1000 * SPEC_TIME_STEP  # 2.5 s per window
    clip_samples = int(clip_duration * SR)
    num_windows = int(np.ceil(audio_seconds / clip_duration))
    # pad to full batches
    num_windows = -(-num_windows // batch) * batch
    total_audio_seconds = num_windows * clip_duration

    rng = np.random.RandomState(0)
    frontend = Frontend(SR, SPEC_TIME_STEP, 0)

    # One fused jitted computation per batch: clips -> features -> decode
    # (minimizes host->device round trips, which dominate over a tunnel).
    # int8 cross-KV wins for MHA (large KV stream); under GQA the stream is
    # already small and per-call overhead dominates (BENCH.md) -> bf16 KV.
    if int8_kv is None:
        int8_kv = not gqa_kv_heads

    if frame_mode:
        from whisperseg_tpu.models.whisper import (encoder_forward,
                                                   frame_head_forward)

        if "frame_head" not in params:
            raise SystemExit("BENCH_FRAME_MODE=1 needs a frame-head model "
                             "(BENCH_MODEL_PATH trained with --frame_head, "
                             "or the default random-init config)")

        @jax.jit
        def segment_batch(params, clips):
            # frame-VAD: the decode stage is gone; device work is
            # frontend + one encoder pass + the frame-head projection.
            # (The host-side run-extraction in refine.segments_from_tracks
            # is microseconds per window and excluded, same as the decode
            # bench excludes transcript parsing.)
            feats = frontend.features_for_clips(clips, 1000)
            enc = encoder_forward(params, cfg, feats)
            return frame_head_forward(params, cfg, enc)

    else:
        @jax.jit
        def segment_batch(params, clips):
            feats = frontend.features_for_clips(clips, 1000)
            # early_exit=False: random weights emit EOT unpredictably; force
            # the calibrated per-window token budget so runs are comparable.
            # early_exit=True (with a real checkpoint) measures the
            # production behavior: the whole batch stops once every row has
            # emitted EOT. int8_kv: Pallas cross-attention kernel with
            # in-VMEM dequant (F1-neutral, halves the dominant decode-step
            # HBM stream; BENCH.md).
            return generate(params, cfg, feats, max_length=max_length,
                            num_beams=1, top_k=1, early_exit=early_exit,
                            int8_kv=int8_kv)

    if audio_path:
        # real audio windows (tiled to fill the budget): with a real
        # checkpoint + early exit this measures the PRODUCTION decode, where
        # transcripts end at EOT instead of the forced budget
        from whisperseg_tpu.audio.io import load_audio

        y, _ = load_audio(audio_path, sr=SR)
        reps = -(-num_windows * clip_samples // max(len(y), 1))
        y = np.tile(y, reps)[: num_windows * clip_samples]
        wins = y.reshape(num_windows, clip_samples).astype(np.float32)
        batches = [jnp.asarray(wins[i * batch:(i + 1) * batch])
                   for i in range(num_windows // batch)]
    else:
        batches = [
            jnp.asarray(rng.randn(batch, clip_samples).astype(np.float32) * 0.1)
            for _ in range(num_windows // batch)
        ]

    if mesh is not None:
        batches = [jax.device_put(b, batch_shard) for b in batches]

    def one_pass():
        t0 = time.perf_counter()
        total_tokens = 0
        for clips in batches:
            tokens = segment_batch(params, clips)
            # np.asarray forces a real device->host sync (block_until_ready is
            # not a reliable barrier on tunneled PJRT backends)
            total_tokens += int(np.asarray(tokens).size)
        return time.perf_counter() - t0, total_tokens

    one_pass()  # warmup / compile
    times = []
    for _ in range(3):
        dt, _ = one_pass()
        times.append(dt)
    best = min(times)
    rtf = total_audio_seconds / best

    kvh = cfg.kv_heads if model_path else (gqa_kv_heads or cfg.num_heads)
    arch = "MHA" if kvh == cfg.num_heads else f"GQA-{kvh}"
    model_name = cfg.model_name if model_path else model_size
    baseline = BASELINE_RTF_BY_MODEL.get(model_name, 4.0)
    return {
        "metric": "audio_seconds_segmented_per_second_per_chip",
        "value": round(rtf, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(rtf / baseline, 2),
        # the measured configuration, so the number is self-describing
        "config": (f"whisper-{model_name} {arch} {quant} batch={batch} "
                   + (f"dp={bench_dp} " if bench_dp > 1 else "")
                   + ("frame-VAD (decoder-free)" if frame_mode else
                      f"greedy max_length={max_length} "
                      + ("early-exit real-ckpt" if early_exit and model_path
                         else "forced-budget"))
                   + (" real-audio" if audio_path else "")),
    }


def main():
    # honor an explicit JAX_PLATFORMS=cpu (the axon PJRT plugin overrides the
    # env var; this re-asserts it) — used for CPU smoke runs of the bench
    from whisperseg_tpu.runtime import respect_jax_platforms_env
    respect_jax_platforms_env()

    explicit = any(k in os.environ for k in
                   ("BENCH_MODEL", "BENCH_MODEL_PATH", "BENCH_GQA",
                    "BENCH_FRAME_MODE"))
    gqa = int(os.environ.get("BENCH_GQA", "0"))
    frame_mode = os.environ.get("BENCH_FRAME_MODE", "0") == "1"
    kw = dict(
        model_size=os.environ.get("BENCH_MODEL", "large"),
        model_path=os.environ.get("BENCH_MODEL_PATH"),
        gqa_kv_heads=gqa,
        batch=int(os.environ.get("BENCH_BATCH", "384" if gqa else "64")),
        max_length=int(os.environ.get("BENCH_MAX_LENGTH", "32")),
        audio_seconds=float(os.environ.get("BENCH_AUDIO_SECONDS", "120")),
        early_exit=os.environ.get("BENCH_EARLY_EXIT", "0") == "1",
        frame_mode=frame_mode,
        quant=os.environ.get("BENCH_QUANT", "int8"),
        int8_kv=(os.environ.get("BENCH_INT8_KV") == "1"
                 if "BENCH_INT8_KV" in os.environ else None),
        bench_dp=int(os.environ.get("BENCH_DP", "1")),
        audio_path=os.environ.get("BENCH_AUDIO"),
    )

    secondary = None
    if not explicit:
        # default run: headline = the shipped production model (trained-model
        # serving, not random weights) with early-exit decode on real audio
        from whisperseg_tpu.hub import default_pretrained_model

        shipped = default_pretrained_model()
        if shipped is not None:
            kw["model_path"] = shipped
            if "BENCH_EARLY_EXIT" not in os.environ:
                kw["early_exit"] = True  # production decode: stop at EOT
            if "BENCH_BATCH" not in os.environ:
                kw["batch"] = 384  # base-size weights amortize at large batch
            if "BENCH_MAX_LENGTH" not in os.environ:
                kw["max_length"] = 0  # resolved to the trained budget
            if kw["audio_path"] is None:
                zf = ("/root/reference/data/example_subset/Zebra_finch/"
                      "test_adults")
                if os.path.isdir(zf):
                    wavs = sorted(f for f in os.listdir(zf)
                                  if f.endswith(".wav"))
                    if wavs:
                        kw["audio_path"] = os.path.join(zf, wavs[0])
            # ... and additionally measure the FIXED apples-to-apples row so
            # the driver's one number stays comparable round-over-round:
            # whisper-large MHA int8, forced 32-token budget, batch 64
            # (identical to BENCH_r02's configuration). Skippable for smoke
            # runs with BENCH_SECONDARY=0.
            if os.environ.get("BENCH_SECONDARY", "1") == "1":
                secondary = measure(model_size="large", batch=64,
                                    max_length=32, quant="int8",
                                    audio_seconds=float(os.environ.get(
                                        "BENCH_AUDIO_SECONDS", "120")))

    headline = measure(**kw)
    if secondary is not None:
        headline["secondary"] = secondary
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
