#!/usr/bin/env python
"""Speculative-decoding speedup measurement on trained checkpoints.

Loads a target and a draft checkpoint (both finetuned on the same dataset so
their transcripts agree), builds a real feature batch from a folder of wavs,
and times plain greedy vs speculative decoding with honest device sync.
Decode-only timing: the encoder runs inside both paths identically, so the
reported ratio is conservative (the speculative path pays the draft encoder
too).

    python scripts/bench_spec.py --model_path /tmp/zf/base/final_checkpoint \
        --draft_model_path /tmp/zf/tiny/final_checkpoint \
        --audio_folder /tmp/zf/test --spec_k 4

Prints ONE JSON line with both timings, the speedup, and the mean accepted
tokens per target forward.
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
    parser.add_argument("--draft_model_path", required=True)
    parser.add_argument("--audio_folder", required=True)
    parser.add_argument("--spec_k", type=int, default=4)
    parser.add_argument("--max_length", type=int, default=100)
    parser.add_argument("--spec_time_step", type=float, default=0.0025)
    parser.add_argument("--passes", type=int, default=3)
    args = parser.parse_args(argv)

    # re-assert an explicit JAX_PLATFORMS=cpu over the axon plugin (it
    # force-prepends itself; see DEVNOTES.md) — every script honors this
    from whisperseg_tpu.runtime import respect_jax_platforms_env
    respect_jax_platforms_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisperseg_tpu.audio.frontend import Frontend
    from whisperseg_tpu.audio.io import load_audio
    from whisperseg_tpu.checkpoint import load_checkpoint
    from whisperseg_tpu.decode import generate, generate_speculative

    def load_bf16(path):
        params, cfg = load_checkpoint(path)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "astype") and x.dtype == jnp.float32 else x, params)
        return params, cfg

    params, cfg = load_bf16(args.model_path)
    dparams, dcfg = load_bf16(args.draft_model_path)

    # Window every wav into the model's clip duration and batch all windows.
    cols = cfg.total_spec_columns
    clip_dur = cols * args.spec_time_step
    clips, srs = [], set()
    for path in sorted(glob(os.path.join(args.audio_folder, "*.wav"))):
        audio, sr = load_audio(path)
        srs.add(sr)
        n = int(clip_dur * sr)
        for i in range(0, len(audio), n):
            c = audio[i:i + n]
            clips.append(np.pad(c, (0, n - len(c))))
    assert len(srs) == 1, f"mixed sample rates {srs}"
    sr = srs.pop()
    frontend = Frontend(sr, args.spec_time_step, 0)
    feats = frontend.features_for_clips(
        jnp.asarray(np.stack(clips), jnp.float32), cols)
    feats = jnp.asarray(np.asarray(feats))  # materialize once, off the clock

    # params are jit ARGUMENTS, not closure captures: capturing bakes ~GBs of
    # weights into the program as constants, which re-uploads them through the
    # compile path (catastrophic over this environment's remote-compile tunnel)
    greedy_fn = jax.jit(lambda p, f: generate(
        p, cfg, f, max_length=args.max_length, num_beams=1, top_k=1))
    spec_fn = jax.jit(lambda p, dp, f: generate_speculative(
        p, cfg, dp, dcfg, f, max_length=args.max_length, spec_k=args.spec_k))

    def run(fn, *fn_args):
        out = np.asarray(fn(*fn_args))  # device->host sync (DEVNOTES.md)
        times = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            out = np.asarray(fn(*fn_args))
            times.append(time.perf_counter() - t0)
        return min(times), out

    t_greedy, out_g = run(greedy_fn, params, feats)
    t_spec, out_s = run(spec_fn, params, dparams, feats)

    from whisperseg_tpu import tokenizer as tok
    def lengths(out):
        return (out != tok.PAD_ID).sum(-1)

    match = float((out_g == out_s).mean())
    print(json.dumps({
        "metric": "speculative_decode_speedup",
        "greedy_s": round(t_greedy, 4),
        "speculative_s": round(t_spec, 4),
        "speedup": round(t_greedy / t_spec, 3),
        "batch_windows": int(feats.shape[0]),
        "spec_k": args.spec_k,
        "token_match_rate": round(match, 4),
        "mean_tokens": round(float(lengths(np.asarray(out_g)).mean()), 1),
    }))


if __name__ == "__main__":
    main()
