#!/usr/bin/env python
"""Training-throughput benchmark: steps/s and audio-hours/hour for one chip.

Counterpart of bench.py (inference) for the training path. Uses synthetic
batches of the production shape (features [B, 80, 1000], 100-token targets) so
it isolates device step time from the data pipeline. Honest sync: every timed
step's loss is transferred to host (block_until_ready is not a reliable
barrier on tunneled PJRT backends; DEVNOTES.md).

    python scripts/bench_train.py --model tiny --batch_size 8 --steps 20
    python scripts/bench_train.py --model large --batch_size 8 --remat 1

Prints ONE JSON line: {"metric", "value", "unit", "model", "batch_size"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="tiny")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_length", type=int, default=100)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--remat", type=int, default=0)
    parser.add_argument("--gqa_kv_heads", type=int, default=0)
    parser.add_argument("--optimizer", default="adamw",
                        choices=["adamw", "adafactor"],
                        help="adafactor: factored state; whisper-large fits "
                             "a single 16 GB chip (f32 params + AdamW m/v "
                             "total ~18.6 GB there)")
    args = parser.parse_args(argv)

    # re-assert an explicit JAX_PLATFORMS=cpu over the axon plugin (it
    # force-prepends itself; see DEVNOTES.md) — every script honors this
    from whisperseg_tpu.runtime import respect_jax_platforms_env
    respect_jax_platforms_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisperseg_tpu.models import init_params, make_config
    from whisperseg_tpu.training.trainer import build_train_step, make_optimizer

    cfg = make_config(args.model, total_spec_columns=1000,
                      num_kv_heads=args.gqa_kv_heads or 0)
    cfg.remat = bool(args.remat)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt, _ = make_optimizer(params, 1e-4, 0.01, 10, args.steps * 10,
                            "linear", freeze_encoder=False,
                            optimizer=args.optimizer)
    opt_state = opt.init(params)
    train_step = build_train_step(cfg, opt)

    rng = np.random.RandomState(0)
    b, ml = args.batch_size, args.max_length
    batch = {
        "input_features": jnp.asarray(
            rng.randn(b, 80, 1000).astype(np.float32) * 0.5),
        "decoder_input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (b, ml)).astype(np.int32)),
        "labels": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (b, ml)).astype(np.int32)),
    }
    key = jax.random.PRNGKey(0)

    # warmup/compile
    params, opt_state, loss = train_step(params, opt_state, batch, key)
    float(np.asarray(loss))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        params, opt_state, loss = train_step(params, opt_state, batch, key)
        float(np.asarray(loss))  # per-step host sync: worst-case honest timing
    dt = time.perf_counter() - t0

    steps_per_s = args.steps / dt
    # each step consumes batch_size windows of 2.5 s audio
    audio_hours_per_hour = steps_per_s * b * 2.5
    print(json.dumps({
        "metric": "train_steps_per_second_per_chip",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "model": args.model,
        "batch_size": b,
        "optimizer": args.optimizer,
        "audio_seconds_per_second": round(audio_hours_per_hour, 2),
    }))


if __name__ == "__main__":
    main()
