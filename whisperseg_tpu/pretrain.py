"""Synthetic task pretraining: the in-environment substitute for pretrained init.

The reference's entire quality story on small corpora rests on initializing
from pretrained Whisper weights (reference model.py:76-115 loads
``openai/whisper-*`` checkpoints). This environment has no network egress, so
the initialization is *manufactured* instead: a large randomized synthetic
vocalization corpus — tones, harmonic stacks, chirps, trills, noise bursts
with cluster structure, over colored-noise beds at the real presets' frontend
configurations — trained with the exact production objective (timestamp
decoding + frame head, data.py/codec.py semantics).

TPU-native design: real-data training over the tunnel runs ~1-2 steps/s
because every step pays a host->device batch transfer + dispatch (DEVNOTES).
Pretraining data is synthetic, so the whole pool lives device-resident and a
``lax.scan`` runs K optimizer steps per dispatch — the host only refreshes
the pool every few thousand steps (double-buffered on a CPU thread). This is
the idiomatic XLA formulation: one compiled program, static shapes, no
per-step host round trips.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .codec import build_target_ids, shift_for_training  # noqa: F401 (re-export)
from .data import VocalSegDataset, build_frame_targets  # noqa: F401


# ------------------------------------------------------------------ acoustics
#
# Each preset family from config/segment_config.json contributes a frontend
# configuration; pretraining sees every production (sr, spec_time_step,
# min_frequency) geometry so the finetune never meets a novel input layout.

PRETRAIN_CONFIGS: Tuple[Tuple[int, float, float], ...] = (
    (32000, 0.0025, 0.0),     # zebra/bengalese finch preset
    (48000, 0.0025, 0.0),     # marmoset preset
    (300000, 0.0005, 35000.0),  # mouse USV preset
    (16000, 0.01, 0.0),       # human preset
    (16000, 0.001, 0.0),      # meerkat preset
    (44100, 0.005, 0.0),      # generic audio-rate corpus
)

_KINDS = ("tone", "harmonic", "chirp", "trill", "noise")


def _edge_env(n: int, sr: float, rise_s: float) -> np.ndarray:
    """Linear attack/release envelope so events have no clicks."""
    t = np.arange(n) / sr
    rise = max(rise_s, 1.0 / sr)
    return np.minimum(1.0, np.minimum(t, t[::-1] if n > 1 else t) / rise)


def _synth_event(rng: np.random.RandomState, sr: int, n: int, sig: dict) -> np.ndarray:
    """One labeled event of ``sig['kind']`` with per-event jitter."""
    t = np.arange(n) / sr
    kind = sig["kind"]
    f0 = sig["f0"] * 2.0 ** rng.uniform(-0.15, 0.15)
    dur = max(n / sr, 1e-6)
    if kind == "noise":
        spec = np.fft.rfft(rng.randn(n))
        freqs = np.fft.rfftfreq(n, 1.0 / sr)
        lo, hi = f0 / 2 ** sig["bw_oct"], f0 * 2 ** sig["bw_oct"]
        spec[(freqs < lo) | (freqs > min(hi, sr / 2))] = 0.0
        y = np.fft.irfft(spec, n)
        peak = np.abs(y).max() or 1.0
        y = y / peak
    else:
        if kind == "chirp":
            sweep_oct = sig["fm_oct"] * rng.choice([-1.0, 1.0])
            f_t = f0 * 2.0 ** (sweep_oct * t / dur)
        elif kind in ("tone", "trill"):
            f_t = f0 * 2.0 ** (sig["fm_oct"] * np.sin(
                2 * np.pi * rng.uniform(0.3, 3.0) / dur * t
                + rng.uniform(0, 2 * np.pi)))
        else:  # harmonic
            f_t = f0 * (1.0 + 0.05 * np.sin(
                2 * np.pi * rng.uniform(0.5, 4.0) * t + rng.uniform(0, 2 * np.pi)))
        phase = 2 * np.pi * np.cumsum(f_t) / sr
        if kind == "harmonic":
            y = np.zeros(n)
            for h in range(1, 13):
                if f0 * h >= 0.48 * sr:
                    break
                y += np.sin(h * phase + rng.uniform(0, 2 * np.pi)) / h
            peak = np.abs(y).max() or 1.0
            y = y / peak
        else:
            y = np.sin(phase)
        if kind == "trill":
            am_rate = sig.get("am_rate", 30.0) * rng.uniform(0.8, 1.25)
            y = y * (0.5 + 0.5 * np.square(
                np.sin(np.pi * am_rate * t + rng.uniform(0, np.pi))))
    return (y * _edge_env(n, sr, sig["rise_s"])).astype(np.float32)


def _cluster_signature(rng: np.random.RandomState, sr: int, min_frequency: float,
                       window_s: float) -> dict:
    """A stable per-cluster acoustic identity (kind + band + duration range)."""
    lo = max(0.02 * sr, min_frequency * 1.15, 200.0)
    hi = 0.38 * sr
    dur_lo = max(3.0e-3, window_s / 500.0)
    dur_hi = min(0.3 * window_s, 120 * dur_lo)
    d1 = np.exp(rng.uniform(np.log(dur_lo), np.log(dur_hi)))
    return {
        "kind": _KINDS[rng.randint(len(_KINDS))],
        "f0": float(np.exp(rng.uniform(np.log(lo), np.log(hi)))),
        "fm_oct": float(rng.uniform(0.0, 1.2)),
        "bw_oct": float(rng.uniform(0.15, 1.0)),
        "am_rate": float(np.exp(rng.uniform(np.log(8.0), np.log(80.0)))),
        "rise_s": float(np.exp(rng.uniform(np.log(5e-4), np.log(1e-2)))),
        "dur_range": (float(d1), float(min(d1 * rng.uniform(1.5, 4.0), dur_hi))),
        "amp": float(rng.uniform(0.15, 0.9)),
    }


def _background(rng: np.random.RandomState, sr: int, n: int) -> np.ndarray:
    """Colored-noise bed + occasional hum/unlabeled broadband clicks."""
    level = 10.0 ** rng.uniform(-3.3, -1.3)
    spec = np.fft.rfft(rng.randn(n))
    freqs = np.maximum(np.fft.rfftfreq(n, 1.0 / sr), 1.0)
    spec = spec / freqs ** rng.uniform(0.0, 0.8)
    y = np.fft.irfft(spec, n)
    y = level * y / (np.std(y) or 1.0)
    if sr <= 48000 and rng.rand() < 0.25:  # mains hum + harmonics
        base = rng.choice([50.0, 60.0])
        t = np.arange(n) / sr
        for h in (1, 2, 3):
            y += level * rng.uniform(0.2, 1.0) * np.sin(
                2 * np.pi * base * h * t + rng.uniform(0, 2 * np.pi))
    if rng.rand() < 0.3:  # unlabeled low-level clicks (cage noise analogue)
        for _ in range(rng.randint(1, 5)):
            pos = rng.randint(n)
            width = rng.randint(max(2, sr // 4000), max(4, sr // 400))
            hi = min(pos + width, n)
            y[pos:hi] += rng.uniform(0.01, 0.08) * rng.randn(hi - pos)
    return y.astype(np.float32)


def gen_example(rng: np.random.RandomState, sr: int, spec_time_step: float,
                min_frequency: float, total_spec_columns: int,
                max_events: int = 20, max_clusters: int = 5):
    """One synthetic clip + label at one frontend configuration.

    Returns ``(audio, label)`` shaped for :class:`~whisperseg_tpu.data.
    VocalSegDataset` — the audio is ~10% longer than one training window so
    the dataset's random crop provides translation jitter."""
    window_s = total_spec_columns * spec_time_step
    n = int(round(window_s * 1.1 * sr))
    audio = _background(rng, sr, n)

    onsets: List[float] = []
    offsets: List[float] = []
    cluster_ids: List[int] = []
    if rng.rand() >= 0.08:  # 8% of clips are pure background (silence target)
        n_clusters = 1 if rng.rand() < 0.5 else rng.randint(2, max_clusters + 1)
        sigs = [_cluster_signature(rng, sr, min_frequency, window_s)
                for _ in range(n_clusters)]
        dense_train = rng.rand() < 0.35  # song-like syllable trains: tight
        # gaps (2-20 quanta) between successive same-style events — the
        # zebra/bengalese timing regime; without these the pretrained event
        # channels learn a well-separated-events prior that over-splits
        # dense song (measured: held-out zebra seg F1 regression in the
        # ptft/ptft2 arms while frame F1 held at ~0.94)
        n_events = rng.randint(1, max_events + 1)
        gap_scale = window_s / max(n_events, 1)
        cursor = rng.uniform(0.0, 0.5 * gap_scale)
        # cluster ids are CANONICALIZED by order of first appearance (first
        # event's cluster = 0, next novel signature = 1, ...): a random
        # signature->id assignment would make the decoder's cluster digits
        # unpredictable in principle (measured: 40k-step pretrain where the
        # frame head converged but decode CE floored near the cluster
        # entropy), while first-appearance ordering is inferable from the
        # audio alone — the in-context clustering task the reference's
        # multi-cluster decode actually requires
        relabel: Dict[int, int] = {}
        for _ in range(n_events):
            raw_cid = rng.randint(n_clusters)
            sig = sigs[raw_cid]
            dur = float(rng.uniform(*sig["dur_range"]))
            if cursor + dur >= n / sr:
                break
            a, b = int(cursor * sr), int((cursor + dur) * sr)
            if b - a >= 8:
                audio[a:b] += sig["amp"] * rng.uniform(0.6, 1.2) * _synth_event(
                    rng, sr, b - a, sig)
                onsets.append(cursor)
                offsets.append(cursor + dur)
                cluster_ids.append(relabel.setdefault(raw_cid, len(relabel)))
            if dense_train:
                gap = float(np.exp(rng.uniform(np.log(2.0), np.log(20.0)))
                            ) * spec_time_step
            else:
                gap = max(2.5 * spec_time_step,
                          float(rng.exponential(0.6 * gap_scale)))
            cursor += dur + gap
    label = {
        "species": "unknown",
        "sr": sr,
        "spec_time_step": spec_time_step,
        "min_frequency": min_frequency,
        "onset": np.asarray(onsets, dtype=np.float64),
        "offset": np.asarray(offsets, dtype=np.float64),
        "cluster_id": np.asarray(cluster_ids, dtype=np.int64),
        "cluster": [str(c) for c in cluster_ids],
    }
    peak = np.abs(audio).max()
    if peak > 1.0:
        audio /= peak
    return audio, label


# ------------------------------------------------------------------ pool build


@dataclass
class PoolSpec:
    total_spec_columns: int = 1000
    max_length: int = 100
    frame_sigma: float = 1.0
    configs: Tuple[Tuple[int, float, float], ...] = PRETRAIN_CONFIGS
    chunk: int = 64  # per-config collate batch (ONE compiled frontend
    #                  program per configuration, reused across refreshes)


def make_items(seed: int, n_items: int, spec: PoolSpec):
    """CPU half of a pool refresh: synth audio + tokenized targets.

    ``n_items`` is rounded up to a multiple of ``len(configs) * chunk`` so
    every device collate call hits the same compiled shape."""
    per = -(-n_items // (len(spec.configs) * spec.chunk)) * spec.chunk
    rng = np.random.RandomState(seed)
    items_by_config = []
    for (sr, step, minf) in spec.configs:
        audio_list, label_list = [], []
        for _ in range(per):
            a, l = gen_example(rng, sr, step, minf, spec.total_spec_columns)
            audio_list.append(a)
            label_list.append(l)
        ds = VocalSegDataset(audio_list, label_list, spec.max_length,
                             spec.total_spec_columns, frame_targets=True,
                             frame_sigma=spec.frame_sigma)
        items = [ds.__getitem__(i, rng=rng) for i in range(per)]
        items_by_config.append((ds, items))
    return items_by_config


def collate_pool(items_by_config, spec: PoolSpec) -> Dict[str, np.ndarray]:
    """Device half of a pool refresh: batched on-device log-mel per config."""
    batches = []
    for ds, items in items_by_config:
        for i in range(0, len(items), spec.chunk):
            batches.append(ds.collate(items[i:i + spec.chunk]))
    pool = {
        "input_features": np.concatenate(
            [b["input_features"] for b in batches]),
        "decoder_input_ids": np.concatenate(
            [b["decoder_input_ids"] for b in batches]),
        "labels": np.concatenate([b["labels"] for b in batches]),
        "frame_targets": {
            k: np.concatenate([b["frame_targets"][k] for b in batches])
            for k in ("vocal", "onset", "offset", "cluster")
        },
    }
    return pool


# ------------------------------------------------------------- scanned trainer


def build_scan_train_step(cfg, opt, steps_per_call: int, batch_size: int,
                          timestamp_loss_weight: float = 1.0,
                          timestamp_label_sigma: float = 1.0,
                          use_spec_augment: bool = True,
                          frame_head_weight: float = 2.0,
                          frame_boundary_weight: float = 1.0,
                          qat_bits: int = 0):
    """K optimizer steps per dispatch over a device-resident pool.

    The counterpart of training/trainer.build_train_step with the batch
    gather moved on-device: ``idx`` is [K, B] int32 into the pool's leading
    axis, and ``lax.scan`` amortizes the tunnel's ~25 ms dispatch cost over
    K steps. ``frame_head_weight <= 0`` trains without frame targets (the
    pool then need not carry them)."""
    import jax
    import jax.numpy as jnp
    import optax

    from .models.whisper import (cross_entropy_loss, decoder_forward_train,
                                 encoder_forward, frame_head_forward,
                                 frame_head_loss)
    from .training.trainer import spec_augment

    def one_step(params, opt_state, batch, rng):
        rng_enc, rng_dec, rng_aug = jax.random.split(rng, 3)
        features = batch["input_features"]
        if use_spec_augment:
            features = spec_augment(features, rng_aug)

        def loss_fn(p):
            if qat_bits:
                from .ops.quant import fake_quantize_params

                p = fake_quantize_params(p, qat_bits)
            enc = encoder_forward(p, cfg, features,
                                  train=cfg.dropout > 0, dropout_rng=rng_enc)
            logits = decoder_forward_train(
                p, cfg, enc, batch["decoder_input_ids"],
                train=cfg.dropout > 0, dropout_rng=rng_dec)
            loss = cross_entropy_loss(logits, batch["labels"],
                                      timestamp_weight=timestamp_loss_weight,
                                      timestamp_sigma=timestamp_label_sigma)
            if frame_head_weight > 0 and "frame_targets" in batch:
                floss = frame_head_loss(frame_head_forward(p, cfg, enc),
                                        batch["frame_targets"],
                                        boundary_weight=frame_boundary_weight)
                loss = loss + frame_head_weight * floss
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def multi_step(params, opt_state, pool, idx, rng):
        def body(carry, idx_k):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)
            batch = jax.tree.map(lambda a: jnp.take(a, idx_k, axis=0), pool)
            params, opt_state, loss = one_step(params, opt_state, batch, sub)
            return (params, opt_state, rng), loss

        (params, opt_state, rng), losses = jax.lax.scan(
            body, (params, opt_state, rng), idx)
        return params, opt_state, losses

    return jax.jit(multi_step, donate_argnums=(0, 1))


def build_eval_loss(cfg, timestamp_loss_weight: float = 1.0,
                    timestamp_label_sigma: float = 1.0,
                    frame_head_weight: float = 2.0,
                    frame_boundary_weight: float = 1.0):
    """Deterministic (no dropout / no augment) loss on one batch, jitted."""
    import jax

    from .models.whisper import (cross_entropy_loss, decoder_forward_train,
                                 encoder_forward, frame_head_forward,
                                 frame_head_loss)

    def loss_fn(params, batch):
        enc = encoder_forward(params, cfg, batch["input_features"], train=False)
        logits = decoder_forward_train(params, cfg, enc,
                                       batch["decoder_input_ids"], train=False)
        loss = cross_entropy_loss(logits, batch["labels"],
                                  timestamp_weight=timestamp_loss_weight,
                                  timestamp_sigma=timestamp_label_sigma)
        floss = frame_head_loss(frame_head_forward(params, cfg, enc),
                                batch["frame_targets"],
                                boundary_weight=frame_boundary_weight)
        return loss + frame_head_weight * floss

    return jax.jit(loss_fn)


# ----------------------------------------------------------------- entry point


@dataclass
class PretrainArgs:
    model: str = "base"
    model_folder: str = "pretrain_model"
    steps: int = 40000
    batch_size: int = 8
    pool_items: int = 1536
    refresh_every: int = 2500
    steps_per_call: int = 100
    learning_rate: float = 5e-4
    weight_decay: float = 0.01
    warmup_steps: int = 500
    dropout: float = 0.1
    seed: int = 0
    max_clusters: int = 5
    save_every: int = 10000
    spec: PoolSpec = field(default_factory=PoolSpec)


def run_pretraining(args: PretrainArgs, use_spec_augment: bool = False) -> Optional[str]:
    import jax
    import jax.numpy as jnp

    from .checkpoint import finalize_best_checkpoint, save_training_checkpoint
    from .models.config import make_config
    from .models.whisper import ensure_frame_head, init_params
    from .training.trainer import make_optimizer

    os.makedirs(args.model_folder, exist_ok=True)
    cfg = make_config(args.model, total_spec_columns=args.spec.total_spec_columns,
                      dropout=args.dropout)
    cfg.frame_head = True
    cfg.frame_head_clusters = args.max_clusters
    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    params = ensure_frame_head(params, cfg, jax.random.PRNGKey(args.seed ^ 0x5E6))

    opt, schedule = make_optimizer(params, args.learning_rate, args.weight_decay,
                                   args.warmup_steps, args.steps, "linear",
                                   freeze_encoder=False)
    opt_state = opt.init(params)
    # spec_augment defaults OFF here: pool refreshes supply effectively
    # infinite fresh data, and masking time stripes while the labels still
    # demand the masked events only corrupts the decoder's task (measured:
    # contributes to the decode-path CE floor of the first 40k-step run)
    train_k = build_scan_train_step(cfg, opt, args.steps_per_call,
                                    args.batch_size,
                                    use_spec_augment=use_spec_augment)
    eval_loss = build_eval_loss(cfg)

    rng = jax.random.PRNGKey(args.seed + 1)
    host_rng = np.random.RandomState(args.seed + 2)

    # held-out synthetic pool for a stable val-loss signal across refreshes
    val_items = make_items(args.seed + 999_983, 4 * len(args.spec.configs)
                           * args.spec.chunk // 4, args.spec)
    val_pool = collate_pool(val_items, args.spec)
    val_pool = jax.tree.map(jnp.asarray, val_pool)

    metrics_path = os.path.join(args.model_folder, "metrics.jsonl")

    # double-buffered pool refresh: CPU item synthesis on a worker thread,
    # device collate on the main thread between dispatches
    next_items: List = [None]

    def refresh_worker(seed):
        next_items[0] = make_items(seed, args.pool_items, args.spec)

    t_gen = threading.Thread(target=refresh_worker, args=(args.seed + 10,))
    t_gen.start()
    t_gen.join()  # first pool is blocking
    pool = jax.tree.map(jnp.asarray, collate_pool(next_items[0], args.spec))
    n_pool = int(pool["labels"].shape[0])
    t_gen = threading.Thread(target=refresh_worker, args=(args.seed + 11,))
    t_gen.start()

    step = 0
    refresh_id = 2
    t0 = time.time()
    while step < args.steps:
        k = min(args.steps_per_call, args.steps - step)
        idx = host_rng.randint(0, n_pool, size=(args.steps_per_call,
                                                args.batch_size)).astype(np.int32)
        rng, sub = jax.random.split(rng)
        params, opt_state, losses = train_k(params, opt_state, pool,
                                            jnp.asarray(idx), sub)
        step += k
        if step % args.refresh_every < args.steps_per_call or step >= args.steps:
            losses_h = np.asarray(losses)[:k]  # real device sync (DEVNOTES)
            vloss = float(np.mean([
                np.asarray(eval_loss(params, jax.tree.map(
                    lambda a: a[i:i + args.batch_size], val_pool)))
                for i in range(0, int(val_pool["labels"].shape[0]),
                               args.batch_size)][:8]))
            rate = step / max(time.time() - t0, 1e-9)
            rec = {"current_step": step, "train/loss": float(losses_h.mean()),
                   "val/loss": vloss, "perf/steps_per_s": round(rate, 2),
                   "train/learning_rate": float(schedule(step))}
            print(json.dumps(rec), flush=True)
            with open(metrics_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            if step < args.steps:
                if t_gen.is_alive():
                    t_gen.join()
                pool = jax.tree.map(jnp.asarray, collate_pool(next_items[0],
                                                              args.spec))
                n_pool = int(pool["labels"].shape[0])
                t_gen = threading.Thread(target=refresh_worker,
                                         args=(args.seed + 10 + refresh_id,))
                t_gen.start()
                refresh_id += 1
        if step % args.save_every < args.steps_per_call or step >= args.steps:
            save_training_checkpoint(args.model_folder, params, cfg, step,
                                     max_to_keep=2, keep_step=None)
    if t_gen.is_alive():
        t_gen.join()
    final = finalize_best_checkpoint(args.model_folder, None)
    if final:
        print(f"Final checkpoint: {final}", flush=True)
    return final
