"""Training loop (behavioral port of reference train.py on a JAX device mesh).

Differences from the reference, all TPU-motivated:
  * bf16 matmuls with f32 params/accumulation instead of fp16 AMP + GradScaler
    (bf16 needs no loss scaling; reference train.py:24-45).
  * data parallelism via mesh sharding (gradient all-reduce compiled by XLA over
    ICI) instead of ``nn.DataParallel``/NCCL (reference train.py:132).
  * the whole update step (fwd + bwd + AdamW) is one donated jit computation.

Faithfully ported semantics: AdamW with bias/LayerNorm excluded from weight decay
(train.py:125-130), linear warmup + linear decay schedule (train.py:191-197),
epoch/iteration reconciliation with a min-iterations floor (train.py:181-189),
periodic validation with num_trials=1/num_beams=1 (train.py:245-263), early stop
after two consecutive validation drops past 50% progress (train.py:273-278),
checkpoint-{step} pruning and final_checkpoint selection (train.py:289-317),
status.json progress/ETA (train.py:218-228).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .. import codec  # noqa: F401  (re-exported for convenience)
from ..checkpoint import (
    finalize_best_checkpoint,
    load_checkpoint,
    save_training_checkpoint,
)
from ..data import (
    DataLoader,
    VocalSegDataset,
    resolve_default_config,
    get_audio_and_label_paths,
    get_cluster_codebook,
    load_data,
    slice_audios_and_labels,
    train_val_split,
)
from ..evaluate import evaluate
from ..models.config import WhisperConfig, make_config
from ..models.whisper import (
    cross_entropy_loss,
    decoder_forward_train,
    encoder_forward,
    init_params,
)
from ..segmenter import Segmenter


@dataclass
class TrainArgs:
    """Mirrors the reference CLI surface (reference train.py:51-88)."""

    initial_model_path: str = "base"
    model_folder: str = "model"
    train_dataset_folder: str = ""
    n_device: Optional[int] = None
    print_every: int = 100
    validate_every: Optional[int] = None
    validate_per_epoch: bool = False
    save_every: Optional[int] = None
    save_per_epoch: bool = False
    max_num_epochs: int = 3
    max_num_iterations: Optional[int] = None
    min_num_iterations: int = 500
    val_ratio: float = 0.0
    max_length: int = 100
    total_spec_columns: int = 1000
    batch_size: int = 4
    learning_rate: float = 3e-6
    lr_schedule: str = "linear"
    max_to_keep: int = -1
    seed: int = 66100
    weight_decay: float = 0.01
    warmup_steps: int = 100
    freeze_encoder: bool = False
    optimizer: str = "adamw"  # or "adafactor" (factored 2nd moment, ~0 state
    #                           memory: lets whisper-large train on ONE chip)
    qat_bits: int = 0  # 4 or 8: quantization-aware training (STE fake-quant
    #                    on projection weights; checkpoint stays f32 and
    #                    becomes robust to inference_dtype='int4'/'int8')
    timestamp_loss_weight: float = 1.0  # >1 upweights timestamp targets
    timestamp_label_sigma: float = 0.0  # >0: Gaussian-soft timestamp targets
    #                                     (stddev in spectrogram columns)
    frame_head: bool = False  # train the auxiliary encoder frame head
    #                           (vocal/onset/offset/cluster per timestamp
    #                           quantum; models/whisper.frame_head_forward)
    frame_head_weight: float = 1.0  # frame-loss weight relative to token CE
    frame_boundary_weight: float = 1.0  # onset/offset channel weight relative
    #                                     to the vocal channel (upweight to
    #                                     sharpen sub-call cut learning)
    frame_label_sigma: float = 1.0  # Gaussian stddev (grid positions) of the
    #                                 soft onset/offset event targets
    spec_augment: bool = False  # SpecAugment freq/time masking (regularizer)
    synth_augment: int = 0  # N: add N splice-synthesized training files built
    #                         from real syllables + noise beds (augment.py)
    dropout: float = 0.0
    num_workers: int = 4  # parallel item-loading threads in the DataLoader
    clear_cluster_codebook: bool = True
    ignore_cluster: bool = False
    tp: int = 1
    fsdp: bool = False
    remat: bool = False  # rematerialize activations (large models / long clips)
    device_pool: bool = False  # device-resident epoch blocks + scanned steps
    #                            (~10x steps/s for small corpora over the
    #                            dispatch-bound tunnel; single-device only;
    #                            validation/save cadence rounds to epoch
    #                            blocks)
    gqa_kv_heads: int = 0  # convert the initial model to GQA before training
    project: str = "whisperseg-tpu"
    run_name: Optional[str] = None
    use_wandb: bool = False
    profile_dir: Optional[str] = None  # jax.profiler trace of steps 10..14


def load_model_any(path_or_name: str, total_spec_columns: int, dropout: float):
    """Resolve an initial model: our checkpoint dir, a HF checkpoint dir, or a
    fresh Whisper family size name ('tiny'..'large') — the counterpart of
    reference load_model (model.py:76-115)."""
    import jax

    if os.path.isdir(path_or_name):
        if os.path.exists(os.path.join(path_or_name, "params.npz")):
            import jax.numpy as jnp

            from ..models.whisper import sinusoid_position_table

            params, cfg = load_checkpoint(path_or_name)
            cfg.dropout = dropout
            cfg.total_spec_columns = total_spec_columns
            new_positions = total_spec_columns // 2
            pos = params["encoder"]["pos_emb"]
            if pos.shape[0] != new_positions:
                # truncate or sinusoid-extend, mirroring reference model.py:79-84
                if pos.shape[0] > new_positions:
                    pos = pos[:new_positions]
                else:
                    ext = sinusoid_position_table(new_positions, pos.shape[1])
                    pos = jnp.asarray(ext).at[: pos.shape[0]].set(pos)
                params["encoder"]["pos_emb"] = pos
            cfg.max_source_positions = new_positions
            return params, cfg
        # HF layout
        from ..models.convert_hf import import_hf_checkpoint

        params, cfg = import_hf_checkpoint(path_or_name, total_spec_columns)
        cfg.dropout = dropout
        return params, cfg
    cfg = make_config(path_or_name, total_spec_columns=total_spec_columns,
                      dropout=dropout)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def _decay_mask(params):
    """True where weight decay applies: everything except biases and norm scales
    (reference train.py:125-129: no_decay = ['bias', 'LayerNorm.weight'])."""
    def walk(tree, name=""):
        if isinstance(tree, dict):
            return {k: walk(v, k) for k, v in tree.items()}
        return not (name.endswith("_b") or name.endswith("_g"))

    return walk(params)


def make_optimizer(params, learning_rate: float, weight_decay: float,
                   warmup_steps: int, total_steps: int, lr_schedule: str,
                   freeze_encoder: bool, optimizer: str = "adamw"):
    import optax

    if lr_schedule == "linear":
        # HF get_linear_schedule_with_warmup semantics (reference train.py:191-195)
        def schedule(step):
            import jax.numpy as jnp

            step = jnp.asarray(step, jnp.float32)
            ramp = step / jnp.maximum(warmup_steps, 1)
            decay = jnp.maximum(
                0.0, (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1)
            )
            return learning_rate * jnp.where(step < warmup_steps, ramp, decay)
    else:
        def schedule(step):
            return learning_rate

    if optimizer == "adafactor":
        # Factored second moments (row+col statistics instead of a full f32
        # moment per parameter) and no first moment: optimizer state drops
        # from 2x params (AdamW's m+v, 12.4 GB f32 for whisper-large; 18.6 GB
        # counting the f32 master params too) to ~per-row/-col vectors, which
        # is what lets whisper-large train on a single 16 GB chip. Beyond-
        # reference capability (the reference is AdamW-only, train.py:125-130).
        #
        # Composed by hand rather than optax.adafactor because that preset
        # applies weight_decay_rate AFTER learning-rate scaling — an absolute
        # 1% weight shrink per step at wd=0.01 (~10^4x the AdamW semantics of
        # the same flag), which destroys a real run. This chain mirrors
        # optax.adamw's ordering: decay joins the update BEFORE the lr scale,
        # so the effective decay is lr * wd, matching the reference's AdamW.
        steps = [
            optax.scale_by_factored_rms(
                min_dim_size_to_factor=32),  # whisper dims all >= 384; keep
            #                                  small test models factored too
            optax.clip_by_block_rms(1.0),
        ]
        if weight_decay:
            steps.append(optax.add_decayed_weights(
                weight_decay, mask=_decay_mask(params)))
        steps.append(optax.scale_by_learning_rate(schedule))
        opt = optax.chain(*steps)
    else:
        opt = optax.adamw(schedule, weight_decay=weight_decay,
                          mask=_decay_mask(params))
    if freeze_encoder:
        def label(tree):
            import jax

            # freeze only the encoder trunk; any other subtree (decoder,
            # frame_head, ...) keeps training
            return {k: jax.tree.map(
                lambda _: "frozen" if k == "encoder" else "train", v)
                for k, v in tree.items()}

        opt = optax.multi_transform(
            {"train": opt, "frozen": optax.set_to_zero()}, label(params)
        )
    return opt, schedule


def spec_augment(features, rng, n_freq_masks: int = 2, freq_width: int = 10,
                 n_time_masks: int = 2, time_width: int = 30):
    """SpecAugment-style feature masking (frequency + time stripes), applied
    on-device inside the jitted train step. Masked cells take the per-example
    feature minimum — the same value the frontend uses for padding
    (reference datautils.py:374-378) — so masks look like silence, not a
    novel token. Beyond-reference regularizer for small datasets."""
    import jax
    import jax.numpy as jnp

    b, m, t = features.shape
    fill = jnp.min(features, axis=(1, 2), keepdims=True)
    freq_idx = jnp.arange(m)[None, :, None]
    time_idx = jnp.arange(t)[None, None, :]
    masked = features
    for i in range(n_freq_masks):
        rng, sub = jax.random.split(rng)
        f0 = jax.random.randint(sub, (b, 1, 1), 0, max(m - freq_width, 1))
        hit = (freq_idx >= f0) & (freq_idx < f0 + freq_width)
        masked = jnp.where(hit, fill, masked)
    for i in range(n_time_masks):
        rng, sub = jax.random.split(rng)
        t0 = jax.random.randint(sub, (b, 1, 1), 0, max(t - time_width, 1))
        hit = (time_idx >= t0) & (time_idx < t0 + time_width)
        masked = jnp.where(hit, fill, masked)
    return masked


def build_train_step(cfg: WhisperConfig, opt, qat_bits: int = 0,
                     timestamp_loss_weight: float = 1.0,
                     timestamp_label_sigma: float = 0.0,
                     use_spec_augment: bool = False,
                     frame_head_weight: float = 0.0,
                     frame_boundary_weight: float = 1.0):
    """The donated, jitted (fwd + bwd + AdamW) step.

    Sharding is carried by the *arguments*: params placed via
    ``parallel.shard_params`` and batches via ``parallel.batch_sharding``;
    GSPMD propagates layouts through the computation and inserts the gradient
    all-reduce over ICI. ``qat_bits`` applies straight-through fake
    quantization to projection weights inside the forward (QAT)."""
    import jax
    import optax

    def step_fn(params, opt_state, batch, rng):
        rng_enc, rng_dec, rng_aug = jax.random.split(rng, 3)
        features = batch["input_features"]
        if use_spec_augment:
            features = spec_augment(features, rng_aug)

        def loss_fn(p):
            if qat_bits:
                from ..ops.quant import fake_quantize_params

                p = fake_quantize_params(p, qat_bits)
            enc = encoder_forward(p, cfg, features,
                                  train=cfg.dropout > 0, dropout_rng=rng_enc)
            logits = decoder_forward_train(p, cfg, enc, batch["decoder_input_ids"],
                                           train=cfg.dropout > 0, dropout_rng=rng_dec)
            loss = cross_entropy_loss(logits, batch["labels"],
                                      timestamp_weight=timestamp_loss_weight,
                                      timestamp_sigma=timestamp_label_sigma)
            if frame_head_weight > 0 and "frame_targets" in batch:
                from ..models.whisper import frame_head_forward, frame_head_loss

                floss = frame_head_loss(frame_head_forward(p, cfg, enc),
                                        batch["frame_targets"],
                                        boundary_weight=frame_boundary_weight)
                loss = loss + frame_head_weight * floss
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step_fn, donate_argnums=(0, 1))


def _run_device_pool_loop(args: TrainArgs, cfg, opt, schedule, params,
                          opt_state, dataset, segmenter, audio_list_val,
                          label_list_val, log_metrics) -> Optional[str]:
    """Epoch-block training over a device-resident pool (``--device_pool``).

    Per block: the host draws ONE fresh random crop of every dataset item
    (the same augmentation the per-step loader applies, just batched),
    collates it on-device grouped by frontend configuration (fixed group
    sizes -> one compiled program per configuration), and a single scanned
    device call runs ``len(dataset) // batch_size`` optimizer steps. The
    next block's crops are generated on a worker thread while the device
    trains (double buffering). Validation / checkpoint cadence rounds up to
    block boundaries."""
    import threading

    import jax
    import jax.numpy as jnp

    from ..evaluate import evaluate
    from ..pretrain import build_scan_train_step

    N = len(dataset)
    B = args.batch_size
    steps_per_block = max(N // B, 1)

    by_key: dict = {}
    for i, label in enumerate(dataset.label_list):
        key = (label["sr"], label["spec_time_step"],
               label.get("min_frequency", 0))
        by_key.setdefault(key, []).append(i)
    key_order = list(by_key)

    def make_items():
        rngs = [np.random.RandomState(np.random.randint(2 ** 31))
                for _ in range(N)]
        return [[dataset.__getitem__(i, rng=rngs[i]) for i in by_key[k]]
                for k in key_order]

    def collate_device(groups):
        batches = [dataset.collate(items) for items in groups]
        pool = {
            "input_features": np.concatenate(
                [b["input_features"] for b in batches]),
            "decoder_input_ids": np.concatenate(
                [b["decoder_input_ids"] for b in batches]),
            "labels": np.concatenate([b["labels"] for b in batches]),
        }
        if dataset.frame_targets:
            pool["frame_targets"] = {
                k: np.concatenate([b["frame_targets"][k] for b in batches])
                for k in ("vocal", "onset", "offset", "cluster")}
        return jax.tree.map(jnp.asarray, pool)

    train_k = build_scan_train_step(
        cfg, opt, steps_per_block, B,
        timestamp_loss_weight=args.timestamp_loss_weight,
        timestamp_label_sigma=args.timestamp_label_sigma,
        use_spec_augment=args.spec_augment,
        frame_head_weight=args.frame_head_weight if args.frame_head else 0.0,
        frame_boundary_weight=args.frame_boundary_weight,
        qat_bits=args.qat_bits)

    pending: dict = {}

    def gen_worker():
        pending["items"] = make_items()

    groups = make_items()
    rng = jax.random.PRNGKey(args.seed)
    step = 0
    epoch = 0
    val_score_history: List = []
    best_step: Optional[int] = None
    early_stop = False
    start_time = time.time()
    timer_t0 = time.time()

    while step < args.max_num_iterations and not early_stop:
        pool = collate_device(groups)
        t_gen = threading.Thread(target=gen_worker)
        t_gen.start()

        # crop rows are pool-order; sample a shuffled full pass over the pool
        perm = np.random.permutation(max(N, steps_per_block * B))[
            : steps_per_block * B] % N
        idx = perm.astype(np.int32).reshape(steps_per_block, B)
        rng, sub = jax.random.split(rng)
        params, opt_state, losses = train_k(params, opt_state, pool,
                                            jnp.asarray(idx), sub)
        prev = step
        k = min(steps_per_block, args.max_num_iterations - step)
        step += k
        epoch += 1
        segmenter.params = params

        mean_loss = float(np.mean(np.asarray(losses)[:k]))  # real device sync
        lr_now = float(schedule(step))
        rate = step / max(time.time() - timer_t0, 1e-9)
        print(f"Epoch: {epoch}, current_step: {step}, "
              f"learning rate: {lr_now:.8f}, Loss: {mean_loss:.4f}")
        log_metrics({"current_step": step, "epoch": epoch,
                     "train/loss": mean_loss, "train/learning_rate": lr_now,
                     "perf/steps_per_s": round(rate, 2)})
        frac = step / args.max_num_iterations
        eta = int((time.time() - start_time) / frac * (1 - frac))
        json.dump({"progress": int(np.round(frac * 100)),
                   "eta": "%02d:%02d:%02d" % (eta // 3600, (eta % 3600) // 60,
                                              eta % 60)},
                  open(os.path.join(args.model_folder, "status.json"), "w"))

        crossed = (lambda every: every is not None
                   and step // every > prev // every)
        if ((crossed(args.validate_every) or args.validate_per_epoch)
                and len(audio_list_val) > 0):
            eval_res = evaluate(audio_list_val, label_list_val, segmenter,
                                args.batch_size, args.max_length,
                                num_trials=1, num_beams=1, verbose=False)
            seg_f1 = eval_res["segment_wise"][-1]
            frame_f1 = eval_res["frame_wise"][-1]
            score = (seg_f1 + frame_f1) * 0.5
            print(f"Epoch: {epoch}, current_step: {step}, "
                  f"validation segment F1: {seg_f1:.4f}, "
                  f"frame F1: {frame_f1:.4f}")
            log_metrics({"current_step": step, "validate/score": score,
                         "validate/segment_score": seg_f1,
                         "validate/frame_score": frame_f1})
            is_new_best = (not val_score_history
                           or score > max(s for _, s in val_score_history))
            val_score_history.append((step, score))
            if is_new_best:
                best_step = step
                save_training_checkpoint(args.model_folder, params, cfg,
                                         step, args.max_to_keep,
                                         keep_step=best_step)
        if crossed(args.save_every) or args.save_per_epoch:
            save_training_checkpoint(args.model_folder, params, cfg, step,
                                     args.max_to_keep, keep_step=best_step)
        if (step >= 0.5 * args.max_num_iterations
                and len(val_score_history) >= 3
                and val_score_history[-1][1] < val_score_history[-2][1]
                and val_score_history[-2][1] < val_score_history[-3][1]):
            early_stop = True

        t_gen.join()
        groups = pending["items"]

    if not os.path.exists(os.path.join(args.model_folder,
                                       f"checkpoint-{step}")):
        save_training_checkpoint(args.model_folder, params, cfg, step,
                                 args.max_to_keep, keep_step=best_step)
    json.dump({"progress": 100, "eta": "00:00:00"},
              open(os.path.join(args.model_folder, "status.json"), "w"))
    if val_score_history:
        best_step = sorted(val_score_history, key=lambda x: -x[1])[0][0]
    final = finalize_best_checkpoint(args.model_folder, best_step)
    try:
        os.remove(os.path.join(args.model_folder, "status.json"))
    except OSError:
        pass
    return final


def run_training(args: TrainArgs) -> Optional[str]:
    """Full training run; returns the final_checkpoint path (or None)."""
    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import make_mesh, shard_params

    np.random.seed(args.seed)
    from ..tokenizer import NUM_TIMESTAMPS

    if args.total_spec_columns > NUM_TIMESTAMPS - 1:
        # fail at config time with a clear message: the compact vocabulary has
        # timestamp tokens <|0|>..<|1000|>, so a larger grid would crash much
        # later inside a DataLoader worker ("timestamp column out of range")
        raise ValueError(
            f"--total_spec_columns {args.total_spec_columns} exceeds the "
            f"timestamp vocabulary ({NUM_TIMESTAMPS - 1} columns max); the "
            f"model input geometry is fixed at <= 1000 spectrogram columns")
    if args.val_ratio == 0.0:
        args.validate_every = None
        args.validate_per_epoch = False
    os.makedirs(args.model_folder, exist_ok=True)

    params, cfg = load_model_any(args.initial_model_path, args.total_spec_columns,
                                 args.dropout)
    cfg.remat = args.remat
    if args.gqa_kv_heads and cfg.kv_heads != args.gqa_kv_heads:
        # one-flag GQA uptraining: mean-pool the MHA K/V heads, then train
        from ..models.gqa import convert_to_gqa

        params, cfg = convert_to_gqa(params, cfg, args.gqa_kv_heads)
        cfg.remat = args.remat
        print(f"Converted initial model to GQA (kv_heads={args.gqa_kv_heads}).")
    if args.max_length > cfg.max_target_positions:
        print(f"Warning: max_length {args.max_length} exceeds the model's "
              f"max_target_positions {cfg.max_target_positions}; clamping.")
        args.max_length = cfg.max_target_positions

    # inference_dtype=None: validation runs on the LIVE f32 training params
    # (reassigned below) — the default would build a bf16 weight copy that is
    # immediately discarded, costing ~1.2 GB HBM headroom on whisper-large
    segmenter = Segmenter(params, cfg, inference_dtype=None)
    if args.clear_cluster_codebook:
        segmenter.update_cluster_codebook({})

    # ---------------------------------------------------------------- data
    audio_paths, label_paths = get_audio_and_label_paths(args.train_dataset_folder)
    # label-aware resolver: the stored defaults match what training actually
    # used when the labels are explicit (see data.resolve_default_config)
    default_config = resolve_default_config(
        audio_paths, label_paths, args.total_spec_columns,
        ignore_cluster=args.ignore_cluster,
    )
    # the STORED defaults also record the decode budget this model trains at,
    # so segment()/evaluate/serving default to it instead of the architectural
    # 448 (slow-compiling and pointless for short-transcript finetunes);
    # default_config itself stays free of non-label keys — read_label merges
    # it into every training label
    stored_config = dict(default_config)
    stored_config["max_length"] = int(args.max_length)
    cfg.default_segmentation_config = stored_config
    segmenter.default_segmentation_config = dict(stored_config)

    cluster_codebook = get_cluster_codebook(
        label_paths, segmenter.cluster_codebook, ignore_cluster=args.ignore_cluster
    )
    segmenter.update_cluster_codebook(cluster_codebook)

    if args.frame_head:
        from ..models.whisper import ensure_frame_head

        cfg.frame_head = True
        cfg.frame_head_clusters = (max(cluster_codebook.values()) + 1
                                   if cluster_codebook else 0)
        params = ensure_frame_head(params, cfg,
                                   jax.random.PRNGKey(args.seed ^ 0x5E6))
        print(f"Frame head enabled ({cfg.frame_head_clusters} cluster "
              f"channel(s)).")

    audio_list, label_list = load_data(
        audio_paths, label_paths, cluster_codebook=cluster_codebook, n_threads=20,
        default_config=default_config, ignore_cluster=args.ignore_cluster,
    )

    audio_list_val, label_list_val = [], []
    if args.val_ratio > 0:
        (audio_list, label_list), (audio_list_val, label_list_val) = train_val_split(
            audio_list, label_list, args.val_ratio
        )
        # Guard-rail: with a tiny validation split the early-stop / best-
        # checkpoint signal is noise (observed: an 8000-step run whose val
        # scores diverged from the true held-out trend, RESULTS.md). The
        # reference has the same failure mode silently; we at least warn.
        n_val_segments = int(sum(len(l.get("onset", [])) for l in label_list_val))
        if len(audio_list_val) < 3 or n_val_segments < 50:
            print(f"Warning: validation split is tiny ({len(audio_list_val)} "
                  f"file(s), {n_val_segments} segment(s)). Validation F1 will "
                  f"be noisy; early stopping and best-checkpoint selection may "
                  f"pick a worse model than the last step. Consider a larger "
                  f"--val_ratio, more data, or val_ratio=0 with a fixed "
                  f"iteration budget.")

    if args.synth_augment > 0:
        # Splice-synthesis augmentation: real syllables on real noise beds
        # with exact boundaries (augment.py). Runs after the val split so
        # validation stays purely real data.
        from ..augment import synthesize_training_files

        synth_audio, synth_label = synthesize_training_files(
            audio_list, label_list, args.synth_augment,
            total_spec_columns=args.total_spec_columns,
        )
        n_synth_segments = int(sum(len(l["onset"]) for l in synth_label))
        print(f"Synth augmentation: +{len(synth_audio)} file(s), "
              f"{n_synth_segments} spliced segment(s).")
        audio_list = list(audio_list) + synth_audio
        label_list = list(label_list) + synth_label

    audio_list, label_list = slice_audios_and_labels(
        audio_list, label_list, args.total_spec_columns
    )

    from ..tokenizer import VOCAB_SIZE

    extra_token_ids = {p: VOCAB_SIZE + i
                       for i, p in enumerate(cfg.extra_tokens)} or None
    dataset = VocalSegDataset(audio_list, label_list, args.max_length,
                              args.total_spec_columns,
                              extra_token_ids=extra_token_ids,
                              cluster_encodings=getattr(
                                  cfg, "cluster_encodings", None) or None,
                              frame_targets=args.frame_head,
                              frame_sigma=args.frame_label_sigma)
    loader = DataLoader(dataset, args.batch_size, shuffle=True, drop_last=True,
                        num_workers=args.num_workers)
    if len(loader) == 0:
        loader = DataLoader(dataset, args.batch_size, shuffle=True,
                            drop_last=False, num_workers=args.num_workers)
    if len(loader) == 0:
        raise RuntimeError("Too few examples (less than a batch) for training!")

    # ------------------------------------------------- schedule reconciliation
    if args.max_num_iterations is not None and args.max_num_iterations > 0:
        args.max_num_epochs = int(np.ceil(args.max_num_iterations / len(loader)))
    else:
        assert args.max_num_epochs and args.max_num_epochs > 0
        args.max_num_iterations = len(loader) * args.max_num_epochs
        if args.min_num_iterations is not None:
            args.max_num_iterations = max(args.max_num_iterations,
                                          args.min_num_iterations)
            args.max_num_epochs = int(np.ceil(args.max_num_iterations / len(loader)))

    # --------------------------------------------------------------- optimizer
    opt, schedule = make_optimizer(
        params, args.learning_rate, args.weight_decay, args.warmup_steps,
        args.max_num_iterations, args.lr_schedule, args.freeze_encoder,
        optimizer=args.optimizer,
    )

    # size the data axis to the batch: use the largest divisor of batch_size
    # that fits the available devices (a 4-example batch on 8 chips runs dp=4)
    avail = len(jax.devices()) if args.n_device is None else args.n_device
    dp_max = max(avail // args.tp, 1)
    dp = next(d for d in range(min(dp_max, args.batch_size), 0, -1)
              if args.batch_size % d == 0)
    if dp * args.tp < avail:
        print(f"Note: using {dp * args.tp}/{avail} devices "
              f"(dp={dp} divides batch_size={args.batch_size}, tp={args.tp})")
    mesh = make_mesh(dp * args.tp, tp=args.tp)
    multi_device = int(np.prod(mesh.devices.shape)) > 1
    if multi_device:
        from ..parallel.mesh import batch_sharding

        params = shard_params(mesh, params, cfg, tp=args.tp > 1, fsdp=args.fsdp)
        opt_state = opt.init(params)  # inherits parameter shardings
        batch_shd = batch_sharding(mesh)
    else:
        opt_state = opt.init(params)
    train_step = build_train_step(
        cfg, opt, qat_bits=args.qat_bits,
        timestamp_loss_weight=args.timestamp_loss_weight,
        timestamp_label_sigma=args.timestamp_label_sigma,
        use_spec_augment=args.spec_augment,
        frame_head_weight=args.frame_head_weight if args.frame_head else 0.0,
        frame_boundary_weight=args.frame_boundary_weight)

    # ------------------------------------------------------------ logging setup
    metrics_path = os.path.join(args.model_folder, "metrics.jsonl")
    wandb = None
    if args.use_wandb:
        try:
            import wandb as _wandb

            wandb = _wandb
            wandb.init(project=args.project, name=args.run_name)
        except Exception:
            wandb = None

    def log_metrics(d):
        with open(metrics_path, "a") as f:
            f.write(json.dumps(d) + "\n")
        if wandb is not None:
            wandb.log(d)

    if args.device_pool:
        # -------------------------------------------------- device-pool loop
        # Real-data training over the remote-dispatch tunnel runs ~1-2
        # steps/s because every step pays a host->device batch transfer
        # (DEVNOTES); this opt-in path re-crops the WHOLE dataset once per
        # epoch block on the host, collates it device-resident (one compiled
        # frontend program per configuration), and trains the block as one
        # lax.scan — the same formulation that gives synthetic pretraining
        # its ~20 steps/s (whisperseg_tpu/pretrain.py). Small-corpus
        # finetunes drop from hours to minutes. Single-device only.
        if multi_device:
            raise ValueError("--device_pool supports single-device training "
                             "only (pass --n_device 1, and drop --tp/--fsdp)")
        final = _run_device_pool_loop(args, cfg, opt, schedule, params,
                                      opt_state, dataset, segmenter,
                                      audio_list_val, label_list_val,
                                      log_metrics)
        if final:
            print(f"Final checkpoint: {final}")
        print("All Done!")
        return final

    # ----------------------------------------------------------------- the loop
    from ..profiling import StepTimer

    rng = jax.random.PRNGKey(args.seed)
    current_step = 0
    loss_window: List[float] = []
    val_score_history: List = []
    best_step: Optional[int] = None  # exempt from max_to_keep pruning
    early_stop = False
    progress = 0
    start_time = time.time()
    timer = StepTimer()

    segmenter.params = params  # keep validation on the live weights

    for epoch in range(args.max_num_epochs + 1):
        for count, batch in enumerate(loader):
            rng, sub = jax.random.split(rng)
            if multi_device:
                # the drop_last=False fallback loader (tiny datasets) can
                # emit a tail batch not divisible by dp — pad it by wrapping
                # samples (slight duplicate weighting beats a sharding
                # ValueError; full batches are untouched)
                b = len(jax.tree.leaves(batch)[0])
                if b % dp:
                    pad = dp - b % dp
                    batch = jax.tree.map(
                        lambda v: np.concatenate([v, v[:pad]]), batch)
                batch_dev = jax.tree.map(
                    lambda v: jax.device_put(jnp.asarray(v), batch_shd), batch)
            else:
                batch_dev = jax.tree.map(jnp.asarray, batch)
            if args.profile_dir and current_step == 10:
                jax.profiler.start_trace(args.profile_dir)
            params, opt_state, loss = train_step(params, opt_state, batch_dev, sub)
            # keep the DEVICE scalar: float(loss) here would sync the host
            # every step, serializing dispatch in dispatch-latency-bound
            # environments (DEVNOTES); materialized at print_every below
            loss_window.append(loss)
            if args.profile_dir and current_step == 14:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
            timer.tick()
            current_step += 1
            segmenter.params = params

            frac = current_step / args.max_num_iterations
            current_progress = int(np.round(frac * 100))
            if current_progress > progress:
                eta = int((time.time() - start_time) / frac * (1 - frac))
                json.dump(
                    {"progress": current_progress,
                     "eta": "%02d:%02d:%02d" % (eta // 3600, (eta % 3600) // 60,
                                                eta % 60)},
                    open(os.path.join(args.model_folder, "status.json"), "w"),
                )
            progress = current_progress

            if current_step % args.print_every == 0:
                lr_now = float(schedule(current_step))
                mean_loss = float(np.mean([np.asarray(x) for x in loss_window]))
                print(f"Epoch: {epoch}, current_step: {current_step}, "
                      f"learning rate: {lr_now:.8f}, Loss: {mean_loss:.4f}")
                log_metrics({"current_step": current_step, "epoch": epoch,
                             "train/loss": mean_loss, "train/learning_rate": lr_now,
                             **{f"perf/{k}": v for k, v in timer.summary().items()}})
                loss_window = []

            run_validation = (
                (args.validate_every is not None
                 and current_step % args.validate_every == 0)
                or (args.validate_per_epoch and count == len(loader) - 1)
            )
            if run_validation and len(audio_list_val) > 0:
                eval_res = evaluate(audio_list_val, label_list_val, segmenter,
                                    args.batch_size, args.max_length,
                                    num_trials=1, num_beams=1, verbose=False)
                seg_f1 = eval_res["segment_wise"][-1]
                frame_f1 = eval_res["frame_wise"][-1]
                score = (seg_f1 + frame_f1) * 0.5
                print(f"Epoch: {epoch}, current_step: {current_step}, "
                      f"validation segment F1: {seg_f1:.4f}, frame F1: {frame_f1:.4f}")
                log_metrics({"current_step": current_step,
                             "validate/score": score,
                             "validate/segment_score": seg_f1,
                             "validate/frame_score": frame_f1})
                is_new_best = (not val_score_history
                               or score > max(s for _, s in val_score_history))
                val_score_history.append((current_step, score))
                if is_new_best:
                    # make best-validation selection real even without
                    # --save_every: finalize_best_checkpoint can only pick
                    # among SAVED checkpoints, so a validation best that was
                    # never saved would silently fall back to the last step
                    best_step = current_step
                    save_training_checkpoint(args.model_folder, params, cfg,
                                             current_step, args.max_to_keep,
                                             keep_step=best_step)

            if ((args.save_every is not None
                 and current_step % args.save_every == 0)
                    or (args.save_per_epoch and count == len(loader) - 1)):
                save_training_checkpoint(args.model_folder, params, cfg,
                                         current_step, args.max_to_keep,
                                         keep_step=best_step)

            if current_step >= 0.5 * args.max_num_iterations:
                if (len(val_score_history) >= 3
                        and val_score_history[-1][1] < val_score_history[-2][1]
                        and val_score_history[-2][1] < val_score_history[-3][1]):
                    early_stop = True

            if current_step >= args.max_num_iterations or early_stop:
                if not os.path.exists(os.path.join(
                        args.model_folder, f"checkpoint-{current_step}")):
                    save_training_checkpoint(args.model_folder, params, cfg,
                                             current_step, args.max_to_keep,
                                             keep_step=best_step)
                break
        if current_step >= args.max_num_iterations or early_stop:
            break

    json.dump({"progress": 100, "eta": "00:00:00"},
              open(os.path.join(args.model_folder, "status.json"), "w"))

    if val_score_history:
        best_step = sorted(val_score_history, key=lambda x: -x[1])[0][0]
    final = finalize_best_checkpoint(args.model_folder, best_step)

    try:
        os.remove(os.path.join(args.model_folder, "status.json"))
    except OSError:
        pass
    if final:
        print(f"Final checkpoint: {final}")
    print("All Done!")
    return final
