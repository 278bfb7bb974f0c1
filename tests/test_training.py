"""End-to-end training: synthetic tone dataset -> run_training -> final checkpoint
-> Segmenter recovers the tones. Also validates the sharded multi-device step."""

import json
import os
import wave

import numpy as np
import pytest

import jax

from whisperseg_tpu.checkpoint import save_checkpoint
from whisperseg_tpu.evaluate import evaluate, evaluate_dataset
from whisperseg_tpu.models import WhisperConfig, init_params
from whisperseg_tpu.segmenter import Segmenter
from whisperseg_tpu.training import TrainArgs, run_training


def write_wav(path, y, sr):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


def make_tone_dataset(folder, n_files=6, sr=16000, dur=2.0, seed=0):
    """Loud 2 kHz tone bursts on silence; labels = burst intervals."""
    os.makedirs(folder, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n_files):
        n = int(sr * dur)
        t = np.arange(n) / sr
        y = 0.005 * rng.randn(n)
        onsets, offsets = [], []
        pos = 0.2
        while pos < dur - 0.5:
            length = rng.uniform(0.15, 0.3)
            onsets.append(round(pos, 3))
            offsets.append(round(pos + length, 3))
            seg = slice(int(pos * sr), int((pos + length) * sr))
            y[seg] += 0.7 * np.sin(2 * np.pi * 2000 * t[seg])
            pos += length + rng.uniform(0.2, 0.4)
        write_wav(os.path.join(folder, f"f{i}.wav"), y, sr)
        json.dump(
            {"onset": onsets, "offset": offsets,
             "cluster": ["Vocal"] * len(onsets),
             "sr": sr, "spec_time_step": 0.01, "min_frequency": 0},
            open(os.path.join(folder, f"f{i}.json"), "w"),
        )
    return folder


def tiny_ckpt(tmp_path, total_spec_columns=200):
    cfg = WhisperConfig(
        d_model=96, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=192,
        vocab_size=1024, max_source_positions=total_spec_columns // 2,
        max_target_positions=64, total_spec_columns=total_spec_columns,
        compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "init_model")
    save_checkpoint(path, params, cfg)
    return path


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("train")
    data_dir = make_tone_dataset(str(tmp_path / "data"))
    init = tiny_ckpt(tmp_path)
    args = TrainArgs(
        initial_model_path=init,
        model_folder=str(tmp_path / "model"),
        train_dataset_folder=data_dir,
        total_spec_columns=200,
        max_length=48,
        batch_size=8,
        learning_rate=1e-3,
        warmup_steps=20,
        max_num_iterations=1200,
        min_num_iterations=1200,
        print_every=200,
        save_every=600,
        val_ratio=0.0,
        seed=13,
    )
    final = run_training(args)
    return args, final, data_dir


def test_training_produces_final_checkpoint(trained):
    args, final, _ = trained
    assert final is not None and os.path.isdir(final)
    assert os.path.basename(final) == "final_checkpoint"
    # only final_checkpoint remains (reference train.py:304-308)
    leftovers = [d for d in os.listdir(args.model_folder)
                 if d.startswith("checkpoint-")]
    assert leftovers == []
    # metrics were logged
    assert os.path.exists(os.path.join(args.model_folder, "metrics.jsonl"))
    # status.json removed at the end (reference train.py:318-321)
    assert not os.path.exists(os.path.join(args.model_folder, "status.json"))


def test_trained_model_metadata(trained):
    args, final, _ = trained
    seg = Segmenter.from_pretrained(final)
    assert seg.cluster_codebook == {"Vocal": 0}
    assert seg.default_segmentation_config["sr"] == 16000
    assert seg.default_segmentation_config["spec_time_step"] > 0
    assert seg.config.current_step == 1200


def test_trained_model_loss_decreased(trained):
    args, final, _ = trained
    rows = [json.loads(l) for l in
            open(os.path.join(args.model_folder, "metrics.jsonl"))]
    losses = [r["train/loss"] for r in rows if "train/loss" in r]
    assert len(losses) >= 2
    assert losses[-1] < losses[0] * 0.5


def test_trained_model_segments_tones(trained):
    args, final, data_dir = trained
    seg = Segmenter.from_pretrained(final)
    test_dir = make_tone_dataset(str(os.path.join(args.model_folder, "..", "test")),
                                 n_files=2, seed=100)
    from whisperseg_tpu.data import get_audio_and_label_paths, read_label
    from whisperseg_tpu.audio.io import load_audio

    audio_paths, label_paths = get_audio_and_label_paths(test_dir)
    audio_list, label_list = [], []
    for a, l in zip(audio_paths, label_paths):
        label = read_label(l)
        y, sr = load_audio(a, sr=label["sr"])
        audio_list.append(y)
        label_list.append(label)
    res = evaluate(audio_list, label_list, seg, batch_size=4, max_length=48,
                   num_trials=1, num_beams=1, verbose=False)
    # a tiny model on a synthetic task: expect decent frame-level detection
    assert res["frame_wise"][-1] > 0.5, res
    assert res["segment_wise"][2] > 0  # labels were counted


def test_multidevice_sharded_training_step(trained):
    """The same train step compiled over an 8-device (4 dp x 2 tp) mesh."""
    import jax.numpy as jnp
    import optax

    from whisperseg_tpu.models import (
        cross_entropy_loss, decoder_forward_train, encoder_forward,
    )
    from whisperseg_tpu.parallel import batch_sharding, make_mesh, shard_params
    from whisperseg_tpu.training.trainer import build_train_step, make_optimizer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=32,
        total_spec_columns=64, compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8, tp=2)
    params = shard_params(mesh, params, cfg, tp=True)
    opt, _ = make_optimizer(params, 1e-4, 0.01, 10, 100, "linear", False)
    opt_state = opt.init(params)
    step = build_train_step(cfg, opt)

    batch = {
        "input_features": jax.device_put(
            jnp.zeros((8, 80, 64)), batch_sharding(mesh)),
        "decoder_input_ids": jax.device_put(
            jnp.zeros((8, 16), jnp.int32), batch_sharding(mesh)),
        "labels": jax.device_put(
            jnp.zeros((8, 16), jnp.int32), batch_sharding(mesh)),
    }
    params2, opt_state2, loss = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # params actually changed
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in
                zip(jax.tree.leaves(params2), jax.tree.leaves(params2)))
    assert np.isfinite(delta)


def test_freeze_encoder_keeps_encoder_constant(tmp_path):
    import jax.numpy as jnp

    from whisperseg_tpu.training.trainer import build_train_step, make_optimizer

    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=32,
        total_spec_columns=64, compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt, _ = make_optimizer(params, 1e-3, 0.01, 0, 100, "linear",
                            freeze_encoder=True)
    opt_state = opt.init(params)
    step = build_train_step(cfg, opt)
    batch = {
        "input_features": jnp.ones((2, 80, 64)),
        "decoder_input_ids": jnp.ones((2, 8), jnp.int32),
        "labels": jnp.ones((2, 8), jnp.int32),
    }
    # snapshot before the step: params/opt_state buffers are donated by the jit
    enc_before = jax.tree.map(np.asarray, params["encoder"])
    dec_before = jax.tree.map(np.asarray, params["decoder"])
    params2, *_ = step(params, opt_state, batch, jax.random.PRNGKey(1))
    for a, b in zip(jax.tree.leaves(enc_before),
                    jax.tree.leaves(params2["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # decoder did move
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(dec_before),
                        jax.tree.leaves(params2["decoder"]))
    )
    assert moved


def test_adafactor_trains_and_state_is_factored():
    """--optimizer adafactor: loss decreases and the optimizer state carries
    no full-size f32 moment per parameter (the memory property that lets
    whisper-large train on a single chip)."""
    import jax.numpy as jnp

    from whisperseg_tpu.training.trainer import build_train_step, make_optimizer

    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=256,
        vocab_size=1024, max_source_positions=32, max_target_positions=32,
        total_spec_columns=64, compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_param_bytes = sum(x.size * 4 for x in jax.tree.leaves(params))

    opt, _ = make_optimizer(params, 1e-3, 0.01, 0, 100, "linear", False,
                            optimizer="adafactor")
    opt_state = opt.init(params)
    state_bytes = sum(
        np.asarray(x).nbytes for x in jax.tree.leaves(opt_state))
    # AdamW state would be 2x params; factored adafactor must be far below 1x
    assert state_bytes < 0.5 * n_param_bytes

    adam_opt, _ = make_optimizer(params, 1e-3, 0.01, 0, 100, "linear", False)
    adam_bytes = sum(
        np.asarray(x).nbytes for x in jax.tree.leaves(adam_opt.init(params)))
    assert adam_bytes >= 2 * n_param_bytes  # the state adafactor eliminates

    step = build_train_step(cfg, opt)
    batch = {
        "input_features": jnp.asarray(
            np.random.RandomState(0).randn(2, 80, 64), jnp.float32),
        "decoder_input_ids": jnp.ones((2, 8), jnp.int32),
        "labels": jnp.ones((2, 8), jnp.int32),
    }
    w_before = float(np.linalg.norm(
        np.asarray(params["encoder"]["layers"]["fc1_w"])))
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(50):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, batch, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    assert np.isfinite(losses[-1])
    # weight decay must be lr-scaled (AdamW semantics): optax.adafactor's
    # weight_decay_rate applies POST-lr (1% absolute shrink per step at
    # wd=0.01), which would erase ~40% of the norm over 50 steps
    w_after = float(np.linalg.norm(
        np.asarray(params["encoder"]["layers"]["fc1_w"])))
    assert w_after > 0.7 * w_before


def test_mixed_config_multicorpus_training(tmp_path):
    """One training folder mixing two frontend configurations (different sr
    and spec_time_step) and two cluster vocabularies — the pooled
    multi-species scenario (per-file configs, reference
    docs/DatasetProcessing.md:86-96). The feature-extractor bank must key per
    (sr, step, min_frequency), the codebook must union the cluster names, and
    the frame head must get one channel per cluster."""
    from whisperseg_tpu.checkpoint import load_checkpoint

    data = str(tmp_path / "data")
    make_tone_dataset(data, n_files=2, sr=16000)
    other = str(tmp_path / "other")
    make_tone_dataset(other, n_files=2, sr=32000, seed=1)
    for i in range(2):
        os.rename(os.path.join(other, f"f{i}.wav"),
                  os.path.join(data, f"g{i}.wav"))
        lab = json.load(open(os.path.join(other, f"f{i}.json")))
        lab["spec_time_step"] = 0.005
        lab["cluster"] = ["Chirp"] * len(lab["cluster"])
        json.dump(lab, open(os.path.join(data, f"g{i}.json"), "w"))

    init = tiny_ckpt(tmp_path)
    out = str(tmp_path / "out")
    run_training(TrainArgs(
        initial_model_path=init, model_folder=out, train_dataset_folder=data,
        max_num_iterations=4, min_num_iterations=4, batch_size=2,
        learning_rate=1e-4, warmup_steps=2, max_length=32,
        total_spec_columns=200, print_every=2, num_workers=1,
        frame_head=True, seed=0))

    params, cfg = load_checkpoint(os.path.join(out, "final_checkpoint"))
    assert set(cfg.cluster_codebook) == {"Vocal", "Chirp"}
    assert cfg.frame_head_clusters == 2
    # head output = [vocal, onset, offset] + one logit per cluster
    assert params["frame_head"]["h2_w"].shape[-1] == 3 + 2
