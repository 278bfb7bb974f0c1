"""--gqa_kv_heads: end-to-end GQA uptraining through run_training."""

import json
import os
import wave

import numpy as np

import jax

from whisperseg_tpu.checkpoint import save_checkpoint
from whisperseg_tpu.models import WhisperConfig, init_params
from whisperseg_tpu.segmenter import Segmenter
from whisperseg_tpu.training import TrainArgs, run_training


def write_wav(path, y, sr):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


def test_gqa_uptraining_flag(tmp_path):
    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=50, max_target_positions=48,
        total_spec_columns=100, compute_dtype="float32",
    )
    init = str(tmp_path / "init")
    save_checkpoint(init, init_params(jax.random.PRNGKey(0), cfg), cfg)

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        sr = 16000
        y = 0.005 * rng.randn(sr * 2)
        y[int(0.5 * sr):sr] += 0.7 * np.sin(
            2 * np.pi * 2000 * np.arange(sr // 2) / sr)
        write_wav(data / f"f{i}.wav", y, sr)
        json.dump({"onset": [0.5], "offset": [1.0], "cluster": ["Vocal"],
                   "sr": sr, "spec_time_step": 0.01, "min_frequency": 0},
                  open(data / f"f{i}.json", "w"))

    final = run_training(TrainArgs(
        initial_model_path=init,
        model_folder=str(tmp_path / "model"),
        train_dataset_folder=str(data),
        total_spec_columns=100, max_length=32, batch_size=4,
        learning_rate=1e-3, warmup_steps=5,
        max_num_iterations=30, min_num_iterations=30,
        print_every=30, save_every=30, seed=7,
        gqa_kv_heads=2,
    ))
    assert final is not None
    seg = Segmenter.from_pretrained(final)
    assert seg.config.kv_heads == 2
    # the trained GQA checkpoint segments end to end
    out = seg.segment(np.zeros(16000, np.float32), 16000, spec_time_step=0.01,
                      max_length=16, num_beams=1)
    assert set(out) == {"onset", "offset", "cluster"}
