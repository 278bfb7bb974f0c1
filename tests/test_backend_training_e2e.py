"""Backend training-queue end-to-end: submit a zip over HTTP, let the worker
run train.py as a real subprocess, then segment with the produced model."""

import io
import json
import os
import socket
import threading
import time
import wave
import zipfile

import numpy as np
import pytest
import requests

import jax

from whisperseg_tpu.checkpoint import save_checkpoint
from whisperseg_tpu.models import WhisperConfig, init_params
from whisperseg_tpu.services.backend import BackendState, build_app


def wav_bytes(y, sr=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def dataset_zip(n_files=3, sr=16000):
    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(n_files):
            n = sr * 2
            t = np.arange(n) / sr
            y = 0.005 * rng.randn(n)
            y[int(0.5 * sr):int(1.0 * sr)] += 0.7 * np.sin(2 * np.pi * 2000 *
                                                           t[: sr // 2])
            zf.writestr(f"f{i}.wav", wav_bytes(y, sr))
            zf.writestr(f"f{i}.json", json.dumps(
                {"onset": [0.5], "offset": [1.0], "cluster": ["Vocal"],
                 "sr": sr, "spec_time_step": 0.01, "min_frequency": 0}))
    return buf.getvalue()


@pytest.mark.slow
def test_backend_training_queue_end_to_end(tmp_path):
    # seed base model
    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=50, max_target_positions=48,
        total_spec_columns=100, compute_dtype="float32",
    )
    base_dir = tmp_path / "models" / "base-model" / "final_checkpoint"
    save_checkpoint(str(base_dir), init_params(jax.random.PRNGKey(0), cfg), cfg)

    # shim train script: forwards to the real train.py with a short iteration
    # budget so the e2e stays inside the suite's time box
    shim = tmp_path / "train_shim.py"
    shim.write_text(
        "import sys, subprocess\n"
        "subprocess.run([sys.executable, '/root/repo/train.py', *sys.argv[1:],\n"
        "                '--min_num_iterations', '60', '--print_every', '50'],\n"
        "               check=True)\n"
    )
    state = BackendState(str(tmp_path / "datasets"), str(tmp_path / "models"),
                         train_script=str(shim))
    # the training subprocess must run on CPU in CI (no TPU contention)
    os.environ["JAX_PLATFORMS"] = "cpu"
    threading.Thread(target=state.run_training_worker, daemon=True).start()
    threading.Thread(target=state.periodic_list_models, daemon=True).start()
    app = build_app(state)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    app.serve("127.0.0.1", port, background=True)
    addr = f"127.0.0.1:{port}"
    try:
        r = requests.post(
            f"http://{addr}/submit-training-request",
            data={"model_name": "queued-model", "initial_model_name":
                  "base-model", "num_epochs": "1", "frame_head": "1"},
            files={"zip": ("d.zip", dataset_zip())},
        )
        assert r.status_code == 200, r.json()

        deadline = time.time() + 360
        final = tmp_path / "models" / "queued-model" / "final_checkpoint"
        while time.time() < deadline:
            if final.exists() and not state.training_request_queue:
                break
            time.sleep(5)
        assert final.exists(), "training subprocess did not produce a checkpoint"

        # the frame_head request field reached train.py: the trained
        # checkpoint carries the head
        from whisperseg_tpu.checkpoint import load_checkpoint

        p_trained, cfg_trained = load_checkpoint(str(final))
        assert cfg_trained.frame_head and "frame_head" in p_trained

        # the registry should now expose it for inference
        models = state.list_models()
        names = {m["model_name"]: m for m in models}
        assert "queued-model" in names
        assert names["queued-model"]["status"] == "ready"

        # and the /segment endpoint can use it
        y = np.zeros(16000, np.float32)
        r = requests.post(
            f"http://{addr}/segment",
            data={"model_name": "queued-model", "num_trials": "1",
                  "spec_time_step": "0.01"},
            files={"audio_file": ("a.wav", wav_bytes(y))},
        )
        assert r.status_code == 200, r.json()
        assert set(r.json()) == {"onset", "offset", "cluster"}
    finally:
        app.shutdown()
