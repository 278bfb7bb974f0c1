"""scripts/ship_pretrained.py installs a checkpoint as a built-in model.

The counterpart of the reference publishing a finetune as a ready hub entry
(reference scripts/backend.py:368-375 consumes two such names): shipping
must narrow storage to bfloat16, survive the round trip, and auto-register
through hub.builtin_models() under the chosen name.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from whisperseg_tpu import hub
from whisperseg_tpu.checkpoint import load_checkpoint, save_checkpoint
from whisperseg_tpu.models.config import WhisperConfig
from whisperseg_tpu.models.whisper import init_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "ship_pretrained", os.path.join(REPO, "scripts", "ship_pretrained.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_checkpoint(path):
    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        max_source_positions=50, max_target_positions=64,
        total_spec_columns=100, compute_dtype="float32",
        cluster_codebook={"Vocal": 0},
        default_segmentation_config={"sr": 16000, "spec_time_step": 0.01,
                                     "min_frequency": 0, "max_length": 32},
        current_step=77,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    save_checkpoint(str(path), params, cfg)
    return params, cfg


def test_ship_installs_bf16_builtin(tmp_path, monkeypatch):
    ship = _load_script()
    fake_root = tmp_path / "pretrained"
    monkeypatch.setattr(ship, "pretrained_dir", lambda: str(fake_root))
    monkeypatch.setattr(hub, "pretrained_dir", lambda: str(fake_root))

    src = tmp_path / "ckpt"
    params, cfg = _tiny_checkpoint(src)

    monkeypatch.setattr(sys, "argv", [
        "ship_pretrained.py", "--checkpoint", str(src), "--name", "my-vad"])
    ship.main()

    dest = fake_root / "my-vad"
    assert (dest / "params.npz").exists()
    import json
    meta = json.loads((dest / "config.json").read_text())
    assert meta["__storage_dtype__"] == "bfloat16"
    assert meta["current_step"] == 77

    # registers by name and round-trips within bf16 mantissa error
    assert hub.builtin_models()["my-vad"] == str(dest)
    rt, rt_cfg = load_checkpoint(str(dest), as_jax=False)
    a = np.asarray(params["encoder"]["conv1_w"], dtype=np.float32)
    b = np.asarray(rt["encoder"]["conv1_w"], dtype=np.float32)
    assert np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-6)) <= 2.0 ** -8 + 1e-6
    assert rt_cfg.default_segmentation_config["max_length"] == 32


def test_ship_refuses_overwrite_without_force(tmp_path, monkeypatch):
    ship = _load_script()
    fake_root = tmp_path / "pretrained"
    monkeypatch.setattr(ship, "pretrained_dir", lambda: str(fake_root))

    src = tmp_path / "ckpt"
    _tiny_checkpoint(src)
    argv = ["ship_pretrained.py", "--checkpoint", str(src), "--name", "m"]
    monkeypatch.setattr(sys, "argv", argv)
    ship.main()
    with pytest.raises(SystemExit):
        ship.main()
    monkeypatch.setattr(sys, "argv", argv + ["--force", "1"])
    ship.main()  # replaces cleanly
    assert (fake_root / "m" / "params.npz").exists()
