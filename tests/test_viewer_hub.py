import os

import numpy as np
import pytest

from whisperseg_tpu.audio.viewer import SpecViewer, slice_audio_and_label
from whisperseg_tpu.hub import download_model, model_cache_dir


def test_spec_viewer_save(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    sr = 16000
    t = np.arange(sr * 3) / sr
    audio = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    pred = {"onset": [0.5, 1.5], "offset": [1.0, 2.0], "cluster": ["a", "b"]}
    label = {"onset": [0.5], "offset": [1.1], "cluster": ["a"]}
    out = SpecViewer().save(str(tmp_path / "viz.png"), audio, sr,
                            prediction=pred, label=label, window_size=3.0)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_spec_viewer_chunk_label():
    label = {"onset": [0.5, 2.0], "offset": [1.5, 3.0], "cluster": ["a", "b"]}
    chunk = SpecViewer.chunk_label(label, 1.0, 2.5)
    assert chunk["onset"] == [0.0, 1.0]
    assert chunk["offset"] == [0.5, 1.5]
    assert chunk["cluster"] == ["a", "b"]


def test_slice_audio_and_label():
    sr = 100
    audio = np.arange(500, dtype=np.float32)
    label = {"onset": [0.5, 3.0], "offset": [1.5, 4.0], "cluster": ["a", "b"]}
    sliced, slabel = slice_audio_and_label(audio, label, sr, 1.0, 3.5)
    assert len(sliced) == 250
    assert slabel["onset"] == [0.0, 2.0]
    assert slabel["offset"] == [0.5, 2.5]


def test_download_model_local_passthrough(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    assert download_model(str(d)) == str(d)


def test_download_model_cache_hit(tmp_path, monkeypatch):
    monkeypatch.setenv("WHISPERSEG_MODEL_CACHE", str(tmp_path / "cache"))
    import hashlib

    digest = hashlib.sha256(b"some/model").hexdigest()
    target = tmp_path / "cache" / digest
    target.mkdir(parents=True)
    (target / "config.json").write_text("{}")
    assert download_model("some/model") == str(target)


def test_download_model_miss_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("WHISPERSEG_MODEL_CACHE", str(tmp_path / "cache"))
    with pytest.raises(FileNotFoundError):
        download_model("definitely/not-a-model-xyz")


def test_builtin_model_resolution(tmp_path, monkeypatch):
    """Built-in names resolve to checkpoints shipped under pretrained/
    (counterpart of the reference's hardcoded ready entries,
    reference scripts/backend.py:368-375)."""
    import whisperseg_tpu.hub as hub

    root = tmp_path / "pretrained"
    ckpt = root / "whisperseg-base-animal-vad"
    ckpt.mkdir(parents=True)
    (ckpt / "config.json").write_text("{}")
    (root / "not-a-model").mkdir()  # no config.json -> not listed
    monkeypatch.setattr(hub, "pretrained_dir", lambda: str(root))
    assert hub.builtin_models() == {
        "whisperseg-base-animal-vad": str(ckpt)}
    assert hub.download_model("whisperseg-base-animal-vad") == str(ckpt)
    assert hub.default_pretrained_model() == str(ckpt)
    # absent directory -> empty, default None
    monkeypatch.setattr(hub, "pretrained_dir",
                        lambda: str(tmp_path / "missing"))
    assert hub.builtin_models() == {}
    assert hub.default_pretrained_model() is None


def test_viewer_save_with_frame_tracks(tmp_path):
    """The frame-head probability strips render into the saved figure."""
    import numpy as np

    from whisperseg_tpu.audio.viewer import SpecViewer

    sr = 16000
    audio = np.random.RandomState(0).randn(sr * 2).astype(np.float32) * 0.01
    pred = {"onset": [0.5], "offset": [0.8], "cluster": ["a"]}
    T = 100
    tracks = {"vocal": np.linspace(0, 1, T).astype(np.float32),
              "onset": np.zeros(T, np.float32),
              "offset": np.ones(T, np.float32) * 0.5,
              "cluster": np.zeros(T, np.int32), "quantum": 0.02}
    out = SpecViewer().save(str(tmp_path / "t.png"), audio, sr,
                            prediction=pred, label=pred, window_size=2.0,
                            tracks=tracks)
    import os

    assert os.path.getsize(out) > 1000
