import json
import os
import wave

import numpy as np
import pytest

import jax

from whisperseg_tpu.checkpoint import save_checkpoint
from whisperseg_tpu.models import WhisperConfig, init_params


def tiny_ckpt(tmp_path, codebook=None):
    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=50, max_target_positions=48,
        total_spec_columns=100, compute_dtype="float32",
    )
    cfg.cluster_codebook = codebook or {"Vocal": 0}
    cfg.default_segmentation_config = {"sr": 16000, "spec_time_step": 0.01,
                                       "min_frequency": 0}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, init_params(jax.random.PRNGKey(0), cfg), cfg)
    return path


def write_wav(path, y, sr=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


def test_species_presets_match_reference():
    ours = json.load(open("config/segment_config.json"))
    theirs = json.load(open("/root/reference/config/segment_config.json"))
    assert ours == theirs


def test_segment_cli_single_file(tmp_path, capsys):
    from whisperseg_tpu.cli.segment import main

    ckpt = tiny_ckpt(tmp_path)
    wav = tmp_path / "a.wav"
    write_wav(wav, np.random.RandomState(0).randn(8000) * 0.1)
    out_csv = tmp_path / "out.csv"
    main(["--model_path", ckpt, "--audio_path", str(wav),
          "--csv_save_path", str(out_csv), "--num_beams", "1",
          "--batch_size", "2", "--spec_time_step", "0.01"])
    content = out_csv.read_text()
    assert content.splitlines()[0] == "onset,offset,cluster"


def test_segment_cli_folder_buffer_mode(tmp_path, capsys):
    from whisperseg_tpu.cli.segment import main

    ckpt = tiny_ckpt(tmp_path)
    for name in ["a.wav", "b.wav"]:
        write_wav(tmp_path / name, np.random.RandomState(0).randn(4000) * 0.1)
    main(["--model_path", ckpt, "--audio_folder", str(tmp_path),
          "--csv_save_path", "buffer", "--num_beams", "1", "--batch_size", "2",
          "--spec_time_step", "0.01"])
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "filename,onset,offset,cluster"


def test_segment_cli_stdin(tmp_path, capsys, monkeypatch):
    import io

    from whisperseg_tpu.cli.segment import main

    ckpt = tiny_ckpt(tmp_path)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(4000, dtype="<i2").tobytes())

    class FakeStdin:
        buffer = io.BytesIO(buf.getvalue())

    monkeypatch.setattr("sys.stdin", FakeStdin())
    main(["--model_path", ckpt, "--audio_path", "-",
          "--csv_save_path", "buffer", "--num_beams", "1",
          "--spec_time_step", "0.01"])
    out = capsys.readouterr().out
    assert "onset,offset,cluster" in out


def test_evaluate_dataset_structure(tmp_path):
    from whisperseg_tpu.evaluate import evaluate_dataset

    ckpt = tiny_ckpt(tmp_path)
    data = tmp_path / "data"
    data.mkdir()
    write_wav(data / "x.wav", np.random.RandomState(1).randn(8000) * 0.1)
    json.dump({"onset": [0.1], "offset": [0.3], "cluster": ["Vocal"],
               "sr": 16000, "spec_time_step": 0.01},
              open(data / "x.json", "w"))
    res = evaluate_dataset(str(data), ckpt, num_trials=1, num_beams=1,
                           max_length=16, batch_size=2)
    assert set(res) == {"segment_wise_scores", "frame_wise_scores"}
    assert res["segment_wise_scores"]["N-positive-in-ground-truth"] == 1


def test_evaluate_dataset_ignore_cluster(tmp_path, monkeypatch):
    """ignore_cluster=True flattens clustered labels to 'Vocal' so a VAD
    model (codebook {'Vocal': 0}) can score against per-syllable labels —
    without it, cluster-name mismatch zeroes both segment and frame TP
    (observed on the multi-species generalist vs zebra_finch_0 labels)."""
    from whisperseg_tpu.evaluate import evaluate_dataset
    from whisperseg_tpu.segmenter import Segmenter

    ckpt = tiny_ckpt(tmp_path)
    data = tmp_path / "data"
    data.mkdir()
    write_wav(data / "x.wav", np.random.RandomState(1).randn(8000) * 0.1)
    json.dump({"onset": [0.1], "offset": [0.3],
               "cluster": ["zebra_finch_0"],  # clustered label, VAD model
               "sr": 16000, "spec_time_step": 0.01},
              open(data / "x.json", "w"))

    # the model predicts exactly the labeled segment as 'Vocal'
    def fake_segment(self, audio, sr, **kw):
        return {"onset": [0.1], "offset": [0.3], "cluster": ["Vocal"]}

    monkeypatch.setattr(Segmenter, "segment", fake_segment)
    kw = dict(num_trials=1, num_beams=1, max_length=16, batch_size=2)
    mismatched = evaluate_dataset(str(data), ckpt, **kw)
    flattened = evaluate_dataset(str(data), ckpt, ignore_cluster=True, **kw)
    assert mismatched["segment_wise_scores"]["N-true-positive"] == 0
    assert mismatched["frame_wise_scores"]["N-true-positive"] == 0
    assert flattened["segment_wise_scores"]["N-true-positive"] == 1
    assert flattened["frame_wise_scores"]["N-true-positive"] > 0


def test_evaluate_dataset_label_tolerance(tmp_path, monkeypatch):
    """label_tolerance=True scores with each label's own 'tolerance' field;
    the default keeps reference semantics (model spec_time_step * 4,
    reference model.py:494-495 — the label field is ignored). The fixture
    model's default tolerance is 0.01 * 4 = 40 ms; a prediction 30 ms off
    is a hit there but a miss at the label's stated 20 ms."""
    from whisperseg_tpu.evaluate import evaluate_dataset
    from whisperseg_tpu.segmenter import Segmenter

    ckpt = tiny_ckpt(tmp_path)
    data = tmp_path / "data"
    data.mkdir()
    write_wav(data / "x.wav", np.random.RandomState(1).randn(8000) * 0.1)
    json.dump({"onset": [0.1], "offset": [0.3], "cluster": ["Vocal"],
               "sr": 16000, "spec_time_step": 0.0025, "tolerance": 0.02},
              open(data / "x.json", "w"))

    def fake_segment(self, audio, sr, **kw):
        return {"onset": [0.13], "offset": [0.33], "cluster": ["Vocal"]}

    monkeypatch.setattr(Segmenter, "segment", fake_segment)
    kw = dict(num_trials=1, num_beams=1, max_length=16, batch_size=2)
    ref_semantics = evaluate_dataset(str(data), ckpt, **kw)
    label_semantics = evaluate_dataset(str(data), ckpt,
                                       label_tolerance=True, **kw)
    assert ref_semantics["segment_wise_scores"]["N-true-positive"] == 1
    assert label_semantics["segment_wise_scores"]["N-true-positive"] == 0


def test_convert_hf_cli(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from scripts.convert_hf import main

    hf_cfg = HFConfig(
        vocab_size=1024, num_mel_bins=80, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, max_source_positions=50,
        max_target_positions=48, pad_token_id=10, bos_token_id=11,
        eos_token_id=11, decoder_start_token_id=12,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(hf_cfg)
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir)
    out_dir = tmp_path / "converted"
    main(["--model", str(hf_dir), "--output_dir", str(out_dir),
          "--total_spec_columns", "100", "--storage_dtype", "bfloat16"])

    from whisperseg_tpu.segmenter import Segmenter

    seg = Segmenter.from_pretrained(str(out_dir))
    assert seg.total_spec_columns == 100
