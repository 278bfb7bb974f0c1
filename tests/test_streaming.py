"""Bounded-memory streaming ingest + segmentation (audio/stream.py,
Segmenter.segment_streaming).

The contract under test: streaming a file chunk-by-chunk produces EXACTLY the
same samples (including through the polyphase resampler — interior chunks are
resampled with 1 s of context and sliced, see audio/stream.py docstring) and
exactly the same segmentation output as the whole-file path, for
deterministic decoding."""

import os

import numpy as np
import pytest

import jax

from whisperseg_tpu.audio.io import load_audio, save_wav
from whisperseg_tpu.audio.stream import AudioStream
from whisperseg_tpu.models import WhisperConfig, init_params
from whisperseg_tpu.segmenter import Segmenter


def _write_wav(path, seconds, sr, channels=1, seed=0):
    rng = np.random.RandomState(seed)
    n = int(seconds * sr)
    y = (rng.randn(n, channels) * 0.1).clip(-0.99, 0.99).astype(np.float32)
    save_wav(path, y, sr)
    return path


def _streamed(path, **kw):
    with AudioStream(path, **kw) as s:
        chunks = [c for c in s]
        sr = s.sr
    if not chunks:
        return np.zeros(0, np.float32), sr
    return np.concatenate(chunks), sr


# ------------------------------------------------------------------ raw stream


def test_stream_equals_load_audio_same_rate(tmp_path):
    path = _write_wav(str(tmp_path / "a.wav"), 7.3, 16000, channels=2)
    ref, ref_sr = load_audio(path)
    got, sr = _streamed(path, chunk_seconds=2)
    assert sr == ref_sr == 16000
    assert np.array_equal(got, ref)


def test_stream_resample_bit_exact(tmp_path):
    """Chunked resampling with context slicing must be BIT-identical to
    resampling the whole file at once (interior polyphase outputs depend only
    on samples within the filter half-width — far inside the 1 s context)."""
    path = _write_wav(str(tmp_path / "b.wav"), 9.13, 44100)
    ref, _ = load_audio(path, sr=32000)
    got, sr = _streamed(path, sr=32000, chunk_seconds=2)
    assert sr == 32000
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_stream_resample_upsample_and_ragged_tail(tmp_path):
    # non-whole-second file + upsampling (16k -> 44.1k), 3 s chunks
    path = _write_wav(str(tmp_path / "c.wav"), 4.777, 16000)
    ref, _ = load_audio(path, sr=44100)
    got, _ = _streamed(path, sr=44100, chunk_seconds=3)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_stream_float_wav_and_channel_select(tmp_path):
    # IEEE-float WAV (stdlib wave rejects it) + channel_id selection
    import struct
    import wave as _w  # noqa: F401  (only for the PCM comparison below)

    sr, n = 8000, 8000 * 3 + 123
    rng = np.random.RandomState(1)
    y = (rng.randn(n, 2) * 0.1).astype(np.float32)
    raw = y.astype("<f4").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, sr, sr * 8, 8, 32)
           + b"data" + struct.pack("<I", len(raw)))
    path = str(_tmp(raw, hdr))
    ref, _ = load_audio(path, channel_id=1)
    got, got_sr = _streamed(path, channel_id=1, chunk_seconds=1)
    assert got_sr == sr
    assert np.array_equal(got, ref)


def _tmp(raw, hdr):
    import tempfile

    f = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
    f.write(hdr + raw)
    f.close()
    return f.name


def test_stream_flac_fallback(tmp_path):
    """Compressed formats fall back to one-shot decode served in chunks."""
    from whisperseg_tpu.audio.flac import encode_flac

    y = (np.random.RandomState(2).randn(32000 * 2) * 0.1).astype(np.float32)
    pcm = np.clip(np.round(y * 32767), -32768, 32767).astype(np.int16)
    data = encode_flac(pcm[:, None], 32000)
    path = str(tmp_path / "a.flac")
    with open(path, "wb") as f:
        f.write(data)
    ref, _ = load_audio(path)
    got, sr = _streamed(path, chunk_seconds=1)
    assert sr == 32000
    assert np.array_equal(got, ref)


# ------------------------------------------------------- streaming segmentation


def tiny_cfg(**kw):
    base = dict(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=64,
        total_spec_columns=64, compute_dtype="float32",
    )
    base.update(kw)
    return WhisperConfig(**base)


@pytest.fixture(scope="module")
def seg():
    cfg = tiny_cfg(frame_head=True, frame_head_clusters=2)
    cfg.cluster_codebook = {"Vocal": 0}
    params = init_params(jax.random.PRNGKey(0), cfg)
    return Segmenter(params, cfg, inference_dtype=None)


SEG_KW = dict(spec_time_step=0.01, min_frequency=0, batch_size=3,
              num_beams=1, top_k=1, max_length=8)


def test_segment_streaming_equals_segment(tmp_path, seg):
    """Windows cut from per-trial carry buffers across chunk boundaries must
    reproduce segment()'s slicing exactly -> identical greedy output."""
    path = _write_wav(str(tmp_path / "s.wav"), 2.0, 16000, seed=3)
    audio, sr = load_audio(path)
    for num_trials in (1, 3):
        ref = seg.segment(audio, sr, num_trials=num_trials, **SEG_KW)
        got = seg.segment_streaming(path, sr=16000, chunk_seconds=1,
                                    num_trials=num_trials, **SEG_KW)
        assert got == ref, f"num_trials={num_trials}"


def test_segment_streaming_ragged_and_empty(tmp_path, seg):
    # ragged tail window (1.23 s = 1.92 windows of 0.64 s)
    path = _write_wav(str(tmp_path / "r.wav"), 1.23, 16000, seed=4)
    audio, sr = load_audio(path)
    ref = seg.segment(audio, sr, num_trials=2, **SEG_KW)
    got = seg.segment_streaming(path, sr=16000, chunk_seconds=1,
                                num_trials=2, **SEG_KW)
    assert got == ref
    # empty audio still emits one window per trial (reference model.py:145-146)
    path0 = str(tmp_path / "e.wav")
    save_wav(path0, np.zeros(0, np.float32), 16000)
    ref0 = seg.segment(np.zeros(0, np.float32), 16000, num_trials=1, **SEG_KW)
    got0 = seg.segment_streaming(path0, sr=16000, num_trials=1, **SEG_KW)
    assert got0 == ref0


def test_segment_streaming_resampled(tmp_path, seg):
    """File at 22.05 kHz segmented at 16 kHz: the streamed resample path must
    match segment() on load_audio(sr=16000)."""
    path = _write_wav(str(tmp_path / "rs.wav"), 1.5, 22050, seed=5)
    audio, _ = load_audio(path, sr=16000)
    ref = seg.segment(audio, 16000, num_trials=1, **SEG_KW)
    got = seg.segment_streaming(path, sr=16000, chunk_seconds=1,
                                num_trials=1, **SEG_KW)
    assert got == ref


def test_segment_streaming_frame_mode(tmp_path, seg):
    path = _write_wav(str(tmp_path / "f.wav"), 2.0, 16000, seed=6)
    audio, sr = load_audio(path)
    ref = seg.segment_from_frames(audio, sr, spec_time_step=0.01,
                                  min_frequency=0, batch_size=3)
    got = seg.segment_streaming(path, sr=16000, chunk_seconds=1,
                                frame_mode=True, spec_time_step=0.01,
                                min_frequency=0, batch_size=3)
    assert got == ref


def test_segment_streaming_frame_postprocess(tmp_path, seg):
    """The learned frame-head post-processing chain (what
    scripts/fit_postprocess.py fits into checkpoints) runs in streaming mode
    via a second stream pass."""
    path = _write_wav(str(tmp_path / "p.wav"), 1.3, 16000, seed=7)
    audio, sr = load_audio(path)
    kw = dict(frame_refine_ms=10.0, frame_filter=0.01, **SEG_KW)
    ref = seg.segment(audio, sr, num_trials=1, **kw)
    got = seg.segment_streaming(path, sr=16000, chunk_seconds=1,
                                num_trials=1, **kw)
    assert got == ref


def test_cli_streaming_flag(tmp_path, seg, capsys, monkeypatch):
    """--streaming 1 produces the same CSV as the in-memory CLI path."""
    from whisperseg_tpu.checkpoint import save_checkpoint
    from whisperseg_tpu.cli import segment as cli

    ckpt = str(tmp_path / "m")
    save_checkpoint(ckpt, seg.params, seg.config)
    path = _write_wav(str(tmp_path / "c.wav"), 1.0, 16000, seed=8)
    base = ["--model_path", ckpt, "--audio_path", path,
            "--csv_save_path", "buffer", "--num_beams", "1",
            "--spec_time_step", "0.01", "--max_length", "8",
            "--compute_type", "float32"]
    cli.main(base)
    out_mem = capsys.readouterr().out
    cli.main(base + ["--streaming", "1", "--chunk_seconds", "1"])
    out_stream = capsys.readouterr().out
    assert out_stream == out_mem
