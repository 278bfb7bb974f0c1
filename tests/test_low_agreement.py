"""Low-agreement warning for multi-trial consolidation (VERDICT r2 item 8).

When DBSCAN consolidation discards a large fraction of segments as
cross-trial disagreement (the recall-collapse mode of weak models under the
reference's production num_trials=3 default — RESULTS.md: frame F1 0.41 at
trials=3 vs 0.71 at trials=1), segment() must warn and the segmentation
service must surface it in response metadata. Reference anchor:
model.py:291-337 (the consolidation whose noise points ARE the signal).
"""

import io
import socket
import warnings
import wave

import numpy as np
import pytest

from whisperseg_tpu import tokenizer as wtok
from whisperseg_tpu.consolidation import consolidate_by_clustering


def _seg(on, off, cl="Vocal"):
    return {"onset": list(on), "offset": list(off),
            "cluster": [cl] * len(on)}


# ------------------------------------------------------------ stats plumbing


def test_consolidation_stats_count_noise():
    # 3 trials; one agreed segment (all trials), three orphans (one trial)
    trials = [
        _seg([1.0, 5.0], [2.0, 6.0]),
        _seg([1.001, 9.0], [2.001, 9.5]),
        _seg([0.999, 12.0], [1.999, 12.5]),
    ]
    stats = {}
    out = consolidate_by_clustering(trials, eps=0.02, min_samples=2,
                                    stats=stats)
    assert len(out["onset"]) == 1
    assert stats == {"n_input": 6, "n_noise": 3, "n_clusters": 1}


def test_consolidation_stats_empty_input():
    stats = {}
    out = consolidate_by_clustering([_seg([], []), _seg([], [])],
                                    eps=0.02, min_samples=2, stats=stats)
    assert out == {"onset": [], "offset": [], "cluster": []}
    assert stats == {"n_input": 0, "n_noise": 0, "n_clusters": 0}


# ----------------------------------------------------- segment() level


def make_segmenter():
    import jax

    from whisperseg_tpu.models.config import WhisperConfig
    from whisperseg_tpu.models.whisper import init_params
    from whisperseg_tpu.segmenter import Segmenter

    cfg = WhisperConfig(
        d_model=64, encoder_layers=1, decoder_layers=1, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=64,
        total_spec_columns=64, compute_dtype="float32",
        cluster_codebook={"Vocal": 0},
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    return Segmenter(params, cfg, inference_dtype=None)


def _tokens_for(segments, spec_time_step):
    """[(on_s, off_s), ...] -> a decoded token list (prompt + triples)."""
    ids = list(wtok.PROMPT_IDS)
    for on, off in segments:
        ids.append(wtok.timestamp_id(int(round(on / (spec_time_step * 2)))))
        ids.append(wtok.TOKEN_TO_ID["0"])  # cluster id 0 = Vocal
        ids.append(wtok.timestamp_id(int(round(off / (spec_time_step * 2)))))
    ids.append(wtok.EOT_ID)
    return ids


def _disagreeing_generate(n_clips, n_trial0, spec_time_step):
    """Token lists where the trial-0 windows (the FIRST ``n_trial0`` clips —
    slice_audio_windows emits trials in order) predict 5 segments each and
    all other trials predict none — every segment becomes DBSCAN noise.
    Segments are spaced 0.12 s apart, beyond the default eps
    (spec_time_step * 2 * 4 = 0.08 s), so same-trial neighbors cannot chain
    into a DBSCAN cluster by themselves."""
    out = []
    for i in range(n_clips):
        if i < n_trial0:
            segs = [(0.05 + 0.12 * k, 0.09 + 0.12 * k) for k in range(5)]
            out.append(_tokens_for(segs, spec_time_step))
        else:
            out.append(_tokens_for([], spec_time_step))
    return out


def test_segment_warns_on_low_cross_trial_agreement(monkeypatch):
    seg = make_segmenter()
    step = 0.01

    def fake_generate(clips, frontend, batch_size, max_length, num_beams,
                      top_k, length_penalty, seed, status_monitor, **kw):
        return _disagreeing_generate(clips.shape[0], 4, step)

    monkeypatch.setattr(seg, "_generate_tokens", fake_generate)
    audio = np.zeros(32000, np.float32)  # 2 s; 0.64 s windows -> 4 trial-0 clips
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = seg.segment(audio, 16000, spec_time_step=step, num_trials=3,
                          max_length=48)
    msgs = [str(x.message) for x in w]
    assert any("num_trials=1" in m for m in msgs), msgs
    stats = seg.last_consolidation_stats
    assert stats["low_agreement"] and stats["n_noise"] == stats["n_input"]
    assert out["onset"] == []  # the collapse the warning is about


def test_segment_no_warning_when_trials_agree(monkeypatch):
    seg = make_segmenter()
    step = 0.01

    def fake_generate(clips, frontend, batch_size, max_length, num_beams,
                      top_k, length_penalty, seed, status_monitor, **kw):
        segs = [(0.1 + 0.1 * k, 0.15 + 0.1 * k) for k in range(4)]
        return [_tokens_for(segs, step) for _ in range(clips.shape[0])]

    monkeypatch.setattr(seg, "_generate_tokens", fake_generate)
    audio = np.zeros(16000, np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = seg.segment(audio, 16000, spec_time_step=step, num_trials=3,
                          max_length=48)
    assert not [x for x in w if "num_trials" in str(x.message)]
    assert not seg.last_consolidation_stats["low_agreement"]
    assert len(out["onset"]) > 0

    # single-trial runs never populate stats
    seg.segment(audio, 16000, spec_time_step=step, num_trials=1,
                max_length=48)
    assert seg.last_consolidation_stats is None


# ------------------------------------------------------------- service level


def _wav_b64(seconds=1.0, sr=16000):
    import base64

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.zeros(int(seconds * sr), dtype="<i2").tobytes())
    return base64.b64encode(buf.getvalue()).decode()


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_service_surfaces_low_agreement_warning(monkeypatch):
    import requests

    from whisperseg_tpu.services.segment_service import build_app

    seg = make_segmenter()
    step = 0.01

    def fake_generate(clips, frontend, batch_size, max_length, num_beams,
                      top_k, length_penalty, seed, status_monitor, **kw):
        return _disagreeing_generate(clips.shape[0], 4, step)

    monkeypatch.setattr(seg, "_generate_tokens", fake_generate)
    app = build_app(seg)
    port = free_port()
    app.serve("127.0.0.1", port, background=True)
    try:
        r = requests.post(f"http://127.0.0.1:{port}/segment", json={
            "audio_file_base64_string": _wav_b64(2.0), "sr": 16000,
            "spec_time_step": step, "num_trials": 3, "max_length": 48})
        assert r.status_code == 201
        body = r.json()
        assert body["onset"] == []
        assert any("num_trials=1" in m for m in body["warnings"])

        # agreeing single-trial request: no warnings key (schema additive)
        def agree(clips, frontend, batch_size, max_length, num_beams,
                  top_k, length_penalty, seed, status_monitor, **kw):
            return [_tokens_for([(0.1, 0.2)], step)
                    for _ in range(clips.shape[0])]

        monkeypatch.setattr(seg, "_generate_tokens", agree)
        r = requests.post(f"http://127.0.0.1:{port}/segment", json={
            "audio_file_base64_string": _wav_b64(), "sr": 16000,
            "spec_time_step": step, "num_trials": 1, "max_length": 48})
        assert r.status_code == 201
        assert "warnings" not in r.json()
    finally:
        app.shutdown()
