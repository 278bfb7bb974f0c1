"""Segmenter pipeline tests with a stubbed generator (exercises slicing, parsing,
boundary merge, consolidation, blur correction, dedup) plus checkpoint round-trip."""

import numpy as np
import pytest

import jax

from whisperseg_tpu import codec
from whisperseg_tpu import tokenizer as tok
from whisperseg_tpu.checkpoint import load_checkpoint, save_checkpoint
from whisperseg_tpu.models import WhisperConfig, init_params
from whisperseg_tpu.segmenter import Segmenter


def tiny_cfg(**kw):
    base = dict(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=64,
        total_spec_columns=64, compute_dtype="float32",
    )
    base.update(kw)
    return WhisperConfig(**base)


def make_segmenter(total_spec_columns=1000, codebook=None):
    cfg = tiny_cfg(total_spec_columns=total_spec_columns,
                   max_source_positions=total_spec_columns // 2)
    cfg.cluster_codebook = codebook or {"Vocal": 0}
    params = init_params(jax.random.PRNGKey(0), cfg)
    return Segmenter(params, cfg)


class StubGen:
    """Replaces Segmenter._generate_tokens with canned per-window token lists."""

    def __init__(self, seg, window_tokens):
        self.window_tokens = window_tokens
        seg._generate_tokens = self  # type: ignore

    def __call__(self, clips, frontend, batch_size, max_length, num_beams,
                 top_k, length_penalty, seed, status_monitor, **kw):
        assert clips.shape[0] == len(self.window_tokens)
        if status_monitor is not None:
            status_monitor["progress"] = 100
        return self.window_tokens


def toks(*segs):
    """Build a generated sequence from (onset_col, cid, offset_col) triples."""
    ids = list(tok.PROMPT_IDS) + [tok.species_token("unknown")]
    for on, cid, off in segs:
        ids += [tok.timestamp_id(on)] + codec.cluster_digits(cid) + [tok.timestamp_id(off)]
    return ids + [tok.EOT_ID]


def test_slice_windows_geometry():
    seg = make_segmenter(total_spec_columns=100)
    sr, step = 16000, 0.01  # clip_duration = 1s, clip_samples = 16000
    audio = np.ones(40000, dtype=np.float32)  # 2.5 s -> 3 windows
    clips, meta = seg.slice_audio_windows(audio, sr, step, num_trials=1)
    assert clips.shape == (3, 16000)
    assert [m[1] for m in meta] == [0.0, 1.0, 2.0]
    assert meta[-1][2] == pytest.approx(0.5)  # last window holds 0.5 s
    assert clips[2, :8000].max() == 1.0 and clips[2, 8000:].max() == 0.0


def test_slice_windows_multi_trial_shift():
    seg = make_segmenter(total_spec_columns=100)
    sr, step = 16000, 0.01
    audio = np.ones(16000, dtype=np.float32)
    clips, meta = seg.slice_audio_windows(audio, sr, step, num_trials=2)
    # trial 0: no shift; trial 1: left pad of round(0.5/step)*step = 0.5 s
    trial_ids = [m[0] for m in meta]
    assert trial_ids == [0, 1, 1]
    assert meta[1][1] == pytest.approx(-0.5)
    assert meta[2][1] == pytest.approx(0.5)


def test_slice_empty_audio_emits_one_window():
    seg = make_segmenter(total_spec_columns=100)
    clips, meta = seg.slice_audio_windows(np.zeros(0, np.float32), 16000, 0.01, 1)
    assert clips.shape == (1, 16000)
    assert meta[0] == (0, 0.0, 0.0)


def test_segment_single_trial_pipeline():
    seg = make_segmenter(total_spec_columns=100, codebook={"call": 0})
    sr, step = 16000, 0.01
    audio = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
    # windows at offset 0 and 1s; segment cols are decoder cols (2 spec cols each)
    StubGen(seg, [toks((5, 0, 10)), toks((10, 0, 20))])
    pred = seg.segment(audio, sr, spec_time_step=step, num_trials=1, batch_size=2)
    # time_delta = 512/2/16000 = 0.016
    td = 0.016
    assert pred["cluster"] == ["call", "call"]
    assert pred["onset"][0] == pytest.approx(0.1 + td)
    assert pred["offset"][0] == pytest.approx(0.2 - td)
    assert pred["onset"][1] == pytest.approx(1.2 + td)
    assert pred["offset"][1] == pytest.approx(1.4 - td)


def test_segment_boundary_merge_across_windows():
    seg = make_segmenter(total_spec_columns=100, codebook={"v": 0})
    sr, step = 16000, 0.01  # clip = 1 s = 50 decoder cols
    audio = np.zeros(32000, dtype=np.float32)
    # window 0 ends segment at col 50 (=1.0s); window 1 starts at col 0 (=1.0s)
    StubGen(seg, [toks((40, 0, 50)), toks((0, 0, 5))])
    pred = seg.segment(audio, sr, spec_time_step=step, num_trials=1)
    assert len(pred["onset"]) == 1  # merged into one segment 0.8 - 1.1
    td = 0.016
    assert pred["onset"][0] == pytest.approx(0.8 + td)
    assert pred["offset"][0] == pytest.approx(1.1 - td)


def test_segment_min_length_filter():
    seg = make_segmenter(total_spec_columns=100, codebook={"v": 0})
    sr, step = 16000, 0.01
    audio = np.zeros(16000, dtype=np.float32)
    StubGen(seg, [toks((0, 0, 1), (10, 0, 30))])
    # min_segment_length defaults to step*2 = 0.02; first seg is exactly 0.02 -> kept
    pred = seg.segment(audio, sr, spec_time_step=step)
    assert len(pred["onset"]) == 2
    # with a larger threshold the short one dies
    StubGen(seg, [toks((0, 0, 1), (10, 0, 30))])
    pred = seg.segment(audio, sr, spec_time_step=step, min_segment_length=0.1)
    assert len(pred["onset"]) == 1


def test_segment_multi_trial_clustering():
    seg = make_segmenter(total_spec_columns=100, codebook={"v": 0})
    sr, step = 16000, 0.01
    audio = np.zeros(16000, dtype=np.float32)
    # 2 trials: same segment in both; trial 1's first window has offset -0.5 s,
    # so cols 35-45 -> 0.7-0.9 - 0.5 = 0.2-0.4 s matches trial 0's cols 10-20.
    StubGen(seg, [toks((10, 0, 20)), toks((35, 0, 45)), toks()])
    pred = seg.segment(audio, sr, spec_time_step=step, num_trials=2,
                       consolidation_method="clustering")
    assert len(pred["onset"]) == 1
    td = 0.016
    assert pred["onset"][0] == pytest.approx(0.2 + td)


def test_segment_blur_midpoint_collapse():
    seg = make_segmenter(total_spec_columns=100, codebook={"v": 0})
    sr, step = 16000, 0.01
    audio = np.zeros(16000, dtype=np.float32)
    # segment of one decoder col = 0.02 s < 2*td = 0.032 -> collapses to midpoint
    # (min_segment_length=0: at the default step*2 the 0.02-s segment is dropped
    # by float round-off, faithfully to the reference's `>=` on computed floats)
    StubGen(seg, [toks((10, 0, 11))])
    pred = seg.segment(audio, sr, spec_time_step=step, min_segment_length=0.0)
    assert pred["onset"][0] == pred["offset"][0] == pytest.approx(0.21)


def test_segment_duplicate_removal():
    seg = make_segmenter(total_spec_columns=100, codebook={"v": 0, "w": 1})
    sr, step = 16000, 0.01
    audio = np.zeros(16000, dtype=np.float32)
    StubGen(seg, [toks((10, 0, 20), (10, 0, 20), (10, 1, 20))])
    pred = seg.segment(audio, sr, spec_time_step=step)
    # exact duplicate (same cluster) removed; different cluster kept
    assert len(pred["onset"]) == 2


def test_segment_unknown_cluster_dropped():
    seg = make_segmenter(total_spec_columns=100, codebook={"v": 0})
    sr, step = 16000, 0.01
    audio = np.zeros(16000, dtype=np.float32)
    StubGen(seg, [toks((10, 7, 20))])
    pred = seg.segment(audio, sr, spec_time_step=step)
    assert pred == {"onset": [], "offset": [], "cluster": []}


def test_status_monitor_progress():
    seg = make_segmenter(total_spec_columns=100, codebook={"v": 0})
    monitor = {}
    StubGen(seg, [toks((10, 0, 20))])
    seg.segment(np.zeros(16000, np.float32), 16000, spec_time_step=0.01,
                status_monitor=monitor)
    assert monitor["progress"] == 100


def test_end_to_end_with_real_model_smoke():
    """Random weights: output is arbitrary but the full device pipeline must run."""
    seg = make_segmenter(total_spec_columns=64, codebook={"v": 0})
    audio = np.random.RandomState(0).randn(3000).astype(np.float32)
    pred = seg.segment(audio, 16000, spec_time_step=0.01, max_length=16,
                       batch_size=2, num_beams=1)
    assert set(pred) == {"onset", "offset", "cluster"}
    pred2 = seg.segment(audio, 16000, spec_time_step=0.01, max_length=16,
                        batch_size=2, num_beams=2)
    assert set(pred2) == {"onset", "offset", "cluster"}


def test_checkpoint_round_trip(tmp_path):
    cfg = tiny_cfg()
    cfg.cluster_codebook = {"a": 0, "b": 1}
    cfg.default_segmentation_config = {"spec_time_step": 0.005, "min_frequency": 100}
    params = init_params(jax.random.PRNGKey(0), cfg)
    save_checkpoint(str(tmp_path / "ckpt"), params, cfg, step=42)
    params2, cfg2 = load_checkpoint(str(tmp_path / "ckpt"))
    assert cfg2.cluster_codebook == {"a": 0, "b": 1}
    assert cfg2.current_step == 42
    assert cfg2.default_segmentation_config["spec_time_step"] == 0.005
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    seg = Segmenter.from_pretrained(str(tmp_path / "ckpt"))
    assert seg.cluster_codebook == {"a": 0, "b": 1}


def test_checkpoint_bf16_storage(tmp_path):
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    save_checkpoint(str(tmp_path / "c16"), params, cfg, dtype="bfloat16")
    params2, _ = load_checkpoint(str(tmp_path / "c16"))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.01, rtol=0.01)


def test_segment_resolves_max_length_from_checkpoint_default():
    """Omitted max_length resolves: checkpoint default_segmentation_config
    (stamped by train.py --max_length) > literal 448."""
    captured = []

    def capture(clips, frontend, batch_size, max_length, *a, **k):
        captured.append(max_length)
        return [[] for _ in range(len(clips))]

    seg = make_segmenter()
    seg._generate_tokens = capture
    seg.segment(np.zeros(8000, np.float32), 16000)
    assert captured[-1] == 448  # no stamp -> reference literal

    seg.default_segmentation_config["max_length"] = 24
    seg.segment(np.zeros(8000, np.float32), 16000)
    assert captured[-1] == 24  # checkpoint default wins

    seg.segment(np.zeros(8000, np.float32), 16000, max_length=100)
    assert captured[-1] == 100  # explicit arg wins


def test_final_dedup_catches_nonadjacent_duplicates():
    """Post-processing re-dedup sorts on the full tuple: a same-onset row
    with a different offset must not shield an exact duplicate."""
    seg = make_segmenter(total_spec_columns=64)
    # stub generator emitting three spans: two identical + one same-onset
    # different-offset, all within one window
    on, off = tok.timestamp_id(4), tok.timestamp_id(12)
    off2 = tok.timestamp_id(8)
    digits = [0]
    tokens = ([on] + digits + [off] + [on] + digits + [off2]
              + [on] + digits + [off])
    StubGen(seg, [list(tok.PROMPT_IDS) + [tok.species_token("unknown")]
                  + tokens + [tok.EOT_ID]])
    out = seg.segment(np.zeros(int(64 * 0.0025 * 32000), np.float32), 32000,
                      num_trials=1, min_segment_length=0.0)
    rows = list(zip(out["onset"], out["offset"], out["cluster"]))
    assert len(rows) == 2, rows  # the exact duplicate removed, both spans kept
    assert len(rows) == len(set(rows)), rows
