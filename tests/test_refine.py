"""Tests for energy-edge boundary refinement (whisperseg_tpu/refine.py)."""

import numpy as np
import pytest

from whisperseg_tpu.refine import energy_envelope_db, refine_prediction


def make_bursts(bounds, sr=32000, duration=4.0, amp=0.4, noise=0.002, seed=0):
    """Audio with tone bursts at the given (onset, offset) times."""
    rng = np.random.default_rng(seed)
    y = rng.standard_normal(int(duration * sr)).astype(np.float32) * noise
    t = np.arange(len(y)) / sr
    for on, off in bounds:
        a, b = int(on * sr), int(off * sr)
        y[a:b] += amp * np.sin(2 * np.pi * 2000 * t[a:b]).astype(np.float32)
    return y


def test_refinement_recovers_jittered_boundaries():
    """Boundaries jittered by up to 30 ms snap back to within ~3 ms."""
    sr = 32000
    truth = [(0.5, 0.8), (1.2, 1.35), (2.0, 2.5), (3.1, 3.22)]
    y = make_bursts(truth, sr=sr)
    rng = np.random.default_rng(1)
    pred = {
        "onset": [on + rng.uniform(-0.03, 0.03) for on, _ in truth],
        "offset": [off + rng.uniform(-0.03, 0.03) for _, off in truth],
        "cluster": ["v"] * len(truth),
    }
    out = refine_prediction(pred, y, sr, search_ms=40)
    for (t_on, t_off), got_on, got_off in zip(truth, out["onset"],
                                              out["offset"]):
        assert abs(got_on - t_on) < 0.004, (t_on, got_on)
        assert abs(got_off - t_off) < 0.004, (t_off, got_off)


def test_refinement_improves_segment_f1():
    """The acceptance shape: jittered predictions fail the ±10 ms tolerance,
    refined ones pass."""
    from whisperseg_tpu.scoring import segment_score

    sr = 32000
    truth = [(0.5, 0.8), (1.2, 1.35), (2.0, 2.5), (3.1, 3.22)]
    y = make_bursts(truth, sr=sr)
    rng = np.random.default_rng(2)
    label = {"onset": [t[0] for t in truth], "offset": [t[1] for t in truth],
             "cluster": ["v"] * len(truth)}
    pred = {
        "onset": [on + float(rng.uniform(0.015, 0.035) * rng.choice([-1, 1]))
                  for on, _ in truth],
        "offset": [off + float(rng.uniform(0.015, 0.035) * rng.choice([-1, 1]))
                   for _, off in truth],
        "cluster": ["v"] * len(truth),
    }
    f1_before = segment_score(pred, label, tolerance=0.01)[-1]
    out = refine_prediction(pred, y, sr, search_ms=40)
    f1_after = segment_score(out, label, tolerance=0.01)[-1]
    assert f1_before < 0.5
    assert f1_after == 1.0, (pred, out)


def test_no_edge_keeps_model_boundary():
    """Flat noise (no energy edge above the contrast threshold) must leave
    boundaries untouched (modulo the 3-decimal rounding contract)."""
    sr = 16000
    rng = np.random.default_rng(3)
    y = rng.standard_normal(sr * 2).astype(np.float32) * 0.01
    pred = {"onset": [0.5004], "offset": [0.9002], "cluster": ["v"]}
    out = refine_prediction(pred, y, sr, search_ms=40)
    assert out["onset"] == [0.5] and out["offset"] == [0.9]


def test_neighboring_segments_do_not_cross():
    sr = 32000
    truth = [(0.5, 0.7), (0.75, 0.95)]  # 50 ms gap < the 80 ms search span
    y = make_bursts(truth, sr=sr)
    pred = {"onset": [0.52, 0.73], "offset": [0.72, 0.97],
            "cluster": ["v", "v"]}
    out = refine_prediction(pred, y, sr, search_ms=40)
    assert out["offset"][0] <= out["onset"][1]
    for (t_on, t_off), got_on, got_off in zip(truth, out["onset"],
                                              out["offset"]):
        assert abs(got_on - t_on) < 0.01
        assert abs(got_off - t_off) < 0.01


def test_empty_prediction_passthrough():
    y = np.zeros(16000, np.float32)
    pred = {"onset": [], "offset": [], "cluster": []}
    out = refine_prediction(pred, y, 16000)
    assert out["onset"] == []


def test_envelope_shape_and_levels():
    sr = 16000
    y = np.concatenate([np.zeros(sr, np.float32),
                        0.5 * np.ones(sr, np.float32)])
    env = energy_envelope_db(y, sr)
    assert len(env) == 2 * sr // 16  # 1 ms hop
    assert env[len(env) // 4] < -80  # silence ~ floor
    assert env[3 * len(env) // 4] > -10  # signal ~ -6 dB


def test_segmenter_api_accepts_flag():
    """segment(..., refine_boundaries_ms=...) plumbs through on a tiny model."""
    import jax

    from whisperseg_tpu.models import init_params
    from whisperseg_tpu.models.config import WhisperConfig
    from whisperseg_tpu.segmenter import Segmenter

    cfg = WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                        num_heads=2, d_ff=128, max_source_positions=50,
                        max_target_positions=32, total_spec_columns=100,
                        compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    seg = Segmenter(params, cfg)
    y = make_bursts([(0.2, 0.4)], sr=16000, duration=1.0)
    out = seg.segment(y, sr=16000, spec_time_step=0.01, num_trials=1,
                      num_beams=1, max_length=16, batch_size=2,
                      refine_boundaries_ms=30)
    assert set(out.keys()) >= {"onset", "offset", "cluster"}


def test_split_merged_segments_recovers_syllables():
    """A single prediction spanning three bursts splits at the energy valleys
    into three segments matching the true boundaries."""
    from whisperseg_tpu.refine import split_merged_segments

    sr = 32000
    truth = [(0.50, 0.62), (0.65, 0.80), (0.83, 0.95)]
    y = make_bursts(truth, sr=sr)
    pred = {"onset": [0.50], "offset": [0.95], "cluster": ["v"]}
    out = split_merged_segments(pred, y, sr, drop_db=10)
    assert len(out["onset"]) == 3
    for (t_on, t_off), got_on, got_off in zip(truth, out["onset"],
                                              out["offset"]):
        assert abs(got_on - t_on) < 0.012, (t_on, got_on)
        assert abs(got_off - t_off) < 0.012, (t_off, got_off)
    assert out["cluster"] == ["v", "v", "v"]


def test_split_keeps_continuous_segments_whole():
    from whisperseg_tpu.refine import split_merged_segments

    sr = 32000
    y = make_bursts([(0.3, 0.9)], sr=sr, duration=1.5)
    pred = {"onset": [0.3], "offset": [0.9], "cluster": ["v"]}
    out = split_merged_segments(pred, y, sr, drop_db=10)
    assert out["onset"] == [0.3] and out["offset"] == [0.9]


def test_split_then_refine_recovers_merged_truth():
    """The full post-process pipeline on the dominant failure mode: a merged
    prediction with sloppy outer boundaries becomes tolerance-accurate
    segments."""
    from whisperseg_tpu.refine import refine_prediction, split_merged_segments
    from whisperseg_tpu.scoring import segment_score

    sr = 32000
    truth = [(0.50, 0.62), (0.66, 0.80), (0.84, 0.95), (1.30, 1.45)]
    y = make_bursts(truth, sr=sr)
    label = {"onset": [t[0] for t in truth], "offset": [t[1] for t in truth],
             "cluster": ["v"] * 4}
    pred = {"onset": [0.52, 1.28], "offset": [0.93, 1.47],
            "cluster": ["v", "v"]}
    assert segment_score(pred, label, tolerance=0.01)[-1] < 0.4
    sp = split_merged_segments(pred, y, sr, drop_db=10)
    out = refine_prediction(sp, y, sr, search_ms=30)
    assert segment_score(out, label, tolerance=0.01)[-1] == 1.0, out


def test_merge_small_gaps_merges_spurious_splits():
    from whisperseg_tpu.refine import merge_small_gaps

    pred = {"onset": [0.1, 0.205, 0.5, 0.62],
            "offset": [0.2, 0.3, 0.6, 0.7],
            "cluster": ["a", "a", "a", "a"]}
    out = merge_small_gaps(pred, gap_s=0.010)
    # 5 ms gap merged; 20 ms gap kept
    assert out["onset"] == [0.1, 0.5, 0.62]
    assert out["offset"] == [0.3, 0.6, 0.7]
    assert out["cluster"] == ["a", "a", "a"]


def test_merge_small_gaps_respects_cluster_and_order():
    from whisperseg_tpu.refine import merge_small_gaps

    # unsorted input, different clusters across the tiny gap -> no merge
    pred = {"onset": [0.5, 0.1], "offset": [0.6, 0.498],
            "cluster": ["b", "a"]}
    out = merge_small_gaps(pred, gap_s=0.010)
    assert out["onset"] == [0.1, 0.5]
    assert out["cluster"] == ["a", "b"]
    # same cluster -> merged, chained across several tiny gaps
    pred = {"onset": [0.1, 0.205, 0.305], "offset": [0.2, 0.3, 0.4],
            "cluster": ["a", "a", "a"]}
    out = merge_small_gaps(pred, gap_s=0.010)
    assert out["onset"] == [0.1] and out["offset"] == [0.4]


def test_merge_small_gaps_empty_and_singleton():
    from whisperseg_tpu.refine import merge_small_gaps

    empty = {"onset": [], "offset": [], "cluster": []}
    assert merge_small_gaps(empty, 0.01) == empty
    one = {"onset": [0.1], "offset": [0.2], "cluster": ["a"]}
    assert merge_small_gaps(one, 0.01) == one


def test_segmenter_api_accepts_merge_gap_flag():
    import jax

    from whisperseg_tpu.models import init_params
    from whisperseg_tpu.models.config import WhisperConfig
    from whisperseg_tpu.segmenter import Segmenter

    cfg = WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                        num_heads=2, d_ff=128, max_source_positions=50,
                        max_target_positions=32, total_spec_columns=100,
                        compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    seg = Segmenter(params, cfg)
    y = make_bursts([(0.2, 0.4)], sr=16000, duration=1.0)
    out = seg.segment(y, sr=16000, spec_time_step=0.01, num_trials=1,
                      num_beams=1, max_length=16, batch_size=2,
                      merge_gap_ms=10, split_merged_db=15)
    assert set(out.keys()) >= {"onset", "offset", "cluster"}


# ---------------------------------------------------------------- fitting


def test_fit_postprocess_picks_split_for_merged_predictions():
    """Merged predictions over gapped truth: the grid fit selects a split
    (optionally + refine) combo whose train F1 beats raw."""
    from whisperseg_tpu.refine import apply_postprocess, fit_postprocess

    sr = 32000
    truth = [(0.5, 0.8), (0.9, 1.2), (2.0, 2.2), (2.32, 2.6)]
    y = make_bursts(truth, sr=sr)
    label = {"onset": [t[0] for t in truth], "offset": [t[1] for t in truth],
             "cluster": ["v"] * 4, "tolerance": 0.01, "spec_time_step": 0.0025}
    pred = {"onset": [0.5, 2.0], "offset": [1.2, 2.6], "cluster": ["v", "v"]}

    params, table = fit_postprocess([pred], [label], [y], [sr])
    assert params.get("split_merged_db"), params
    raw = table["merge_0+split_0+refine_0"]["segment_F1"]
    g = params.get("merge_gap_ms", 0)
    d = params.get("split_merged_db", 0)
    w = params.get("refine_boundaries_ms", 0)
    fitted = table[f"merge_{g:g}+split_{d:g}+refine_{w:g}"]["segment_F1"]
    assert fitted > raw

    # applying the fitted params reproduces the fitted score
    from whisperseg_tpu.scoring import segment_score

    out = apply_postprocess(pred, y, sr, **params)
    assert round(segment_score(out, label, tolerance=0.01)[-1], 4) == fitted


def test_fit_postprocess_noop_on_perfect_predictions():
    """When raw predictions already score 1.0, simplicity tie-breaking keeps
    every knob off (empty params)."""
    from whisperseg_tpu.refine import fit_postprocess

    sr = 32000
    truth = [(0.5, 0.8), (1.2, 1.5)]
    y = make_bursts(truth, sr=sr)
    label = {"onset": [t[0] for t in truth], "offset": [t[1] for t in truth],
             "cluster": ["v"] * 2, "tolerance": 0.01, "spec_time_step": 0.0025}
    pred = {"onset": list(label["onset"]), "offset": list(label["offset"]),
            "cluster": ["v", "v"]}
    params, table = fit_postprocess([pred], [label], [y], [sr])
    assert params == {}, params
    assert table["merge_0+split_0+refine_0"]["segment_F1"] == 1.0


def test_segment_applies_checkpoint_default_postprocess(monkeypatch):
    """Knobs stored in default_segmentation_config activate at segment() time;
    an explicit 0 argument disables them (arg > model default > off)."""
    import jax

    from whisperseg_tpu import refine
    from whisperseg_tpu.models import init_params
    from whisperseg_tpu.models.config import WhisperConfig
    from whisperseg_tpu.segmenter import Segmenter

    cfg = WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                        num_heads=2, d_ff=128, max_source_positions=50,
                        max_target_positions=32, total_spec_columns=100,
                        compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    seg = Segmenter(params, cfg)
    seg.default_segmentation_config["merge_gap_ms"] = 7.0

    calls = []
    real = refine.merge_small_gaps

    def spy(prediction, gap_s):
        calls.append(gap_s)
        return real(prediction, gap_s)

    monkeypatch.setattr(refine, "merge_small_gaps", spy)
    y = make_bursts([(0.2, 0.4)], sr=16000, duration=1.0)
    common = dict(sr=16000, spec_time_step=0.01, num_trials=1, num_beams=1,
                  max_length=16, batch_size=2)
    seg.segment(y, **common)
    assert calls == [pytest.approx(0.007)]
    seg.segment(y, merge_gap_ms=0, **common)  # explicit off
    assert len(calls) == 1
    seg.segment(y, merge_gap_ms=3, **common)  # explicit override
    assert calls[-1] == pytest.approx(0.003)


# ----------------------------------------------- frame-head (learned) chain


def _tracks(T=100, q=0.02, **spikes):
    """Build a tracks dict; spikes maps track name -> {pos: value}."""
    t = {"vocal": np.zeros(T, np.float32), "onset": np.zeros(T, np.float32),
         "offset": np.zeros(T, np.float32),
         "cluster": np.zeros(T, np.int32), "quantum": q}
    for name, d in spikes.items():
        for pos, val in d.items():
            t[name][pos] = val
    return t


def test_frame_peak_pos_fallback_and_interpolation():
    from whisperseg_tpu.refine import frame_peak_pos

    track = np.zeros(50, np.float32)
    # below min_peak -> stays at center
    assert frame_peak_pos(track, 10, 3) == 10.0
    # clear integer peak
    track[12] = 1.0
    assert frame_peak_pos(track, 10, 3) == 12.0
    # asymmetric shoulder pulls the peak off-grid (parabolic)
    track[11], track[13] = 0.6, 0.2
    p = frame_peak_pos(track, 10, 3)
    assert 11.5 < p < 12.0
    # out-of-range center clamps instead of crashing
    assert frame_peak_pos(track, 200, 3) == 200.0


def test_split_with_frame_tracks_cuts_where_both_events_fire():
    from whisperseg_tpu.refine import split_with_frame_tracks

    q, delta = 0.02, 0.008
    # decoded segment [10q+delta, 30q-delta] (blur-corrected); internal
    # boundary at grid position 20 where BOTH event tracks exceed 0.5
    tr = _tracks(onset={20: 0.9}, offset={20: 0.8})
    pred = {"onset": [10 * q + delta], "offset": [30 * q - delta],
            "cluster": ["a"]}
    out = split_with_frame_tracks(pred, tr, delta, cut_threshold=0.5)
    assert out["cluster"] == ["a", "a"]
    np.testing.assert_allclose(out["onset"],
                               [10 * q + delta, 20 * q + delta], atol=1e-9)
    np.testing.assert_allclose(out["offset"],
                               [20 * q - delta, 30 * q - delta], atol=1e-9)
    # one-sided events do NOT cut
    tr2 = _tracks(onset={20: 0.9})
    out2 = split_with_frame_tracks(pred, tr2, delta, cut_threshold=0.5)
    assert out2["onset"] == pred["onset"]


def test_split_with_frame_tracks_min_len_guard():
    from whisperseg_tpu.refine import split_with_frame_tracks

    q, delta = 0.02, 0.008
    tr = _tracks(onset={11: 0.9}, offset={11: 0.9})
    pred = {"onset": [10 * q + delta], "offset": [30 * q - delta],
            "cluster": ["a"]}
    # cutting at 11 would leave a left piece shorter than min_len_s
    out = split_with_frame_tracks(pred, tr, delta, cut_threshold=0.5,
                                  min_len_s=0.05)
    assert len(out["onset"]) == 1


def test_refine_with_frame_tracks_snaps_and_guards():
    from whisperseg_tpu.refine import refine_with_frame_tracks

    q, delta = 0.02, 0.008
    # decoder put the boundary at grid 10/20; the head sees events at 12/19
    tr = _tracks(onset={12: 1.0}, offset={19: 1.0})
    pred = {"onset": [10 * q + delta], "offset": [20 * q - delta],
            "cluster": ["a"]}
    out = refine_with_frame_tracks(pred, tr, delta, search_ms=60.0)
    np.testing.assert_allclose(out["onset"], [12 * q + delta], atol=1e-9)
    np.testing.assert_allclose(out["offset"], [19 * q - delta], atol=1e-9)
    # no nearby peak -> boundary stays put
    out2 = refine_with_frame_tracks(pred, _tracks(), delta, search_ms=60.0)
    np.testing.assert_allclose(out2["onset"], pred["onset"], atol=1e-9)
    np.testing.assert_allclose(out2["offset"], pred["offset"], atol=1e-9)
    # a snap that would invert the segment is rejected
    tr3 = _tracks(onset={19: 1.0}, offset={12: 1.0})
    out3 = refine_with_frame_tracks(pred, tr3, delta, search_ms=60.0)
    np.testing.assert_allclose(out3["onset"], pred["onset"], atol=1e-9)


def test_apply_frame_postprocess_chain_and_disable():
    from whisperseg_tpu.refine import apply_frame_postprocess

    q, delta = 0.02, 0.008
    tr = _tracks(onset={20: 0.9, 10: 1.0}, offset={20: 0.9, 30: 1.0})
    pred = {"onset": [10 * q + delta + 0.004], "offset": [30 * q - delta],
            "cluster": ["a"]}
    # split then refine: two pieces, onset snapped back to the grid-10 peak
    out = apply_frame_postprocess(pred, tr, delta, frame_split=0.5,
                                  frame_refine_ms=30.0)
    assert len(out["onset"]) == 2
    assert out["onset"][0] == pytest.approx(10 * q + delta, abs=1e-9)
    # both knobs falsy -> untouched
    same = apply_frame_postprocess(pred, tr, delta, frame_split=0,
                                   frame_refine_ms=None)
    assert same == pred


def test_segment_frame_knobs_require_head(monkeypatch):
    """segment(frame_split=...) on a model WITHOUT a frame head silently
    skips the learned stage (and never calls frame_probs)."""
    import jax

    from whisperseg_tpu.models import init_params
    from whisperseg_tpu.models.config import WhisperConfig
    from whisperseg_tpu.segmenter import Segmenter

    cfg = WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                        num_heads=2, d_ff=128, max_source_positions=50,
                        max_target_positions=32, total_spec_columns=100,
                        compute_dtype="float32")
    seg = Segmenter(init_params(jax.random.PRNGKey(0), cfg), cfg)
    assert "frame_head" not in seg.params

    def boom(*a, **k):
        raise AssertionError("frame_probs must not be called without a head")

    monkeypatch.setattr(type(seg), "frame_probs", boom)
    y = make_bursts([(0.2, 0.4)], sr=16000, duration=1.0)
    pred = seg.segment(y, sr=16000, spec_time_step=0.01, num_trials=1,
                       num_beams=1, max_length=16, batch_size=2,
                       frame_split=0.5, frame_refine_ms=20.0)
    assert set(pred) == {"onset", "offset", "cluster"}


def test_segment_uses_frame_postprocess_with_head(monkeypatch):
    """With a frame-head model and crafted tracks, segment(frame_refine_ms=...)
    moves decoded boundaries onto the event peaks."""
    import jax

    from whisperseg_tpu.models import init_params
    from whisperseg_tpu.models.config import WhisperConfig
    from whisperseg_tpu.segmenter import Segmenter

    cfg = WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                        num_heads=2, d_ff=128, max_source_positions=50,
                        max_target_positions=32, total_spec_columns=100,
                        compute_dtype="float32", frame_head=True,
                        frame_head_clusters=2)
    seg = Segmenter(init_params(jax.random.PRNGKey(0), cfg), cfg)

    sr = 16000
    q = 0.02
    from whisperseg_tpu.constants import fft_time_delta
    delta = fft_time_delta(sr)
    tr = _tracks(T=50, q=q, onset={12: 1.0}, offset={19: 1.0})
    # segment() now emits frame tracks from the decode pass itself (the
    # fused path — no frame_probs re-encode); inject the crafted tracks at
    # the fused assembly seam
    import whisperseg_tpu.segmenter as seg_mod

    monkeypatch.setattr(seg_mod, "_tracks_from_window_frames",
                        lambda *a, **k: tr)
    # and fail loudly if the two-pass fallback re-runs the encoder
    monkeypatch.setattr(type(seg), "frame_probs",
                        lambda self, *a, **k: pytest.fail(
                            "two-pass frame_probs used despite fused path"))
    # bypass the decoder: force a raw prediction at grid 10/20
    monkeypatch.setattr(
        type(seg), "_parse_generation",
        lambda self, *a, **k: {"onset": [10 * q - delta],
                               "offset": [20 * q + delta],
                               "cluster": ["Vocal"]})
    y = make_bursts([(0.2, 0.4)], sr=sr, duration=1.0)
    pred = seg.segment(y, sr=sr, spec_time_step=0.01, num_trials=1,
                       num_beams=1, max_length=16, batch_size=2,
                       frame_refine_ms=60.0)
    assert pred["onset"][0] == pytest.approx(12 * q + delta, abs=1e-6)
    assert pred["offset"][0] == pytest.approx(19 * q - delta, abs=1e-6)


def test_fit_postprocess_selects_frame_knobs():
    """With frame tracks that precisely explain the label and a merged raw
    prediction, the grid-fit picks the frame-head split over the energy
    stages (energy grids pinned to 0 to isolate the learned chain)."""
    from whisperseg_tpu.refine import fit_postprocess

    sr = 32000
    q = 0.005                       # spec_time_step 0.0025 -> quantum 5 ms
    delta = 512 / 2 / sr            # 8 ms
    # ground truth: two syllables; raw prediction merged them into one
    label = {"onset": [0.100, 0.300], "offset": [0.260, 0.460],
             "cluster": ["v", "v"], "tolerance": 0.02,
             "spec_time_step": 0.0025}
    pred = {"onset": [0.100], "offset": [0.460], "cluster": ["v"]}
    y = make_bursts([(0.1, 0.26), (0.3, 0.46)], sr=sr, duration=1.0,
                    noise=0.0)     # silence between bursts
    T = int(np.ceil(1.0 / q))
    onset_t = np.zeros(T, np.float32)
    offset_t = np.zeros(T, np.float32)
    # the head fires an offset at 0.26+delta and an onset at 0.30-delta in
    # label space; the midpoint grid cell sees both above threshold
    cut = int(np.round(((0.26 + 0.30) / 2) / q))
    onset_t[cut] = offset_t[cut] = 0.9
    tracks = {"vocal": np.zeros(T, np.float32), "onset": onset_t,
              "offset": offset_t, "cluster": np.zeros(T, np.int32),
              "quantum": q}
    # time_delta such that cut*q +/- delta lands within tolerance of the label
    td = (0.300 - 0.260) / 2 - (0.280 - cut * q)
    params, table = fit_postprocess(
        [pred], [label], [y], [sr],
        merge_gap_ms=(0.0,), split_db=(0.0,), widths_ms=(0.0,),
        frame_tracks=[tracks], time_deltas=[td],
        frame_split=(0.0, 0.5), frame_refine_ms=(0.0,))
    assert params == {"frame_split": 0.5}, (params, table)
    assert table["merge_0+split_0+refine_0+fsplit_0.5+fsnap_0+ffilt_0"][
        "segment_F1"] == 1.0
    # baseline (all off) exists in the table and scores worse
    assert table["merge_0+split_0+refine_0+fsplit_0+fsnap_0+ffilt_0"][
        "segment_F1"] < 1.0


def test_fit_postprocess_without_tracks_table_names_unchanged():
    """No frame tracks -> the table keeps the original 3-knob combo names
    (backward compatible with stored RESULTS)."""
    from whisperseg_tpu.refine import fit_postprocess

    sr = 32000
    label = {"onset": [0.5], "offset": [0.8], "cluster": ["v"],
             "tolerance": 0.01, "spec_time_step": 0.0025}
    pred = {"onset": [0.5], "offset": [0.8], "cluster": ["v"]}
    y = make_bursts([(0.5, 0.8)], sr=sr, duration=1.0)
    params, table = fit_postprocess([pred], [label], [y], [sr],
                                    merge_gap_ms=(0.0,), split_db=(0.0,),
                                    widths_ms=(0.0, 20.0))
    assert "merge_0+split_0+refine_0" in table
    assert all("fsplit" not in k for k in table)
    assert params == {}


def test_filter_with_frame_tracks_drops_silent_segments():
    from whisperseg_tpu.refine import filter_with_frame_tracks

    q, delta = 0.02, 0.008
    T = 100
    vocal = np.zeros(T, np.float32)
    vocal[10:20] = 1.0              # only [10, 20) is vocal
    tr = {"vocal": vocal, "onset": np.zeros(T, np.float32),
          "offset": np.zeros(T, np.float32),
          "cluster": np.zeros(T, np.int32), "quantum": q}
    pred = {"onset": [10 * q + delta, 50 * q + delta],
            "offset": [20 * q - delta, 60 * q - delta],
            "cluster": ["a", "b"]}
    out = filter_with_frame_tracks(pred, tr, delta, min_vocal=0.5)
    assert out["cluster"] == ["a"]
    assert out["onset"] == [pred["onset"][0]]
    # threshold 0 (handled by apply_frame_postprocess gating) — direct call
    # with a tiny threshold keeps everything with any support
    out2 = filter_with_frame_tracks(pred, tr, delta, min_vocal=-1.0)
    assert out2["cluster"] == ["a", "b"]
    # out-of-range segment (beyond track end) judges the clamped cells
    pred3 = {"onset": [99 * q], "offset": [120 * q], "cluster": ["c"]}
    out3 = filter_with_frame_tracks(pred3, tr, delta, min_vocal=0.5)
    assert out3["cluster"] == []


def test_apply_frame_postprocess_filter_runs_first():
    """A hallucinated segment is dropped before the split/refine stages ever
    see it; a supported segment passes through."""
    from whisperseg_tpu.refine import apply_frame_postprocess

    q, delta = 0.02, 0.008
    T = 100
    vocal = np.zeros(T, np.float32)
    vocal[10:30] = 1.0
    tr = {"vocal": vocal,
          "onset": np.zeros(T, np.float32),
          "offset": np.zeros(T, np.float32),
          "cluster": np.zeros(T, np.int32), "quantum": q}
    tr["onset"][20] = tr["offset"][20] = 0.9   # internal cut in the real one
    pred = {"onset": [10 * q + delta, 60 * q + delta],
            "offset": [30 * q - delta, 70 * q - delta],
            "cluster": ["a", "ghost"]}
    out = apply_frame_postprocess(pred, tr, delta, frame_split=0.5,
                                  frame_filter=0.5)
    assert out["cluster"] == ["a", "a"]   # ghost dropped, real one split


def test_segment_applies_checkpoint_default_frame_knobs(monkeypatch):
    """frame_* knobs stored in default_segmentation_config (e.g. by
    scripts/fit_postprocess.py --write) activate at segment() time on a
    frame-head model; an explicit 0 disables them."""
    import jax

    from whisperseg_tpu.models import init_params
    from whisperseg_tpu.models.config import WhisperConfig
    from whisperseg_tpu.segmenter import Segmenter

    cfg = WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                        num_heads=2, d_ff=128, max_source_positions=50,
                        max_target_positions=32, total_spec_columns=100,
                        compute_dtype="float32", frame_head=True,
                        frame_head_clusters=2)
    seg = Segmenter(init_params(jax.random.PRNGKey(0), cfg), cfg)
    seg.default_segmentation_config["frame_refine_ms"] = 20.0

    calls = []
    tracks = {"vocal": np.zeros(50, np.float32),
              "onset": np.zeros(50, np.float32),
              "offset": np.zeros(50, np.float32),
              "cluster": np.zeros(50, np.int32), "quantum": 0.02}

    def spy(*a, **k):
        calls.append(1)
        return tracks

    # segment() emits tracks from the decode pass (fused path); the frame
    # post-processing activating == the fused assembly seam being hit
    import whisperseg_tpu.segmenter as seg_mod

    monkeypatch.setattr(seg_mod, "_tracks_from_window_frames", spy)
    y = make_bursts([(0.2, 0.4)], sr=16000, duration=1.0)
    common = dict(sr=16000, spec_time_step=0.01, num_trials=1, num_beams=1,
                  max_length=16, batch_size=2)
    seg.segment(y, **common)
    assert calls == [1]          # default activated the frame path
    seg.segment(y, frame_refine_ms=0, **common)
    assert calls == [1]          # explicit 0 disables it


def test_refine_with_frame_tracks_no_peak_keeps_offgrid_boundary():
    """Review regression: the no-peak fallback must return the ORIGINAL
    (off-grid) boundary, not a grid-quantized one — and never a negative
    onset near t=0."""
    from whisperseg_tpu.refine import refine_with_frame_tracks

    q = 0.005
    delta = 0.008  # sr=32k: time_delta > quantum/2
    pred = {"onset": [0.1023, 0.0], "offset": [0.2511, 0.05],
            "cluster": ["a", "b"]}
    out = refine_with_frame_tracks(pred, _tracks(T=200, q=q), delta,
                                   search_ms=20.0)
    assert out["onset"] == pred["onset"]
    assert out["offset"] == pred["offset"]
    assert out["onset"][1] >= 0.0


def test_segment_dedups_after_frame_snap(monkeypatch):
    """Review regression: two decoded segments snapping to the same event
    peaks must collapse to ONE output segment (the pre-post-processing dedup
    cannot see them)."""
    import jax

    from whisperseg_tpu.models import init_params
    from whisperseg_tpu.models.config import WhisperConfig
    from whisperseg_tpu.segmenter import Segmenter

    cfg = WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                        num_heads=2, d_ff=128, max_source_positions=50,
                        max_target_positions=32, total_spec_columns=100,
                        compute_dtype="float32", frame_head=True,
                        frame_head_clusters=2)
    seg = Segmenter(init_params(jax.random.PRNGKey(0), cfg), cfg)

    sr, q = 16000, 0.02
    from whisperseg_tpu.constants import fft_time_delta
    delta = fft_time_delta(sr)
    tr = _tracks(T=50, q=q, onset={12: 1.0}, offset={20: 1.0})
    # inject at the fused-path assembly seam (segment() emits tracks from
    # the decode pass; frame_probs is no longer called)
    import whisperseg_tpu.segmenter as seg_mod

    monkeypatch.setattr(seg_mod, "_tracks_from_window_frames",
                        lambda *a, **k: tr)
    # two distinct decoded segments that will both snap to peaks 12/20
    monkeypatch.setattr(
        type(seg), "_parse_generation",
        lambda self, *a, **k: {"onset": [11 * q - delta, 13 * q - delta],
                               "offset": [19 * q + delta, 21 * q + delta],
                               "cluster": ["Vocal", "Vocal"]})
    y = make_bursts([(0.2, 0.4)], sr=sr, duration=1.5)
    pred = seg.segment(y, sr=sr, spec_time_step=0.01, num_trials=1,
                       num_beams=1, max_length=16, batch_size=2,
                       frame_refine_ms=60.0)
    assert len(pred["onset"]) == 1, pred
