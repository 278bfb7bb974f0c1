"""Tests for the auxiliary encoder frame head (beyond reference).

The head predicts vocal activity / onset events / offset events / cluster ids
per encoder position (= one decoder timestamp quantum), trained jointly with
the seq2seq objective; it powers learned boundary refinement and the
decoder-free frame-VAD mode (Segmenter.segment_from_frames).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperseg_tpu.data import build_frame_targets
from whisperseg_tpu.models.config import WhisperConfig
from whisperseg_tpu.models.whisper import (
    encoder_forward,
    ensure_frame_head,
    frame_head_forward,
    frame_head_loss,
    init_frame_head,
    init_params,
)


def tiny_cfg(**kw):
    base = dict(d_model=64, encoder_layers=1, decoder_layers=1, num_heads=2,
                d_ff=128, max_source_positions=50, max_target_positions=32,
                total_spec_columns=100, compute_dtype="float32",
                frame_head=True, frame_head_clusters=3)
    base.update(kw)
    return WhisperConfig(**base)


# ------------------------------------------------------------------- targets


def test_build_frame_targets_hand_case():
    # quantum = 0.01 * 2 = 0.02 s, S = 100 // 2 = 50 positions
    t = build_frame_targets(onsets=[0.10], offsets=[0.20], cluster_ids=[2],
                            spec_time_step=0.01, total_spec_columns=100,
                            sigma=0.0)
    assert t["vocal"].shape == (50,)
    # onset at col 5, offset at col 10 -> vocal on [5, 10)
    assert t["vocal"][4] == 0 and t["vocal"][5] == 1
    assert t["vocal"][9] == 1 and t["vocal"][10] == 0
    assert t["onset"][5] == 1 and t["onset"].sum() == 1
    assert t["offset"][10] == 1 and t["offset"].sum() == 1
    assert t["cluster"][7] == 2 and t["cluster"][4] == -1


def test_build_frame_targets_sigma_smooths_and_clips_edge():
    t = build_frame_targets([0.0], [1.0], [0], spec_time_step=0.01,
                            total_spec_columns=100, sigma=1.0)
    # offset quantizes to col 50 == S -> event marker clips to the last position
    assert t["offset"][49] == pytest.approx(1.0)
    # Gaussian tails present around the onset at col 0
    assert 0 < t["onset"][1] < 1
    assert t["vocal"].sum() == 50  # fully vocal


def test_build_frame_targets_zero_length_segment_still_marks_one_position():
    t = build_frame_targets([0.201], [0.201], [1], spec_time_step=0.01,
                            total_spec_columns=100, sigma=0.0)
    assert t["vocal"].sum() == 1
    assert t["vocal"][10] == 1


# -------------------------------------------------------------- model + loss


def test_frame_head_forward_shapes_and_loss_grads():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "frame_head" in params
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 80, 100), jnp.float32)
    enc = encoder_forward(params, cfg, feats)
    logits = frame_head_forward(params, cfg, enc)
    assert logits.shape == (2, 50, 3 + 3)

    targets = {
        "vocal": jnp.zeros((2, 50)).at[:, 10:20].set(1.0),
        "onset": jnp.zeros((2, 50)).at[:, 10].set(1.0),
        "offset": jnp.zeros((2, 50)).at[:, 20].set(1.0),
        "cluster": jnp.full((2, 50), -1, jnp.int32).at[:, 10:20].set(1),
    }

    def loss_fn(p):
        return frame_head_loss(frame_head_forward(p, cfg, encoder_forward(p, cfg, feats)),
                               targets)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g = grads["frame_head"]["h2_w"]
    assert float(jnp.abs(g).sum()) > 0
    # encoder receives gradient through the head too
    assert float(jnp.abs(grads["encoder"]["conv1_w"]).sum()) > 0


def test_frame_head_loss_ignores_unlabeled_cluster_positions():
    logits = jnp.zeros((1, 8, 3 + 2))
    base = {
        "vocal": jnp.zeros((1, 8)), "onset": jnp.zeros((1, 8)),
        "offset": jnp.zeros((1, 8)),
        "cluster": jnp.full((1, 8), -1, jnp.int32),
    }
    all_ignored = frame_head_loss(logits, base)
    labeled = frame_head_loss(logits, {**base,
                                       "cluster": base["cluster"].at[0, 0].set(1)})
    assert labeled > all_ignored  # the CE term only appears with labels


def test_frame_head_loss_boundary_weight_scales_cut_channels():
    # nonzero onset/offset logits so the boundary terms carry loss
    logits = jnp.zeros((1, 8, 3)).at[..., 1].set(2.0).at[..., 2].set(-1.0)
    targets = {
        "vocal": jnp.zeros((1, 8)),
        "onset": jnp.zeros((1, 8)),
        "offset": jnp.ones((1, 8)),
    }
    base = frame_head_loss(logits, targets)
    up = frame_head_loss(logits, targets, boundary_weight=4.0)
    # decomposition: loss = vocal + w * (onset + offset)
    vocal_only = frame_head_loss(logits, targets, boundary_weight=0.0)
    cut = base - vocal_only
    assert cut > 0
    assert jnp.allclose(up, vocal_only + 4.0 * cut, rtol=1e-6)


def test_ensure_frame_head_adds_and_widens():
    cfg = tiny_cfg(frame_head_clusters=0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bare = {"encoder": params["encoder"], "decoder": params["decoder"]}
    added = ensure_frame_head(bare, cfg, jax.random.PRNGKey(1))
    assert added["frame_head"]["h2_w"].shape[-1] == 3

    # widening to 5 clusters keeps the trained first 3 outputs
    cfg5 = tiny_cfg(frame_head_clusters=5)
    wide = ensure_frame_head(added, cfg5, jax.random.PRNGKey(2))
    assert wide["frame_head"]["h2_w"].shape[-1] == 8
    np.testing.assert_allclose(np.asarray(wide["frame_head"]["h2_w"])[:, :3],
                               np.asarray(added["frame_head"]["h2_w"]))
    # unchanged head passes through untouched
    same = ensure_frame_head(wide, cfg5, jax.random.PRNGKey(3))
    assert same["frame_head"] is wide["frame_head"]


def test_train_step_with_frame_head_decreases_loss():
    import optax

    from whisperseg_tpu.training.trainer import build_train_step

    cfg = tiny_cfg(frame_head_clusters=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = build_train_step(cfg, opt, frame_head_weight=1.0)

    rs = np.random.RandomState(1)
    batch = {
        "input_features": jnp.asarray(rs.randn(2, 80, 100), jnp.float32),
        "decoder_input_ids": jnp.asarray(rs.randint(0, 50, (2, 8)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, 50, (2, 8)), jnp.int32),
        "frame_targets": {
            "vocal": jnp.zeros((2, 50)).at[:, 5:15].set(1.0),
            "onset": jnp.zeros((2, 50)).at[:, 5].set(1.0),
            "offset": jnp.zeros((2, 50)).at[:, 15].set(1.0),
            "cluster": jnp.full((2, 50), -1, jnp.int32).at[:, 5:15].set(1),
        },
    }
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(25):
        params, opt_state, loss = step(params, opt_state, batch, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_freeze_encoder_with_frame_head_params():
    from whisperseg_tpu.training.trainer import make_optimizer

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt, _ = make_optimizer(params, 1e-4, 0.01, 0, 100, "linear",
                            freeze_encoder=True)  # warmup 0: lr > 0 at step 0
    state = opt.init(params)  # would raise if the label tree mismatched

    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    assert float(jnp.abs(updates["encoder"]["conv1_w"]).sum()) == 0.0
    assert float(jnp.abs(updates["frame_head"]["h2_w"]).sum()) > 0.0


# ----------------------------------------------------------- dataset plumbing


def test_dataset_emits_frame_targets():
    from whisperseg_tpu.data import VocalSegDataset

    sr = 16000
    audio = np.random.RandomState(0).randn(sr).astype(np.float32) * 0.01
    label = {"sr": sr, "spec_time_step": 0.01, "min_frequency": 0,
             "species": "unknown",
             "onset": np.array([0.1]), "offset": np.array([0.3]),
             "cluster_id": np.array([0])}
    ds = VocalSegDataset([audio], [label], max_length=20,
                         total_spec_columns=100, frame_targets=True)
    item = ds[0]
    assert set(item["frame_targets"]) == {"vocal", "onset", "offset", "cluster"}
    assert item["frame_targets"]["vocal"].shape == (50,)
    batch = ds.collate([item, ds[0]])
    assert batch["frame_targets"]["vocal"].shape == (2, 50)
    assert batch["frame_targets"]["cluster"].dtype == np.int32


# -------------------------------------------------------- checkpoint roundtrip


def test_checkpoint_roundtrip_preserves_frame_head(tmp_path):
    from whisperseg_tpu.checkpoint import load_checkpoint, save_checkpoint

    cfg = tiny_cfg(frame_head_clusters=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    save_checkpoint(str(tmp_path / "ck"), params, cfg)
    p2, cfg2 = load_checkpoint(str(tmp_path / "ck"))
    assert cfg2.frame_head and cfg2.frame_head_clusters == 2
    np.testing.assert_allclose(np.asarray(p2["frame_head"]["h2_w"]),
                               np.asarray(params["frame_head"]["h2_w"]),
                               rtol=1e-6)


# -------------------------------------------------------------- segmenter API


def make_segmenter(cfg=None):
    from whisperseg_tpu.segmenter import Segmenter

    cfg = cfg or tiny_cfg(frame_head_clusters=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return Segmenter(params, cfg, inference_dtype="float32")


def test_frame_probs_shapes_and_range():
    seg = make_segmenter()
    sr = 16000
    audio = np.random.RandomState(0).randn(int(1.5 * sr)).astype(np.float32)
    tracks = seg.frame_probs(audio, sr=sr, spec_time_step=0.01, batch_size=2)
    quantum = 0.02
    n_t = int(np.ceil(1.5 / quantum))
    for k in ("vocal", "onset", "offset"):
        assert tracks[k].shape == (n_t,)
        assert np.all((tracks[k] >= 0) & (tracks[k] <= 1))
    assert tracks["cluster"].shape == (n_t,)
    assert tracks["quantum"] == pytest.approx(quantum)


def test_frame_probs_requires_head():
    seg = make_segmenter(tiny_cfg(frame_head=False, frame_head_clusters=0))
    with pytest.raises(ValueError, match="frame head"):
        seg.frame_probs(np.zeros(16000, np.float32), sr=16000,
                        spec_time_step=0.01)


def test_segment_from_frames_extracts_runs_cuts_and_snaps(monkeypatch):
    """Deterministic end-to-end check of the run/cut/snap logic on crafted
    probability tracks (the model itself is untrained)."""
    seg = make_segmenter()
    seg.cluster_codebook = {"a": 0, "b": 1}
    seg.config.cluster_codebook = dict(seg.cluster_codebook)

    T, q = 50, 0.02
    vocal = np.zeros(T, np.float32)
    onset = np.zeros(T, np.float32)
    offset = np.zeros(T, np.float32)
    cluster = np.zeros(T, np.int32)
    # one long vocal run [10, 30) that is actually TWO vocalizations glued at
    # position 20 (both event tracks fire there), plus a clean run [35, 40)
    vocal[10:30] = 1.0
    vocal[35:40] = 1.0
    onset[10] = 1.0
    onset[20] = 0.9
    offset[20] = 0.9
    offset[30] = 1.0
    onset[35] = 1.0
    offset[40] = 1.0
    cluster[10:20] = 0
    cluster[20:30] = 1
    cluster[35:40] = 1

    tracks = {"vocal": vocal, "onset": onset, "offset": offset,
              "cluster": cluster, "quantum": q}
    monkeypatch.setattr(type(seg), "frame_probs",
                        lambda self, *a, **k: tracks)

    sr = 16000
    audio = np.zeros(sr, np.float32)  # 1 s; fft_time_delta(16000)=512/2/16000=0.016
    pred = seg.segment_from_frames(audio, sr=sr, spec_time_step=0.01)
    assert pred["cluster"] == ["a", "b", "b"]
    delta = 512 / 2 / 16000
    np.testing.assert_allclose(
        pred["onset"], [10 * q + delta, 20 * q + delta, 35 * q + delta],
        atol=1e-9)
    np.testing.assert_allclose(
        pred["offset"], [20 * q - delta, 30 * q - delta, 40 * q - delta],
        atol=1e-9)


def test_segment_from_frames_empty_on_silence(monkeypatch):
    seg = make_segmenter()
    T = 50
    tracks = {"vocal": np.zeros(T, np.float32), "onset": np.zeros(T, np.float32),
              "offset": np.zeros(T, np.float32),
              "cluster": np.zeros(T, np.int32), "quantum": 0.02}
    monkeypatch.setattr(type(seg), "frame_probs", lambda self, *a, **k: tracks)
    pred = seg.segment_from_frames(np.zeros(16000, np.float32), sr=16000,
                                   spec_time_step=0.01)
    assert pred == {"onset": [], "offset": [], "cluster": []}


def test_segment_from_frames_parabolic_interpolation(monkeypatch):
    """An asymmetric peak pulls the boundary off the integer grid."""
    seg = make_segmenter(tiny_cfg(frame_head_clusters=0))
    T, q = 50, 0.02
    vocal = np.zeros(T, np.float32)
    onset = np.zeros(T, np.float32)
    offset = np.zeros(T, np.float32)
    vocal[10:20] = 1.0
    onset[9], onset[10], onset[11] = 0.6, 1.0, 0.2  # peak biased left of 10
    offset[20] = 1.0
    tracks = {"vocal": vocal, "onset": onset, "offset": offset,
              "cluster": np.full(T, -1, np.int32), "quantum": q}
    monkeypatch.setattr(type(seg), "frame_probs", lambda self, *a, **k: tracks)
    pred = seg.segment_from_frames(np.zeros(16000, np.float32), sr=16000,
                                   spec_time_step=0.01)
    delta = 512 / 2 / 16000
    # interpolated onset position: 10 + 0.5*(0.6-0.2)/(0.6-2+0.2) = 10 - 1/6
    expect = (10 - 1.0 / 6.0) * q + delta
    assert pred["onset"][0] == pytest.approx(round(expect, 3), abs=2e-3)
    assert pred["cluster"] == ["Vocal"]


# ------------------------------------------------------- end-to-end training


def test_frame_head_end_to_end_training(tmp_path):
    """run_training with --frame_head on the synthetic tone dataset: the
    checkpoint carries the head + config, and the trained vocal track
    separates tone bursts from silence."""
    from test_training import make_tone_dataset, tiny_ckpt

    from whisperseg_tpu.segmenter import Segmenter
    from whisperseg_tpu.training import TrainArgs, run_training

    data_dir = make_tone_dataset(str(tmp_path / "data"), n_files=4)
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
        max_num_iterations=300,
        min_num_iterations=300,
        print_every=100,
        val_ratio=0.0,
        seed=7,
        frame_head=True,
        frame_head_weight=2.0,
    )
    final = run_training(args)
    assert final is not None

    seg = Segmenter.from_pretrained(final, inference_dtype="float32")
    assert seg.config.frame_head
    assert "frame_head" in seg.params

    # one of the training files: bursts are loud 2 kHz tones
    import json as _json

    label = _json.load(open(data_dir + "/f0.json"))
    from whisperseg_tpu.audio.io import load_audio

    audio, sr = load_audio(data_dir + "/f0.wav", sr=label["sr"])
    tracks = seg.frame_probs(audio, sr=sr, spec_time_step=0.01)
    q = tracks["quantum"]
    inside = np.zeros(len(tracks["vocal"]), bool)
    for on, off in zip(label["onset"], label["offset"]):
        inside[int(np.round(on / q)):int(np.round(off / q))] = True
    assert tracks["vocal"][inside].mean() > tracks["vocal"][~inside].mean()

    # the decoder-free mode produces a sane prediction dict
    pred = seg.segment_from_frames(audio, sr=sr, spec_time_step=0.01)
    assert set(pred) == {"onset", "offset", "cluster"}
    for on, off in zip(pred["onset"], pred["offset"]):
        assert 0 <= on < off <= len(audio) / sr + 1e-6


# ------------------------------------------------- frame-mode threshold fitting


def test_segment_from_frames_reads_fitted_thresholds(monkeypatch):
    """Thresholds stored in default_segmentation_config (fit_frame_mode
    --write) change the run extraction; explicit args still win."""
    seg = make_segmenter()
    T, q = 50, 0.02
    vocal = np.zeros(T, np.float32)
    vocal[10:20] = 0.4   # below the literal 0.5 default
    tracks = {"vocal": vocal, "onset": np.zeros(T, np.float32),
              "offset": np.zeros(T, np.float32),
              "cluster": np.full(T, -1, np.int32), "quantum": q}
    monkeypatch.setattr(type(seg), "frame_probs", lambda self, *a, **k: tracks)
    audio = np.zeros(16000, np.float32)

    # literal default 0.5: the 0.4-probability run is invisible
    assert seg.segment_from_frames(audio, sr=16000, spec_time_step=0.01
                                   )["onset"] == []
    # fitted default activates
    seg.default_segmentation_config["frame_vocal_threshold"] = 0.3
    assert len(seg.segment_from_frames(audio, sr=16000, spec_time_step=0.01
                                       )["onset"]) == 1
    # explicit arg overrides the fitted default (0.6 hides the 0.4 run even
    # though the fitted default 0.3 would show it)
    assert seg.segment_from_frames(audio, sr=16000, spec_time_step=0.01,
                                   vocal_threshold=0.35)["onset"] != []
    assert seg.segment_from_frames(audio, sr=16000, spec_time_step=0.01,
                                   vocal_threshold=0.6)["onset"] == []


def test_fit_frame_mode_selects_lower_vocal_threshold():
    """When the head under-fires (probabilities ~0.35), the grid fit picks a
    lower vocal threshold that recovers the segments."""
    from whisperseg_tpu.refine import fit_frame_mode

    q = 0.02
    delta = 512 / 2 / 16000  # 0.016
    T = 100
    vocal = np.zeros(T, np.float32)
    onset = np.zeros(T, np.float32)
    offset = np.zeros(T, np.float32)
    vocal[10:20] = 0.35
    vocal[40:50] = 0.35
    onset[10] = onset[40] = 0.9
    offset[20] = offset[50] = 0.9
    tracks = {"vocal": vocal, "onset": onset, "offset": offset,
              "cluster": np.zeros(T, np.int32), "quantum": q}
    label = {"onset": [10 * q + delta, 40 * q + delta],
             "offset": [20 * q - delta, 50 * q - delta],
             "cluster": ["Vocal", "Vocal"], "tolerance": 0.02,
             "spec_time_step": 0.01}
    params, table = fit_frame_mode(
        [tracks], [label], [2.0], [delta], {0: "Vocal"},
        vocal_threshold=(0.3, 0.5), cut_threshold=(0.5,), boundary_snap=(2,),
        gap_cut=(0,))
    assert params.get("frame_vocal_threshold") == 0.3, (params, table)
    assert table["vt_0.3+ct_0.5+snap_2+gap_0"]["segment_F1"] == 1.0
    assert table["vt_0.5+ct_0.5+snap_2+gap_0"]["segment_F1"] == 0.0


def test_fit_frame_mode_defaults_win_ties():
    """When every combination scores the same, the fit returns {} (defaults)."""
    from whisperseg_tpu.refine import fit_frame_mode

    T, q = 50, 0.02
    delta = 0.016
    vocal = np.zeros(T, np.float32)
    vocal[10:20] = 0.9
    tracks = {"vocal": vocal, "onset": np.zeros(T, np.float32),
              "offset": np.zeros(T, np.float32),
              "cluster": np.zeros(T, np.int32), "quantum": q}
    label = {"onset": [10 * q + delta], "offset": [20 * q - delta],
             "cluster": ["Vocal"], "tolerance": 0.05, "spec_time_step": 0.01}
    params, _ = fit_frame_mode(
        [tracks], [label], [1.0], [delta], {0: "Vocal"},
        vocal_threshold=(0.3, 0.5), cut_threshold=(0.5,), boundary_snap=(2,))
    assert params == {}


def _pause_tracks(T=60, q=0.02):
    """One vocal run [10, 30) that is really TWO spans with a 3-quantum
    pause the vocal track never dips through: offset event at 20, onset
    event at 23."""
    vocal = np.zeros(T, np.float32)
    onset = np.zeros(T, np.float32)
    offset = np.zeros(T, np.float32)
    vocal[10:30] = 1.0
    onset[10] = 1.0
    offset[20] = 0.9
    onset[23] = 0.9
    offset[30] = 1.0
    return {"vocal": vocal, "onset": onset, "offset": offset,
            "cluster": np.zeros(T, np.int32), "quantum": q}


def test_segments_from_tracks_gap_cut_splits_subfloor_pause():
    """gap_cut pairs an offset event with a following onset event across a
    pause the vocal track never dips through (the human-AVA / meerkat
    merged-adjacent-spans failure, RESULTS.md round-4); 0 preserves the
    same-position-only behavior."""
    from whisperseg_tpu.refine import segments_from_tracks

    q = 0.02
    delta = 512 / 2 / 16000
    tracks = _pause_tracks(q=q)
    merged = segments_from_tracks(tracks, 2.0, delta, {0: "Vocal"},
                                  gap_cut=0)
    assert len(merged["onset"]) == 1  # events 3 quanta apart: no cut at 0
    split = segments_from_tracks(tracks, 2.0, delta, {0: "Vocal"},
                                 gap_cut=4)
    assert len(split["onset"]) == 2
    np.testing.assert_allclose(split["onset"], [10 * q + delta, 23 * q + delta],
                               atol=1e-9)
    np.testing.assert_allclose(split["offset"], [20 * q - delta, 30 * q - delta],
                               atol=1e-9)


def test_fit_frame_mode_selects_gap_cut():
    """When ground truth has the pause, the grid fit turns the gap cut on."""
    from whisperseg_tpu.refine import fit_frame_mode

    q = 0.02
    delta = 512 / 2 / 16000
    tracks = _pause_tracks(q=q)
    label = {"onset": [10 * q + delta, 23 * q + delta],
             "offset": [20 * q - delta, 30 * q - delta],
             "cluster": ["Vocal", "Vocal"], "tolerance": 0.02,
             "spec_time_step": 0.01}
    params, table = fit_frame_mode(
        [tracks], [label], [2.0], [delta], {0: "Vocal"},
        vocal_threshold=(0.5,), cut_threshold=(0.5,), boundary_snap=(2,),
        gap_cut=(0, 4))
    assert params.get("frame_gap_cut") == 4, (params, table)
    assert table["vt_0.5+ct_0.5+snap_2+gap_4"]["segment_F1"] == 1.0
    assert table["vt_0.5+ct_0.5+snap_2+gap_0"]["segment_F1"] < 1.0


# ------------------------------------------------- fused decode+frames pass


def test_fused_frame_tracks_match_frame_probs():
    """segment() with fitted frame knobs must get its tracks from the decode
    pass's own encoder run (trial-0 windows == frame_probs' windows), not a
    second encoder pass — and the tracks must match frame_probs exactly."""
    from whisperseg_tpu.segmenter import _tracks_from_window_frames

    seg = make_segmenter()
    sr = 16000
    audio = np.random.RandomState(7).randn(int(1.7 * sr)).astype(np.float32)
    step = 0.01

    two_pass = seg.frame_probs(audio, sr=sr, spec_time_step=step,
                               batch_size=2)

    from whisperseg_tpu.audio.frontend import Frontend

    clips, meta = seg.slice_audio_windows(audio, sr, step, num_trials=2)
    frontend = Frontend(sr, step, 0)
    _, probs, cl = seg._generate_tokens(
        clips, frontend, 2, 16, 1, 1, 1.0, 0, None, collect_frames=True)
    n0 = sum(1 for m in meta if m[0] == 0)
    fused = _tracks_from_window_frames(probs[:n0], cl[:n0],
                                       len(audio) / sr, step)

    for k in ("vocal", "onset", "offset"):
        np.testing.assert_allclose(fused[k], two_pass[k], atol=1e-5)
    np.testing.assert_array_equal(fused["cluster"], two_pass["cluster"])
    assert fused["quantum"] == two_pass["quantum"]


def test_segment_with_fitted_knobs_skips_second_encoder_pass(monkeypatch):
    """With fitted frame post-processing active, segment() must not call
    frame_probs (the old second full encoder pass) — and its output must
    equal applying the post-processing to the two-pass tracks."""
    from whisperseg_tpu.refine import apply_frame_postprocess
    from whisperseg_tpu.constants import fft_time_delta
    from whisperseg_tpu.segmenter import (_blur_correct_and_dedup,
                                          _round_and_rededup)

    seg = make_segmenter()
    sr = 16000
    audio = np.random.RandomState(8).randn(int(1.3 * sr)).astype(np.float32)
    kw = dict(spec_time_step=0.01, min_frequency=0, batch_size=2,
              num_beams=1, top_k=1, max_length=16, num_trials=1)

    # expected: the plain decode output put through the post-processing with
    # independently computed (two-pass) tracks
    plain_tokens_tracks = seg.frame_probs(audio, sr=sr, spec_time_step=0.01,
                                          batch_size=2)

    calls = []
    orig = type(seg).frame_probs
    monkeypatch.setattr(type(seg), "frame_probs",
                        lambda self, *a, **k: calls.append(1) or orig(self, *a, **k))
    got = seg.segment(audio, sr, frame_refine_ms=20.0, frame_filter=0.01,
                      **kw)
    assert calls == [], "segment() ran the second encoder pass"

    # two-pass expected output: re-run the pre-postprocessing pipeline, then
    # apply the frame post-processing with the independent tracks
    clips, meta = seg.slice_audio_windows(audio, sr, 0.01, 1)
    from whisperseg_tpu.audio.frontend import Frontend

    tokens = seg._generate_tokens(clips, Frontend(sr, 0.01, 0), 2, 16, 1, 1,
                                  1.0, 0, None)
    final = seg._parse_generation(tokens, meta, 0.02, len(audio) / sr,
                                  0.01, 1, 0.08, 0.01, "clustering")
    delta = fft_time_delta(sr)
    final = _blur_correct_and_dedup(final, delta)
    final = apply_frame_postprocess(final, plain_tokens_tracks, delta,
                                    frame_split=0, frame_refine_ms=20.0,
                                    frame_filter=0.01, min_len_s=0.02)
    expected = _round_and_rededup(final, seg.precision_bits)
    assert got == expected
