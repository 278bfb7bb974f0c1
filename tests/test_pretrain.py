"""Synthetic task pretraining (whisperseg_tpu/pretrain.py).

The pretrain module is the in-environment substitute for the reference's
pretrained-Whisper initialization (reference model.py:76-115); these tests
pin the generator's label validity, the pool geometry contract, and the
device-resident scanned trainer end-to-end (tiny model, CPU).
"""

import json
import os

import numpy as np
import pytest

from whisperseg_tpu.pretrain import (PRETRAIN_CONFIGS, PoolSpec, PretrainArgs,
                                     collate_pool, gen_example, make_items,
                                     run_pretraining)


def test_gen_example_labels_valid():
    rng = np.random.RandomState(7)
    for sr, step, minf in PRETRAIN_CONFIGS:
        audio, label = gen_example(rng, sr, step, minf, 1000)
        window_s = 1000 * step
        assert len(audio) == int(round(window_s * 1.1 * sr))
        assert np.all(np.isfinite(audio)) and np.abs(audio).max() <= 1.0
        on, off = label["onset"], label["offset"]
        assert len(on) == len(off) == len(label["cluster_id"]) <= 20
        if len(on):
            assert np.all(off > on)
            assert np.all(on >= 0) and np.all(off <= len(audio) / sr + 1e-9)
            assert np.all(np.diff(on) > 0)  # sequential, non-overlapping
            assert np.all(on[1:] >= off[:-1])
            assert label["cluster_id"].min() >= 0
            assert label["cluster_id"].max() < 5
            # ids canonicalized by first appearance: each new id is exactly
            # one more than the largest id seen so far
            seen = -1
            for cid in label["cluster_id"]:
                assert cid <= seen + 1
                seen = max(seen, int(cid))


def test_gen_example_sometimes_empty():
    rng = np.random.RandomState(0)
    counts = [len(gen_example(rng, 16000, 0.0025, 0.0, 200)[1]["onset"])
              for _ in range(60)]
    assert any(c == 0 for c in counts)  # silence clips exist
    assert any(c >= 5 for c in counts)  # dense clips exist


def test_pool_geometry_fixed_chunks():
    spec = PoolSpec(total_spec_columns=200, max_length=40, chunk=4,
                    configs=((16000, 0.0025, 0.0), (32000, 0.0025, 0.0)))
    items = make_items(0, 5, spec)  # rounds up to 2 configs * 4 = 8
    assert sum(len(it) for _, it in items) == 8
    pool = collate_pool(items, spec)
    assert pool["input_features"].shape == (8, 80, 200)
    assert pool["decoder_input_ids"].shape == (8, 40)
    assert pool["labels"].shape == (8, 40)
    for k in ("vocal", "onset", "offset", "cluster"):
        assert pool["frame_targets"][k].shape == (8, 100)
    # soft boundary tracks are in [0, 1]; cluster ids -1 or < 5
    assert float(pool["frame_targets"]["onset"].max()) <= 1.0
    assert int(pool["frame_targets"]["cluster"].max()) < 5


@pytest.mark.slow
def test_pretrain_end_to_end_then_finetune(tmp_path):
    """Scanned pretraining runs, saves a loadable checkpoint, and train.py's
    loader narrows the 5-cluster frame head for an ignore_cluster finetune."""
    spec = PoolSpec(total_spec_columns=200, max_length=40, chunk=4,
                    configs=((16000, 0.0025, 0.0),))
    out = str(tmp_path / "pt")
    final = run_pretraining(PretrainArgs(
        model="tiny", model_folder=out, steps=10, batch_size=2, pool_items=4,
        refresh_every=10, steps_per_call=5, warmup_steps=2, save_every=10,
        spec=spec))
    assert final and os.path.isdir(final)
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert lines and all(np.isfinite(l["train/loss"]) for l in lines)

    from whisperseg_tpu.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(final)
    assert cfg.frame_head and cfg.frame_head_clusters == 5
    assert params["frame_head"]["h2_w"].shape[-1] == 3 + 5

    # the finetune entry narrows the head (ensure_frame_head keeps channels)
    import jax

    from whisperseg_tpu.models.whisper import ensure_frame_head

    cfg.frame_head_clusters = 1
    narrowed = ensure_frame_head(params, cfg, jax.random.PRNGKey(0))
    assert narrowed["frame_head"]["h2_w"].shape[-1] == 4
    np.testing.assert_array_equal(
        np.asarray(narrowed["frame_head"]["h2_w"])[:, :4],
        np.asarray(params["frame_head"]["h2_w"])[:, :4])


@pytest.mark.slow
def test_device_pool_finetune_end_to_end(tmp_path):
    """--device_pool trains real wav+json data through the scanned
    device-resident path and produces a loadable final checkpoint with the
    same artifact layout as the streaming loop."""
    import wave

    from whisperseg_tpu.pretrain import gen_example
    from whisperseg_tpu.training.trainer import TrainArgs, run_training

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(5)
    for i in range(2):
        a, l = gen_example(rng, 16000, 0.0025, 0.0, 200)
        with wave.open(str(data / f"f{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((np.clip(a, -1, 1) * 32767).astype("<i2").tobytes())
        (data / f"f{i}.json").write_text(json.dumps(
            {"sr": 16000, "spec_time_step": 0.0025, "min_frequency": 0.0,
             "onset": [float(t) for t in l["onset"]],
             "offset": [float(t) for t in l["offset"]],
             "cluster": ["Vocal"] * len(l["onset"])}))

    out = str(tmp_path / "model")
    final = run_training(TrainArgs(
        initial_model_path="tiny", model_folder=out,
        train_dataset_folder=str(data), max_num_iterations=8,
        min_num_iterations=1, batch_size=2, total_spec_columns=200,
        max_length=40, frame_head=True, ignore_cluster=True,
        learning_rate=5e-4, save_every=8, num_workers=1, device_pool=True,
        timestamp_label_sigma=1.0, n_device=1))
    assert final and os.path.isdir(final)
    from whisperseg_tpu.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(final)
    assert cfg.frame_head and "frame_head" in params
    lines = [json.loads(x)
             for x in open(os.path.join(out, "metrics.jsonl"))]
    assert lines and all(np.isfinite(x["train/loss"]) for x in lines)
    assert lines[-1]["current_step"] == 8
    # multi-device request must be rejected explicitly
    import jax

    if len(jax.devices()) > 1:
        with pytest.raises(ValueError, match="single-device"):
            run_training(TrainArgs(
                initial_model_path="tiny", model_folder=str(tmp_path / "m2"),
                train_dataset_folder=str(data), max_num_iterations=2,
                min_num_iterations=1, batch_size=2, total_spec_columns=200,
                max_length=40, device_pool=True))
