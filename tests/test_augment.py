"""Tests for splice-synthesis data augmentation (whisperseg_tpu/augment.py)."""
import numpy as np
import pytest

from whisperseg_tpu.augment import synthesize_training_files


def _make_corpus(sr=4000, n_files=2, seed=0):
    """Tiny fake corpus: sine-burst syllables on low-level noise beds, with
    post-load_data-shaped labels (config keys + cluster_id arrays)."""
    rng = np.random.default_rng(seed)
    audio_list, label_list = [], []
    for _ in range(n_files):
        dur_s = 4.0
        n = int(dur_s * sr)
        audio = (rng.standard_normal(n) * 0.005).astype(np.float32)
        onsets, offsets, clusters = [], [], []
        t = 0.2
        while t < dur_s - 0.4:
            seg = float(rng.uniform(0.05, 0.15))
            s, e = int(t * sr), int((t + seg) * sr)
            tt = np.arange(e - s) / sr
            audio[s:e] += (0.5 * np.sin(2 * np.pi * 800 * tt)).astype(np.float32)
            onsets.append(t)
            offsets.append(t + seg)
            clusters.append("zebra_finch_0")
            t += seg + float(rng.uniform(0.03, 0.2))
        label = {
            "sr": sr, "spec_time_step": 0.0025, "min_frequency": 0,
            "species": "unknown",
            "onset": np.asarray(onsets), "offset": np.asarray(offsets),
            "cluster": clusters,
            "cluster_id": np.zeros(len(onsets), dtype=np.int64),
        }
        audio_list.append(audio)
        label_list.append(label)
    return audio_list, label_list


def test_synthesize_shapes_and_validity():
    audio_list, label_list = _make_corpus()
    sa, sl = synthesize_training_files(audio_list, label_list, 5,
                                       rng=np.random.default_rng(1))
    assert len(sa) == len(sl) == 5
    for audio, label in zip(sa, sl):
        sr = label["sr"]
        assert sr == 4000 and label["spec_time_step"] == 0.0025
        on = np.asarray(label["onset"])
        off = np.asarray(label["offset"])
        assert len(on) > 0
        # monotone, non-overlapping, inside the file
        assert np.all(on[1:] >= off[:-1])
        assert np.all(off > on)
        assert on[0] >= 0 and off[-1] * sr <= len(audio)
        assert len(label["cluster"]) == len(on) == len(label["cluster_id"])
        assert set(label["cluster"]) == {"zebra_finch_0"}
        # energy inside segments clearly exceeds the background
        mask = np.zeros(len(audio), dtype=bool)
        for o, f in zip(on, off):
            mask[int(o * sr):int(f * sr)] = True
        seg_rms = float(np.sqrt(np.mean(audio[mask] ** 2)))
        bg_rms = float(np.sqrt(np.mean(audio[~mask] ** 2))) + 1e-12
        assert seg_rms / bg_rms > 3.0


def test_synthesize_deterministic_under_rng():
    audio_list, label_list = _make_corpus()
    sa1, sl1 = synthesize_training_files(audio_list, label_list, 3,
                                         rng=np.random.default_rng(7))
    sa2, sl2 = synthesize_training_files(audio_list, label_list, 3,
                                         rng=np.random.default_rng(7))
    assert all(np.array_equal(a, b) for a, b in zip(sa1, sa2))
    assert all(np.array_equal(l1["onset"], l2["onset"]) for l1, l2 in zip(sl1, sl2))


def test_synthesize_flows_through_training_pipeline():
    """Synthetic files must survive slicing and the VocalSegDataset item path."""
    from whisperseg_tpu.data import VocalSegDataset, slice_audios_and_labels

    audio_list, label_list = _make_corpus()
    sa, sl = synthesize_training_files(audio_list, label_list, 2,
                                       rng=np.random.default_rng(3))
    a2, l2 = slice_audios_and_labels(sa, sl, total_spec_columns=1000)
    assert len(a2) > 0
    ds = VocalSegDataset(a2, l2, max_length=100, total_spec_columns=1000)
    item = ds[0]
    assert np.isfinite(item["audio_clip"]).all()
    assert item["frontend_key"] == (4000, 0.0025, 0)
    assert item["decoder_input_ids"].shape == item["labels"].shape


def test_synthesize_groups_by_config():
    """Files with different (sr, step) configs never mix in one synthetic file."""
    a1, l1 = _make_corpus(sr=4000, seed=0)
    a2, l2 = _make_corpus(sr=8000, seed=1)
    for l in l2:
        l["spec_time_step"] = 0.001
        l["cluster"] = ["other"] * len(l["cluster"])
        l["cluster_id"] = np.ones(len(l["cluster"]), dtype=np.int64)
    sa, sl = synthesize_training_files(a1 + a2, l1 + l2, 4,
                                       rng=np.random.default_rng(2))
    assert len(sa) >= 2
    for label in sl:
        if label["sr"] == 4000:
            assert set(label["cluster"]) == {"zebra_finch_0"}
        else:
            assert label["sr"] == 8000
            assert set(label["cluster"]) == {"other"}
    assert {l["sr"] for l in sl} == {4000, 8000}


def test_synthesize_no_noise_spans_falls_back_to_silence_bed():
    """A corpus whose files are back-to-back syllables still synthesizes."""
    sr = 4000
    n = int(2.0 * sr)
    tt = np.arange(n) / sr
    audio = (0.3 * np.sin(2 * np.pi * 700 * tt)).astype(np.float32)
    label = {
        "sr": sr, "spec_time_step": 0.0025, "min_frequency": 0,
        "species": "unknown",
        "onset": np.asarray([0.0, 1.0]), "offset": np.asarray([1.0, 2.0]),
        "cluster": ["a", "a"], "cluster_id": np.zeros(2, dtype=np.int64),
    }
    sa, sl = synthesize_training_files([audio], [label], 2,
                                       rng=np.random.default_rng(5))
    assert len(sa) == 2
    for a, l in zip(sa, sl):
        assert len(l["onset"]) > 0
        assert np.isfinite(a).all()
