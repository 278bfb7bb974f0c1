import json
import os
import wave

import numpy as np
import pytest

from whisperseg_tpu import tokenizer as tok
from whisperseg_tpu.data import (
    DataLoader,
    VocalSegDataset,
    determine_default_config,
    get_audio_and_label_paths,
    get_cluster_codebook,
    load_data,
    read_label,
    slice_audio_and_label,
    split_audio_and_label,
    train_val_split,
)


def write_wav(path, y, sr):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


def make_dataset_dir(tmp_path, n_files=2, sr=16000, dur=2.0):
    for i in range(n_files):
        t = np.arange(int(sr * dur)) / sr
        y = 0.01 * np.random.RandomState(i).randn(len(t))
        onsets, offsets = [0.3, 1.0], [0.5, 1.4]
        for a, b in zip(onsets, offsets):
            seg = slice(int(a * sr), int(b * sr))
            y[seg] += 0.8 * np.sin(2 * np.pi * 2000 * t[seg])
        write_wav(tmp_path / f"f{i}.wav", y, sr)
        json.dump(
            {"onset": onsets, "offset": offsets, "cluster": ["a", "b"],
             "sr": sr, "spec_time_step": 0.01, "min_frequency": 0},
            open(tmp_path / f"f{i}.json", "w"),
        )
    return str(tmp_path)


def test_read_label_json(tmp_path):
    p = tmp_path / "l.json"
    json.dump({"onset": [0.1], "offset": [0.2]}, open(p, "w"))
    label = read_label(str(p), default_config={"sr": 16000})
    assert label["cluster"] == ["Vocal"]
    assert label["sr"] == 16000
    assert label["species"] == "unknown"


def test_read_label_csv(tmp_path):
    p = tmp_path / "l.csv"
    p.write_text("onset,offset,cluster\n0.1,0.2,5\n0.3,0.4,7\n")
    label = read_label(str(p))
    assert label["cluster"] == ["5", "7"]  # clusters stringified


def test_read_label_ignore_cluster(tmp_path):
    p = tmp_path / "l.json"
    json.dump({"onset": [0.1], "offset": [0.2], "cluster": ["x"]}, open(p, "w"))
    assert read_label(str(p), ignore_cluster=True)["cluster"] == ["Vocal"]


def test_path_pairing(tmp_path):
    write_wav(tmp_path / "a.wav", np.zeros(100), 16000)
    json.dump({"onset": [], "offset": []}, open(tmp_path / "a.json", "w"))
    write_wav(tmp_path / "b.wav", np.zeros(100), 16000)
    (tmp_path / "b.csv").write_text("onset,offset\n")
    write_wav(tmp_path / "c.wav", np.zeros(100), 16000)  # no label -> skipped
    audio, labels = get_audio_and_label_paths(str(tmp_path))
    stems = sorted(os.path.basename(p) for p in labels)
    assert stems == ["a.json", "b.csv"]


def test_determine_default_config(tmp_path):
    make_dataset_dir(tmp_path)
    audio, labels = get_audio_and_label_paths(str(tmp_path))
    cfg = determine_default_config(audio, labels, total_spec_columns=1000)
    assert cfg["sr"] == 16000
    assert cfg["min_frequency"] == 0
    # median segment dur (with blur widening 2*0.016) = 0.332 ->
    # ceil(0.332*25/0.5)*0.5/1000 = 8.5/1000
    assert cfg["spec_time_step"] == pytest.approx(0.0085)


def test_cluster_codebook(tmp_path):
    make_dataset_dir(tmp_path)
    _, labels = get_audio_and_label_paths(str(tmp_path))
    cb = get_cluster_codebook(labels, {"pre": 0})
    assert cb == {"pre": 0, "a": 1, "b": 2}


def test_load_data_corrections(tmp_path):
    make_dataset_dir(tmp_path, n_files=3)
    audio_paths, label_paths = get_audio_and_label_paths(str(tmp_path))
    cb = get_cluster_codebook(label_paths, {})
    audio_list, label_list = load_data(audio_paths, label_paths, cb, n_threads=2,
                                       default_config={"sr": 16000,
                                                       "spec_time_step": 0.01,
                                                       "min_frequency": 0})
    assert len(audio_list) == 3
    lab = label_list[0]
    td = 512 / 2 / 16000
    np.testing.assert_allclose(lab["onset"], [0.3 - td, 1.0 - td])
    np.testing.assert_allclose(lab["offset"], [0.5 + td, 1.4 + td])
    assert lab["cluster_id"].tolist() == [cb["a"], cb["b"]]


def _label(sr=16000, onsets=(0.3, 1.0), offsets=(0.5, 1.4)):
    return {
        "sr": sr, "spec_time_step": 0.01, "min_frequency": 0,
        "species": "unknown",
        "onset": np.asarray(onsets), "offset": np.asarray(offsets),
        "cluster": ["a", "b"][: len(onsets)],
        "cluster_id": np.asarray([0, 1][: len(onsets)]),
    }


def test_split_audio_and_label():
    audio = np.zeros(32000, np.float32)
    label = _label()
    (a1, l1), (a2, l2) = split_audio_and_label(audio, label, 0.5)
    assert len(a1) == 16000 and len(a2) == 16000
    # segment [0.3,0.5] entirely in part1; [1.0,1.4] in part2 shifted by 1.0
    np.testing.assert_allclose(l1["onset"], [0.3])
    np.testing.assert_allclose(l1["offset"], [0.5])
    np.testing.assert_allclose(l2["onset"], [0.0])
    np.testing.assert_allclose(l2["offset"], [0.4])


def test_split_boundary_crossing_clipped():
    audio = np.zeros(32000, np.float32)
    label = _label(onsets=(0.8,), offsets=(1.2,))
    (a1, l1), (a2, l2) = split_audio_and_label(audio, label, 0.5)
    np.testing.assert_allclose(l1["onset"], [0.8])
    np.testing.assert_allclose(l1["offset"], [1.0])
    np.testing.assert_allclose(l2["onset"], [0.0])
    np.testing.assert_allclose(l2["offset"], [0.2])


def test_split_short_part_dropped():
    audio = np.zeros(16000, np.float32)
    label = _label(onsets=(0.1,), offsets=(0.2,))
    (a1, l1), (a2, l2) = split_audio_and_label(audio, label, 0.99)
    assert a2 is None and l2 is None
    assert a1 is not None


def test_train_val_split_seeded():
    np.random.seed(0)
    audios = [np.zeros(32000, np.float32) for _ in range(4)]
    labels = [_label() for _ in range(4)]
    (ta, tl), (va, vl) = train_val_split(audios, labels, 0.25)
    assert len(ta) + len(va) >= 4  # all files produce at least one part
    for l in tl + vl:
        assert (l["offset"] >= l["onset"]).all()


def test_slice_audio_and_label_geometry():
    # clip_duration = 100 * 0.01 = 1 s; audio 2.5 s
    audio = np.ones(40000, np.float32)
    label = _label()
    clips, lclips = slice_audio_and_label(audio, label, total_spec_columns=100)
    # padded audio = 1s zero + 2.5s = 3.5s -> windows at 0,1,2,3 s each 2 s
    assert len(clips) == 4
    assert len(clips[0]) == 32000
    # first clip: [0,2) of padded = 1 s zeros + first second; segment 0.3->1.3
    np.testing.assert_allclose(lclips[0]["onset"], [1.3])
    np.testing.assert_allclose(lclips[0]["offset"], [1.5])
    # last clip starts at 3 s, holds 0.5 s audio
    assert len(clips[-1]) == 8000


def test_dataset_item_and_collate():
    np.random.seed(0)
    audio = np.concatenate([np.zeros(4000), np.ones(8000) * 0.5, np.zeros(4000)])
    label = _label(onsets=(0.25,), offsets=(0.75,))
    ds = VocalSegDataset([audio.astype(np.float32)], [label], max_length=20,
                         total_spec_columns=100)
    item = ds[0]
    assert item["audio_clip"].shape == (16000,)
    assert item["decoder_input_ids"].shape == (20,)
    assert item["labels"].shape == (20,)
    assert item["decoder_input_ids"][0] == tok.SOT_ID
    batch = ds.collate([item, ds[0]])
    assert batch["input_features"].shape == (2, 80, 100)
    assert batch["decoder_input_ids"].shape == (2, 20)
    assert np.isfinite(batch["input_features"]).all()


def test_dataset_label_tokens_follow_crop():
    from whisperseg_tpu import codec

    sr = 16000
    audio = np.zeros(16000, np.float32)
    label = _label(onsets=(0.2,), offsets=(0.4,))
    ds = VocalSegDataset([audio], [label], max_length=20, total_spec_columns=100)
    np.random.seed(1)
    item = ds[0]
    # replicate the seeded random crop (reference datautils.py:341)
    np.random.seed(1)
    clip_start = int(np.random.choice(min(16000 + 1, 16000 - 512 + 1)))
    start = clip_start / sr
    end = start + (16000 - clip_start) / sr
    ids = item["decoder_input_ids"].tolist()
    if 0.2 < end and 0.4 > start:  # segment visible in the crop
        on = max(0.2, start) - start
        off = min(0.4, end) - start
        assert ids[4] == tok.timestamp_id(codec.time_to_col(on, 0.01, 100))
        assert ids[5] == 0
        assert ids[6] == tok.timestamp_id(codec.time_to_col(off, 0.01, 100))
    else:
        # transcript is just species + EOT; EOT lands in the shifted labels
        assert item["labels"][3] == tok.EOT_ID
        assert ids[4] == tok.PAD_ID


def test_dataloader_batching():
    np.random.seed(0)
    audios = [np.zeros(16000, np.float32) for _ in range(5)]
    labels = [_label() for _ in range(5)]
    ds = VocalSegDataset(audios, labels, max_length=10, total_spec_columns=100)
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    loader2 = DataLoader(ds, batch_size=2, drop_last=False)
    assert len(loader2) == 3
    assert list(loader2)[-1]["input_features"].shape[0] == 1

def test_dataloader_buckets_by_frontend_key():
    """Mixed-config datasets: full batches must be single-frontend (one device
    program per batch); leftovers may mix; nothing is lost."""
    np.random.seed(0)
    audios, labels = [], []
    for i in range(6):
        labels.append(_label(sr=16000))
        audios.append(np.zeros(16000, np.float32))
    for i in range(5):
        lab = _label(sr=16000)
        lab["spec_time_step"] = 0.02  # different frontend bucket
        labels.append(lab)
        audios.append(np.zeros(16000, np.float32))
    ds = VocalSegDataset(audios, labels, max_length=10, total_spec_columns=100)
    loader = DataLoader(ds, batch_size=4, drop_last=False, num_workers=2)
    batch_idx_lists = loader._batch_indices()
    assert sum(len(b) for b in batch_idx_lists) == 11
    keys_per_batch = [
        {(labels[i]["sr"], labels[i]["spec_time_step"],
          labels[i].get("min_frequency", 0)) for i in b}
        for b in batch_idx_lists
    ]
    full = [ks for b, ks in zip(batch_idx_lists, keys_per_batch) if len(b) == 4]
    # 6 and 5 items -> one full batch per bucket, each single-key
    assert sum(len(ks) == 1 for ks in full) >= 2
    # iterating produces correctly shaped batches and covers every sample
    seen = 0
    for batch in loader:
        assert batch["input_features"].shape[1:] == (80, 100)
        seen += batch["input_features"].shape[0]
    assert seen == 11


def test_dataloader_multiworker_matches_len():
    np.random.seed(0)
    audios = [np.zeros(16000, np.float32) for _ in range(9)]
    labels = [_label() for _ in range(9)]
    ds = VocalSegDataset(audios, labels, max_length=10, total_spec_columns=100)
    loader = DataLoader(ds, batch_size=2, drop_last=True, num_workers=4)
    assert len(list(loader)) == len(loader) == 4


def test_dataloader_abandoned_iterator_releases_producer():
    """run_training abandons the iterator at max_num_iterations; the
    prefetch producer must terminate instead of blocking in q.put forever
    (a parked thread at interpreter exit hung completed train.py processes,
    which would stall the backend training queue)."""
    import threading
    import time

    from whisperseg_tpu.data import DataLoader

    class SlowDataset:
        def __init__(self, n):
            self.n = n
            # frontend-bucketing key source used by _batch_indices
            self.label_list = [{"sr": 16000, "spec_time_step": 0.01,
                                "min_frequency": 0}] * n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            time.sleep(0.01)
            return i

        def collate(self, items):
            return list(items)

    before = set(threading.enumerate())
    loader = DataLoader(SlowDataset(64), batch_size=2, shuffle=False,
                        drop_last=False, num_workers=2)
    it = iter(loader)
    next(it)
    next(it)
    it.close()  # abandon mid-epoch (what `break` in a for-loop does on GC)

    deadline = time.time() + 10
    while time.time() < deadline:
        extra = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"producer threads leaked: {extra}"


def test_split_train_test_script(tmp_path):
    """scripts/split_train_test.py writes reloadable wav+json splits
    (reference scripts/Split_train_test.ipynb)."""
    import subprocess
    import sys

    src = tmp_path / "raw"
    src.mkdir()
    make_dataset_dir(src, n_files=3)
    train_dir, test_dir = tmp_path / "train", tmp_path / "test"
    out = subprocess.run(
        [sys.executable, "scripts/split_train_test.py",
         "--dataset_folder", str(src), "--train_folder", str(train_dir),
         "--test_folder", str(test_dir), "--val_ratio", "0.25"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr

    a_tr, l_tr = get_audio_and_label_paths(str(train_dir))
    a_te, l_te = get_audio_and_label_paths(str(test_dir))
    assert len(a_tr) == 3 and len(a_te) == 3  # head/tail split of each file
    for lp in l_tr + l_te:
        label = json.load(open(lp))
        assert "cluster_id" not in label
        assert label["sr"] == 16000
        assert len(label["onset"]) == len(label["offset"]) == len(label["cluster"])
    # the splits partition each file's duration: train + test ~ original
    from whisperseg_tpu.audio import get_audio_duration

    total = sum(get_audio_duration(p) for p in a_tr + a_te)
    assert total == pytest.approx(3 * 2.0, abs=0.1)


def test_resolve_default_config_label_override(tmp_path):
    """resolve_default_config stores the labels' explicit values (what training
    actually used) over the heuristic; heuristic applies when any label omits
    the key."""
    from whisperseg_tpu.data import resolve_default_config

    make_dataset_dir(tmp_path)  # every label: sr 16000, spec_time_step 0.01
    audio, labels = get_audio_and_label_paths(str(tmp_path))

    cfg = resolve_default_config(audio, labels, total_spec_columns=1000)
    assert cfg["spec_time_step"] == pytest.approx(0.01)  # label, not 0.0085
    assert cfg["sr"] == 16000
    assert cfg["min_frequency"] == 0

    # one label drops the key -> heuristic (reference-verbatim) value again
    lab = json.load(open(labels[0]))
    del lab["spec_time_step"]
    json.dump(lab, open(labels[0], "w"))
    cfg = resolve_default_config(audio, labels, total_spec_columns=1000)
    assert cfg["spec_time_step"] == pytest.approx(0.0085)


def test_resolve_default_config_mixed_values_take_mode(tmp_path):
    """With heterogeneous explicit values the resolver stores the MOST COMMON
    one (a configuration some file actually trained at), never an averaged
    value no file used."""
    from whisperseg_tpu.data import resolve_default_config

    make_dataset_dir(tmp_path, n_files=3)
    audio, labels = get_audio_and_label_paths(str(tmp_path))
    for lp, step in zip(labels, [0.005, 0.005, 0.001]):
        lab = json.load(open(lp))
        lab["spec_time_step"] = step
        json.dump(lab, open(lp, "w"))
    cfg = resolve_default_config(audio, labels, total_spec_columns=1000)
    assert cfg["spec_time_step"] == pytest.approx(0.005)


def test_dataloader_reproducible_across_worker_counts(tmp_path):
    """Seeded epochs produce identical batches for any num_workers: per-item
    crop RNGs are drawn from the global stream in deterministic order before
    dispatch, not inside concurrently scheduled __getitem__ calls."""
    from whisperseg_tpu.data import DataLoader, VocalSegDataset, load_data, \
        slice_audios_and_labels

    make_dataset_dir(tmp_path, n_files=3)
    aps, lps = get_audio_and_label_paths(str(tmp_path))
    cb = get_cluster_codebook(lps, {})
    al, ll = load_data(aps, lps, cb, n_threads=2,
                       default_config={"sr": 16000, "spec_time_step": 0.01,
                                       "min_frequency": 0})
    al, ll = slice_audios_and_labels(al, ll, 100)
    ds = VocalSegDataset(al, ll, max_length=40, total_spec_columns=100)

    def epoch(workers):
        np.random.seed(7)
        loader = DataLoader(ds, 2, shuffle=True, drop_last=True,
                            num_workers=workers)
        return [np.asarray(b["decoder_input_ids"]).tolist() for b in loader]

    assert epoch(1) == epoch(4)


def test_load_data_surfaces_failing_file(tmp_path):
    """A corrupt file fails with an error naming it, not a NoneType crash."""
    make_dataset_dir(tmp_path, n_files=2)
    bad = tmp_path / "f1.wav"
    bad.write_bytes(b"not a wav at all")
    aps, lps = get_audio_and_label_paths(str(tmp_path))
    cb = get_cluster_codebook(lps, {})
    with pytest.raises(RuntimeError, match="f1.wav"):
        load_data(aps, lps, cb, n_threads=2,
                  default_config={"sr": 16000, "spec_time_step": 0.01,
                                  "min_frequency": 0})


def test_split_train_test_tail_test_deterministic(tmp_path):
    """--tail_test 1 always trains on the HEAD and tests on the TAIL of each
    file (the notebook's random head/tail choice can hand a sparse region to
    the test side)."""
    import subprocess
    import sys

    src = tmp_path / "raw"
    src.mkdir()
    make_dataset_dir(src, n_files=1)
    src_label = json.load(open(next(iter(
        get_audio_and_label_paths(str(src))[1]))))
    train_dir, test_dir = tmp_path / "train", tmp_path / "test"
    out = subprocess.run(
        [sys.executable, "scripts/split_train_test.py",
         "--dataset_folder", str(src), "--train_folder", str(train_dir),
         "--test_folder", str(test_dir), "--val_ratio", "0.4",
         "--tail_test", "1"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    from whisperseg_tpu.audio import get_audio_duration

    a_tr, l_tr = get_audio_and_label_paths(str(train_dir))
    a_te, l_te = get_audio_and_label_paths(str(test_dir))
    # deterministic proportions: head 60% trains, tail 40% tests
    assert get_audio_duration(a_tr[0]) == pytest.approx(1.2, abs=0.05)
    assert get_audio_duration(a_te[0]) == pytest.approx(0.8, abs=0.05)
    split_time = get_audio_duration(a_tr[0])
    te = json.load(open(l_te[0]))
    # the tail side keeps every source segment whose OFFSET crosses the
    # split point, clipped to the tail (split_audio_and_label semantics);
    # fixture: [0.3, 0.5] stays in train, [1.0, 1.4] straddles 1.2 -> tail
    # clips its onset to 0.0
    orig_tail = [t for t in src_label["offset"] if t > split_time]
    assert len(te["onset"]) == len(orig_tail) == 1
    assert te["onset"][0] == pytest.approx(0.0, abs=1e-6)
    assert te["offset"][0] == pytest.approx(1.4 - split_time, abs=0.05)


def test_make_synthetic_from_stats_bootstrap(tmp_path):
    """bootstrap_label resamples the source's empirical timing: durations
    and gaps stay inside the (jittered) empirical support, events never
    overlap, and the config keys ride along."""
    from scripts.make_synthetic_from_stats import bootstrap_label, main

    source = {"onset": [0.2, 0.5, 0.9], "offset": [0.3, 0.62, 1.04],
              "cluster": ["a", "b", "a"], "sr": 16000,
              "spec_time_step": 0.01, "tolerance": 0.01}
    rng = np.random.RandomState(0)
    label = bootstrap_label(rng, source, duration=20.0)
    on = np.asarray(label["onset"])
    off = np.asarray(label["offset"])
    assert len(on) > 20  # 20 s at ~0.35 s/event pitch
    assert np.all(off > on) and np.all(on[1:] >= off[:-1])
    assert float(off[-1]) <= 20.0
    durs = off - on
    assert durs.min() >= 0.1 * 0.9 - 1e-9
    assert durs.max() <= 0.14 * 1.1 + 1e-9
    assert set(label["cluster"]) <= {"a", "b"}
    assert label["sr"] == 16000 and label["spec_time_step"] == 0.01

    # CLI end-to-end: n_files wav+json pairs that feed the data layer
    sp = tmp_path / "src.json"
    sp.write_text(json.dumps(source))
    out = tmp_path / "out"
    main(["--source", str(sp), "--out_dir", str(out), "--n_files", "2",
          "--duration", "4.0", "--seed", "1"])
    a, l = get_audio_and_label_paths(str(out))
    assert len(a) == 2
    parsed = read_label(l[0])
    assert len(parsed["onset"]) > 5
