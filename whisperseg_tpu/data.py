"""Data layer: dataset discovery, label parsing, config inference, slicing, batching.

Behavioral port of the reference's data pipeline (reference datautils.py), with one
architectural change: per-item CPU feature extraction (the reference's training
bottleneck, mitigated there with torch DataLoader workers) is replaced by *batched
on-device* log-mel extraction — the loader assembles raw audio clips and the
features for a whole batch are computed in one jitted call per frontend
configuration.
"""

from __future__ import annotations

import json
import os
import threading
from collections import Counter
from copy import deepcopy
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import codec
from .audio.frontend import Frontend
from .audio.io import get_audio_duration, get_sampling_rate, load_audio
from .constants import fft_time_delta


# ----------------------------------------------------------------------- labels


def read_label(label_path: str, default_config: Optional[dict] = None,
               ignore_cluster: bool = False) -> dict:
    """Load a .json/.csv annotation (reference datautils.py:19-42)."""
    default_config = default_config or {}
    if label_path.endswith(".json"):
        with open(label_path) as f:
            label = json.load(f)
    elif label_path.endswith(".csv"):
        import pandas as pd

        df = pd.read_csv(label_path)
        label = {k: df[k].tolist() for k in df.columns}
    else:
        raise ValueError(f"Unsupported label format: {label_path}")
    assert "onset" in label and "offset" in label
    if "cluster" not in label:
        label["cluster"] = ["Vocal"] * len(label["onset"])
    label["cluster"] = list(map(str, label["cluster"]))
    for k, v in default_config.items():
        if k not in label:
            label[k] = v
    # species is not actually used downstream (reference datautils.py:36-37)
    label["species"] = "unknown"
    if ignore_cluster:
        label["cluster"] = ["Vocal"] * len(label["cluster"])
    return label


_AUDIO_EXTS = (".wav", ".flac", ".mp3", ".ogg")


def get_audio_and_label_paths(folder: str) -> Tuple[List[str], List[str]]:
    """Pair audio files with sibling .json (preferred) or .csv labels
    (reference datautils.py:44-56; the reference pairs only *.wav, but its
    loader reads anything librosa does — here all of wav/flac/mp3/ogg pair)."""
    audio_paths, label_paths = [], []
    for fname in os.listdir(folder):
        ext = os.path.splitext(fname)[1].lower()
        if ext not in _AUDIO_EXTS:
            continue
        wav = os.path.join(folder, fname)
        stem = wav[: -len(ext)]
        if os.path.exists(stem + ".json"):
            audio_paths.append(wav)
            label_paths.append(stem + ".json")
        elif os.path.exists(stem + ".csv"):
            audio_paths.append(wav)
            label_paths.append(stem + ".csv")
    return audio_paths, label_paths


def determine_default_config(audio_paths: Sequence[str], label_paths: Sequence[str],
                             total_spec_columns: int,
                             ignore_cluster: bool = False,
                             labels: Optional[Sequence[dict]] = None) -> dict:
    """Auto-derive (sr, spec_time_step, ...) from the dataset
    (reference datautils.py:58-93). ``labels``: optionally pass already-parsed
    ``read_label`` dicts (same order as the paths) to skip re-reading them."""
    sr_list = [get_sampling_rate(p) for p in audio_paths]
    assert len(sr_list) > 0, "No valid audios were provided."
    sr = int(np.median(sr_list))
    time_delta = fft_time_delta(sr)

    if labels is None:
        labels = [read_label(p, ignore_cluster=ignore_cluster)
                  for p in label_paths]
    onsets, offsets = [], []
    for audio_path, label in zip(audio_paths, labels):
        dur = get_audio_duration(audio_path)
        onsets += [max(0, t - time_delta) for t in label["onset"]]
        offsets += [min(dur, t + time_delta) for t in label["offset"]]
    assert len(onsets) > 0, "No vocal segment is annotated in the label files."
    seg_dur_median = float(np.median(np.asarray(offsets) - np.asarray(onsets)))
    # target ~25 median-segment-durations per window, rounded up to 0.5 s
    # (reference datautils.py:82-84)
    spec_time_step = float(
        np.ceil(seg_dur_median * 25 / 0.5) * 0.5 / total_spec_columns
    )
    return {
        "species": "unknown",
        "sr": sr,
        "min_frequency": 0,
        "spec_time_step": spec_time_step,
    }


def resolve_default_config(audio_paths: Sequence[str], label_paths: Sequence[str],
                           total_spec_columns: int,
                           ignore_cluster: bool = False) -> dict:
    """``determine_default_config`` + label-aware override: when EVERY training
    label explicitly specifies ``sr`` / ``min_frequency`` / ``spec_time_step``,
    store the labels' median instead of the heuristic value.

    Rationale (divergence from the reference, deliberate): at training time
    each file is processed at its OWN label's values (``read_label`` merges the
    derived config only for missing keys — reference datautils.py:19-42), so
    when the labels are explicit the heuristic value is never actually used
    for training, yet the reference stamps it into the checkpoint's
    ``default_segmentation_config`` anyway. A user then segmenting without
    explicit arguments runs the model at a resolution it never saw (observed:
    a meerkat model trained at the labels' 1 ms step whose stored default said
    6 ms, collapsing 20 calls into 2 windows-wide segments). The heuristic
    still applies whenever any label omits a key."""
    labels = [read_label(p, ignore_cluster=ignore_cluster) for p in label_paths]
    config = determine_default_config(audio_paths, label_paths,
                                      total_spec_columns,
                                      ignore_cluster=ignore_cluster,
                                      labels=labels)
    for key, cast in (("sr", int), ("min_frequency", float),
                      ("spec_time_step", float)):
        explicit = [lab[key] for lab in labels if key in lab]
        if labels and len(explicit) == len(labels):
            # the MOST COMMON explicit value (not the median): a mixed corpus
            # must still get a default some file actually trained at;
            # ties break toward the median, then the smaller value
            med = float(np.median(np.asarray(explicit, dtype=np.float64)))
            counts = Counter(explicit)
            best = max(counts, key=lambda v: (counts[v], -abs(v - med), -v))
            config[key] = cast(best)
    return config


def get_cluster_codebook(label_paths: Sequence[str], initial_cluster_codebook: dict,
                         ignore_cluster: bool = False) -> dict:
    """Sorted unique cluster names -> ids, extending an initial codebook
    (reference datautils.py:95-108)."""
    codebook = deepcopy(initial_cluster_codebook)
    unique = set()
    for path in label_paths:
        unique.update(read_label(path, ignore_cluster=ignore_cluster)["cluster"])
    for cluster in sorted(unique):
        if cluster not in codebook:
            codebook[cluster] = len(codebook)
    return codebook


# ---------------------------------------------------------------------- loading


def _load_one(audio_path: str, label_path: str, cluster_codebook: dict,
              default_config: dict, ignore_cluster: bool):
    label = read_label(label_path, default_config, ignore_cluster=ignore_cluster)
    y, _ = load_audio(audio_path, sr=label["sr"])
    sr = label["sr"]
    time_delta = fft_time_delta(sr)
    dur = len(y) / sr

    onset = np.asarray([max(0, t - time_delta) for t in label["onset"]])
    offset = np.asarray([min(dur, t + time_delta) for t in label["offset"]])
    valid = np.logical_and(np.logical_and(onset < dur, offset > 0), onset <= offset)
    onset, offset = onset[valid], offset[valid]
    label["cluster"] = [c for c, v in zip(label["cluster"], valid) if v]
    label.update({
        "onset": onset,
        "offset": offset,
        "cluster_id": np.asarray([cluster_codebook[c] for c in label["cluster"]],
                                 dtype=np.int64),
    })
    return y, label


def load_data(audio_paths: Sequence[str], label_paths: Sequence[str],
              cluster_codebook: dict, n_threads: int = 8,
              default_config: Optional[dict] = None,
              ignore_cluster: bool = False):
    """Threaded corpus load with FFT-blur label correction
    (reference datautils.py:110-186)."""
    default_config = default_config or {}
    n = len(audio_paths)
    results: List = [None] * n
    lock = threading.Lock()
    next_idx = [0]

    def worker():
        while True:
            with lock:
                if next_idx[0] >= n:
                    return
                i = next_idx[0]
                next_idx[0] += 1
            try:
                results[i] = _load_one(audio_paths[i], label_paths[i],
                                       cluster_codebook, default_config,
                                       ignore_cluster)
            except Exception as e:  # surfaced below, naming the file
                results[i] = e

    threads = [threading.Thread(target=worker) for _ in range(min(n_threads, max(n, 1)))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # A failed file must name itself: an exception on a worker thread used to
    # leave results[i] = None and surface later as an opaque
    # "'NoneType' object is not subscriptable".
    failures = [(audio_paths[i], r) for i, r in enumerate(results)
                if isinstance(r, Exception)]
    if failures:
        path, err = failures[0]
        raise RuntimeError(
            f"failed to load {len(failures)} of {n} training file(s); "
            f"first failure: {path}: {type(err).__name__}: {err}") from err
    audio_list = [r[0] for r in results]
    label_list = [r[1] for r in results]
    return audio_list, label_list


# ---------------------------------------------------------------------- splits


def split_audio_and_label(audio, label, split_ratio: float):
    """Head/tail split of one file with boundary clipping; parts < 0.1 s dropped
    (reference datautils.py:188-225)."""
    sr = label["sr"]
    split_point = int(len(audio) * split_ratio)
    split_time = split_point / sr

    def part(seg_audio, onset, offset, cluster_id, cluster):
        if len(seg_audio) / sr < 0.1:
            return None, None
        p = deepcopy(label)
        p.update({"onset": onset, "offset": offset, "cluster_id": cluster_id,
                  "cluster": cluster})
        return seg_audio, p

    idx1 = label["onset"] < split_time
    part1 = part(
        audio[:split_point],
        label["onset"][idx1],
        np.minimum(label["offset"][idx1], split_time),
        label["cluster_id"][idx1],
        [label["cluster"][i] for i in np.nonzero(idx1)[0]],
    )
    idx2 = label["offset"] > split_time
    part2 = part(
        audio[split_point:],
        np.maximum(label["onset"][idx2], split_time) - split_time,
        label["offset"][idx2] - split_time,
        label["cluster_id"][idx2],
        [label["cluster"][i] for i in np.nonzero(idx2)[0]],
    )
    return part1, part2


def train_val_split(audio_list, label_list, val_ratio: float):
    """Per-file random head/tail split (reference datautils.py:227-249)."""
    train_a, train_l, val_a, val_l = [], [], [], []
    for audio, label in zip(audio_list, label_list):
        if np.random.choice([0, 1]) == 0:
            (va, vl), (ta, tl) = split_audio_and_label(audio, label, val_ratio)
        else:
            (ta, tl), (va, vl) = split_audio_and_label(audio, label, 1 - val_ratio)
        if ta is not None:
            train_a.append(ta)
            train_l.append(tl)
        if va is not None:
            val_a.append(va)
            val_l.append(vl)
    return (train_a, train_l), (val_a, val_l)


def slice_audio_and_label(audio, label, total_spec_columns: int):
    """Chop one file into overlapping 2x-clip windows with a one-clip zero left pad
    (reference datautils.py:251-292)."""
    sr = label["sr"]
    clip_duration = total_spec_columns * label["spec_time_step"]
    num_samples = int(np.round(clip_duration * sr))
    padded = np.concatenate([np.zeros(num_samples, dtype=audio.dtype), audio])
    p_onset = label["onset"] + clip_duration
    p_offset = label["offset"] + clip_duration

    audio_clips, label_clips = [], []
    for pos in range(0, len(padded), num_samples):
        clip = padded[pos:pos + 2 * num_samples]
        if len(clip) / sr < 0.1:
            continue
        start, end = pos / sr, (pos + len(clip)) / sr
        inter = np.logical_and(p_onset < end, p_offset > start)
        lc = deepcopy(label)
        lc.update({
            "onset": np.maximum(p_onset[inter], start) - start,
            "offset": np.minimum(p_offset[inter], end) - start,
            "cluster_id": label["cluster_id"][inter],
            "cluster": [label["cluster"][i] for i in np.nonzero(inter)[0]],
        })
        audio_clips.append(clip)
        label_clips.append(lc)
    return audio_clips, label_clips


def slice_audios_and_labels(audio_list, label_list, total_spec_columns: int):
    """(reference datautils.py:294-302)"""
    sliced_a, sliced_l = [], []
    for audio, label in zip(audio_list, label_list):
        a, l = slice_audio_and_label(audio, label, total_spec_columns)
        sliced_a += a
        sliced_l += l
    return sliced_a, sliced_l


# ---------------------------------------------------------------------- dataset


def build_frame_targets(onsets, offsets, cluster_ids, spec_time_step: float,
                        total_spec_columns: int, sigma: float = 1.0):
    """Per-encoder-position targets for the optional frame head.

    The grid has ``S = total_spec_columns // 2`` positions; one position = one
    decoder timestamp quantum (= ``spec_time_step * RATIO`` seconds), so the
    head and the decoder's timestamp tokens share a time base. Returns a dict:
    ``vocal`` [S] float32 0/1, ``onset`` / ``offset`` [S] float32 soft event
    tracks (max of per-event discrete Gaussians, stddev ``sigma`` positions),
    ``cluster`` [S] int32 (-1 where unlabeled). Boundary events at the clip
    edge clip onto the last grid position."""
    from .constants import RATIO_DECODING_TIME_STEP_TO_SPEC_TIME_STEP as RATIO

    S = total_spec_columns // 2
    quantum = spec_time_step * RATIO
    vocal = np.zeros(S, dtype=np.float32)
    onset_evt = np.zeros(S, dtype=np.float32)
    offset_evt = np.zeros(S, dtype=np.float32)
    cluster = np.full(S, -1, dtype=np.int32)
    grid = np.arange(S, dtype=np.float32)
    for on, off, cid in zip(onsets, offsets, cluster_ids):
        c_on = min(int(np.round(float(on) / quantum)), S)
        c_off = min(int(np.round(float(off) / quantum)), S)
        c_on = min(c_on, S - 1)
        c_off = max(c_off, c_on + 1)
        vocal[c_on:c_off] = 1.0
        cluster[c_on:c_off] = int(cid)
        for track, c in ((onset_evt, c_on), (offset_evt, min(c_off, S - 1))):
            if sigma > 0:
                np.maximum(track, np.exp(-0.5 * ((grid - c) / sigma) ** 2),
                           out=track)
            else:
                track[c] = 1.0
    return {"vocal": vocal, "onset": onset_evt, "offset": offset_evt,
            "cluster": cluster}


class VocalSegDataset:
    """Random-crop training dataset (reference datautils.py:304-390).

    ``__getitem__`` returns raw host-side arrays; feature extraction happens in
    :meth:`collate`, batched on device per frontend configuration.
    """

    def __init__(self, audio_list, label_list, max_length: int,
                 total_spec_columns: int, extra_token_ids: dict = None,
                 frame_targets: bool = False, frame_sigma: float = 1.0,
                 cluster_encodings: dict = None):
        self.audio_list = audio_list
        self.label_list = label_list
        self.max_length = max_length
        self.total_spec_columns = total_spec_columns
        # piece -> extended token id, for finetuning an imported HF checkpoint
        # whose BPE merged multi-digit cluster ids (models/convert_hf.py):
        # targets then use the same tokens the imported model generates
        self.extra_token_ids = extra_token_ids or None
        # exact BPE piece sequence per cluster string from the imported
        # checkpoint (cfg.cluster_encodings) — authoritative over greedy
        # longest-match (tokenizer.encode_cluster_string)
        self.cluster_encodings = cluster_encodings or None
        self.frame_targets = frame_targets
        self.frame_sigma = frame_sigma
        self._frontends: Dict[Tuple, Frontend] = {}

    def __len__(self):
        return len(self.audio_list)

    def frontend_for(self, label) -> Frontend:
        key = (label["sr"], label["spec_time_step"], label.get("min_frequency", 0))
        if key not in self._frontends:
            self._frontends[key] = Frontend(key[0], key[1], key[2] or 0)
        return self._frontends[key]

    def __getitem__(self, idx: int, rng=None):
        audio = self.audio_list[idx]
        label = self.label_list[idx]
        sr = label["sr"]
        step = label["spec_time_step"]
        frontend = self.frontend_for(label)

        num_samples = int(np.round(self.total_spec_columns * step * sr))
        hi = min(num_samples + 1, len(audio) - frontend.n_fft + 1)
        # rng: per-item generator handed in by the DataLoader so concurrent
        # workers don't consume the shared global stream in scheduling order
        # (which would break seeded reproducibility); plain indexing keeps
        # the global-np.random behavior
        clip_start = int((rng or np.random).choice(max(hi, 1)))
        clip = audio[clip_start:clip_start + num_samples]

        start = clip_start / sr
        end = start + len(clip) / sr
        inter = np.logical_and(label["onset"] < end, label["offset"] > start)
        onset = np.maximum(label["onset"][inter], start) - start
        offset = np.minimum(label["offset"][inter], end) - start
        cluster_id = label["cluster_id"][inter]

        target = codec.build_target_ids(
            label.get("species", "unknown"), onset, offset, cluster_id,
            step, self.total_spec_columns,
            extra_token_ids=self.extra_token_ids,
            cluster_encodings=self.cluster_encodings,
        )
        dec_inputs, labels = codec.shift_for_training(target, self.max_length)

        full = np.zeros(num_samples, dtype=np.float32)
        full[: len(clip)] = clip
        item = {
            "audio_clip": full,
            "frontend_key": (sr, step, label.get("min_frequency", 0)),
            "decoder_input_ids": np.asarray(dec_inputs, dtype=np.int32),
            "labels": np.asarray(labels, dtype=np.int32),
        }
        if self.frame_targets:
            item["frame_targets"] = build_frame_targets(
                onset, offset, cluster_id, step, self.total_spec_columns,
                sigma=self.frame_sigma)
        return item

    def collate(self, items) -> Dict[str, np.ndarray]:
        """Assemble a batch; features computed on device per frontend group."""
        from .constants import NUM_MEL_BINS

        feats = np.empty((len(items), NUM_MEL_BINS, self.total_spec_columns),
                         dtype=np.float32)
        by_key: Dict[Tuple, List[int]] = {}
        for i, item in enumerate(items):
            by_key.setdefault(item["frontend_key"], []).append(i)
        for key, idxs in by_key.items():
            frontend = self._frontends[key]
            clips = np.stack([items[i]["audio_clip"] for i in idxs])
            f = np.asarray(frontend.features_for_clips(clips, self.total_spec_columns))
            for j, i in enumerate(idxs):
                feats[i] = f[j]
        batch = {
            "input_features": feats,
            "decoder_input_ids": np.stack([it["decoder_input_ids"] for it in items]),
            "labels": np.stack([it["labels"] for it in items]),
        }
        if self.frame_targets:
            batch["frame_targets"] = {
                k: np.stack([it["frame_targets"][k] for it in items])
                for k in ("vocal", "onset", "offset", "cluster")
            }
        return batch


class DataLoader:
    """Shuffled, optionally drop-last batch iterator with background prefetch.

    ``num_workers`` threads load items concurrently (random-crop + target
    encoding are numpy work that releases the GIL in its hot ops); the
    producer draws one per-item crop RNG from the global ``np.random`` stream
    in deterministic order BEFORE dispatching to workers, so seeded epochs
    are identical for any ``num_workers`` (concurrent draws inside
    ``__getitem__`` would interleave by thread schedule). When the dataset mixes frontend configurations
    (sr / spec_time_step / min_frequency), batches are bucketed by config so
    each batch runs ONE device frontend program instead of one per group
    (matching the reference's per-dataset homogeneity assumption,
    datautils.py:304-390, while staying correct for mixed folders)."""

    def __init__(self, dataset: VocalSegDataset, batch_size: int,
                 shuffle: bool = True, drop_last: bool = True,
                 prefetch: int = 2, num_workers: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers)

    def _batch_indices(self):
        """Per-epoch batch index lists, bucketed by frontend key."""
        by_key: Dict[Tuple, List[int]] = {}
        for i, label in enumerate(self.dataset.label_list):
            key = (label["sr"], label["spec_time_step"],
                   label.get("min_frequency", 0))
            by_key.setdefault(key, []).append(i)
        batches: List[np.ndarray] = []
        leftovers: List[int] = []
        for idxs in by_key.values():
            order = np.asarray(idxs)
            if self.shuffle:
                np.random.shuffle(order)
            full = len(order) // self.batch_size * self.batch_size
            batches.extend(np.split(order[:full], full // self.batch_size)
                           if full else [])
            leftovers.extend(order[full:].tolist())
        # Leftovers from different buckets form (possibly mixed) tail batches
        # so no sample is silently dropped beyond drop_last semantics.
        for b in range(0, len(leftovers), self.batch_size):
            tail = np.asarray(leftovers[b:b + self.batch_size])
            if len(tail) == self.batch_size or not self.drop_last:
                batches.append(tail)
        if self.shuffle:
            np.random.shuffle(batches)
        # a short remainder batch always comes last (torch DataLoader contract)
        batches.sort(key=lambda x: len(x) < self.batch_size)
        return batches

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        import queue
        from concurrent.futures import ThreadPoolExecutor

        batches = self._batch_indices()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        # The consumer routinely ABANDONS the iterator mid-epoch (run_training
        # breaks at max_num_iterations). Without a stop signal the producer
        # blocks forever in q.put — and a thread parked inside a device call
        # at interpreter exit can hang process shutdown entirely (observed:
        # a completed train.py lingering >30 min, which would stall the
        # backend's training queue). The stop event + the generator's
        # try/finally make abandonment release the producer promptly.
        stop = threading.Event()

        def _put(batch) -> bool:
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # An exception in __getitem__/collate must still wake the
            # consumer: without a sentinel it would block in q.get() forever.
            # The exception object itself is enqueued and re-raised there.
            try:
                # Per-item RNGs are drawn from the global stream HERE, in
                # deterministic order, so the random crops are identical for
                # any num_workers value (thread scheduling would otherwise
                # interleave draws and break seeded reproducibility).
                def _seeded(idxs):
                    return [np.random.RandomState(np.random.randint(2 ** 31))
                            for _ in idxs]

                def _get(i, r):
                    try:
                        return self.dataset.__getitem__(int(i), rng=r)
                    except TypeError:
                        return self.dataset[int(i)]  # dataset without rng arg

                if self.num_workers > 1:
                    with ThreadPoolExecutor(self.num_workers) as pool:
                        for idxs in batches:
                            if stop.is_set():
                                return
                            items = list(pool.map(_get, [int(i) for i in idxs],
                                                  _seeded(idxs)))
                            if not _put(self.dataset.collate(items)):
                                return
                else:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        items = [_get(i, r)
                                 for i, r in zip(idxs, _seeded(idxs))]
                        if not _put(self.dataset.collate(items)):
                            return
                _put(None)
            except BaseException as e:  # noqa: BLE001 — relayed to consumer
                _put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # drain so a producer blocked in put() wakes immediately
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=30)
