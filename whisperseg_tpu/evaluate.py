"""Corpus evaluation (behavioral port of reference evaluate.py)."""

from __future__ import annotations

from typing import Optional

from tqdm import tqdm

from .data import get_audio_and_label_paths, read_label
from .audio.io import load_audio


def evaluate(audio_list, label_list, segmenter, batch_size, max_length,
             num_trials, num_beams: int = 4, target_cluster: Optional[str] = None,
             verbose: bool = True, refine_boundaries_ms=None,
             split_merged_db=None, merge_gap_ms=None, frame_mode: bool = False,
             frame_split=None, frame_refine_ms=None, frame_filter=None,
             label_tolerance: bool = False):
    """Micro-averaged segment-wise and frame-wise P/R/F1 over a corpus
    (reference evaluate.py:9-51). By default, per-label ``tolerance`` /
    ``time_per_frame_for_scoring`` fields are intentionally ignored, as in the
    reference (scores use the segmenter's defaults: the model config's
    ``spec_time_step * 4`` matching tolerance, reference model.py:494-495) —
    even when a label says e.g. ``tolerance: 0.02``. ``label_tolerance=True``
    honors those per-label fields instead, which matches the objective the
    offline fitters optimize (refine._scoring_resolutions) — use it when the
    model's global spec_time_step differs from a corpus's annotation
    resolution (e.g. the meerkat set: 1 ms frames, 20 ms stated tolerance,
    scored at the generalist's 2.5 ms * 4 = 10 ms by default)."""
    seg_tp = seg_pred = seg_label = 0
    fr_tp = fr_pred = fr_label = 0

    iterator = zip(audio_list, label_list)
    if verbose:
        iterator = tqdm(iterator, total=len(audio_list))
    for audio, label in iterator:
        if frame_mode:
            # decoder-free frame-VAD path (requires --frame_head training);
            # vocal/cut/snap default to the checkpoint's fitted values, with
            # per-label overrides (the presets file may carry per-species
            # thresholds, reference config/segment_config.json pattern)
            prediction = segmenter.segment_from_frames(
                audio,
                sr=label["sr"],
                min_frequency=label.get("min_frequency", None),
                spec_time_step=label.get("spec_time_step", None),
                batch_size=batch_size,
                vocal_threshold=label.get("frame_vocal_threshold", None),
                cut_threshold=label.get("frame_cut_threshold", None),
                boundary_snap=label.get("frame_boundary_snap", None),
                gap_cut=label.get("frame_gap_cut", None),
            )
        else:
            prediction = segmenter.segment(
                audio,
                sr=label["sr"],
                min_frequency=label.get("min_frequency", None),
                spec_time_step=label.get("spec_time_step", None),
                max_length=max_length,
                batch_size=batch_size,
                num_trials=num_trials,
                num_beams=num_beams,
                refine_boundaries_ms=refine_boundaries_ms,
                split_merged_db=split_merged_db,
                merge_gap_ms=merge_gap_ms,
                frame_split=frame_split,
                frame_refine_ms=frame_refine_ms,
                frame_filter=frame_filter,
            )
        tol = label.get("tolerance") if label_tolerance else None
        tpf = (label.get("time_per_frame_for_scoring")
               if label_tolerance else None)
        tp, p_pred, p_label = segmenter.segment_score(
            prediction, label, target_cluster=target_cluster,
            tolerance=tol)[:3]
        seg_tp += tp
        seg_pred += p_pred
        seg_label += p_label
        tp, p_pred, p_label = segmenter.frame_score(
            prediction, label, target_cluster=target_cluster,
            time_per_frame_for_scoring=tpf)[:3]
        fr_tp += tp
        fr_pred += p_pred
        fr_label += p_label

    from .scoring import _prf

    def prf(tp, pred, label):
        return [tp, pred, label, *_prf(tp, pred, label)]

    return {
        "segment_wise": prf(seg_tp, seg_pred, seg_label),
        "frame_wise": prf(fr_tp, fr_pred, fr_label),
    }


def evaluate_dataset(dataset_folder: str, model_path: str, num_trials: int,
                     max_length: Optional[int] = None, num_beams: int = 4,
                     batch_size: int = 8, inference_dtype: str = "bfloat16",
                     refine_boundaries_ms=None, split_merged_db=None,
                     merge_gap_ms=None, frame_mode: bool = False,
                     frame_split=None, frame_refine_ms=None, frame_filter=None,
                     ignore_cluster: bool = False,
                     frame_vocal_threshold=None, frame_cut_threshold=None,
                     frame_boundary_snap=None, frame_gap_cut=None,
                     label_tolerance: bool = False,
                     segmenter=None, **kwargs):
    """(reference evaluate.py:53-84)

    ``ignore_cluster=True`` flattens label clusters to "Vocal" (via
    ``read_label``'s reference semantics, datautils.py:19-42) — required when
    scoring a VAD model trained with ``--ignore_cluster 1`` (e.g. the
    multi-species generalist) against per-syllable-clustered labels, since
    both segment and frame scores match cluster names exactly.

    Precedence: when a pre-loaded ``segmenter`` is passed, ``model_path`` and
    ``inference_dtype`` are NOT consulted — the segmenter's own checkpoint and
    dtype win (they were fixed at its construction)."""
    from .segmenter import Segmenter

    audio_list, label_list = [], []
    audio_paths, label_paths = get_audio_and_label_paths(dataset_folder)
    for audio_path, label_path in zip(audio_paths, label_paths):
        label = read_label(label_path, ignore_cluster=ignore_cluster)
        audio, sr = load_audio(audio_path, sr=label.get("sr", None))
        label["sr"] = sr
        # explicit frame-mode threshold overrides (else labels/checkpoint)
        for key, val in (("frame_vocal_threshold", frame_vocal_threshold),
                         ("frame_cut_threshold", frame_cut_threshold),
                         ("frame_boundary_snap", frame_boundary_snap),
                         ("frame_gap_cut", frame_gap_cut)):
            if val is not None:
                label[key] = val
        audio_list.append(audio)
        label_list.append(label)

    if segmenter is None:
        # pass a pre-loaded ``segmenter`` when scoring several corpora with
        # one model (scripts/evaluate_many.py): model load and jit programs
        # are then shared across folders instead of re-paid per call
        segmenter = Segmenter.from_pretrained(model_path,
                                              inference_dtype=inference_dtype)
    res = evaluate(audio_list, label_list, segmenter, batch_size, max_length,
                   num_trials, num_beams, target_cluster=None,
                   refine_boundaries_ms=refine_boundaries_ms,
                   split_merged_db=split_merged_db, merge_gap_ms=merge_gap_ms,
                   frame_mode=frame_mode, frame_split=frame_split,
                   frame_refine_ms=frame_refine_ms, frame_filter=frame_filter,
                   label_tolerance=label_tolerance)

    def expand(row):
        return {
            "N-true-positive": row[0],
            "N-positive-in-prediction": row[1],
            "N-positive-in-ground-truth": row[2],
            "precision": row[3],
            "recall": row[4],
            "F1": row[5],
        }

    return {
        "segment_wise_scores": expand(res["segment_wise"]),
        "frame_wise_scores": expand(res["frame_wise"]),
    }
