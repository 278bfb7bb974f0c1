"""Segment <-> token-sequence codec.

This module owns the mapping between continuous time and decoder tokens:

  * time -> spectrogram-column quantization used to build training targets
    (reference datautils.py:323-324, 354-368)
  * token-id sequence -> segment list, replacing the reference's regex parse
    ``<\\|([0-9]+)\\|>(\\d+?)<\\|([0-9]+)\\|>`` (reference model.py:120, 191-207)
    with an equivalent structured scan over token ids (no text round-trip needed).

All functions are pure Python/host-side: they run on lists of ints produced by the
on-device decoder and on label metadata, never inside jit.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .constants import RATIO_DECODING_TIME_STEP_TO_SPEC_TIME_STEP as RATIO
from . import tokenizer as tok


def time_to_col(t: float, spec_time_step: float, total_spec_columns: int) -> int:
    """Quantize a time (seconds) to a decoder timestamp column.

    Mirrors reference datautils.py:323-324: round-half-to-even (numpy semantics),
    clipped to ``total_spec_columns``.
    """
    import numpy as np

    return min(int(np.round(t / (spec_time_step * RATIO))), total_spec_columns)


def col_to_time(col: int, spec_time_step: float) -> float:
    """Inverse of :func:`time_to_col` (reference model.py:196-197)."""
    return col * spec_time_step * RATIO


def cluster_digits(cluster_id: int) -> List[int]:
    """Cluster integer id -> digit token ids ('12' -> [1, 2])."""
    if cluster_id < 0:
        raise ValueError("cluster ids must be non-negative")
    return [tok.DIGIT_BASE + (ord(c) - ord("0")) for c in str(cluster_id)]


def build_target_ids(
    species: str,
    onsets: Sequence[float],
    offsets: Sequence[float],
    cluster_ids: Sequence[int],
    spec_time_step: float,
    total_spec_columns: int,
    extra_token_ids: Dict[str, int] = None,
    cluster_encodings: Dict[str, list] = None,
) -> List[int]:
    """Full decoder sequence for one training clip: prompt + species + segments + EOT.

    Equivalent to the reference's label-text construction + tokenization
    (reference datautils.py:354-368 + WhisperTokenizer.encode): the text
    ``<|species|><|on|>cid<|off|>...`` surrounded by the decoding prompt and EOT.

    ``extra_token_ids`` (piece -> extended token id) makes cluster-id encoding
    consistent with an imported HF checkpoint whose BPE merges multi-digit
    cluster ids into single tokens — finetuning such an import then trains the
    same target the original model generates.
    """
    ids: List[int] = list(tok.PROMPT_IDS)
    ids.append(tok.species_token(species))
    for onset, offset, cid in zip(onsets, offsets, cluster_ids):
        ids.append(tok.timestamp_id(time_to_col(onset, spec_time_step, total_spec_columns)))
        if extra_token_ids:
            ids.extend(tok.encode_cluster_string(str(int(cid)), extra_token_ids,
                                                 cluster_encodings))
        else:
            ids.extend(cluster_digits(int(cid)))
        ids.append(tok.timestamp_id(time_to_col(offset, spec_time_step, total_spec_columns)))
    ids.append(tok.EOT_ID)
    return ids


def shift_for_training(
    ids: Sequence[int], max_length: int, ignore_id: int = -100
) -> Tuple[List[int], List[int]]:
    """Truncate/shift a full decoder sequence into (decoder_input_ids, labels).

    Mirrors reference datautils.py:380-384: sequence truncated to ``max_length + 1``,
    inputs = seq[:-1] padded with PAD, labels = seq[1:] padded with ``ignore_id``.
    """
    seq = list(ids)[: max_length + 1]
    inputs = seq[:-1]
    labels = seq[1:]
    inputs = inputs + [tok.PAD_ID] * (max_length - len(inputs))
    labels = labels + [ignore_id] * (max_length - len(labels))
    return inputs, labels


def parse_segments_from_ids(
    ids: Sequence[int],
    spec_time_step: float,
    inverse_cluster_codebook: Dict[int, str],
    extra_tokens: Sequence[str] = (),
) -> List[List]:
    """Scan a generated token sequence for (onset_ts, digits+, offset_ts) triples.

    Token-level equivalent of the reference regex parse (reference model.py:191-207):
    after a successful match the scan resumes *after* the closing timestamp (regex
    ``findall`` semantics), so a closing timestamp never opens the next segment.
    Unknown cluster ids and non-positive-length segments are dropped.

    ``extra_tokens`` are extended-vocabulary digit pieces (ids >= VOCAB_SIZE) of
    an imported HF checkpoint — a single token '12' contributes two digits to
    the cluster id, exactly as the reference's text-level regex sees it.

    Returns a list of mutable ``[onset_seconds, offset_seconds, cluster_name]``.
    """
    def digit_surface(t: int) -> str:
        if tok.is_digit(t):
            return str(t - tok.DIGIT_BASE)
        return tok.extended_digits(t, extra_tokens)

    out: List[List] = []
    i = 0
    n = len(ids)
    while i < n:
        if not tok.is_timestamp(int(ids[i])):
            i += 1
            continue
        j = i + 1
        digits = ""
        while j < n and digit_surface(int(ids[j])):
            digits += digit_surface(int(ids[j]))
            j += 1
        if digits and j < n and tok.is_timestamp(int(ids[j])):
            onset_col = int(ids[i]) - tok.TIMESTAMP_BASE
            offset_col = int(ids[j]) - tok.TIMESTAMP_BASE
            cluster_id = int(digits)
            onset = col_to_time(onset_col, spec_time_step)
            offset = col_to_time(offset_col, spec_time_step)
            if cluster_id in inverse_cluster_codebook and offset - onset > 0:
                out.append([onset, offset, inverse_cluster_codebook[cluster_id]])
            i = j + 1  # resume after the closing timestamp
        else:
            i += 1
    return out


def parse_segments_from_text(
    text: str,
    spec_time_step: float,
    inverse_cluster_codebook: Dict[int, str],
) -> List[List]:
    """Text-level parse for API compatibility with the reference's generated_text path."""
    return parse_segments_from_ids(
        tok.encode_text(text), spec_time_step, inverse_cluster_codebook
    )
