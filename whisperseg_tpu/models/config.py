"""Model configuration.

Architecture hyperparameters follow OpenAI Whisper's published family sizes so that
official weights can be imported (see models/convert_hf.py), with two WhisperSeg
modifications mirrored from the reference:

  * ``max_source_positions`` is truncated to ``total_spec_columns // 2``
    (reference model.py:79-84; 500 for the default 1000 columns).
  * the vocabulary is the compact 1024-token segmentation vocabulary
    (see whisperseg_tpu/tokenizer.py) instead of the 51k BPE vocab.

The config also carries the segmentation metadata the reference stores inside the
HF config object: ``total_spec_columns``, ``cluster_codebook``,
``default_segmentation_config``, ``current_step`` (reference model.py:86-108,
train.py:145-149).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict

from ..constants import DEFAULT_TOTAL_SPEC_COLUMNS, NUM_MEL_BINS
from ..tokenizer import VOCAB_SIZE


@dataclass
class WhisperConfig:
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    num_heads: int = 6
    num_kv_heads: int = 0  # 0 -> = num_heads (MHA); < num_heads -> GQA
    d_ff: int = 1536
    num_mel_bins: int = NUM_MEL_BINS
    vocab_size: int = VOCAB_SIZE
    max_source_positions: int = DEFAULT_TOTAL_SPEC_COLUMNS // 2
    max_target_positions: int = 448
    dropout: float = 0.0
    compute_dtype: str = "bfloat16"  # dtype of matmul inputs; params stay float32
    remat: bool = False  # rematerialize layer activations in backward (memory)

    # --- optional encoder frame head (beyond reference) ----------------------
    # A per-encoder-position classification head trained jointly with the
    # seq2seq objective. One encoder position = RATIO spectrogram columns =
    # exactly one decoder timestamp quantum, so the head predicts, on the
    # same grid the decoder's timestamps live on: vocal activity, onset
    # events, offset events, and (when frame_head_clusters > 0) the cluster.
    # Used for learned boundary refinement / merged-segment splitting and for
    # a decoder-free fast VAD mode (Segmenter.segment_from_frames).
    frame_head: bool = False
    frame_head_clusters: int = 0  # cluster logits (0 = no cluster channel)

    # --- segmentation metadata (persisted with checkpoints) ---
    total_spec_columns: int = DEFAULT_TOTAL_SPEC_COLUMNS
    # Extended-vocabulary surfaces for ids >= tokenizer.VOCAB_SIZE: multi-digit
    # cluster BPE pieces of an imported HF checkpoint ('12', '17', ...). Empty
    # for natively trained models. vocab_size covers them (128-padded).
    extra_tokens: list = field(default_factory=list)
    # Exact BPE piece sequence per multi-digit cluster-id string, as the
    # imported HF checkpoint's own tokenizer produced it (e.g. {"123":
    # ["1", "23"]}). Greedy longest-match over the piece SET cannot
    # reconstruct merge order, so the import records the sequences; empty for
    # natively trained models (host-side metadata, not in the arch key).
    cluster_encodings: Dict[str, list] = field(default_factory=dict)
    cluster_codebook: Dict[str, int] = field(default_factory=dict)
    default_segmentation_config: Dict[str, Any] = field(default_factory=dict)
    current_step: int = 0
    model_name: str = "custom"

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.num_heads == 0
        return self.d_model // self.num_heads

    @property
    def kv_heads(self) -> int:
        """Number of K/V heads (grouped-query attention when < num_heads).

        GQA divides the decode step's dominant HBM stream — the cross-attention
        K/V (BENCH.md roofline) — by num_heads / kv_heads. Converting an MHA
        checkpoint: models/gqa.convert_to_gqa (mean-pooled heads, then uptrain).
        """
        n = self.num_kv_heads or self.num_heads
        assert self.num_heads % n == 0
        return n

    # --- hashability for use as a static jit argument ------------------------
    # Only fields that influence traced computation participate; mutable metadata
    # (cluster_codebook, default_segmentation_config, current_step) does not.
    def _arch_key(self):
        return (
            self.d_model, self.encoder_layers, self.decoder_layers, self.num_heads,
            self.num_kv_heads, self.d_ff, self.num_mel_bins, self.vocab_size,
            self.max_source_positions, self.max_target_positions,
            self.dropout, self.compute_dtype, self.total_spec_columns,
            self.remat,
            # the COUNT of extended tokens shapes the traced grammar mask
            # (decode.py); their surfaces are host-side-only
            len(self.extra_tokens),
            self.frame_head, self.frame_head_clusters,
        )

    def __hash__(self):
        return hash(self._arch_key())

    def __eq__(self, other):
        if not isinstance(other, WhisperConfig):
            return NotImplemented
        return self._arch_key() == other._arch_key()

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "WhisperConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


# Whisper family sizes (d_model / layers / heads), same as the published models.
_FAMILY = {
    "tiny": dict(d_model=384, encoder_layers=4, decoder_layers=4, num_heads=6),
    "base": dict(d_model=512, encoder_layers=6, decoder_layers=6, num_heads=8),
    "small": dict(d_model=768, encoder_layers=12, decoder_layers=12, num_heads=12),
    "medium": dict(d_model=1024, encoder_layers=24, decoder_layers=24, num_heads=16),
    "large": dict(d_model=1280, encoder_layers=32, decoder_layers=32, num_heads=20),
}


def make_config(
    name: str = "base",
    total_spec_columns: int = DEFAULT_TOTAL_SPEC_COLUMNS,
    dropout: float = 0.0,
    **overrides,
) -> WhisperConfig:
    """Build a config for a named Whisper family size."""
    if name not in _FAMILY:
        raise ValueError(f"unknown model size {name!r}; choose from {sorted(_FAMILY)}")
    base = dict(_FAMILY[name])
    base["d_ff"] = 4 * base["d_model"]
    base.update(overrides)
    return WhisperConfig(
        total_spec_columns=total_spec_columns,
        max_source_positions=total_spec_columns // 2,
        dropout=dropout,
        model_name=name,
        **base,
    )
