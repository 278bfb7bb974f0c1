"""Offline importer: HuggingFace Whisper checkpoints -> WhisperSeg-TPU pytrees.

The reference finetunes from HF checkpoints (``WhisperForConditionalGeneration``,
reference model.py:76-115) and converts them to CTranslate2 for inference. This
rebuild needs no conversion step — one pytree serves train and inference — but it
can *import* HF weights so users can start from published Whisper/WhisperSeg models.

Vocabulary handling: this framework uses a compact 1024-token vocabulary
(whisperseg_tpu/tokenizer.py) instead of the 51k BPE vocab, so embedding rows must
be gathered through a ``token_map`` (our_id -> hf_id). For checkpoints that carry a
HF tokenizer directory, :func:`build_token_map` derives the map from the saved vocab
(digits, control tokens, and the 1001 added timestamp + species tokens of
reference model.py:110-113). Unmappable rows keep their random initialization —
the same behavior the reference has for its freshly added tokens.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from .. import tokenizer as tok
from .config import WhisperConfig
from .whisper import init_params, sinusoid_position_table


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_hf_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read a HF checkpoint directory (safetensors or torch .bin) into numpy."""
    st_path = os.path.join(model_dir, "model.safetensors")
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: _to_np(v) for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights found under {model_dir}")


def _load_hf_vocab(tokenizer_dir: str) -> Dict[str, int]:
    """token string -> hf id from vocab.json + added_tokens.json."""
    vocab: Dict[str, int] = {}
    vocab_path = os.path.join(tokenizer_dir, "vocab.json")
    added_path = os.path.join(tokenizer_dir, "added_tokens.json")
    if os.path.exists(vocab_path):
        vocab.update(json.load(open(vocab_path)))
    if os.path.exists(added_path):
        vocab.update(json.load(open(added_path)))
    if not vocab:
        raise FileNotFoundError(f"no vocab.json/added_tokens.json under {tokenizer_dir}")
    return vocab


def _load_merge_ranks(tokenizer_dir: str) -> Dict[tuple, int]:
    """(left, right) -> merge priority from merges.txt (lower merges first)."""
    path = os.path.join(tokenizer_dir, "merges.txt")
    ranks: Dict[tuple, int] = {}
    if not os.path.exists(path):
        return ranks
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.rstrip("\n")
            if not line or line.startswith("#version"):
                continue
            parts = line.split(" ")
            if len(parts) == 2:
                ranks[(parts[0], parts[1])] = i
    return ranks


def bpe_encode_digits(digits: str, merge_ranks: Dict[tuple, int]):
    """Byte-pair-encode an all-digit pretoken exactly as a GPT2-style HF
    tokenizer does (ASCII digits are fixed points of the byte encoder, and the
    GPT2 pretokenizer groups a digit run into one pretoken): repeatedly merge
    the lowest-rank adjacent pair. Returns the list of piece strings.

    This is how the reference's frozen BPE vocabulary turns a multi-digit
    cluster id into a SINGLE token (e.g. '12'), which is why reference
    finetunes with cluster ids >= 10 were unmappable onto the compact
    digit-token vocabulary before extended tokens existed (PARITY.md)."""
    word = list(digits)
    while len(word) > 1:
        best_rank, best_pair = None, None
        for pair in zip(word, word[1:]):
            r = merge_ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        merged = []
        i = 0
        while i < len(word):
            if (i + 1 < len(word)
                    and (word[i], word[i + 1]) == best_pair):
                merged.append(word[i] + word[i + 1])
                i += 2
            else:
                merged.append(word[i])
                i += 1
        word = merged
    return word


def derive_extra_tokens(tokenizer_dir: str, cluster_int_ids):
    """Multi-digit BPE pieces needed to represent the given cluster integer
    ids the way the checkpoint's own tokenizer does.

    The reference embeds the integer cluster id in the transcript text
    (reference datautils.py:359-368); its BPE merges '12' into one token, so an
    imported finetune *generates* that single token. Each such piece gets an
    extended row in our vocabulary (ids >= tokenizer.VOCAB_SIZE).

    Returns ``(extras, encodings)``: ``extras`` maps piece -> hf id;
    ``encodings`` maps each multi-digit cluster string to its exact BPE piece
    sequence (merge ORDER matters — a greedy match over the piece set can
    pick a different partition, e.g. '123' -> ['12','3'] where BPE produced
    ['1','23']), persisted as ``cfg.cluster_encodings`` so label encoding
    reproduces the checkpoint's own tokenization."""
    vocab = _load_hf_vocab(tokenizer_dir)
    ranks = _load_merge_ranks(tokenizer_dir)
    extras: Dict[str, int] = {}
    encodings: Dict[str, list] = {}
    for cid in sorted({int(c) for c in cluster_int_ids}):
        s = str(cid)
        if len(s) < 2:
            continue
        pieces = [s] if s in vocab and not ranks else bpe_encode_digits(s, ranks)
        encodings[s] = list(pieces)
        for piece in pieces:
            if len(piece) > 1 and piece in vocab and piece not in extras:
                extras[piece] = vocab[piece]
    return extras, encodings


def build_token_map(tokenizer_dir: str,
                    extra_tokens: Optional[list] = None) -> Dict[int, int]:
    """our_token_id -> hf_token_id using the vocab files saved with a HF
    checkpoint. ``extra_tokens`` (ordered multi-digit piece surfaces) map onto
    extended ids ``VOCAB_SIZE + i``."""
    vocab = _load_hf_vocab(tokenizer_dir)

    mapping: Dict[int, int] = {}
    for our_id, token in enumerate(tok.ID_TO_TOKEN):
        if token in vocab:
            mapping[our_id] = vocab[token]
    # our pad has no HF equivalent by name; whisper uses eot as pad
    if tok.PAD_ID not in mapping and "<|endoftext|>" in vocab:
        mapping[tok.PAD_ID] = vocab["<|endoftext|>"]
    for i, piece in enumerate(extra_tokens or []):
        if piece in vocab:
            mapping[tok.VOCAB_SIZE + i] = vocab[piece]
    return mapping


def config_from_hf(hf_config, total_spec_columns: int = 1000) -> WhisperConfig:
    """Translate a HF WhisperConfig into ours (with pos-emb truncation semantics
    of reference model.py:79-84)."""
    return WhisperConfig(
        d_model=hf_config.d_model,
        encoder_layers=hf_config.encoder_layers,
        decoder_layers=hf_config.decoder_layers,
        num_heads=hf_config.encoder_attention_heads,
        d_ff=hf_config.encoder_ffn_dim,
        num_mel_bins=hf_config.num_mel_bins,
        max_source_positions=total_spec_columns // 2,
        max_target_positions=hf_config.max_target_positions,
        total_spec_columns=total_spec_columns,
    )


def params_from_hf_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: WhisperConfig,
    token_map: Optional[Dict[int, int]] = None,
    seed: int = 0,
):
    """Map a HF Whisper state dict onto our stacked-layer pytree."""
    import jax

    params = jax.tree.map(np.asarray, init_params(jax.random.PRNGKey(seed), cfg))

    def g(name):
        key = name if name in sd else "model." + name
        return sd[key].astype(np.float32)

    enc = params["encoder"]
    enc["conv1_w"] = g("encoder.conv1.weight").transpose(2, 1, 0)
    enc["conv1_b"] = g("encoder.conv1.bias")
    enc["conv2_w"] = g("encoder.conv2.weight").transpose(2, 1, 0)
    enc["conv2_b"] = g("encoder.conv2.bias")
    # Truncate encoder positions to max_source_positions (reference model.py:79-84).
    pos = g("encoder.embed_positions.weight")
    if pos.shape[0] < cfg.max_source_positions:
        ext = sinusoid_position_table(cfg.max_source_positions, cfg.d_model)
        ext[: pos.shape[0]] = pos
        pos = ext
    enc["pos_emb"] = pos[: cfg.max_source_positions]
    enc["ln_post_g"] = g("encoder.layer_norm.weight")
    enc["ln_post_b"] = g("encoder.layer_norm.bias")

    def stack(fmt, transpose=False):
        mats = [g(fmt.format(i)) for i in range(cfg.encoder_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    el = enc["layers"]
    p = "encoder.layers.{}."
    el["ln1_g"] = stack(p + "self_attn_layer_norm.weight")
    el["ln1_b"] = stack(p + "self_attn_layer_norm.bias")
    el["q_w"] = stack(p + "self_attn.q_proj.weight", transpose=True)
    el["q_b"] = stack(p + "self_attn.q_proj.bias")
    el["k_w"] = stack(p + "self_attn.k_proj.weight", transpose=True)
    el["v_w"] = stack(p + "self_attn.v_proj.weight", transpose=True)
    el["v_b"] = stack(p + "self_attn.v_proj.bias")
    el["o_w"] = stack(p + "self_attn.out_proj.weight", transpose=True)
    el["o_b"] = stack(p + "self_attn.out_proj.bias")
    el["ln2_g"] = stack(p + "final_layer_norm.weight")
    el["ln2_b"] = stack(p + "final_layer_norm.bias")
    el["fc1_w"] = stack(p + "fc1.weight", transpose=True)
    el["fc1_b"] = stack(p + "fc1.bias")
    el["fc2_w"] = stack(p + "fc2.weight", transpose=True)
    el["fc2_b"] = stack(p + "fc2.bias")

    dec = params["decoder"]
    emb = g("decoder.embed_tokens.weight")
    if token_map is not None:
        new_emb = np.asarray(dec["tok_emb"]).copy()
        for our_id, hf_id in token_map.items():
            if hf_id < emb.shape[0]:
                new_emb[our_id] = emb[hf_id]
        dec["tok_emb"] = new_emb
    else:
        if emb.shape[0] < cfg.vocab_size:
            new_emb = np.asarray(dec["tok_emb"]).copy()
            new_emb[: emb.shape[0]] = emb
            dec["tok_emb"] = new_emb
        else:
            dec["tok_emb"] = emb[: cfg.vocab_size]
    dpos = g("decoder.embed_positions.weight")
    dec["pos_emb"] = dpos[: cfg.max_target_positions]
    dec["ln_post_g"] = g("decoder.layer_norm.weight")
    dec["ln_post_b"] = g("decoder.layer_norm.bias")

    def dstack(fmt, transpose=False):
        mats = [g(fmt.format(i)) for i in range(cfg.decoder_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    dl = dec["layers"]
    p = "decoder.layers.{}."
    dl["ln1_g"] = dstack(p + "self_attn_layer_norm.weight")
    dl["ln1_b"] = dstack(p + "self_attn_layer_norm.bias")
    dl["q_w"] = dstack(p + "self_attn.q_proj.weight", transpose=True)
    dl["q_b"] = dstack(p + "self_attn.q_proj.bias")
    dl["k_w"] = dstack(p + "self_attn.k_proj.weight", transpose=True)
    dl["v_w"] = dstack(p + "self_attn.v_proj.weight", transpose=True)
    dl["v_b"] = dstack(p + "self_attn.v_proj.bias")
    dl["o_w"] = dstack(p + "self_attn.out_proj.weight", transpose=True)
    dl["o_b"] = dstack(p + "self_attn.out_proj.bias")
    dl["lnx_g"] = dstack(p + "encoder_attn_layer_norm.weight")
    dl["lnx_b"] = dstack(p + "encoder_attn_layer_norm.bias")
    dl["xq_w"] = dstack(p + "encoder_attn.q_proj.weight", transpose=True)
    dl["xq_b"] = dstack(p + "encoder_attn.q_proj.bias")
    dl["xk_w"] = dstack(p + "encoder_attn.k_proj.weight", transpose=True)
    dl["xv_w"] = dstack(p + "encoder_attn.v_proj.weight", transpose=True)
    dl["xv_b"] = dstack(p + "encoder_attn.v_proj.bias")
    dl["xo_w"] = dstack(p + "encoder_attn.out_proj.weight", transpose=True)
    dl["xo_b"] = dstack(p + "encoder_attn.out_proj.bias")
    dl["ln2_g"] = dstack(p + "final_layer_norm.weight")
    dl["ln2_b"] = dstack(p + "final_layer_norm.bias")
    dl["fc1_w"] = dstack(p + "fc1.weight", transpose=True)
    dl["fc1_b"] = dstack(p + "fc1.bias")
    dl["fc2_w"] = dstack(p + "fc2.weight", transpose=True)
    dl["fc2_b"] = dstack(p + "fc2.bias")

    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


def import_hf_checkpoint(model_dir: str,
                         total_spec_columns: Optional[int] = 1000):
    """Full import of a HF Whisper checkpoint directory -> (params, config).

    Beyond the architecture weights this also imports the segmentation
    metadata the reference persists inside the HF config object —
    ``cluster_codebook``, ``species_codebook`` implicit via species tokens,
    ``default_segmentation_config``, ``total_spec_columns``, ``current_step``
    (reference model.py:86-108, train.py:145-149) — so an imported reference
    finetune is immediately usable for segmentation. Multi-digit cluster ids
    get extended vocabulary rows with embeddings gathered from the
    checkpoint's own BPE pieces (see :func:`derive_extra_tokens`)."""
    from transformers import WhisperConfig as HFConfig

    hf_cfg = HFConfig.from_pretrained(model_dir)
    raw = {}
    cfg_path = os.path.join(model_dir, "config.json")
    if os.path.exists(cfg_path):
        raw = json.load(open(cfg_path))
    if total_spec_columns is None:
        total_spec_columns = int(raw.get("total_spec_columns", 1000))
    cfg = config_from_hf(hf_cfg, total_spec_columns)
    cfg.cluster_codebook = dict(raw.get("cluster_codebook", {}) or {})
    cfg.default_segmentation_config = dict(
        raw.get("default_segmentation_config", {}) or {})
    cfg.current_step = int(raw.get("current_step", 0) or 0)
    if raw.get("whisperseg_compute_dtype"):
        cfg.compute_dtype = str(raw["whisperseg_compute_dtype"])
    if raw.get("whisperseg_model_name"):
        cfg.model_name = str(raw["whisperseg_model_name"])

    sd = load_hf_state_dict(model_dir)
    token_map = None
    stamped = "extra_tokens" in raw
    try:
        if stamped:
            # a checkpoint exported by export_hf stamps its extended-token
            # layout directly — trust it over re-deriving from merges.txt
            # (merge re-derivation is for third-party HF checkpoints), and
            # its embedding matrix is already in OUR id layout so it copies
            # straight across (token_map stays None), padded rows included
            cfg.extra_tokens = list(raw.get("extra_tokens") or [])
            cfg.cluster_encodings = {
                k: list(v)
                for k, v in (raw.get("cluster_encodings") or {}).items()}
        else:
            extras, encodings = derive_extra_tokens(
                model_dir, cfg.cluster_codebook.values())
            cfg.extra_tokens = list(extras.keys())
            cfg.cluster_encodings = encodings
        if cfg.extra_tokens:
            # extended rows live right after the compact vocab; pad the row
            # count to the next multiple of 128 (one MXU lane tile)
            n = len(cfg.extra_tokens)
            cfg.vocab_size = tok.VOCAB_SIZE + ((n + 127) // 128) * 128
        if not stamped:
            token_map = build_token_map(model_dir, cfg.extra_tokens)
    except FileNotFoundError:
        pass
    params = params_from_hf_state_dict(sd, cfg, token_map)
    if raw.get("frame_head") and "frame_head.h1_w" in sd:
        # the frame head (no HF equivalent) rides along as extra tensors
        # that transformers ignores; restore it for a lossless round-trip
        import jax.numpy as jnp

        cfg.frame_head = True
        cfg.frame_head_clusters = int(raw.get("frame_head_clusters", 0) or 0)
        params["frame_head"] = {
            k.split(".", 1)[1]: jnp.asarray(v.astype(np.float32))
            for k, v in sd.items() if k.startswith("frame_head.")}
    return params, cfg
