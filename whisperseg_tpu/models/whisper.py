"""Whisper encoder-decoder as pure JAX functions over pytree parameters.

A single implementation serves training (teacher forcing) and fast inference
(pre-allocated KV-cache decoding) — replacing the reference's dual engines
(HF transformers for training, CTranslate2 for inference; reference model.py:
625-676, 678-746, convert_hf_to_ct2.py).

TPU-first design choices:
  * layer parameters are stacked along a leading ``num_layers`` axis and the layer
    loop is a ``lax.scan`` — compile time stays flat in depth (32-layer large).
  * matmul inputs are cast to ``config.compute_dtype`` (bfloat16 by default) with
    float32 accumulation (``preferred_element_type``) — MXU-friendly.
  * layer norms and softmax run in float32.
  * the KV cache is laid out ``[num_layers, B, max_len, heads, head_dim]`` and
    updated with ``dynamic_update_slice`` inside the scan, so one step is a single
    fused XLA computation.

Shapes follow the conventions of the published Whisper architecture so official
weights can be imported (models/convert_hf.py). The encoder positional table is
sinusoidal at init (as in Whisper) but stored as a parameter, mirroring the
reference's truncation of it to ``total_spec_columns // 2`` rows
(reference model.py:79-84).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .config import WhisperConfig

Params = Dict[str, Any]


# --------------------------------------------------------------------------- init


def sinusoid_position_table(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal position embedding (interleaved sin/cos halves)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def _dense_init(key, shape, scale=None):
    fan_in = shape[0]
    scale = scale if scale is not None else 1.0 / math.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype=jnp.float32) * scale


def _layer_params(key, cfg: WhisperConfig, cross_attention: bool) -> Params:
    d, f = cfg.d_model, cfg.d_ff
    dkv = cfg.kv_heads * cfg.head_dim  # < d under grouped-query attention
    ks = jax.random.split(key, 12)
    p = {
        "ln1_g": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "q_w": _dense_init(ks[0], (d, d)), "q_b": jnp.zeros((d,)),
        "k_w": _dense_init(ks[1], (d, dkv)),
        "v_w": _dense_init(ks[2], (d, dkv)), "v_b": jnp.zeros((dkv,)),
        "o_w": _dense_init(ks[3], (d, d)), "o_b": jnp.zeros((d,)),
        "ln2_g": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
        "fc1_w": _dense_init(ks[4], (d, f)), "fc1_b": jnp.zeros((f,)),
        "fc2_w": _dense_init(ks[5], (f, d)), "fc2_b": jnp.zeros((d,)),
    }
    if cross_attention:
        p.update({
            "lnx_g": jnp.ones((d,)), "lnx_b": jnp.zeros((d,)),
            "xq_w": _dense_init(ks[6], (d, d)), "xq_b": jnp.zeros((d,)),
            "xk_w": _dense_init(ks[7], (d, dkv)),
            "xv_w": _dense_init(ks[8], (d, dkv)), "xv_b": jnp.zeros((dkv,)),
            "xo_w": _dense_init(ks[9], (d, d)), "xo_b": jnp.zeros((d,)),
        })
    return p


def _stack_layers(key, cfg: WhisperConfig, n: int, cross: bool) -> Params:
    keys = jax.random.split(key, n)
    layers = [_layer_params(k, cfg, cross) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def init_params(key, cfg: WhisperConfig) -> Params:
    d = cfg.d_model
    k_enc, k_dec, k_c1, k_c2, k_emb = jax.random.split(key, 5)
    encoder = {
        "conv1_w": _dense_init(k_c1, (3, cfg.num_mel_bins, d),
                               scale=1.0 / math.sqrt(3 * cfg.num_mel_bins)),
        "conv1_b": jnp.zeros((d,)),
        "conv2_w": _dense_init(k_c2, (3, d, d), scale=1.0 / math.sqrt(3 * d)),
        "conv2_b": jnp.zeros((d,)),
        "pos_emb": jnp.asarray(sinusoid_position_table(cfg.max_source_positions, d)),
        "layers": _stack_layers(k_enc, cfg, cfg.encoder_layers, cross=False),
        "ln_post_g": jnp.ones((d,)), "ln_post_b": jnp.zeros((d,)),
    }
    decoder = {
        "tok_emb": _dense_init(k_emb, (cfg.vocab_size, d), scale=0.02),
        "pos_emb": jnp.zeros((cfg.max_target_positions, d)),
        "layers": _stack_layers(k_dec, cfg, cfg.decoder_layers, cross=True),
        "ln_post_g": jnp.ones((d,)), "ln_post_b": jnp.zeros((d,)),
    }
    params = {"encoder": encoder, "decoder": decoder}
    if cfg.frame_head:
        params["frame_head"] = init_frame_head(key, cfg)
    return params


def init_frame_head(key, cfg: WhisperConfig) -> Params:
    """Parameters of the optional per-encoder-position head: LN -> dense ->
    gelu -> dense to [vocal, onset, offset] (+ cluster logits)."""
    d = cfg.d_model
    hidden = max(d // 2, 64)
    out = 3 + cfg.frame_head_clusters
    k1, k2 = jax.random.split(jax.random.fold_in(key, 0x5E6), 2)
    return {
        "ln_g": jnp.ones((d,)), "ln_b": jnp.zeros((d,)),
        "h1_w": _dense_init(k1, (d, hidden)), "h1_b": jnp.zeros((hidden,)),
        "h2_w": _dense_init(k2, (hidden, out)), "h2_b": jnp.zeros((out,)),
    }


def ensure_frame_head(params: Params, cfg: WhisperConfig, key) -> Params:
    """Add a freshly initialized frame head to a parameter tree that lacks one
    (e.g. an imported HF checkpoint or an earlier native checkpoint), so
    ``--frame_head`` finetuning works from any starting point."""
    fh = params.get("frame_head")
    want_out = 3 + cfg.frame_head_clusters
    if fh is not None and fh["h2_w"].shape[-1] == want_out:
        return params
    new = dict(params)
    head = init_frame_head(key, cfg)
    if fh is not None:
        # cluster-count change: keep trained layers, widen/narrow the output
        keep = min(fh["h2_w"].shape[-1], want_out)
        fresh_w2 = head["h2_w"]
        head = dict(fh)
        head["h2_w"] = fresh_w2.at[:, :keep].set(jnp.asarray(fh["h2_w"])[:, :keep])
        head["h2_b"] = jnp.zeros((want_out,)).at[:keep].set(
            jnp.asarray(fh["h2_b"])[:keep])
    new["frame_head"] = head
    return new


def frame_head_forward(params: Params, cfg: WhisperConfig, enc_out):
    """Encoder hidden states [B, S, D] -> frame logits [B, S, 3 + C] float32.

    Channels: 0 = vocal activity, 1 = onset event, 2 = offset event,
    3.. = cluster logits. One position = one decoder timestamp quantum
    (= RATIO spectrogram columns = spec_time_step * RATIO seconds)."""
    fh = params["frame_head"]
    cdt = jnp.dtype(cfg.compute_dtype)
    h = _layer_norm(enc_out, fh["ln_g"], fh["ln_b"])
    h = jax.nn.gelu(_dot(h, fh["h1_w"], cdt) + fh["h1_b"], approximate=False)
    return (_dot(h, fh["h2_w"], cdt) + fh["h2_b"]).astype(jnp.float32)


def frame_head_loss(logits, targets, cluster_pos_weight: float = 1.0,
                    boundary_weight: float = 1.0):
    """Multi-task frame loss.

    ``targets`` is a dict of [B, S] arrays: ``vocal`` (0/1 float), ``onset`` /
    ``offset`` (soft 0..1 float — Gaussian-smoothed events, built host-side in
    data.py), and optionally ``cluster`` (int32, -1 = unlabeled position).
    Binary channels use sigmoid BCE (mean over all positions); the cluster
    channel uses softmax CE masked to labeled (vocal) positions.

    ``boundary_weight`` scales the onset/offset (cut) channels relative to
    the vocal channel: boundary events occupy a few positions per segment so
    their gradient is naturally dwarfed by the dense vocal BCE — upweighting
    them targets the merged-sub-call failure mode (densely annotated corpora
    like meerkat, where detection is right but segmentation granularity is
    not; RESULTS.md oracle sweeps)."""
    def bce(logit, target):
        # numerically stable x - x*z + log(1 + exp(-x)) form
        return jnp.mean(
            jnp.maximum(logit, 0) - logit * target
            + jnp.log1p(jnp.exp(-jnp.abs(logit))))

    loss = (bce(logits[..., 0], targets["vocal"])
            + boundary_weight * (bce(logits[..., 1], targets["onset"])
                                 + bce(logits[..., 2], targets["offset"])))
    cluster = targets.get("cluster")
    if cluster is not None and logits.shape[-1] > 3:
        logp = jax.nn.log_softmax(logits[..., 3:], axis=-1)
        mask = cluster >= 0
        safe = jnp.where(mask, cluster, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(mask), 1)
        loss = loss + cluster_pos_weight * jnp.sum(
            jnp.where(mask, nll, 0.0)) / denom
    return loss


def num_parameters(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------- primitives


def _layer_norm(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return y * g + b


def _dot(x, w, cdt):
    from ..ops.quant import Quant4Tensor, QuantTensor, qdot

    if isinstance(w, (QuantTensor, Quant4Tensor)):
        return qdot(x, w)
    return jnp.dot(x.astype(cdt), w.astype(cdt), preferred_element_type=jnp.float32)


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def _attention(q, k, v, cdt, mask=None):
    """q: [B,Lq,H,hd]; k,v: [B,Lk,Hkv,hd] with H % Hkv == 0 (grouped-query
    attention when Hkv < H; mask broadcastable to the score shape).

    In bf16 compute the materialized score/prob tensors stay bf16 (softmax
    statistics still f32 inside the fusion) — they are the dominant HBM stream
    for long-sequence attention; f32 compute keeps f32 throughout. The GQA
    path keeps K/V un-expanded (grouped einsum) so the smaller K/V is what
    streams from HBM."""
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    cdt = jnp.dtype(cdt)
    score_dtype = jnp.float32 if cdt == jnp.float32 else jnp.bfloat16
    h, hk = q.shape[2], k.shape[2]
    if h != hk:
        b, lq = q.shape[:2]
        g = h // hk
        q5 = q.reshape(b, lq, hk, g, head_dim)
        scores = jnp.einsum(
            "bqkgd,bskd->bkgqs", (q5 * scale).astype(cdt), k.astype(cdt),
            preferred_element_type=score_dtype,
        )
        if mask is not None:
            # mask comes in as [..., Lq, Lk]; broadcast over (kv-head, group)
            scores = jnp.where(mask[:, :, None], scores,
                               jnp.asarray(-1e30, score_dtype))
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum(
            "bkgqs,bskd->bqkgd", probs.astype(cdt), v.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(b, lq, h * head_dim)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", (q * scale).astype(cdt), k.astype(cdt),
        preferred_element_type=score_dtype,
    )
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.asarray(-1e30, score_dtype))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(cdt), v.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    b, lq, h, hd = out.shape
    return out.reshape(b, lq, h * hd)


def _dropout(x, rate, rng):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------- head-major projections
#
# The fused encoder-attention kernel wants [B, H, S, hd] (and K transposed to
# [B, Hkv, hd, S]). Emitting those layouts straight from the projection
# einsums lets XLA fuse the relayout into the matmul epilogue — the separate
# transpose+pad passes the kernel otherwise needs (4 per layer) disappear.


def _deq_full(w, cdt):
    from ..ops.quant import Quant4Tensor, QuantTensor, unpack4

    if isinstance(w, QuantTensor):
        return w.values.astype(cdt) * w.scale.astype(cdt)
    if isinstance(w, Quant4Tensor):
        return unpack4(w, cdt)
    return w.astype(cdt)


def _project_heads(h, w, b, heads: int, cdt):
    """h [B, S, D] @ w [D, heads*hd] -> [B, heads, S, hd] (bias optional)."""
    d = h.shape[-1]
    w3 = _deq_full(w, cdt).reshape(d, heads, -1)
    out = jnp.einsum("bsd,dhf->bhsf", h.astype(cdt), w3,
                     preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.reshape(1, heads, 1, -1)
    return out.astype(cdt)


def _project_heads_t(h, w, heads: int, cdt):
    """h [B, S, D] @ w [D, heads*hd] -> [B, heads, hd, S] (K, pre-transposed)."""
    d = h.shape[-1]
    w3 = _deq_full(w, cdt).reshape(d, heads, -1)
    return jnp.einsum("bsd,dhf->bhfs", h.astype(cdt), w3,
                      preferred_element_type=jnp.float32).astype(cdt)


def _oproj_heads(a4, w, b, cdt):
    """a4 [B, H, S, hd] @ w [H*hd, D] -> [B, S, D] float32 (+ bias)."""
    heads, hd = a4.shape[1], a4.shape[3]
    w3 = _deq_full(w, cdt).reshape(heads, hd, -1)
    return jnp.einsum("bhsf,hfd->bsd", a4.astype(cdt), w3,
                      preferred_element_type=jnp.float32) + b


# ------------------------------------------------------------------------- encoder


def encoder_forward(
    params: Params,
    cfg: WhisperConfig,
    features,  # [B, num_mel_bins, T]
    train: bool = False,
    dropout_rng=None,
):
    """Log-mel features -> encoder hidden states [B, T // 2, d_model]."""
    enc = params["encoder"]
    cdt = jnp.dtype(cfg.compute_dtype)

    # Convs run fully in the compute dtype and upcast after: mixing
    # preferred_element_type=f32 with bf16 conv operands breaks the conv
    # transpose rule under grad (cotangents arrive f32).
    x = features.astype(cdt)
    dn = ("NCH", "HIO", "NCH")
    x = lax.conv_general_dilated(
        x, enc["conv1_w"].astype(cdt), window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=dn,
    ).astype(jnp.float32) + enc["conv1_b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = lax.conv_general_dilated(
        x.astype(cdt), enc["conv2_w"].astype(cdt), window_strides=(2,),
        padding=[(1, 1)], dimension_numbers=dn,
    ).astype(jnp.float32) + enc["conv2_b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = x.transpose(0, 2, 1)  # [B, S, D]

    s = x.shape[1]
    x = (x + enc["pos_emb"][:s][None]).astype(jnp.float32)

    rate = cfg.dropout if train else 0.0
    num_heads = cfg.num_heads
    kv_heads = cfg.kv_heads
    head_dim = cfg.head_dim

    # Head-major fast path (TPU): run the WHOLE encoder at the 128-padded
    # sequence length, emit q/k/v straight in the kernel's layouts from the
    # projection einsums, and mask padded keys inside the kernel — zero
    # relayout/pad passes per layer. The padded rows carry garbage but never
    # influence valid keys; they are sliced off at the end.
    from ..ops.attention import fused_attention_hm, fused_available

    # the head-major kernel unrolls one whole kv-group per grid step, so it
    # needs group size <= 8 (its VMEM budget); MQA/extreme-GQA on wide models
    # (e.g. num_kv_heads=1 at 12+ heads) takes the XLA einsum path instead
    use_hm = (fused_available(s, head_dim, False)
              and num_heads // max(kv_heads, 1) <= 8)
    sp = -(-s // 128) * 128
    if use_hm and sp != s:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    def layer_fn(x, scanned):
        if rate > 0.0:
            lp, rng = scanned
            rng1, rng2 = jax.random.split(rng)
        else:
            lp = scanned
        h = _layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        if use_hm:
            q4 = _project_heads(h, lp["q_w"], lp["q_b"], num_heads, cdt)
            kt4 = _project_heads_t(h, lp["k_w"], kv_heads, cdt)
            v4 = _project_heads(h, lp["v_w"], lp["v_b"], kv_heads, cdt)
            a4 = fused_attention_hm(s, q4, kt4, v4)        # [B, H, Sp, hd]
            a = _oproj_heads(a4, lp["o_w"], lp["o_b"], cdt)
        else:
            q = _split_heads(_dot(h, lp["q_w"], cdt) + lp["q_b"], num_heads)
            k = _split_heads(_dot(h, lp["k_w"], cdt), kv_heads)
            v = _split_heads(_dot(h, lp["v_w"], cdt) + lp["v_b"], kv_heads)
            # XLA einsum attention (MHA and GQA); flash under WS_FLASH=1
            from ..ops.attention import self_attention

            a = self_attention(q.astype(cdt), k.astype(cdt), v.astype(cdt))
            a = _dot(a, lp["o_w"], cdt) + lp["o_b"]
        if rate > 0.0:
            a = _dropout(a, rate, rng1)
        x = x + a
        h = _layer_norm(x, lp["ln2_g"], lp["ln2_b"])
        h = jax.nn.gelu(_dot(h, lp["fc1_w"], cdt) + lp["fc1_b"], approximate=False)
        h = _dot(h, lp["fc2_w"], cdt) + lp["fc2_b"]
        if rate > 0.0:
            h = _dropout(h, rate, rng2)
        x = x + h
        return x, None

    if cfg.remat:
        # recompute layer activations in backward: memory O(1) in depth
        # (jax.checkpoint; the TPU trade of HBM for MXU FLOPs)
        layer_fn = jax.checkpoint(layer_fn)
    if rate > 0.0:
        x, _ = lax.scan(layer_fn, x, (enc["layers"],
                                      jax.random.split(dropout_rng, cfg.encoder_layers)))
    else:
        x, _ = lax.scan(layer_fn, x, enc["layers"])

    if use_hm and sp != s:
        x = x[:, :s]
    return _layer_norm(x, enc["ln_post_g"], enc["ln_post_b"])


# ------------------------------------------------------------------------- decoder


def decoder_forward_train(
    params: Params,
    cfg: WhisperConfig,
    enc_out,      # [B, S, D]
    input_ids,    # [B, L] int32
    train: bool = False,
    dropout_rng=None,
):
    """Teacher-forced decoder -> logits [B, L, vocab] (float32)."""
    dec = params["decoder"]
    cdt = jnp.dtype(cfg.compute_dtype)
    num_heads = cfg.num_heads
    kv_heads = cfg.kv_heads
    b, l = input_ids.shape

    # residual stream stays f32 regardless of parameter storage dtype
    x = (dec["tok_emb"][input_ids] + dec["pos_emb"][:l][None]).astype(jnp.float32)

    causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]  # [1,1,L,L]

    rate = cfg.dropout if train else 0.0
    if rate > 0.0:
        layer_rngs = jax.random.split(dropout_rng, cfg.decoder_layers)

    def layer_fn(x, scanned):
        if rate > 0.0:
            lp, rng = scanned
            rng1, rng2, rng3 = jax.random.split(rng, 3)
        else:
            lp = scanned
        h = _layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        q = _split_heads(_dot(h, lp["q_w"], cdt) + lp["q_b"], num_heads)
        k = _split_heads(_dot(h, lp["k_w"], cdt), kv_heads)
        v = _split_heads(_dot(h, lp["v_w"], cdt) + lp["v_b"], kv_heads)
        a = _dot(_attention(q, k, v, cdt, mask=causal), lp["o_w"], cdt) + lp["o_b"]
        if rate > 0.0:
            a = _dropout(a, rate, rng1)
        x = x + a

        h = _layer_norm(x, lp["lnx_g"], lp["lnx_b"])
        q = _split_heads(_dot(h, lp["xq_w"], cdt) + lp["xq_b"], num_heads)
        k = _split_heads(_dot(enc_out, lp["xk_w"], cdt), kv_heads)
        v = _split_heads(_dot(enc_out, lp["xv_w"], cdt) + lp["xv_b"], kv_heads)
        a = _dot(_attention(q, k, v, cdt), lp["xo_w"], cdt) + lp["xo_b"]
        if rate > 0.0:
            a = _dropout(a, rate, rng2)
        x = x + a

        h = _layer_norm(x, lp["ln2_g"], lp["ln2_b"])
        h = jax.nn.gelu(_dot(h, lp["fc1_w"], cdt) + lp["fc1_b"], approximate=False)
        h = _dot(h, lp["fc2_w"], cdt) + lp["fc2_b"]
        if rate > 0.0:
            h = _dropout(h, rate, rng3)
        x = x + h
        return x, None

    if cfg.remat:
        layer_fn = jax.checkpoint(layer_fn)
    if rate > 0.0:
        x, _ = lax.scan(layer_fn, x, (dec["layers"], layer_rngs))
    else:
        x, _ = lax.scan(layer_fn, x, dec["layers"])

    x = _layer_norm(x, dec["ln_post_g"], dec["ln_post_b"])
    logits = _dot(x, dec["tok_emb"].T, cdt)
    return logits


def cross_entropy_loss(logits, labels, ignore_id: int = -100,
                       timestamp_weight: float = 1.0,
                       timestamp_sigma: float = 0.0):
    """Mean token cross-entropy with ``ignore_id`` masking (HF semantics:
    mean over non-ignored target tokens; reference train.py:30-31).

    Two beyond-reference knobs attack boundary accuracy directly (the
    segment-wise F1 failure mode is onsets/offsets outside the +-10 ms
    tolerance, not missing detections — RESULTS.md):

    * ``timestamp_weight`` > 1 upweights timestamp-token targets relative to
      cluster-digit / control tokens, spending more of the gradient budget on
      the boundary predictions that segment-wise F1 scores.
    * ``timestamp_sigma`` > 0 replaces the one-hot target of a timestamp token
      with a discrete Gaussian over neighboring *columns* (stddev in columns,
      truncated at 3 sigma, renormalized). Timestamp tokens are ordinal —
      column 41 is a near-miss for column 40, not just "wrong" — but one-hot
      CE treats all errors equally; the soft target makes the loss
      distance-aware so near-misses cost less than far misses.
    """
    mask = labels != ignore_id
    safe_labels = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]

    from ..tokenizer import NUM_TIMESTAMPS, TIMESTAMP_BASE

    is_ts = (safe_labels >= TIMESTAMP_BASE) & (
        safe_labels < TIMESTAMP_BASE + NUM_TIMESTAMPS)

    if timestamp_sigma and timestamp_sigma > 0:
        # static neighborhood: offsets [-K..K] in column space
        K = max(1, int(math.ceil(3.0 * timestamp_sigma)))
        offs = np.arange(-K, K + 1)
        w = np.exp(-0.5 * (offs / timestamp_sigma) ** 2)
        w = (w / w.sum()).astype(np.float32)
        soft = jnp.zeros_like(nll)
        for k, wk in zip(offs, w):
            # out-of-range neighbors clip onto the edge column (mass preserved)
            idx = jnp.clip(safe_labels + int(k), TIMESTAMP_BASE,
                           TIMESTAMP_BASE + NUM_TIMESTAMPS - 1)
            soft = soft - float(wk) * jnp.take_along_axis(
                logp, idx[..., None], axis=-1)[..., 0]
        nll = jnp.where(is_ts, soft, nll)

    token_w = jnp.where(is_ts, jnp.float32(timestamp_weight), jnp.float32(1.0))
    token_w = jnp.where(mask, token_w, 0.0)
    total = jnp.sum(nll * token_w)
    count = jnp.maximum(jnp.sum(token_w), 1e-6)
    return total / count


# ------------------------------------------------------------------ cached decoding


def precompute_cross_kv(params: Params, cfg: WhisperConfig, enc_out,
                        int8_kv: bool = False):
    """Cross-attention K/V for all decoder layers: ([Ld, B, S, H, hd], same).

    ``int8_kv=True`` stores K/V as (int8 values, per-position-head f32 scale)
    tuples — the cross-KV stream is the largest per-decode-step HBM read
    (batch x 500 positions x d_model x 2 x layers; 5.2 GB at whisper-large
    batch 32), so halving its bytes matters more than weight quantization."""
    dec = params["decoder"]
    cdt = jnp.dtype(cfg.compute_dtype)
    kv_heads = cfg.kv_heads

    def one_layer(lp):
        k = _split_heads(_dot(enc_out, lp["xk_w"], cdt), kv_heads)
        v = _split_heads(_dot(enc_out, lp["xv_w"], cdt) + lp["xv_b"], kv_heads)
        return k.astype(cdt), v.astype(cdt)

    k, v = jax.vmap(one_layer)(dec["layers"])
    if not int8_kv:
        return k, v

    from ..ops.cross_attention import quantize_kv_for_kernel

    kq, ks, vq, vs, _seq = quantize_kv_for_kernel(k, v, kv_heads)
    return (kq, ks), (vq, vs)


def init_cache(cfg: WhisperConfig, batch: int, max_len: int):
    """Pre-allocated self-attention KV cache [Ld, B, max_len, H, hd] (compute dtype)."""
    cdt = jnp.dtype(cfg.compute_dtype)
    shape = (cfg.decoder_layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype=cdt), jnp.zeros(shape, dtype=cdt)


def decoder_step(
    params: Params,
    cfg: WhisperConfig,
    cross_k,      # [Ld, B, S, H, hd], or (int8 values, scales) kernel layout
    cross_v,
    input_ids,    # [B, Lc] — chunk of new tokens (prefill: prompt; decode: 1)
    pos0,         # scalar int32: absolute position of input_ids[:, 0]
    cache_k,      # [Ld, B, max_len, H, hd]
    cache_v,
    cross_seq_len: int = 0,  # valid encoder positions (int8 KV layout only)
    truepos=None,    # optional [B] int32: per-row TRUE sequence position of
                     # input_ids[:, 0] (slot mode; pos0 becomes the cache slot)
    slot_valid=None,  # optional [B, max_len] bool: which cache slots hold
                      # committed history (slot mode, see decode.py speculative)
):
    """Run the decoder over a chunk of new tokens with KV caching.

    Returns (logits [B, Lc, vocab] float32, new_cache_k, new_cache_v).
    This one function covers both prompt prefill (Lc > 1) and the autoregressive
    inner loop (Lc == 1); the self-attention mask allows key position ``kp`` for
    query chunk index ``qi`` iff ``kp <= pos0 + qi``.

    Slot mode (speculative decoding): when ``truepos``/``slot_valid`` are
    given, cache indices decouple from sequence positions — the chunk's K/V
    are written at slots ``pos0..pos0+Lc-1`` (the same for every row, so one
    dynamic_update_slice suffices; no scatter), positional embeddings use the
    per-row ``truepos``, and self-attention sees committed history slots
    (``slot_valid``) plus the causal prefix of the current chunk. Rejected
    draft slots simply stay masked forever.
    """
    dec = params["decoder"]
    cdt = jnp.dtype(cfg.compute_dtype)
    num_heads = cfg.num_heads
    kv_heads = cfg.kv_heads
    b, lc = input_ids.shape
    max_len = cache_k.shape[2]

    if truepos is None:
        pos = pos0 + jnp.arange(lc)
        pos_emb = jnp.take(dec["pos_emb"], pos, axis=0)[None]    # [1, Lc, D]
    else:
        pos = truepos[:, None] + jnp.arange(lc)[None]            # [B, Lc]
        pos = jnp.clip(pos, 0, dec["pos_emb"].shape[0] - 1)
        pos_emb = jnp.take(dec["pos_emb"], pos, axis=0)          # [B, Lc, D]
    x = (dec["tok_emb"][input_ids] + pos_emb).astype(jnp.float32)

    key_pos = jnp.arange(max_len)[None, None, None, :]           # [1,1,1,K]
    qi = jnp.arange(lc)[None, None, :, None]                     # [1,1,Lc,1]
    if slot_valid is None:
        self_mask = key_pos <= pos0 + qi
    else:
        in_chunk = (key_pos >= pos0) & (key_pos <= pos0 + qi)    # [1,1,Lc,K]
        hist = slot_valid[:, None, None, :] & (key_pos < pos0)   # [B,1,1,K]
        self_mask = hist | in_chunk                              # [B,1,Lc,K]

    def layer_fn(x, scanned):
        lp, xk_l, xv_l, ck_l, cv_l = scanned
        h = _layer_norm(x, lp["ln1_g"], lp["ln1_b"])
        q = _split_heads(_dot(h, lp["q_w"], cdt) + lp["q_b"], num_heads)
        k = _split_heads(_dot(h, lp["k_w"], cdt), kv_heads).astype(cdt)
        v = _split_heads(_dot(h, lp["v_w"], cdt) + lp["v_b"], kv_heads).astype(cdt)
        ck_l = lax.dynamic_update_slice(ck_l, k, (0, pos0, 0, 0))
        cv_l = lax.dynamic_update_slice(cv_l, v, (0, pos0, 0, 0))
        a = _attention(q, ck_l, cv_l, cdt, mask=self_mask)
        x = x + _dot(a, lp["o_w"], cdt) + lp["o_b"]

        h = _layer_norm(x, lp["lnx_g"], lp["lnx_b"])
        q2d = _dot(h, lp["xq_w"], cdt) + lp["xq_b"]  # [B, Lc, D]
        if isinstance(xk_l, tuple):  # int8 cross-KV (kernel layout)
            # Policy (measured, BENCH.md): the kernel wins when the KV stream
            # is large (MHA: +7-11%); under GQA the stream is already small
            # and per-call overhead dominates (206 vs 268 audio-s/s at GQA-4),
            # so grouped models should simply use bf16 KV (int8_kv=False).
            # kv_heads * head_dim >= 256: a measured Mosaic fault on this
            # TPU faults the worker at exactly Dkv=128 MHA (GQA at the same
            # width is fine); no Whisper model is that narrow (tiny = 6
            # heads), so fall back to the XLA dequant path there.
            head_dim_l = q2d.shape[-1] // num_heads
            if lc == 1 and num_heads == kv_heads and \
                    kv_heads * head_dim_l >= 256 and \
                    jax.default_backend() == "tpu":
                from ..ops.cross_attention import cross_attention_int8

                a = cross_attention_int8(
                    q2d[:, 0, :], xk_l[0], xk_l[1], xv_l[0], xv_l[1],
                    kv_heads, cross_seq_len, num_q_heads=num_heads,
                )[:, None, :]
            else:
                # prefill / CPU fallback: dequantize the packed layout once
                def deq(vals, scale):
                    bb, sp, dd = vals.shape
                    x4 = vals.reshape(bb, sp, kv_heads, dd // kv_heads)
                    sc = scale[:, :, :kv_heads, None].astype(jnp.float32)
                    return (x4.astype(jnp.float32) * sc)[:, :cross_seq_len]

                kd = deq(*xk_l).astype(cdt)
                vd = deq(*xv_l).astype(cdt)
                q = _split_heads(q2d, num_heads)
                a = _attention(q, kd, vd, cdt)
        else:
            q = _split_heads(q2d, num_heads)
            a = _attention(q, xk_l, xv_l, cdt)
        x = x + _dot(a, lp["xo_w"], cdt) + lp["xo_b"]

        h = _layer_norm(x, lp["ln2_g"], lp["ln2_b"])
        h = jax.nn.gelu(_dot(h, lp["fc1_w"], cdt) + lp["fc1_b"], approximate=False)
        x = x + _dot(h, lp["fc2_w"], cdt) + lp["fc2_b"]
        return x, (ck_l, cv_l)

    import os

    unroll = int(os.environ.get("WS_DECODE_UNROLL", "1"))
    x, (new_ck, new_cv) = lax.scan(
        layer_fn, x, (dec["layers"], cross_k, cross_v, cache_k, cache_v),
        unroll=unroll,
    )
    x = _layer_norm(x, dec["ln_post_g"], dec["ln_post_b"])
    logits = _dot(x, dec["tok_emb"].T, cdt)
    return logits, new_ck, new_cv
