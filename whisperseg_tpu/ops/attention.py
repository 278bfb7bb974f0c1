"""Attention dispatch: Pallas flash attention on TPU, XLA einsum elsewhere.

The encoder's self-attention over S=500 positions materializes
``[B, H, 500, 500]`` float32 score tensors in the XLA formulation — at
whisper-large batch 32 that is ~40 GB of HBM traffic per forward. The Pallas
flash-attention kernel (jax.experimental.pallas.ops.tpu.flash_attention, with a
custom VJP, so it serves training too) streams K/V tiles through VMEM instead.

Sequence lengths are padded to the kernel's 128-lane granularity and the padded
tail is masked out via segment ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=1)
def _flash():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


def flash_available(seq_len: int, head_dim: int) -> bool:
    """Opt-in (WS_FLASH=1): at whisper geometry (S=500, hd=64) the XLA einsum
    attention measured FASTER than the flash kernel on v5e (285 vs 430 ms for
    the large encoder at batch 32) — the S x S score tensor at bf16 is small
    enough that XLA's fusion wins. Kept for longer-context experiments."""
    import os

    return (
        os.environ.get("WS_FLASH", "0") == "1"
        and jax.default_backend() == "tpu"
        and seq_len >= 128
        and head_dim % 128 in (0, 64)  # kernel handles 64/128 head dims
    )


def self_attention(q, k, v, causal: bool = False):
    """q, k, v: [B, L, H, hd] (unscaled q) -> [B, L, H*hd] float32.

    Uses the flash kernel on TPU; the XLA einsum path elsewhere. Softmax runs
    in f32 in both paths.
    """
    b, l, h, hd = q.shape
    scale = hd ** -0.5

    if flash_available(l, hd):
        fa = _flash()
        lp = _round_up(l, 128)
        pad = lp - l

        def prep(x):
            x = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, L, hd]
            if pad:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
            # bf16 streams through the MXU; the kernel's softmax statistics
            # accumulate in f32 internally
            return x.astype(jnp.bfloat16)

        qf, kf, vf = prep(q), prep(k), prep(v)
        if pad:
            seg = jnp.concatenate(
                [jnp.zeros((b, l), jnp.int32), jnp.ones((b, pad), jnp.int32)],
                axis=1,
            )
            segment_ids = fa.SegmentIds(q=seg, kv=seg)
        else:
            segment_ids = None
        out = fa.flash_attention(qf, kf, vf, segment_ids=segment_ids,
                                 causal=causal, sm_scale=scale)
        out = jnp.transpose(out[:, :, :l, :], (0, 2, 1, 3))  # [B, L, H, hd]
        return out.reshape(b, l, h * hd).astype(jnp.float32)

    # XLA path. In bf16 compute the materialized score/prob tensors (the
    # dominant encoder HBM stream: [B, H, S, S] per layer) stay bf16; the
    # softmax statistics are computed in f32 inside the fused elementwise
    # chain. f32 compute (CPU tests / HF parity) keeps f32 throughout.
    bf16_scores = q.dtype == jnp.bfloat16
    score_dtype = jnp.bfloat16 if bf16_scores else jnp.float32
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", (q * scale).astype(q.dtype), k,
        preferred_element_type=score_dtype,
    )
    if causal:
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
        scores = jnp.where(mask, scores, jnp.asarray(-1e30, score_dtype))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, l, h * hd)
