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


# Test hook: force the fused kernel into Pallas interpret mode (CPU) so the
# custom-VJP machinery can be exercised off-TPU.
FORCE_INTERPRET = False


@functools.lru_cache(maxsize=1)
def _flash():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


def fused_available(seq_len: int, head_dim: int, causal: bool) -> bool:
    """Single-block fused attention (below): default on TPU for the encoder
    geometry. Whisper's S <= ~512 means a whole [S, S] score tile fits in
    VMEM, so one program per (batch, head) fuses QK^T + softmax + PV with no
    HBM materialization — the stock flash kernel's streaming machinery only
    added overhead here (285 vs 430 ms, BENCH.md). WS_FUSED_ATTN=0 disables."""
    import os

    return (
        os.environ.get("WS_FUSED_ATTN", "1") == "1"
        and not causal
        and jax.default_backend() == "tpu"
        and seq_len <= 1024  # [Sp, Sp] f32 scores stay < 4 MB of VMEM
        and head_dim in (64, 128)
    )


def fused_encoder_attention(q, k, v, interpret: bool = False):
    """Non-causal self-attention, one fused kernel, no HBM score tensor.

    q: [B, S, H, hd]; k, v: [B, S, Hkv, hd] with H % Hkv == 0 (GQA when
    Hkv < H).

    Grid: (batch, kv-head chunks). Chunk sizing balances two measured
    failure modes at whisper-large batch 48: one step per (batch, head) is
    overhead-bound (960 ~4 us steps, 0.94x vs XLA), one step per batch item
    overflows the 16 MB scoped VMEM. A chunk of ~4-8 query heads per step
    (whole kv groups, so K/V tiles are loaded once and reused) measured
    1.20x vs the XLA einsum. The softmax division is folded into the [Sp,
    hd] output (one fewer [Sp, Sp] pass); the remaining cost is the VPU exp
    floor, which every formulation pays.

    Returns [B, S, H*hd] in q's dtype (callers cast into the output
    projection anyway; a f32 output would double the out stream)."""
    b, s, h, hd = q.shape
    sp = _round_up(s, 128)

    qt = jnp.transpose(q, (0, 2, 1, 3))                    # [B, H, S, hd]
    kt = jnp.transpose(k, (0, 2, 3, 1))                    # [B, Hkv, hd, S]
    vt = jnp.transpose(v, (0, 2, 1, 3))                    # [B, Hkv, S, hd]
    if sp != s:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, sp - s)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
    out = fused_attention_head_major(s, qt, kt, vt, interpret=interpret)
    out = out[:, :, :s].transpose(0, 2, 1, 3)
    return out.reshape(b, s, h * hd)


def fused_attention_head_major(valid_len: int, q4, kt4, v4,
                               interpret: bool = False):
    """The fused attention kernel on HEAD-MAJOR inputs (no relayouts).

    q4: [B, H, Sp, hd]; kt4: [B, Hkv, hd, Sp] (K pre-transposed); v4:
    [B, Hkv, Sp, hd]; Sp a 128-multiple; keys at positions >= valid_len are
    masked. Returns [B, H, Sp, hd] in q's dtype (padded rows are garbage —
    slice or keep padded, they never influence valid keys).

    This is the zero-copy entry for the head-major encoder path
    (models/whisper.py): projections emit these layouts directly via einsum
    (the relayout fuses into the projection matmul), so the kernel's former
    4 transposes + pads per layer disappear."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or FORCE_INTERPRET
    b, h, sp, hd = q4.shape
    hkv = v4.shape[1]
    g = h // hkv
    scale = hd ** -0.5
    # kv groups per grid step: the largest divisor of Hkv keeping the
    # unrolled q-head loop (and its [Sp, Sp] f32 temporaries) inside the
    # 16 MB scoped VMEM (one step per head was overhead-bound; one step per
    # batch item overflowed)
    if g > 8:
        raise ValueError(
            f"fused_attention_hm: GQA group size {g} exceeds the kernel's "
            f"8-head-per-step VMEM budget; use the XLA einsum path "
            f"(models/whisper.py gates on this)")
    gc = max(d for d in range(1, hkv + 1) if hkv % d == 0 and d * g <= 8)
    hc = gc * g  # query heads per grid step

    qt = q4.reshape(b, h * sp, hd)
    kt = kt4.reshape(b, hkv * hd, sp)
    vt = v4.reshape(b, hkv * sp, hd)

    def kernel(q_ref, kt_ref, v_ref, o_ref):
        f32 = jnp.float32
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        for hh in range(hc):  # static unroll; K/V tiles reused per group
            kv = hh // g
            kth = kt_ref[0, kv * hd:(kv + 1) * hd, :]      # [hd, Sp]
            vh = v_ref[0, kv * sp:(kv + 1) * sp, :]        # [Sp, hd]
            qh = q_ref[0, hh * sp:(hh + 1) * sp, :]        # [Sp, hd]
            scores = jax.lax.dot_general(
                qh, kth, (((1,), (0,)), ((), ())),
                preferred_element_type=f32) * f32(scale)   # [Sp, Sp]
            scores = jnp.where(col < valid_len, scores, f32(-1e30))
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m).astype(q_ref.dtype)
            l = jnp.sum(p.astype(f32), axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                # [Sp, hd]
            o_ref[0, hh * sp:(hh + 1) * sp, :] = (o / l).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, hkv // gc),
        in_specs=[
            pl.BlockSpec((1, hc * sp, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gc * hd, sp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gc * sp, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hc * sp, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * sp, hd), q4.dtype),
        interpret=interpret,
    )(qt, kt, vt)
    return out.reshape(b, h, sp, hd)


def xla_attention_head_major(valid_len: int, q4, kt4, v4):
    """Einsum reference for the head-major layout (VJP backward + CPU path)."""
    b, h, sp, hd = q4.shape
    hkv = v4.shape[1]
    g = h // hkv
    scale = hd ** -0.5
    score_dtype = jnp.bfloat16 if q4.dtype == jnp.bfloat16 else jnp.float32
    q5 = q4.reshape(b, hkv, g, sp, hd)
    scores = jnp.einsum("bkgsf,bkft->bkgst", (q5 * scale).astype(q4.dtype),
                        kt4, preferred_element_type=score_dtype)
    mask = (jnp.arange(sp) < valid_len)[None, None, None, None, :]
    scores = jnp.where(mask, scores, jnp.asarray(-1e30, score_dtype))
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q4.dtype)
    out = jnp.einsum("bkgst,bktf->bkgsf", probs, v4,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h, sp, hd).astype(q4.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_attention_hm(valid_len: int, q4, kt4, v4):
    """Differentiable head-major fused attention (einsum-remat backward)."""
    return fused_attention_head_major(valid_len, q4, kt4, v4)


def _fused_hm_fwd(valid_len, q4, kt4, v4):
    return fused_attention_head_major(valid_len, q4, kt4, v4), (q4, kt4, v4)


def _fused_hm_bwd(valid_len, res, g_out):
    q4, kt4, v4 = res

    def ref(q4, kt4, v4):
        return xla_attention_head_major(valid_len, q4, kt4, v4).astype(
            g_out.dtype)

    _, vjp = jax.vjp(ref, q4, kt4, v4)
    return vjp(g_out)


fused_attention_hm.defvjp(_fused_hm_fwd, _fused_hm_bwd)


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


def _xla_attention(q, k, v, causal: bool = False):
    """XLA einsum attention, MHA and GQA (the fallback + gradient path).

    In bf16 compute the materialized score/prob tensors (the dominant
    encoder HBM stream: [B, H, S, S] per layer) stay bf16; the softmax
    statistics run in f32 inside the fused elementwise chain."""
    b, l, h, hd = q.shape
    hkv = k.shape[2]
    scale = hd ** -0.5
    score_dtype = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32

    if h != hkv:
        # grouped path: keep K/V un-expanded so the smaller K/V streams
        g = h // hkv
        q5 = q.reshape(b, l, hkv, g, hd)
        scores = jnp.einsum("bqkgd,bskd->bkgqs", (q5 * scale).astype(q.dtype),
                            k, preferred_element_type=score_dtype)
        if causal:
            mask = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None, None]
            scores = jnp.where(mask, scores, jnp.asarray(-1e30, score_dtype))
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
        out = jnp.einsum("bkgqs,bskd->bqkgd", probs, v,
                         preferred_element_type=jnp.float32)
        return out.reshape(b, l, h * hd)

    scores = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(q.dtype), k,
                        preferred_element_type=score_dtype)
    if causal:
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
        scores = jnp.where(mask, scores, jnp.asarray(-1e30, score_dtype))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, l, h * hd)


@jax.custom_vjp
def _fused_attention(q, k, v):
    """Differentiable wrapper: kernel forward, XLA-einsum backward.

    A bare pallas_call has no transpose rule, but the encoder runs under
    grad during training — the backward pass rematerializes the attention
    with the (mathematically identical) einsum formulation and
    differentiates that, so training works and inference keeps the kernel."""
    return fused_encoder_attention(q, k, v)


def _fused_attention_fwd(q, k, v):
    return fused_encoder_attention(q, k, v), (q, k, v)


def _fused_attention_bwd(res, g):
    q, k, v = res
    out_dtype = g.dtype

    def ref(q, k, v):
        return _xla_attention(q, k, v, False).astype(out_dtype)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def self_attention(q, k, v, causal: bool = False):
    """q: [B, L, H, hd] (unscaled); k, v: [B, L, Hkv, hd] (GQA when Hkv < H)
    -> [B, L, H*hd] (q's dtype on the fused path, float32 otherwise).

    Dispatch: the fused single-block kernel on TPU (default; differentiable
    via the einsum-rematerializing VJP), the stock flash kernel under
    WS_FLASH=1 (MHA only), the XLA einsum path elsewhere. Softmax runs in
    f32 in all paths."""
    b, l, h, hd = q.shape
    hkv = k.shape[2]
    scale = hd ** -0.5

    if fused_available(l, hd, causal):
        return _fused_attention(q, k, v)

    if h != hkv:
        return _xla_attention(q, k, v, causal)

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

    return _xla_attention(q, k, v, causal)
