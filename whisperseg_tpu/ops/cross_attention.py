"""Pallas int8 cross-attention kernel for the decode step.

Motivation (BENCH.md roofline): the decode step is HBM-bound and its largest
stream is the cross-attention K/V (5.2 GB/step at whisper-large batch 32 in
bf16). Storing K/V int8 halves that stream — but only if the dequantization
happens in VMEM: the XLA formulation (`astype * scale`) materializes the bf16
copy through HBM and measured SLOWER. This kernel keeps everything on-chip.

Head handling: head_dim = 64 conflicts with the 128-lane alignment required for
per-head slicing, so heads are never sliced. With query length 1 per decode
step, attention decomposes into lane-parallel elementwise ops plus two tiny
matmuls against a constant 0/1 "head-sum" matrix E (E[h*hd + d, h] = 1):

    P          = q ⊙ K_int8.astype(bf16)            # [S, D], VPU, in-VMEM dequant
    scores     = (P @ E) * k_scale * inv_sqrt(hd)   # [S, Hp]  (scale folded in)
    probs      = softmax_S(scores)  with S-padding masked
    probs'     = probs * v_scale                     # fold V's scale
    PE         = probs' @ E^T                        # [S, D]
    out        = Σ_S  PE ⊙ V_int8.astype(bf16)       # [1, D]

All int8 -> bf16 casts happen on VMEM-resident tiles; HBM only ever sees int8
values and the small [S, H] scales.
"""

from __future__ import annotations

import functools
import math

import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def head_sum_matrices(num_heads: int, head_dim: int):
    """E [D, Hp] and E^T [Hp, D] with Hp = num_heads padded to 128 lanes."""
    d = num_heads * head_dim
    hp = _round_up(num_heads, 128)
    e = np.zeros((d, hp), np.float32)
    for h in range(num_heads):
        e[h * head_dim:(h + 1) * head_dim, h] = 1.0
    return e, np.ascontiguousarray(e.T)


def cross_attention_int8(q, k_int8, k_scale, v_int8, v_scale,
                         num_kv_heads: int, seq_len: int,
                         num_q_heads: int = 0,
                         interpret: bool = False):
    """Single-query int8 cross-attention (MHA and grouped-query).

    q:       [B, Dq] float (already projected, bias added, NOT pre-scaled);
             Dq = num_q_heads * head_dim
    k_int8:  [B, Sp, Dkv] int8   (Sp = seq padded; Dkv = num_kv_heads * head_dim)
    k_scale: [B, Sp, Hp] bf16/f32 (per-position-kv-head scales; Hp 128-padded)
    v_int8:  [B, Sp, Dkv] int8
    v_scale: [B, Sp, Hp]
    seq_len: number of valid positions (<= Sp); the padded tail is masked.

    GQA (num_q_heads = G * num_kv_heads): the kernel loops the G group members
    over the SAME VMEM-resident K/V tiles — the HBM stream stays Dkv-sized.
    The (tiny) q/out group-major rearrangements happen in XLA here.

    Caller contract (TPU): MHA with Dkv == 128 hits a Mosaic backend fault on
    this hardware (GQA at the same width compiles fine); callers must route
    Dkv < 256 MHA through a non-kernel path (models/whisper.py does).

    Returns [B, Dq] float32 in standard head-major layout.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_q_heads = num_q_heads or num_kv_heads
    groups = num_q_heads // num_kv_heads
    b, sp, d = k_int8.shape
    hp = k_scale.shape[-1]
    head_dim = d // num_kv_heads
    e_np, et_np = head_sum_matrices(num_kv_heads, head_dim)
    inv_sqrt = 1.0 / math.sqrt(head_dim)

    def kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, e_ref, et_ref, o_ref):
        f32 = jnp.float32
        bi = pl.program_id(0)
        kb = k_ref[0].astype(jnp.bfloat16)            # [Sp, Dkv], in-VMEM dequant
        vb = v_ref[0].astype(f32)
        ks = ks_ref[0].astype(f32)
        vs = vs_ref[0].astype(f32)
        row = jax.lax.broadcasted_iota(jnp.int32, (sp, hp), 0)
        for g in range(groups):  # static unroll; K/V tiles reused from VMEM
            q_row = q_ref[pl.ds(bi * groups + g, 1), :]   # [1, Dkv]
            p = q_row.astype(jnp.bfloat16) * kb           # q row broadcasts
            scores = jnp.dot(p, e_ref[:, :].astype(jnp.bfloat16),
                             preferred_element_type=f32)  # [Sp, Hp]
            scores = scores * ks * f32(inv_sqrt)
            scores = jnp.where(row < seq_len, scores, f32(-1e30))
            m = jnp.max(scores, axis=0, keepdims=True)
            ex = jnp.exp(scores - m)
            probs = ex / jnp.sum(ex, axis=0, keepdims=True)
            probs = probs * vs                            # fold V scale
            pe = jnp.dot(probs.astype(jnp.bfloat16),
                         et_ref[:, :].astype(jnp.bfloat16),
                         preferred_element_type=f32)      # [Sp, Dkv]
            o_ref[pl.ds(bi * groups + g, 1), :] = jnp.sum(
                pe * vb, axis=0, keepdims=True)

    rows = b * groups
    # q/out rows must satisfy the 8-sublane rule themselves (small batches
    # crash the TPU otherwise); pad and slice the tail off after the call.
    rows_p = _round_up(rows, 8)
    if groups > 1:
        # head-major [B, (kvh, g, d)] -> group-major rows [(b, g), (kvh, d)]
        q = q.reshape(b, num_kv_heads, groups, head_dim).transpose(
            0, 2, 1, 3)
    q_rows = q.reshape(rows, d)
    if rows_p != rows:
        q_rows = jnp.pad(q_rows, ((0, rows_p - rows), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            # q and out stay whole-array in VMEM (tiny); rows indexed by
            # program_id — a (1, D) block would violate the 8-sublane rule
            pl.BlockSpec((rows_p, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_p, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, d), jnp.float32),
        interpret=interpret,
    )(q_rows, k_int8, k_scale, v_int8, v_scale,
      jnp.asarray(e_np), jnp.asarray(et_np))
    if rows_p != rows:
        out = out[:rows]
    if groups > 1:
        out = out.reshape(b, groups, num_kv_heads, head_dim).transpose(
            0, 2, 1, 3)
    return out.reshape(b, num_q_heads * head_dim)


def quantize_kv_for_kernel(k, v, num_heads: int):
    """[L, B, S, H, hd] float K/V -> kernel layout:
    (k_int8 [L, B, Sp, D], k_scale [L, B, Sp, Hp], v_int8, v_scale, seq_len).
    S is padded to a multiple of 8 sublanes; H to 128 lanes."""
    import jax.numpy as jnp

    l, b, s, h, hd = k.shape
    sp = _round_up(s, 8)
    hp = _round_up(h, 128)

    def quant(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)  # [L,B,S,H,1]
        vals = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                        -127, 127).astype(jnp.int8)
        vals = vals.reshape(l, b, s, h * hd)
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
        sc = scale.reshape(l, b, s, h)
        sc = jnp.pad(sc, ((0, 0), (0, 0), (0, sp - s), (0, hp - h))
                     ).astype(jnp.bfloat16)
        return vals, sc

    kq, ks = quant(k)
    vq, vs = quant(v)
    return kq, ks, vq, vs, s
