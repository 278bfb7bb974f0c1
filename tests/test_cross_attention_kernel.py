"""int8 cross-attention kernel vs reference attention math (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperseg_tpu.ops.cross_attention import (
    cross_attention_int8,
    head_sum_matrices,
    quantize_kv_for_kernel,
)


def reference_attention(q, k, v, num_heads):
    """q [B, D]; k, v [B, S, H, hd] -> [B, D] (f32, single query)."""
    b, d = q.shape
    _, s, h, hd = k.shape
    qh = q.reshape(b, h, hd).astype(np.float32)
    scores = np.einsum("bhd,bshd->bhs", qh * hd ** -0.5, k.astype(np.float32))
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = np.einsum("bhs,bshd->bhd", probs, v.astype(np.float32))
    return out.reshape(b, d)


def test_head_sum_matrices():
    e, et = head_sum_matrices(4, 64)
    assert e.shape == (256, 128)
    assert e[:64, 0].sum() == 64 and e[:64, 1].sum() == 0
    np.testing.assert_array_equal(et, e.T)


@pytest.mark.parametrize("b,s,h,hd", [(2, 500, 20, 64), (3, 100, 4, 64)])
def test_kernel_matches_reference(b, s, h, hd):
    rng = np.random.RandomState(0)
    d = h * hd
    q = rng.randn(b, d).astype(np.float32)
    k = rng.randn(1, b, s, h, hd).astype(np.float32) * 0.5
    v = rng.randn(1, b, s, h, hd).astype(np.float32) * 0.5

    kq, ks, vq, vs, seq = quantize_kv_for_kernel(
        jnp.asarray(k), jnp.asarray(v), h)
    out = np.asarray(cross_attention_int8(
        jnp.asarray(q), kq[0], ks[0], vq[0], vs[0], h, seq, interpret=True))

    want = reference_attention(q, k[0], v[0], h)
    # int8 KV quantization: ~1% relative tolerance
    denom = np.abs(want).max()
    assert np.abs(out - want).max() / denom < 0.02, \
        np.abs(out - want).max() / denom


def test_padding_positions_ignored():
    """Appending garbage rows beyond seq_len must not change the output."""
    rng = np.random.RandomState(1)
    b, s, h, hd = 1, 12, 4, 64
    d = h * hd
    q = rng.randn(b, d).astype(np.float32)
    k = rng.randn(1, b, s, h, hd).astype(np.float32)
    v = rng.randn(1, b, s, h, hd).astype(np.float32)
    kq, ks, vq, vs, seq = quantize_kv_for_kernel(jnp.asarray(k), jnp.asarray(v), h)
    out1 = np.asarray(cross_attention_int8(
        jnp.asarray(q), kq[0], ks[0], vq[0], vs[0], h, seq, interpret=True))
    # poison the padded tail
    kq2 = kq.at[:, :, s:, :].set(127)
    vq2 = vq.at[:, :, s:, :].set(127)
    ks2 = ks.at[:, :, s:, :].set(10.0)
    vs2 = vs.at[:, :, s:, :].set(10.0)
    out2 = np.asarray(cross_attention_int8(
        jnp.asarray(q), kq2[0], ks2[0], vq2[0], vs2[0], h, seq, interpret=True))
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_kernel_gqa_matches_reference():
    """GQA: q has G x the kv heads; kernel loops groups over shared K/V."""
    rng = np.random.RandomState(2)
    b, s, hkv, g, hd = 2, 96, 2, 2, 64
    hq = hkv * g
    q = rng.randn(b, hq * hd).astype(np.float32)
    k = rng.randn(1, b, s, hkv, hd).astype(np.float32) * 0.5
    v = rng.randn(1, b, s, hkv, hd).astype(np.float32) * 0.5
    kq, ks, vq, vs, seq = quantize_kv_for_kernel(jnp.asarray(k), jnp.asarray(v), hkv)
    out = np.asarray(cross_attention_int8(
        jnp.asarray(q), kq[0], ks[0], vq[0], vs[0], hkv, seq,
        num_q_heads=hq, interpret=True))

    # reference: expand kv heads by repeat
    k_exp = np.repeat(k[0], g, axis=2)
    v_exp = np.repeat(v[0], g, axis=2)
    want = reference_attention(q, k_exp, v_exp, hq)
    denom = np.abs(want).max()
    assert np.abs(out - want).max() / denom < 0.02
