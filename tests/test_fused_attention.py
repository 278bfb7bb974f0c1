"""Fused single-block encoder attention vs the einsum reference (interpret)."""

import numpy as np
import jax.numpy as jnp

from whisperseg_tpu.models.whisper import _attention
from whisperseg_tpu.ops.attention import fused_encoder_attention


def _ref(q, k, v):
    return np.asarray(_attention(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), jnp.float32))


def test_fused_matches_reference_mha():
    rng = np.random.RandomState(0)
    b, s, h, hd = 2, 200, 4, 64  # S not a lane multiple: exercises padding
    q = rng.randn(b, s, h, hd).astype(np.float32) * 0.3
    k = rng.randn(b, s, h, hd).astype(np.float32) * 0.3
    v = rng.randn(b, s, h, hd).astype(np.float32) * 0.3
    out = np.asarray(fused_encoder_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))
    want = _ref(q, k, v)
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_fused_matches_reference_gqa():
    rng = np.random.RandomState(1)
    b, s, h, hkv, hd = 2, 128, 6, 2, 64
    q = rng.randn(b, s, h, hd).astype(np.float32) * 0.3
    k = rng.randn(b, s, hkv, hd).astype(np.float32) * 0.3
    v = rng.randn(b, s, hkv, hd).astype(np.float32) * 0.3
    out = np.asarray(fused_encoder_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))
    want = _ref(q, k, v)
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_fused_bf16_inputs():
    rng = np.random.RandomState(2)
    b, s, h, hd = 1, 96, 2, 64
    q = (rng.randn(b, s, h, hd) * 0.3).astype(np.float32)
    k = (rng.randn(b, s, h, hd) * 0.3).astype(np.float32)
    v = (rng.randn(b, s, h, hd) * 0.3).astype(np.float32)
    out = np.asarray(fused_encoder_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), interpret=True))
    want = _ref(q, k, v)
    denom = np.abs(want).max()
    assert np.abs(out - want).max() / denom < 0.02


def test_fused_attention_vjp_matches_einsum_grad():
    """Training path: grad through the fused kernel (custom VJP that
    rematerializes the einsum formulation) must match the pure-XLA grad."""
    import jax
    from whisperseg_tpu.ops import attention as att

    rng = np.random.RandomState(3)
    b, s, h, hd = 1, 96, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, hd).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, s, h, hd).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, s, h, hd).astype(np.float32) * 0.3)

    def loss_fused(q, k, v):
        return jnp.sum(att._fused_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(att._xla_attention(q, k, v) ** 2)

    att.FORCE_INTERPRET = True
    try:
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    finally:
        att.FORCE_INTERPRET = False
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)
