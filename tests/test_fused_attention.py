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


def test_head_major_kernel_matches_reference():
    from whisperseg_tpu.ops.attention import (
        fused_attention_head_major, xla_attention_head_major)

    rng = np.random.RandomState(4)
    b, h, hkv, sp, hd, s = 2, 6, 2, 128, 64, 100
    q4 = jnp.asarray(rng.randn(b, h, sp, hd).astype(np.float32) * 0.3)
    kt4 = jnp.asarray(rng.randn(b, hkv, hd, sp).astype(np.float32) * 0.3)
    v4 = jnp.asarray(rng.randn(b, hkv, sp, hd).astype(np.float32) * 0.3)
    out = np.asarray(fused_attention_head_major(s, q4, kt4, v4, interpret=True))
    want = np.asarray(xla_attention_head_major(s, q4, kt4, v4))
    # only valid rows are comparable (padded query rows are garbage by contract)
    np.testing.assert_allclose(out[:, :, :s], want[:, :, :s], atol=2e-5)


def test_head_major_vjp_matches_einsum_grad():
    import jax
    from whisperseg_tpu.ops import attention as att

    rng = np.random.RandomState(5)
    b, h, hkv, sp, hd, s = 1, 4, 4, 128, 64, 96
    q4 = jnp.asarray(rng.randn(b, h, sp, hd).astype(np.float32) * 0.3)
    kt4 = jnp.asarray(rng.randn(b, hkv, hd, sp).astype(np.float32) * 0.3)
    v4 = jnp.asarray(rng.randn(b, hkv, sp, hd).astype(np.float32) * 0.3)

    def loss_f(q4, kt4, v4):
        return jnp.sum(att.fused_attention_hm(s, q4, kt4, v4)[:, :, :s] ** 2)

    def loss_r(q4, kt4, v4):
        return jnp.sum(att.xla_attention_head_major(s, q4, kt4, v4)[:, :, :s] ** 2)

    att.FORCE_INTERPRET = True
    try:
        gf = jax.grad(loss_f, argnums=(0, 1, 2))(q4, kt4, v4)
    finally:
        att.FORCE_INTERPRET = False
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q4, kt4, v4)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)


def test_encoder_head_major_path_matches_standard(monkeypatch):
    """encoder_forward with the head-major branch forced (interpret kernel)
    must match the standard XLA path, for MHA and GQA and quantized weights."""
    import jax
    from whisperseg_tpu.models import init_params, make_config
    from whisperseg_tpu.models.whisper import encoder_forward
    from whisperseg_tpu.ops import attention as att
    from whisperseg_tpu.ops.quant import cast_float_leaves, quantize_params

    rng = np.random.RandomState(6)
    for kv in (0, 2):
        cfg = make_config("tiny", total_spec_columns=200, num_kv_heads=kv)
        params = init_params(jax.random.PRNGKey(0), cfg)
        feats = jnp.asarray(rng.randn(2, 80, 200).astype(np.float32) * 0.5)
        base = np.asarray(encoder_forward(params, cfg, feats))

        monkeypatch.setattr(att, "fused_available", lambda *a: True)
        monkeypatch.setattr(att, "FORCE_INTERPRET", True)
        hm = np.asarray(encoder_forward(params, cfg, feats))
        monkeypatch.setattr(att, "fused_available",
                            att.__dict__["fused_available"])
        monkeypatch.undo()

        denom = np.abs(base).max()
        assert np.abs(hm - base).max() / denom < 5e-3, f"kv={kv}"

        # quantized weights route through the dequant einsum helpers
        qparams = cast_float_leaves(quantize_params(params), "bfloat16")
        baseq = np.asarray(encoder_forward(qparams, cfg, feats))
        monkeypatch.setattr(att, "fused_available", lambda *a: True)
        monkeypatch.setattr(att, "FORCE_INTERPRET", True)
        hmq = np.asarray(encoder_forward(qparams, cfg, feats))
        monkeypatch.undo()
        assert np.abs(hmq - baseq).max() / np.abs(baseq).max() < 0.05, f"kv={kv}"


def test_fused_attention_hm_rejects_group_size_over_8():
    """MQA / extreme GQA (group > 8) exceeds the kernel's per-step VMEM
    budget; models/whisper.py routes those to the XLA einsum path, and the
    kernel itself must fail loudly rather than crash at trace time."""
    import pytest

    from whisperseg_tpu.ops.attention import fused_attention_hm

    b, h, hkv, sp, hd = 1, 12, 1, 128, 64
    q4 = jnp.zeros((b, h, sp, hd), jnp.float32)
    kt4 = jnp.zeros((b, hkv, hd, sp), jnp.float32)
    v4 = jnp.zeros((b, hkv, sp, hd), jnp.float32)
    with pytest.raises(ValueError, match="group size"):
        fused_attention_hm(sp, q4, kt4, v4)
