"""Grouped-query attention: shapes, train/decode consistency, MHA conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperseg_tpu import codec
from whisperseg_tpu.decode import generate
from whisperseg_tpu.models import (
    WhisperConfig,
    cross_entropy_loss,
    decoder_forward_train,
    decoder_step,
    encoder_forward,
    init_cache,
    init_params,
    precompute_cross_kv,
)
from whisperseg_tpu.models.gqa import convert_to_gqa


def cfg_with(num_kv_heads=0):
    return WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4,
        num_kv_heads=num_kv_heads, d_ff=128, vocab_size=1024,
        max_source_positions=32, max_target_positions=48,
        total_spec_columns=64, compute_dtype="float32",
    )


def test_gqa_param_shapes():
    cfg = cfg_with(num_kv_heads=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    dl = params["decoder"]["layers"]
    assert dl["k_w"].shape == (2, 64, 32)   # kv_heads * head_dim = 2 * 16
    assert dl["q_w"].shape == (2, 64, 64)
    assert dl["xv_b"].shape == (2, 32)


def test_gqa_forward_and_grad():
    cfg = cfg_with(num_kv_heads=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 80, 64), jnp.float32)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 1024, (2, 8)),
                      jnp.int32)

    def loss(p):
        enc = encoder_forward(p, cfg, feats)
        logits = decoder_forward_train(p, cfg, enc, ids)
        return cross_entropy_loss(logits, ids)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_gqa_cached_decode_matches_teacher_forcing():
    cfg = cfg_with(num_kv_heads=1)  # MQA extreme
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(np.random.RandomState(2).randn(2, 80, 64), jnp.float32)
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 1024, (2, 7)),
                      jnp.int32)
    enc = encoder_forward(params, cfg, feats)
    full = decoder_forward_train(params, cfg, enc, ids)

    xk, xv = precompute_cross_kv(params, cfg, enc)
    ck, cv = init_cache(cfg, 2, 16)
    assert ck.shape == (2, 2, 16, 1, 16)  # kv_heads = 1

    chunks = []
    lg, ck, cv = decoder_step(params, cfg, xk, xv, ids[:, :3], jnp.int32(0),
                              ck, cv)
    chunks.append(lg)
    for t in range(3, ids.shape[1]):
        lg, ck, cv = decoder_step(params, cfg, xk, xv, ids[:, t:t + 1],
                                  jnp.int32(t), ck, cv)
        chunks.append(lg)
    step_logits = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits), np.asarray(full),
                               atol=2e-4)


def test_gqa_generate_runs():
    cfg = cfg_with(num_kv_heads=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(np.random.RandomState(4).randn(1, 80, 64), jnp.float32)
    out = np.asarray(generate(params, cfg, feats, max_length=12))
    assert out.shape == (1, 12)
    # int8 KV with GQA must use the fallback path and still run
    out2 = np.asarray(generate(params, cfg, feats, max_length=12, int8_kv=True))
    assert out2.tolist() == out.tolist()


def test_convert_to_gqa_preserves_group_mean():
    cfg = cfg_with()
    params = init_params(jax.random.PRNGKey(0), cfg)
    new_params, new_cfg = convert_to_gqa(params, cfg, num_kv_heads=2)
    assert new_cfg.kv_heads == 2
    kw = np.asarray(params["decoder"]["layers"]["k_w"])  # [L, 64, 64]
    nw = np.asarray(new_params["decoder"]["layers"]["k_w"])  # [L, 64, 32]
    want = kw.reshape(2, 64, 2, 2, 16).mean(axis=3).reshape(2, 64, 32)
    np.testing.assert_allclose(nw, want, atol=1e-6)
    # converted model runs end to end
    feats = jnp.asarray(np.random.RandomState(5).randn(1, 80, 64), jnp.float32)
    out = np.asarray(generate(new_params, new_cfg, feats, max_length=10))
    assert out.shape == (1, 10)


def test_gqa_overfit_and_generate():
    """GQA model trains and recovers a transcript (end-to-end sanity)."""
    import optax

    cfg = cfg_with(num_kv_heads=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 80, 64), jnp.float32)
    target = codec.build_target_ids("unknown", [0.02], [0.1], [0], 0.01, 64)
    inputs, labels = codec.shift_for_training(target, max_length=12)
    inputs = jnp.asarray([inputs], jnp.int32)
    labels = jnp.asarray([labels], jnp.int32)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            enc = encoder_forward(p, cfg, feats)
            return cross_entropy_loss(
                decoder_forward_train(p, cfg, enc, inputs), labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(400):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.05
    out = np.asarray(generate(params, cfg, feats, max_length=16))[0].tolist()
    assert out[: len(target)] == target
