"""Model-architecture tests: HF logits parity (the oracle the reference runs on),
KV-cache consistency, loss masking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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


def tiny_cfg(**kw):
    base = dict(
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        num_heads=4,
        d_ff=128,
        vocab_size=1024,
        max_source_positions=32,
        max_target_positions=48,
        total_spec_columns=64,
        compute_dtype="float32",
    )
    base.update(kw)
    return WhisperConfig(**base)


@pytest.fixture(scope="module")
def hf_pair():
    """A random tiny HF Whisper model + our converted params (identity vocab map)."""
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from whisperseg_tpu.models.convert_hf import params_from_hf_state_dict

    cfg = tiny_cfg()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        num_mel_bins=80,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.d_ff,
        decoder_ffn_dim=cfg.d_ff,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        activation_function="gelu",
        pad_token_id=10,
        bos_token_id=11,
        eos_token_id=11,
        decoder_start_token_id=12,
    )
    torch.manual_seed(0)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg, token_map=None)
    return hf_model, params, cfg


def test_encoder_matches_hf(hf_pair):
    import torch

    hf_model, params, cfg = hf_pair
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 80, cfg.max_source_positions * 2).astype(np.float32)
    with torch.no_grad():
        hf_out = (
            hf_model.model.encoder(torch.from_numpy(feats)).last_hidden_state.numpy()
        )
    ours = np.asarray(encoder_forward(params, cfg, jnp.asarray(feats)))
    assert ours.shape == hf_out.shape
    np.testing.assert_allclose(ours, hf_out, atol=2e-4)


def test_decoder_train_matches_hf(hf_pair):
    import torch

    hf_model, params, cfg = hf_pair
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 80, cfg.max_source_positions * 2).astype(np.float32)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        hf_logits = hf_model(
            input_features=torch.from_numpy(feats),
            decoder_input_ids=torch.from_numpy(ids),
        ).logits.numpy()
    enc = encoder_forward(params, cfg, jnp.asarray(feats))
    ours = np.asarray(decoder_forward_train(params, cfg, enc, jnp.asarray(ids)))
    assert ours.shape == hf_logits.shape
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4)


def test_cached_decode_matches_teacher_forcing():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    feats = rng.randn(2, 80, cfg.max_source_positions * 2).astype(np.float32)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(2, 9)), dtype=jnp.int32)

    enc = encoder_forward(params, cfg, jnp.asarray(feats))
    full_logits = decoder_forward_train(params, cfg, enc, ids)

    xk, xv = precompute_cross_kv(params, cfg, enc)
    ck, cv = init_cache(cfg, batch=2, max_len=16)

    # prefill 3 tokens, then step one-by-one
    logits_chunks = []
    lg, ck, cv = decoder_step(params, cfg, xk, xv, ids[:, :3], jnp.int32(0), ck, cv)
    logits_chunks.append(lg)
    for t in range(3, ids.shape[1]):
        lg, ck, cv = decoder_step(
            params, cfg, xk, xv, ids[:, t:t + 1], jnp.int32(t), ck, cv
        )
        logits_chunks.append(lg)
    step_logits = jnp.concatenate(logits_chunks, axis=1)
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full_logits), atol=2e-4
    )


def test_cross_entropy_masking():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.asarray([[1, 2, -100, -100]])
    loss = cross_entropy_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-6)

    # fully masked -> finite zero loss
    loss2 = cross_entropy_loss(logits, jnp.full((1, 4), -100))
    assert np.isfinite(float(loss2)) and float(loss2) == 0.0


def test_bfloat16_forward_runs():
    cfg = tiny_cfg(compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.zeros((1, 80, cfg.max_source_positions * 2), dtype=jnp.float32)
    enc = encoder_forward(params, cfg, feats)
    assert enc.dtype == jnp.float32  # f32 accumulate out of LN
    ids = jnp.zeros((1, 4), dtype=jnp.int32)
    logits = decoder_forward_train(params, cfg, enc, ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_dropout_changes_output_and_is_deterministic():
    cfg = tiny_cfg(dropout=0.3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(
        np.random.RandomState(0).randn(1, 80, cfg.max_source_positions * 2),
        dtype=jnp.float32,
    )
    r1 = encoder_forward(params, cfg, feats, train=True,
                         dropout_rng=jax.random.PRNGKey(1))
    r2 = encoder_forward(params, cfg, feats, train=True,
                         dropout_rng=jax.random.PRNGKey(2))
    r1b = encoder_forward(params, cfg, feats, train=True,
                          dropout_rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r1b))
    # eval mode ignores dropout
    e1 = encoder_forward(params, cfg, feats)
    e2 = encoder_forward(params, cfg, feats)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
