import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperseg_tpu import tokenizer as tok
from whisperseg_tpu.checkpoint import save_checkpoint
from whisperseg_tpu.decode import generate
from whisperseg_tpu.models import (
    WhisperConfig,
    decoder_forward_train,
    encoder_forward,
    init_params,
)
from whisperseg_tpu.training.trainer import load_model_any


def tiny_cfg(total=100):
    return WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=total // 2,
        max_target_positions=48, total_spec_columns=total,
        compute_dtype="float32",
    )


def test_load_resizes_positions_down_and_up(tmp_path):
    cfg = tiny_cfg(total=100)
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "c")
    save_checkpoint(path, params, cfg)

    p2, c2 = load_model_any(path, total_spec_columns=60, dropout=0.0)
    assert c2.max_source_positions == 30
    assert p2["encoder"]["pos_emb"].shape[0] == 30
    np.testing.assert_allclose(np.asarray(p2["encoder"]["pos_emb"]),
                               np.asarray(params["encoder"]["pos_emb"][:30]))

    p3, c3 = load_model_any(path, total_spec_columns=200, dropout=0.0)
    assert c3.max_source_positions == 100
    assert p3["encoder"]["pos_emb"].shape[0] == 100
    np.testing.assert_allclose(np.asarray(p3["encoder"]["pos_emb"][:50]),
                               np.asarray(params["encoder"]["pos_emb"]))
    # forward runs at the new geometry
    feats = jnp.zeros((1, 80, 200), jnp.float32)
    out = encoder_forward(p3, c3, feats)
    assert out.shape == (1, 100, 64)


def _sequence_logprob(params, cfg, feats, seq):
    """Sum of log-probs of seq[1:] given teacher forcing on seq[:-1]."""
    enc = encoder_forward(params, cfg, feats)
    ids = jnp.asarray([seq], jnp.int32)
    logits = decoder_forward_train(params, cfg, enc, ids[:, :-1])
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    total = 0.0
    for t, token in enumerate(seq[1:]):
        total += float(logp[0, t, token])
        if token == tok.EOT_ID:
            break
    return total


def test_beam_at_least_as_good_as_greedy():
    """On random models, beam-4's hypothesis must score >= greedy's
    (the defining property of beam search; exact HF tie-breaking may differ)."""
    cfg = tiny_cfg()
    for seed in range(3):
        params = init_params(jax.random.PRNGKey(seed), cfg)
        feats = jnp.asarray(
            np.random.RandomState(seed).randn(1, 80, cfg.total_spec_columns),
            jnp.float32)
        greedy = np.asarray(generate(params, cfg, feats, max_length=12))[0]
        beam = np.asarray(generate(params, cfg, feats, max_length=12,
                                   num_beams=4, length_penalty=1.0))[0]

        def clip(seq):
            seq = list(seq)
            if tok.EOT_ID in seq[3:]:
                seq = seq[: seq.index(tok.EOT_ID, 3) + 1]
            return seq

        g_seq, b_seq = clip(greedy), clip(beam)
        g_lp = _sequence_logprob(params, cfg, feats, g_seq)
        b_lp = _sequence_logprob(params, cfg, feats, b_seq)
        # length penalty 1.0: compare per-token-normalized scores as the beam does
        g_score = g_lp / max(len(g_seq) - 3, 1)
        b_score = b_lp / max(len(b_seq) - 3, 1)
        assert b_score >= g_score - 1e-3, (seed, g_seq, b_seq, g_score, b_score)
