"""Grammar-constrained decoding: every transcript must parse into monotone
segments, and a well-trained model's output is unchanged."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperseg_tpu import codec
from whisperseg_tpu import tokenizer as tok
from whisperseg_tpu.decode import _grammar_mask, _grammar_step, generate
from whisperseg_tpu.models import WhisperConfig, init_params


def tiny_cfg():
    return WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=64,
        total_spec_columns=64, compute_dtype="float32",
    )


def test_grammar_mask_states():
    vocab = 1024
    mode = jnp.asarray([0, 1, 2, 3])
    last_col = jnp.asarray([0, 5, 5, 7])
    mask = np.asarray(_grammar_mask(mode, last_col, vocab))
    # mode 0: species/ts/eot allowed, digits not
    assert mask[0, tok.SPECIES_BASE] and mask[0, tok.EOT_ID]
    assert mask[0, tok.timestamp_id(0)] and not mask[0, 3]
    # mode 1 (after ts_open): digits only
    assert mask[1, 3] and not mask[1, tok.EOT_ID]
    assert not mask[1, tok.timestamp_id(9)]
    # mode 2 (in digits): digits or ts STRICTLY > open col (5) — closing at
    # the opening column would be a zero-length segment the parser drops
    assert mask[2, 7] and mask[2, tok.timestamp_id(6)]
    assert not mask[2, tok.timestamp_id(5)]
    assert not mask[2, tok.timestamp_id(4)] and not mask[2, tok.EOT_ID]
    # mode 3 (after ts_close): ts >= close col (7) or eot
    assert mask[3, tok.EOT_ID] and mask[3, tok.timestamp_id(7)]
    assert not mask[3, tok.timestamp_id(6)] and not mask[3, 2]


def test_grammar_step_transitions():
    mode = jnp.asarray([0, 1, 2, 3])
    col = jnp.asarray([0, 5, 5, 7])
    # emit: ts(3) in mode0 -> open; digit in mode1 -> 2; ts(9) in mode2 ->
    # close; ts(8) in mode3 -> open
    token = jnp.asarray([tok.timestamp_id(3), 4, tok.timestamp_id(9),
                         tok.timestamp_id(8)])
    m2, c2 = _grammar_step(mode, col, token)
    assert m2.tolist() == [1, 2, 3, 1]
    assert c2.tolist() == [3, 5, 9, 8]


def test_constrained_outputs_always_parse():
    """Random (untrained) models: unconstrained output may be garbage, but
    constrained output must parse into valid monotone segments every time."""
    cfg = tiny_cfg()
    inv = {i: str(i) for i in range(100)}
    for seed in range(4):
        params = init_params(jax.random.PRNGKey(seed), cfg)
        feats = jnp.asarray(
            np.random.RandomState(seed).randn(2, 80, 64), jnp.float32)
        out = np.asarray(generate(params, cfg, feats, max_length=24,
                                  constrained=True))
        for row in out:
            seq = row.tolist()
            # structural validation: species? then (ts digit+ ts)* with
            # non-decreasing timestamp columns, ending in EOT/PAD/truncation
            i = 3  # skip prompt
            if tok.SPECIES_BASE <= seq[i] < tok.SPECIES_BASE + 7:
                i += 1
            last_col = 0
            while i < len(seq) and seq[i] not in (tok.EOT_ID, tok.PAD_ID):
                assert tok.is_timestamp(seq[i]), (seq, i)
                open_col = seq[i] - tok.TIMESTAMP_BASE
                assert open_col >= last_col, (seq, i)
                i += 1
                n_digits = 0
                while i < len(seq) and tok.is_digit(seq[i]):
                    n_digits += 1
                    i += 1
                if i >= len(seq):
                    break  # truncated mid-span: allowed
                assert n_digits >= 1, (seq, i)
                assert tok.is_timestamp(seq[i]), (seq, i)
                close_col = seq[i] - tok.TIMESTAMP_BASE
                assert close_col >= open_col, (seq, i)
                last_col = close_col
                i += 1
            # PAD only after EOT
            if i < len(seq) and seq[i] == tok.EOT_ID:
                assert all(t == tok.PAD_ID for t in seq[i + 1:])
            # the parser accepts it without structural surprises
            codec.parse_segments_from_ids(seq, 0.01, inv)


def test_constrained_matches_unconstrained_on_trained_model():
    import optax

    from whisperseg_tpu.models import (
        cross_entropy_loss, decoder_forward_train, encoder_forward,
    )

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 80, 64), jnp.float32)
    target = codec.build_target_ids("unknown", [0.02, 0.2], [0.1, 0.4], [0, 1],
                                    0.01, 64)
    inputs, labels = codec.shift_for_training(target, max_length=16)
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

    for _ in range(500):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.02

    free = np.asarray(generate(params, cfg, feats, max_length=32))
    constrained = np.asarray(generate(params, cfg, feats, max_length=32,
                                      constrained=True))
    assert free.tolist() == constrained.tolist()
