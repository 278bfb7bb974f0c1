"""Generation tests: a tiny model is *trained* to emit a fixed segment transcript,
then greedy/beam/sampling paths must all recover it and stop at EOT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperseg_tpu import codec
from whisperseg_tpu import tokenizer as tok
from whisperseg_tpu.decode import generate
from whisperseg_tpu.models import (
    WhisperConfig,
    cross_entropy_loss,
    decoder_forward_train,
    encoder_forward,
    init_params,
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
        max_target_positions=64,
        total_spec_columns=64,
        compute_dtype="float32",
    )
    base.update(kw)
    return WhisperConfig(**base)


@pytest.fixture(scope="module")
def overfit_model():
    """Train a tiny model on a single (features -> transcript) pair."""
    import optax

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(
        np.random.RandomState(0).randn(1, 80, cfg.total_spec_columns), jnp.float32
    )
    target = codec.build_target_ids(
        "unknown", [0.02, 0.2], [0.1, 0.4], [0, 1], 0.01, cfg.total_spec_columns
    )
    inputs, labels = codec.shift_for_training(target, max_length=16)
    inputs = jnp.asarray([inputs], jnp.int32)
    labels = jnp.asarray([labels], jnp.int32)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            enc = encoder_forward(p, cfg, feats)
            logits = decoder_forward_train(p, cfg, enc, inputs)
            return cross_entropy_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(500):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.02, f"tiny model failed to overfit, loss={float(loss)}"
    return cfg, params, feats, target


def test_greedy_recovers_sequence(overfit_model):
    cfg, params, feats, target = overfit_model
    out = np.asarray(generate(params, cfg, feats, max_length=32))
    seq = out[0].tolist()
    n = len(target)
    assert seq[:n] == target
    assert all(t == tok.PAD_ID for t in seq[n:])


def test_beam_recovers_sequence(overfit_model):
    cfg, params, feats, target = overfit_model
    out = np.asarray(
        generate(params, cfg, feats, max_length=32, num_beams=4, length_penalty=1.0)
    )
    seq = out[0].tolist()
    n = len(target)
    assert seq[:n] == target


def test_topk_sampling_on_peaked_model(overfit_model):
    # On an overfit (near-deterministic) model even top_k=4 sampling recovers it.
    cfg, params, feats, target = overfit_model
    out = np.asarray(
        generate(params, cfg, feats, rng=jax.random.PRNGKey(3), max_length=32, top_k=4)
    )
    segs = codec.parse_segments_from_ids(out[0].tolist(), 0.01, {0: "a", 1: "b"})
    assert len(segs) == 2


def test_batch_generation_consistent(overfit_model):
    cfg, params, feats, target = overfit_model
    batch_feats = jnp.concatenate([feats, feats, feats], axis=0)
    out = np.asarray(generate(params, cfg, batch_feats, max_length=32))
    for b in range(3):
        assert out[b, : len(target)].tolist() == target


def test_max_length_truncation(overfit_model):
    cfg, params, feats, target = overfit_model
    out = np.asarray(generate(params, cfg, feats, max_length=6))
    assert out.shape == (1, 6)
    assert out[0, :3].tolist() == list(tok.PROMPT_IDS)


def test_parse_generated(overfit_model):
    cfg, params, feats, target = overfit_model
    out = np.asarray(generate(params, cfg, feats, max_length=32))
    inv = {0: "c0", 1: "c1"}
    segs = codec.parse_segments_from_ids(out[0].tolist(), 0.01, inv)
    assert segs == [
        [0.02, pytest.approx(0.1), "c0"],
        [pytest.approx(0.2), pytest.approx(0.4), "c1"],
    ]


def test_nucleus_filter_masks_tail():
    from whisperseg_tpu.decode import _nucleus_filter, NEG_INF

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(_nucleus_filter(logits, 0.7))
    # 0.5 kept (prefix 0 < 0.7), 0.3 kept (prefix 0.5 < 0.7),
    # 0.15 dropped (prefix 0.8 >= 0.7), 0.05 dropped
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert out[0, 2] <= float(NEG_INF) / 2 and out[0, 3] <= float(NEG_INF) / 2
    # top token always survives even for tiny p
    out2 = np.asarray(_nucleus_filter(logits, 1e-6))
    assert np.isfinite(out2[0, 0]) and (out2[0, 1:] <= float(NEG_INF) / 2).all()


def test_top_p_sampling_stays_in_nucleus():
    from whisperseg_tpu.decode import _sample_or_argmax

    rng = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.tile(jnp.asarray([[0.6, 0.25, 0.1, 0.05]]), (64, 1)))
    toks = np.asarray(_sample_or_argmax(logits, top_k=0, rng=rng, top_p=0.8))
    assert set(toks.tolist()) <= {0, 1}  # nucleus at p=0.8 is {0.6, 0.25}
    assert 1 in toks.tolist()  # it actually samples, not argmaxes


def test_top_p_on_peaked_model_recovers_sequence(overfit_model):
    cfg, params, feats, target = overfit_model
    out = np.asarray(generate(params, cfg, feats, max_length=32,
                              num_beams=1, top_k=1, top_p=0.5))
    n = len(target)
    assert out[0].tolist()[:n] == target
