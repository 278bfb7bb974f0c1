"""Int8 quantization: numerics, pytree behavior, and quantized-model decoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperseg_tpu.ops.quant import (
    QuantTensor,
    cast_float_leaves,
    qdot,
    quantize,
    quantize_params,
)


def test_quantize_round_trip_accuracy():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32) * 0.1
    qt = quantize(jnp.asarray(w))
    assert qt.values.dtype == jnp.int8
    deq = np.asarray(qt.values, np.float32) * np.asarray(qt.scale)
    # per-channel int8: relative error bounded by ~1/127 of the channel max
    err = np.abs(deq - w)
    assert (err <= np.abs(w).max(axis=0, keepdims=True) / 127.0 + 1e-7).all()


def test_qdot_matches_float_dot():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 64).astype(np.float32)
    w = rng.randn(64, 32).astype(np.float32) * 0.05
    qt = quantize(jnp.asarray(w))
    got = np.asarray(qdot(jnp.asarray(x), qt))
    want = x @ w
    # int8 dynamic quant: ~1% relative error on random gaussians
    rel = np.abs(got - want) / (np.abs(want).max() + 1e-9)
    assert rel.max() < 0.03


def test_qdot_batched_3d():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 16).astype(np.float32)
    w = rng.randn(16, 8).astype(np.float32)
    qt = quantize(jnp.asarray(w))
    got = np.asarray(qdot(jnp.asarray(x), qt))
    want = x @ w
    assert got.shape == want.shape
    rel = np.abs(got - want) / (np.abs(want).max() + 1e-9)
    assert rel.max() < 0.05


def test_quant_tensor_scans_over_stacked_layers():
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(3, 16, 8).astype(np.float32))
    qt = quantize(w)
    assert qt.values.shape == (3, 16, 8)
    assert qt.scale.shape == (3, 1, 8)

    def body(carry, layer_qt):
        return carry, qdot(carry, layer_qt)

    x = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    _, ys = jax.lax.scan(body, x, qt)
    assert ys.shape == (3, 2, 8)
    for i in range(3):
        ref = np.asarray(qdot(x, QuantTensor(qt.values[i], qt.scale[i])))
        np.testing.assert_allclose(np.asarray(ys[i]), ref, atol=1e-5)


def test_quantize_params_structure():
    from whisperseg_tpu.models import WhisperConfig, init_params

    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=32,
        total_spec_columns=64, compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    qp = cast_float_leaves(quantize_params(params), "bfloat16")
    assert isinstance(qp["encoder"]["layers"]["q_w"], QuantTensor)
    assert isinstance(qp["decoder"]["layers"]["xo_w"], QuantTensor)
    assert qp["decoder"]["tok_emb"].dtype == jnp.bfloat16
    assert qp["encoder"]["conv1_w"].dtype == jnp.bfloat16
    assert qp["encoder"]["layers"]["q_b"].dtype == jnp.bfloat16


def test_quantized_model_generates_same_transcript():
    """An overfit tiny model must produce the same tokens after int8 quantization
    (the int8 path is the CT2-equivalent production inference mode)."""
    import optax

    from whisperseg_tpu import codec
    from whisperseg_tpu.decode import generate
    from whisperseg_tpu.models import (
        WhisperConfig, cross_entropy_loss, decoder_forward_train,
        encoder_forward, init_params,
    )

    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=64,
        total_spec_columns=64, compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(
        np.random.RandomState(0).randn(1, 80, 64), jnp.float32)
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

    out_f32 = np.asarray(generate(params, cfg, feats, max_length=32))
    qp = cast_float_leaves(quantize_params(params), "bfloat16")
    out_int8 = np.asarray(generate(qp, cfg, feats, max_length=32))
    assert out_f32.tolist() == out_int8.tolist()


def test_qdot_w8a8_stacked_weights_broadcasting():
    """mode='w8a8' with stacked [L, in, out] weights: per-row activation
    scale must broadcast over the stacked dim (was misaligned)."""
    import numpy as np

    from whisperseg_tpu.ops.quant import qdot, quantize

    rng = np.random.RandomState(0)
    w = rng.randn(3, 16, 8).astype(np.float32)
    x = rng.randn(5, 16).astype(np.float32)
    qt = quantize(w)
    out = np.asarray(qdot(jnp.asarray(x), qt, mode="w8a8"))
    assert out.shape == (5, 3, 8)
    ref = np.einsum("bi,lio->blo", x, w)
    # int8 weight + dynamic int8 activation quantization tolerance
    np.testing.assert_allclose(out, ref, atol=0.15, rtol=0.15)
