"""int8 cross-KV decode path: structural correctness on CPU (the perf story is
measured on hardware, BENCH.md)."""

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
    encoder_forward,
    init_params,
    precompute_cross_kv,
)


def tiny_cfg():
    return WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=64,
        total_spec_columns=64, compute_dtype="float32",
    )


def test_int8_kv_quantization_accuracy():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    enc = encoder_forward(
        params, cfg,
        jnp.asarray(np.random.RandomState(0).randn(2, 80, 64), jnp.float32))
    (kq, ks), (vq, vs) = precompute_cross_kv(params, cfg, enc, int8_kv=True)
    k, v = precompute_cross_kv(params, cfg, enc, int8_kv=False)
    l, b, s, h, hd = k.shape
    # dequantize the packed kernel layout back to [L, B, S, H, hd]
    deq = (np.asarray(kq, np.float32).reshape(l, b, -1, h, hd)[:, :, :s]
           * np.asarray(ks, np.float32)[:, :, :s, :h, None])
    err = np.abs(deq - np.asarray(k))
    bound = np.abs(np.asarray(k)).max(axis=-1, keepdims=True) / 127 + 1e-6
    assert (err <= bound + 1e-5).all()


def test_int8_kv_generates_same_transcript_on_trained_model():
    import optax

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
            e = encoder_forward(p, cfg, feats)
            return cross_entropy_loss(
                decoder_forward_train(p, cfg, e, inputs), labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(500):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.02

    base = np.asarray(generate(params, cfg, feats, max_length=32))
    quant = np.asarray(generate(params, cfg, feats, max_length=32,
                                int8_kv=True))
    assert base.tolist() == quant.tolist()
