"""int4 (w4a16) quantization: packing, numerics, pytree/scan behavior, and
quantized-model decoding. Beyond-reference capability (CT2 has no int4 mode);
the decode-step HBM weight stream halves again vs w8a16."""

import numpy as np

import jax
import jax.numpy as jnp

from whisperseg_tpu.ops.quant import (
    Quant4Tensor,
    cast_float_leaves,
    qdot,
    qdot4,
    quantize4,
    quantize_params,
    unpack4,
)


def test_pack_unpack_roundtrip_exact():
    rng = np.random.RandomState(0)
    w = rng.randn(256, 64).astype(np.float32) * 0.1
    qt = quantize4(jnp.asarray(w), group_size=128)
    assert qt.packed.dtype == jnp.int8
    assert qt.packed.shape == (128, 64)
    assert qt.scale.shape == (2, 64)
    # the packed nibbles must reproduce the quantized integer grid exactly:
    # unpack/scale then re-quantize must be a fixed point
    deq = np.asarray(unpack4(qt))
    qt2 = quantize4(jnp.asarray(deq), group_size=128)
    np.testing.assert_array_equal(np.asarray(qt.packed), np.asarray(qt2.packed))


def test_unpack_matches_direct_quantization():
    rng = np.random.RandomState(1)
    w = rng.randn(256, 32).astype(np.float32)
    qt = quantize4(jnp.asarray(w), group_size=64)
    deq = np.asarray(unpack4(qt))
    # group-wise int4: error bounded by half a quantization step per group
    step = np.asarray(qt.scale)  # [groups, out]
    err = np.abs(deq - w).reshape(4, 64, 32).max(axis=1)
    assert (err <= step / 2 + 1e-6).all()


def test_qdot4_matches_float_dot():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 256).astype(np.float32)
    w = rng.randn(256, 128).astype(np.float32) * 0.05
    qt = quantize4(jnp.asarray(w))
    got = np.asarray(qdot4(jnp.asarray(x), qt))
    want = x @ w
    # 4-bit on random gaussians: ~10% worst-case relative error is inherent
    # (15-level grid); converged models have far coarser decision margins —
    # the generate-equality test below is the accuracy oracle.
    rel = np.abs(got - want) / (np.abs(want).max() + 1e-9)
    assert rel.max() < 0.2
    # qdot dispatches on the tensor type
    got2 = np.asarray(qdot(jnp.asarray(x), qt))
    np.testing.assert_array_equal(got, got2)


def test_odd_group_fallback():
    # contraction dim not divisible by the group size -> one group
    rng = np.random.RandomState(3)
    w = rng.randn(96, 16).astype(np.float32)
    qt = quantize4(jnp.asarray(w), group_size=128)
    assert qt.scale.shape == (1, 16)
    deq = np.asarray(unpack4(qt))
    assert np.abs(deq - w).max() <= np.abs(w).max() / 7.0 + 1e-6


def test_quant4_scans_over_stacked_layers():
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(3, 128, 32).astype(np.float32))
    qt = quantize4(w, group_size=64)
    assert qt.packed.shape == (3, 64, 32)
    assert qt.scale.shape == (3, 2, 32)

    def body(carry, layer_qt):
        return carry, qdot(carry, layer_qt)

    x = jnp.asarray(rng.randn(2, 128).astype(np.float32))
    _, ys = jax.lax.scan(body, x, qt)
    assert ys.shape == (3, 2, 32)
    for i in range(3):
        ref = np.asarray(qdot(x, Quant4Tensor(qt.packed[i], qt.scale[i])))
        np.testing.assert_allclose(np.asarray(ys[i]), ref, atol=1e-4)


def test_pallas_w4_kernel_interpret_matches_xla():
    from whisperseg_tpu.ops.quant import _qdot_pallas_w4a16

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(8, 256).astype(np.float32))
    w = rng.randn(256, 128).astype(np.float32) * 0.1
    qt = quantize4(jnp.asarray(w))
    want = np.asarray(qdot4(x, qt))  # XLA path on CPU

    import unittest.mock as mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp):
        got = np.asarray(_qdot_pallas_w4a16(x, qt))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_pallas_kernels_cover_non_512_divisible_out():
    """Regression: out=1280 (whisper-large projections) is not divisible by
    the 512 column tile; the grid must still cover ALL columns (the original
    kernels left columns 1024+ unwritten)."""
    import unittest.mock as mock
    from jax.experimental import pallas as pl

    from whisperseg_tpu.ops.quant import (
        _pick_out_tile, _qdot_pallas_w4a16, _qdot_pallas_w8a16, quantize,
    )

    assert _pick_out_tile(1280) == 256
    assert _pick_out_tile(5120) == 512
    assert _pick_out_tile(384) == 384
    assert _pick_out_tile(200) is None

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(8, 256).astype(np.float32))
    w = rng.randn(256, 640).astype(np.float32) * 0.1  # tile 128, grid 5

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp):
        qt8 = quantize(jnp.asarray(w))
        got8 = np.asarray(_qdot_pallas_w8a16(x, qt8))
        want8 = np.asarray(x) @ (
            np.asarray(qt8.values, np.float32) * np.asarray(qt8.scale))
        np.testing.assert_allclose(got8, want8, rtol=2e-2, atol=2e-2)
        assert np.abs(got8[:, 512:]).max() > 0  # the tail columns are written

        qt4 = quantize4(jnp.asarray(w))
        got4 = np.asarray(_qdot_pallas_w4a16(x, qt4))
        want4 = np.asarray(x) @ np.asarray(unpack4(qt4))
        np.testing.assert_allclose(got4, want4, rtol=2e-2, atol=2e-2)
        assert np.abs(got4[:, 512:]).max() > 0


def test_quantize_params_bits4_structure():
    from whisperseg_tpu.models import WhisperConfig, init_params

    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=32,
        total_spec_columns=64, compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    qp = cast_float_leaves(quantize_params(params, bits=4), "bfloat16")
    assert isinstance(qp["encoder"]["layers"]["q_w"], Quant4Tensor)
    assert isinstance(qp["decoder"]["layers"]["xo_w"], Quant4Tensor)
    assert qp["decoder"]["tok_emb"].dtype == jnp.bfloat16
    assert qp["encoder"]["layers"]["q_b"].dtype == jnp.bfloat16


def test_int4_model_generates_parseable_equal_transcript():
    """An overfit tiny model must produce the same tokens after int4
    quantization (group-wise scales keep the error below the decision
    margins of a converged model)."""
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
    qp = cast_float_leaves(quantize_params(params, bits=4), "bfloat16")
    out_int4 = np.asarray(generate(qp, cfg, feats, max_length=32))
    assert out_f32.tolist() == out_int4.tolist()


def test_segmenter_int4_inference_dtype_runs_end_to_end():
    """inference_dtype='int4' quantizes projections and still segments."""
    from whisperseg_tpu.models import WhisperConfig, init_params
    from whisperseg_tpu.ops.quant import Quant4Tensor
    from whisperseg_tpu.segmenter import Segmenter

    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=64,
        total_spec_columns=64, compute_dtype="float32",
    )
    cfg.cluster_codebook = {"Vocal": 0}
    params = init_params(jax.random.PRNGKey(0), cfg)
    seg = Segmenter(params, cfg, inference_dtype="int4")
    assert isinstance(seg.params["encoder"]["layers"]["q_w"], Quant4Tensor)
    audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.05
    res = seg.segment(audio, sr=16000, spec_time_step=0.01, num_beams=1,
                      max_length=16, batch_size=4)
    assert set(res) == {"onset", "offset", "cluster"}


def test_ste_gradients_pass_through():
    from whisperseg_tpu.ops.quant import ste_quant4, ste_quant8

    w = jnp.asarray(np.random.RandomState(8).randn(64, 32), jnp.float32)
    for ste in (ste_quant8, ste_quant4):
        g = jax.grad(lambda x: (ste(x) * 3.0).sum())(w)
        np.testing.assert_allclose(np.asarray(g), 3.0, rtol=0, atol=0)


def test_qat_training_makes_int4_quantization_lossless():
    """QAT-4 training: the forward already sees the int4 grid, so quantizing
    the finished checkpoint to int4 reproduces the QAT model's transcript
    exactly — the accuracy-recovery recipe for int4 inference."""
    import optax

    from whisperseg_tpu import codec
    from whisperseg_tpu.decode import generate
    from whisperseg_tpu.models import (
        WhisperConfig, cross_entropy_loss, decoder_forward_train,
        encoder_forward, init_params,
    )
    from whisperseg_tpu.ops.quant import (
        cast_float_leaves, fake_quantize_params, quantize_params,
    )
    from whisperseg_tpu.training.trainer import build_train_step

    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=64,
        total_spec_columns=64, compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 80, 64), jnp.float32)
    target = codec.build_target_ids("unknown", [0.02, 0.2], [0.1, 0.4], [0, 1],
                                    0.01, 64)
    inputs, labels = codec.shift_for_training(target, max_length=16)
    batch = {
        "input_features": feats,
        "decoder_input_ids": jnp.asarray([inputs], jnp.int32),
        "labels": jnp.asarray([labels], jnp.int32),
    }

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = build_train_step(cfg, opt, qat_bits=4)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(400):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, batch, sub)
        losses.append(float(loss))
    assert losses[-1] < 0.1  # QAT converges through the fake-quant grid

    # transcript through the fake-quant forward (what training optimized)
    out_fake = np.asarray(generate(fake_quantize_params(params, 4), cfg,
                                   feats, max_length=32))
    # transcript after REAL int4 quantization of the checkpoint
    qp = quantize_params(params, bits=4)
    out_int4 = np.asarray(generate(qp, cfg, feats, max_length=32))
    assert out_fake.tolist() == out_int4.tolist()
    # and it learned the target transcript
    parsed = codec.parse_segments_from_ids(
        [t for t in out_int4[0].tolist()], 0.01, {0: "a", 1: "b"})
    assert len(parsed) == 2
