import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperseg_tpu.models import (
    WhisperConfig,
    cross_entropy_loss,
    decoder_forward_train,
    encoder_forward,
    init_params,
)
from whisperseg_tpu.segmenter import Segmenter


def tiny_cfg(**kw):
    base = dict(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=32, max_target_positions=32,
        total_spec_columns=64, compute_dtype="float32",
    )
    base.update(kw)
    return WhisperConfig(**base)


def test_remat_gradients_match():
    cfg = tiny_cfg()
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 80, 64), jnp.float32)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 1024, (2, 8)),
                      jnp.int32)
    labels = jnp.asarray(np.random.RandomState(2).randint(0, 1024, (2, 8)),
                         jnp.int32)

    def loss(p, c):
        enc = encoder_forward(p, c, feats)
        return cross_entropy_loss(decoder_forward_train(p, c, enc, ids), labels)

    g1 = jax.grad(lambda p: loss(p, cfg))(params)
    g2 = jax.grad(lambda p: loss(p, cfg_r))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4)


def test_warmup_precompiles_and_matches():
    cfg = tiny_cfg(total_spec_columns=100, max_source_positions=50)
    cfg.cluster_codebook = {"v": 0}
    params = init_params(jax.random.PRNGKey(0), cfg)
    seg = Segmenter(params, cfg, inference_dtype=None)
    seg.warmup(16000, spec_time_step=0.01, batch_size=2, max_length=16,
               num_beams=1)
    # the fused fn cache is populated for that configuration
    assert len(seg._segment_fn_cache) == 1
    audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    out = seg.segment(audio, 16000, spec_time_step=0.01, max_length=16,
                      batch_size=2, num_beams=1)
    assert set(out) == {"onset", "offset", "cluster"}
    assert len(seg._segment_fn_cache) == 1  # reused, not recompiled
