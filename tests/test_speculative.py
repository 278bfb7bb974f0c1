"""Speculative decoding: output must EXACTLY equal the target's greedy
transcript, for any draft model (acceptance rate only affects speed)."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_decode import overfit_model, tiny_cfg  # noqa: F401 (fixture)
from whisperseg_tpu.decode import generate, generate_speculative
from whisperseg_tpu.models import init_params


def test_self_draft_exact_match(overfit_model):  # noqa: F811
    """Target drafting for itself: every draft accepted, output identical."""
    cfg, params, feats, target = overfit_model
    greedy = np.asarray(generate(params, cfg, feats, max_length=32))
    spec = np.asarray(generate_speculative(
        params, cfg, params, cfg, feats, max_length=32, spec_k=3))
    np.testing.assert_array_equal(spec, greedy)


def test_random_draft_exact_match(overfit_model):  # noqa: F811
    """A RANDOM draft (≈0% acceptance) must still produce the target's
    greedy transcript — correctness is draft-independent."""
    cfg, params, feats, target = overfit_model
    dcfg = tiny_cfg(d_model=32, encoder_layers=1, decoder_layers=1,
                    num_heads=2, d_ff=64)
    dparams = init_params(jax.random.PRNGKey(7), dcfg)
    greedy = np.asarray(generate(params, cfg, feats, max_length=32))
    spec = np.asarray(generate_speculative(
        params, cfg, dparams, dcfg, feats, max_length=32, spec_k=4))
    np.testing.assert_array_equal(spec, greedy)


def test_speculative_batch_ragged_lengths(overfit_model):  # noqa: F811
    """Rows finishing at different iterations stay correct (per-row true
    positions + slot masking)."""
    cfg, params, feats, target = overfit_model
    rng = np.random.RandomState(1)
    feats_b = jnp.concatenate(
        [feats, jnp.asarray(rng.randn(2, 80, cfg.total_spec_columns),
                            jnp.float32)], axis=0)
    greedy = np.asarray(generate(params, cfg, feats_b, max_length=24))
    spec = np.asarray(generate_speculative(
        params, cfg, params, cfg, feats_b, max_length=24, spec_k=2))
    np.testing.assert_array_equal(spec, greedy)


def test_speculative_budget_cap(overfit_model):  # noqa: F811
    """max_length is a hard cap even when commits would overshoot it."""
    cfg, params, feats, target = overfit_model
    greedy = np.asarray(generate(params, cfg, feats, max_length=7,
                                 early_exit=False))
    spec = np.asarray(generate_speculative(
        params, cfg, params, cfg, feats, max_length=7, spec_k=3))
    assert spec.shape == (1, 7)
    # both contain the same prefix of the transcript
    np.testing.assert_array_equal(spec[:, :7], greedy[:, :7])


def test_segmenter_draft_model_pipeline(tmp_path):
    """Segmenter with a draft model produces the same segments as without."""
    import jax
    from whisperseg_tpu.checkpoint import save_checkpoint
    from whisperseg_tpu.models import make_config
    from whisperseg_tpu.segmenter import Segmenter

    cfg = make_config("tiny", total_spec_columns=100)
    params = init_params(jax.random.PRNGKey(0), cfg)
    cfg.cluster_codebook = {"a": 0}
    cfg.default_segmentation_config = {
        "sr": 16000, "spec_time_step": 0.01, "min_frequency": 0}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, cfg)

    audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    seg = Segmenter.from_pretrained(path)
    base = seg.segment(audio, sr=16000, num_trials=1, num_beams=1,
                       max_length=16, batch_size=4)
    seg2 = Segmenter.from_pretrained(path)
    seg2.set_draft_model(path, spec_k=2)  # self-draft: 100% acceptance
    spec = seg2.segment(audio, sr=16000, num_trials=1, num_beams=1,
                        max_length=16, batch_size=4)
    assert base == spec
