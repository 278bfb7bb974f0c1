"""Unit tests for the boundary-accuracy loss knobs
(cross_entropy_loss timestamp_weight / timestamp_sigma)."""

import numpy as np
import jax.numpy as jnp

from whisperseg_tpu import tokenizer as tok
from whisperseg_tpu.models.whisper import cross_entropy_loss


def _manual_ce(logits, labels, weights):
    logits = np.asarray(logits, np.float64)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    total = wsum = 0.0
    for i, (l, w) in enumerate(zip(labels, weights)):
        if l < 0:
            continue
        total += -logp[i, l] * w
        wsum += w
    return total / wsum


def test_defaults_match_plain_ce():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((1, 6, tok.VOCAB_SIZE)).astype(np.float32)
    labels = np.array([[tok.timestamp_id(40), 3, tok.timestamp_id(52),
                        tok.EOT_ID, -100, -100]], np.int32)
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = _manual_ce(logits[0], labels[0], [1.0] * 6)
    assert abs(got - want) < 1e-4


def test_timestamp_weight_upweights_only_timestamps():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 4, tok.VOCAB_SIZE)).astype(np.float32)
    labels = np.array([[tok.timestamp_id(7), 5, tok.timestamp_id(9),
                        tok.EOT_ID]], np.int32)
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   timestamp_weight=4.0))
    want = _manual_ce(logits[0], labels[0], [4.0, 1.0, 4.0, 1.0])
    assert abs(got - want) < 1e-4


def test_sigma_prefers_near_miss_over_far_miss():
    """With soft targets, a model putting its mass one column off must incur
    less loss than one putting it ten columns off."""
    target = tok.timestamp_id(100)
    labels = np.array([[target]], np.int32)

    def loss_with_peak(peak_id):
        logits = np.full((1, 1, tok.VOCAB_SIZE), -10.0, np.float32)
        logits[0, 0, peak_id] = 10.0
        return float(cross_entropy_loss(jnp.asarray(logits),
                                        jnp.asarray(labels),
                                        timestamp_sigma=1.0))

    exact = loss_with_peak(target)
    near = loss_with_peak(tok.timestamp_id(101))
    far = loss_with_peak(tok.timestamp_id(110))
    assert exact < near < far
    # one-hot CE would score near == far; verify the soft loss separates them
    assert far - near > 1.0


def test_sigma_leaves_non_timestamp_targets_one_hot():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((1, 3, tok.VOCAB_SIZE)).astype(np.float32)
    labels = np.array([[3, 7, tok.EOT_ID]], np.int32)  # digits + EOT only
    plain = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    soft = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                    timestamp_sigma=2.0))
    assert abs(plain - soft) < 1e-6


def test_sigma_mass_is_normalized():
    """Soft-target loss of a uniform predictor equals log(V) regardless of
    sigma — the neighbor weights must sum to 1."""
    labels = np.array([[tok.timestamp_id(500)]], np.int32)
    logits = np.zeros((1, 1, tok.VOCAB_SIZE), np.float32)
    for sigma in (0.5, 1.0, 3.0):
        got = float(cross_entropy_loss(jnp.asarray(logits),
                                       jnp.asarray(labels),
                                       timestamp_sigma=sigma))
        assert abs(got - np.log(tok.VOCAB_SIZE)) < 1e-4


def test_edge_columns_keep_mass():
    """Neighbors falling outside [0, 1000] clip onto the edge column; the
    loss stays finite and normalized at the boundary."""
    labels = np.array([[tok.timestamp_id(0), tok.timestamp_id(1000)]], np.int32)
    logits = np.zeros((1, 2, tok.VOCAB_SIZE), np.float32)
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   timestamp_sigma=2.0))
    assert abs(got - np.log(tok.VOCAB_SIZE)) < 1e-4


def test_spec_augment_masks_with_feature_min():
    import jax

    from whisperseg_tpu.training.trainer import spec_augment

    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.uniform(1.0, 2.0, (2, 80, 200)).astype(np.float32))
    out = np.asarray(spec_augment(feats, jax.random.PRNGKey(0)))
    assert out.shape == feats.shape
    changed = out != np.asarray(feats)
    # something was masked, and masked cells carry the per-example minimum
    assert changed.any()
    for b in range(2):
        if changed[b].any():
            assert np.allclose(out[b][changed[b]], np.asarray(feats)[b].min())
    # masked fraction is bounded (stripes, not wholesale destruction)
    assert changed.mean() < 0.5
