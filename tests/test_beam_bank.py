"""Unit tests for the banked beam-search helpers (decode.py).

The banked formulation (reference: HF beam hypotheses / CT2 beam_size) moves
EOT candidates out of the live set into a per-sequence top-K bank so finished
beams stop occupying exploration slots."""

import numpy as np
import jax.numpy as jnp

from whisperseg_tpu.decode import _bank_merge, _beam_candidates, NEG_INF


def test_beam_candidates_topk_split():
    # P=2 parents, V=5 vocab, K=2 -> top-4 of the 10 (parent, token) pairs.
    total = jnp.asarray([[
        0.0, -1.0, -9.0, -9.0, -9.0,   # parent 0: tokens 0, 1
        -0.5, -9.0, -9.0, -2.0, -9.0,  # parent 1: tokens 0, 3
    ]])
    scores, parent, tok = _beam_candidates(total, 2, 5)
    np.testing.assert_array_equal(np.asarray(scores)[0], [0.0, -0.5, -1.0, -2.0])
    np.testing.assert_array_equal(np.asarray(parent)[0], [0, 1, 0, 1])
    np.testing.assert_array_equal(np.asarray(tok)[0], [0, 0, 1, 3])


def test_bank_merge_keeps_best_k_and_aligns_tokens():
    bank_s = jnp.asarray([[-1.0, -3.0]])
    bank_t = jnp.asarray([[[10, 10], [30, 30]]], dtype=jnp.int32)
    cand_s = jnp.asarray([[-2.0, -0.5, float(NEG_INF)]])
    cand_t = jnp.asarray([[[20, 20], [5, 5], [99, 99]]], dtype=jnp.int32)
    s, t = _bank_merge(bank_s, bank_t, cand_s, cand_t)
    np.testing.assert_allclose(np.asarray(s)[0], [-0.5, -1.0])
    np.testing.assert_array_equal(np.asarray(t)[0], [[5, 5], [10, 10]])


def test_bank_merge_neg_inf_slots_never_win():
    # An empty bank (NEG_INF) merged with one real candidate keeps it first.
    bank_s = jnp.full((1, 3), NEG_INF)
    bank_t = jnp.zeros((1, 3, 2), jnp.int32)
    cand_s = jnp.asarray([[-4.0]])
    cand_t = jnp.asarray([[[7, 8]]], dtype=jnp.int32)
    s, t = _bank_merge(bank_s, bank_t, cand_s, cand_t)
    assert float(np.asarray(s)[0, 0]) == -4.0
    np.testing.assert_array_equal(np.asarray(t)[0, 0], [7, 8])
    assert np.asarray(s)[0, 1] <= float(NEG_INF) / 2


def test_two_k_candidates_always_contain_k_non_eot():
    """With <=K parents, at most K of the 2K top candidates can be EOT."""
    k, vocab, eot = 3, 8, 5
    rng = np.random.RandomState(0)
    for _ in range(20):
        total = rng.randn(2, k * vocab).astype(np.float32)
        # make every parent's EOT the per-parent best to stress the split
        total = total.reshape(2, k, vocab)
        total[:, :, eot] = 10.0 + rng.rand(2, k)
        _, _, tok = _beam_candidates(jnp.asarray(total.reshape(2, -1)), k, vocab)
        non_eot = (np.asarray(tok) != eot).sum(axis=1)
        assert (non_eot >= k).all()
