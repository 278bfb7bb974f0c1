"""Batched autoregressive generation under jit: greedy, top-k sampling, beam search.

This is the TPU-native replacement for both of the reference's inference engines —
HF ``model.generate`` (reference model.py:604-622, 647-668) and the CTranslate2 C++
Whisper engine (reference model.py:704-736). The whole decode loop is a single XLA
computation (``lax.while_loop`` with early exit once every sequence has emitted
EOT), with a pre-allocated KV cache; there is no per-token host round-trip.

Covered generation knobs (matching the reference's surface):
  * ``num_beams``  — beam search with ``length_penalty`` (reference model.py:609-618
    and CT2 ``beam_size``/``length_penalty``, model.py:723-727)
  * ``top_k``      — sampling when ``num_beams == 1`` (``do_sample = num_beams == 1``
    with default ``top_k = 1`` == greedy; reference model.py:615-616)

Beam search uses the standard static banked formulation (flax/T5X family, the
same algorithm class CTranslate2 implements): each step takes the top-2K
candidates, finished (EOT) candidates move to a per-sequence bank of K best
hypotheses by ``score / length**length_penalty``, and all K live slots keep
exploring unfinished continuations. The final hypothesis is the best of the
bank and the (length-penalized) live set.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax

from . import tokenizer as tok
from .models.config import WhisperConfig
from .models.whisper import (
    decoder_step,
    encoder_forward,
    init_cache,
    precompute_cross_kv,
)

NEG_INF = jnp.float32(-1e30)


# ------------------------------------------------------------ grammar constraint
#
# The transcript grammar is  species? (ts_open digit+ ts_close)* EOT  with
# non-decreasing timestamps. Real models occasionally emit malformed spans that
# the parser then drops (the reference inherits this silently via its regex,
# reference model.py:191-207); constrained decoding masks invalid tokens at
# each step so every generated transcript parses. Opt-in: changes outputs only
# where the unconstrained model would have produced garbage.
#
# Decoder state per sequence: mode in {0: start (species|ts|EOT), 1: after
# ts_open (digits only), 2: in digits (digits | ts >= open), 3: after ts_close
# (ts >= close | EOT)}, plus the last timestamp column.

_TS0 = tok.TIMESTAMP_BASE
_TS1 = tok.TIMESTAMP_BASE + tok.NUM_TIMESTAMPS


def _grammar_mask(mode, last_col, vocab: int, n_extra: int = 0):
    """mode [B], last_col [B] -> allowed-token bool mask [B, V].

    ``n_extra`` extended tokens (ids >= tok.VOCAB_SIZE, imported multi-digit
    cluster pieces) are digit-class; vocabulary padding rows beyond them stay
    disallowed."""
    ids = jnp.arange(vocab)
    is_digit = ((ids >= 0) & (ids < 10)) | (
        (ids >= tok.VOCAB_SIZE) & (ids < tok.VOCAB_SIZE + n_extra))
    is_ts = (ids >= _TS0) & (ids < _TS1)
    is_species = (ids >= tok.SPECIES_BASE) & (
        ids < tok.SPECIES_BASE + len(tok.SPECIES_TOKEN_IDS))
    is_eot = ids == tok.EOT_ID

    ts_geq = is_ts & (ids[None, :] >= (_TS0 + last_col)[:, None])  # [B, V]
    # closing a span needs a STRICTLY later column: onset == offset would be
    # a zero-length segment the parser drops (codec.parse_segments_from_ids
    # requires offset - onset > 0) — the silent garbage this mask exists to
    # rule out. Re-opening after a close (mode 3) keeps >=: abutting segments
    # are legal and the reference merges them (model.py:240-248).
    ts_gt = is_ts & (ids[None, :] > (_TS0 + last_col)[:, None])    # [B, V]

    m0 = (is_species | is_ts | is_eot)[None, :]
    m1 = is_digit[None, :]
    m2 = is_digit[None, :] | ts_gt
    m3 = is_eot[None, :] | ts_geq

    mode = mode[:, None]
    return jnp.where(
        mode == 0, m0, jnp.where(mode == 1, m1, jnp.where(mode == 2, m2, m3))
    )


def _grammar_step(mode, last_col, token, n_extra: int = 0):
    """Advance (mode, last_col) given the emitted token [B]."""
    is_digit = ((token >= 0) & (token < 10)) | (
        (token >= tok.VOCAB_SIZE) & (token < tok.VOCAB_SIZE + n_extra))
    is_ts = (token >= _TS0) & (token < _TS1)
    col = jnp.where(is_ts, token - _TS0, last_col)
    new_mode = jnp.where(
        is_ts,
        jnp.where((mode == 0) | (mode == 3), 1, 3),  # ts opens or closes a span
        jnp.where(is_digit, 2, mode),                # digits stay in the span
    )
    return new_mode, col


def _nucleus_filter(logits, top_p: float):
    """Mask tokens outside the smallest set with cumulative prob >= top_p
    (HF top_p semantics; the highest-prob token always survives). The full
    descending sort is one lax.top_k over the compact 1024-token vocab."""
    v = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    sorted_p, sort_idx = lax.top_k(probs, v)
    cum = jnp.cumsum(sorted_p, axis=-1)
    keep_sorted = (cum - sorted_p) < top_p          # prefix mass before token
    rows = jnp.arange(logits.shape[0])[:, None]
    keep = jnp.zeros(logits.shape, bool).at[rows, sort_idx].set(keep_sorted)
    return jnp.where(keep, logits, NEG_INF)


def _sample_or_argmax(logits, top_k: int, rng, top_p: float = 1.0):
    """logits [B, V] -> token [B]. Greedy when neither filter is active;
    otherwise sample from the (top_k ∩ nucleus) filtered distribution
    (HF sampling semantics: filters compose)."""
    if top_k <= 1 and top_p >= 1.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if top_p < 1.0:
        logits = _nucleus_filter(logits, top_p)
    if top_k > 1:
        vals, idxs = lax.top_k(logits, top_k)
        choice = jax.random.categorical(rng, vals.astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(
            idxs, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
    return jax.random.categorical(
        rng, logits.astype(jnp.float32), axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_length", "num_beams", "top_k", "top_p",
                     "early_exit", "constrained", "int8_kv"),
)
def generate(
    params,
    cfg: WhisperConfig,
    features,                      # [B, num_mel_bins, total_spec_columns]
    rng=None,
    max_length: int = 448,
    num_beams: int = 1,
    top_k: int = 1,
    top_p: float = 1.0,
    length_penalty: float = 1.0,
    early_exit: bool = True,
    constrained: bool = False,
    int8_kv: bool = False,
    enc_out=None,
):
    """Features -> generated token ids [B, max_length] (prompt included, PAD-padded).

    ``max_length`` caps the total sequence length including the 3-token prompt,
    mirroring HF ``generate(max_length=...)`` semantics (reference model.py:613).
    ``early_exit=False`` forces the full token budget (benchmarking).
    ``constrained=True`` masks grammar-invalid tokens per step (greedy/top-k
    path) so every transcript parses into monotone segments. ``int8_kv=True``
    stores the cross-attention K/V int8 and decodes through the Pallas
    in-VMEM-dequant kernel (``ops/cross_attention.py``) — measured faster than
    bf16 KV for MHA models, a wash under GQA (see BENCH.md).
    ``enc_out`` lets a caller that already ran the encoder (e.g. to also
    feed the frame head from the same pass) skip the second encoder run."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if enc_out is None:
        enc_out = encoder_forward(params, cfg, features)
    if num_beams <= 1:
        return _generate_greedy(params, cfg, enc_out, rng, max_length, top_k,
                                early_exit, constrained, int8_kv, top_p)
    return _generate_beam(params, cfg, enc_out, max_length, num_beams,
                          length_penalty, early_exit, int8_kv)


# ----------------------------------------------------------------- greedy / sample


def _generate_greedy(params, cfg, enc_out, rng, max_length: int, top_k: int,
                     early_exit: bool = True, constrained: bool = False,
                     int8_kv: bool = False, top_p: float = 1.0):
    batch = enc_out.shape[0]
    seq_len = enc_out.shape[1]
    prompt = jnp.tile(jnp.asarray(tok.PROMPT_IDS, dtype=jnp.int32)[None], (batch, 1))
    prompt_len = prompt.shape[1]
    vocab = cfg.vocab_size

    xk, xv = precompute_cross_kv(params, cfg, enc_out, int8_kv=int8_kv)
    ck, cv = init_cache(cfg, batch, max_length)

    tokens = jnp.full((batch, max_length), tok.PAD_ID, dtype=jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, prompt, (0, 0))

    mode = jnp.zeros((batch,), jnp.int32)
    last_col = jnp.zeros((batch,), jnp.int32)

    n_extra = len(cfg.extra_tokens)

    def pick(logits, rng_sub, mode, last_col):
        if constrained:
            mask = _grammar_mask(mode, last_col, vocab, n_extra)
            logits = jnp.where(mask, logits, NEG_INF)
        nxt = _sample_or_argmax(logits, top_k, rng_sub, top_p)
        mode2, col2 = _grammar_step(mode, last_col, nxt, n_extra)
        return nxt, mode2, col2

    logits, ck, cv = decoder_step(params, cfg, xk, xv, prompt, jnp.int32(0),
                                  ck, cv, cross_seq_len=seq_len)
    rng, sub = jax.random.split(rng)
    next_tok, mode, last_col = pick(logits[:, -1], sub, mode, last_col)
    finished = next_tok == tok.EOT_ID
    tokens = tokens.at[:, prompt_len].set(next_tok)

    def cond(state):
        tokens, pos, ck, cv, finished, rng, cur, mode, last_col = state
        if not early_exit:
            return pos + 1 < max_length
        return jnp.logical_and(pos + 1 < max_length, ~jnp.all(finished))

    def body(state):
        tokens, pos, ck, cv, finished, rng, cur, mode, last_col = state
        logits, ck, cv = decoder_step(
            params, cfg, xk, xv, cur[:, None], pos, ck, cv,
            cross_seq_len=seq_len,
        )
        rng, sub = jax.random.split(rng)
        nxt, mode, last_col = pick(logits[:, -1], sub, mode, last_col)
        nxt = jnp.where(finished, tok.PAD_ID, nxt)
        new_finished = jnp.logical_or(finished, nxt == tok.EOT_ID)
        tokens = lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        return tokens, pos + 1, ck, cv, new_finished, rng, nxt, mode, last_col

    state = (tokens, jnp.int32(prompt_len), ck, cv, finished, rng, next_tok,
             mode, last_col)
    tokens, *_ = lax.while_loop(cond, body, state)
    return tokens


# ----------------------------------------------------------------- speculative


@functools.partial(
    jax.jit, static_argnames=("cfg", "draft_cfg", "max_length", "spec_k"))
def generate_speculative(
    params,
    cfg: WhisperConfig,
    draft_params,
    draft_cfg: WhisperConfig,
    features,
    max_length: int = 448,
    spec_k: int = 4,
):
    """Greedy speculative decoding: a small draft model proposes ``spec_k``
    tokens per iteration, the target model verifies them in ONE forward over
    the chunk, and the longest matching prefix plus the target's own next
    token are committed. The output is EXACTLY the target's greedy transcript
    (acceptance rate only affects speed) — a capability neither of the
    reference's engines (HF generate / CTranslate2) provides. Exactness
    caveat: "the target's greedy transcript" as computed by chunked
    verification forwards — on TPU, bf16 MXU passes make the Lc=K+1 chunk
    numerically differ from Lc=1 steps in the last bits, so near-tied
    argmaxes occasionally flip (measured: boundary-level diffs on a few of
    39 segments on real data; bitwise-identical on CPU f32).

    TPU-native formulation: cache slots are decoupled from sequence
    positions. Every iteration consumes ``spec_k + 1`` cache slots at a
    GLOBAL cursor (identical for all rows, so cache writes stay a single
    dynamic_update_slice — no scatter); per-row divergence lives entirely in
    a ``slot_valid`` boolean map (rejected drafts stay masked forever) and a
    per-row true-position vector for positional embeddings. All shapes are
    static; the whole decode is one ``lax.while_loop``.

    The draft runs ``spec_k + 1`` single-token steps per iteration (the last
    ingests its own final draft so every committed token's K/V exists in
    both caches). Worst case (zero acceptance) this degrades to ~greedy
    speed plus draft overhead; with a finetuned tiny draft the target runs
    once per ~accepted+1 tokens.

    Cache memory: ``prompt + (max_length - prompt) * (spec_k + 1)`` slots.
    Both models must share the tokenizer (same vocab/prompt)."""
    assert cfg.vocab_size == draft_cfg.vocab_size, "vocabularies must match"
    k = spec_k
    enc_t = encoder_forward(params, cfg, features)
    enc_d = encoder_forward(draft_params, draft_cfg, features)
    batch, s_t = enc_t.shape[:2]
    s_d = enc_d.shape[1]

    xk_t, xv_t = precompute_cross_kv(params, cfg, enc_t)
    xk_d, xv_d = precompute_cross_kv(draft_params, draft_cfg, enc_d)

    prompt = jnp.tile(jnp.asarray(tok.PROMPT_IDS, dtype=jnp.int32)[None],
                      (batch, 1))
    pl = prompt.shape[1]
    max_slots = pl + (max_length - pl) * (k + 1)
    ck_t, cv_t = init_cache(cfg, batch, max_slots)
    ck_d, cv_d = init_cache(draft_cfg, batch, max_slots)

    tokens = jnp.full((batch, max_length), tok.PAD_ID, dtype=jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, prompt, (0, 0))

    # Prefill both models (slots == positions for the prompt).
    logits, ck_t, cv_t = decoder_step(params, cfg, xk_t, xv_t, prompt,
                                      jnp.int32(0), ck_t, cv_t,
                                      cross_seq_len=s_t)
    _, ck_d, cv_d = decoder_step(draft_params, draft_cfg, xk_d, xv_d, prompt,
                                 jnp.int32(0), ck_d, cv_d, cross_seq_len=s_d)
    cur = jnp.argmax(logits[:, -1].astype(jnp.float32), -1).astype(jnp.int32)
    tokens = tokens.at[:, pl].set(cur)
    finished = cur == tok.EOT_ID
    tp = jnp.full((batch,), pl + 1, jnp.int32)  # committed length per row
    slot_valid = (jnp.arange(max_slots) < pl)[None, :].repeat(batch, axis=0)

    cols_k = jnp.arange(k + 1)
    cols_len = jnp.arange(max_length)
    cols_s = jnp.arange(max_slots)

    def cond(state):
        tokens, tp, cur, finished, slot0, slot_valid, *_ = state
        return jnp.logical_and(slot0 + k + 1 <= max_slots,
                               ~jnp.all(finished))

    def body(state):
        (tokens, tp, cur, finished, slot0, slot_valid,
         ck_t, cv_t, ck_d, cv_d) = state

        # ---- draft phase: k proposal steps + 1 ingest step (all Lc == 1)
        def draft_step(j, carry):
            x_j, drafts, ck_d, cv_d = carry
            spec_prefix = (cols_s >= slot0) & (cols_s < slot0 + j)
            dl, ck_d, cv_d = decoder_step(
                draft_params, draft_cfg, xk_d, xv_d, x_j[:, None], slot0 + j,
                ck_d, cv_d, cross_seq_len=s_d,
                truepos=tp - 1 + j,
                slot_valid=slot_valid | spec_prefix[None, :])
            d_j = jnp.argmax(dl[:, -1].astype(jnp.float32), -1).astype(jnp.int32)
            drafts = jnp.where(cols_k[None, :k] == j, d_j[:, None], drafts)
            return d_j, drafts, ck_d, cv_d

        drafts = jnp.full((batch, k), tok.PAD_ID, dtype=jnp.int32)
        _, drafts, ck_d, cv_d = lax.fori_loop(
            0, k + 1, draft_step, (cur, drafts, ck_d, cv_d))

        # ---- verify: one target forward over [cur, d_1..d_k]
        chunk = jnp.concatenate([cur[:, None], drafts], axis=1)  # [B, K+1]
        tl, ck_t, cv_t = decoder_step(
            params, cfg, xk_t, xv_t, chunk, slot0, ck_t, cv_t,
            cross_seq_len=s_t, truepos=tp - 1, slot_valid=slot_valid)
        g = jnp.argmax(tl.astype(jnp.float32), -1).astype(jnp.int32)  # [B,K+1]

        # ---- acceptance: longest matching prefix, then the bonus token
        match = drafts == g[:, :k]                                # [B, K]
        accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        bonus = jnp.take_along_axis(g, accepted[:, None], axis=1)[:, 0]
        padded = jnp.concatenate(
            [drafts, jnp.full((batch, 1), tok.PAD_ID, jnp.int32)], axis=1)
        commit = jnp.where(cols_k[None] < accepted[:, None], padded,
                           jnp.where(cols_k[None] == accepted[:, None],
                                     bonus[:, None], tok.PAD_ID))  # [B, K+1]

        # EOT truncation: commits stop at (and include) the first EOT
        is_eot = commit == tok.EOT_ID
        any_eot = jnp.any(is_eot, axis=1)
        first_eot = jnp.argmax(is_eot, axis=1)
        count = jnp.where(any_eot, first_eot + 1, accepted + 1)
        count = jnp.where(finished, 0, count)
        count = jnp.minimum(count, max_length - tp)                # budget cap

        # ---- write committed tokens at per-row true positions (one pass)
        rel = jnp.clip(cols_len[None] - tp[:, None], 0, k)
        vals = jnp.take_along_axis(commit, rel, axis=1)            # [B, L]
        wmask = (cols_len[None] >= tp[:, None]) & \
                (cols_len[None] < (tp + count)[:, None])
        tokens = jnp.where(wmask, vals, tokens)

        # ---- bookkeeping
        n_draft_committed = jnp.minimum(accepted, count)           # d_j slots
        newly_valid = (cols_s[None] >= slot0) & \
            (cols_s[None] <= slot0 + n_draft_committed[:, None]) & \
            ~finished[:, None]
        slot_valid = slot_valid | newly_valid
        new_finished = finished | any_eot | (tp + count >= max_length)
        cur = jnp.where(new_finished, tok.PAD_ID, bonus)
        tp = tp + count
        return (tokens, tp, cur, new_finished, slot0 + k + 1, slot_valid,
                ck_t, cv_t, ck_d, cv_d)

    state = (tokens, tp, cur, finished, jnp.int32(pl), slot_valid,
             ck_t, cv_t, ck_d, cv_d)
    tokens, *_ = lax.while_loop(cond, body, state)
    return tokens


# ------------------------------------------------------------------------ beam


def _beam_rows(beam_idx, batch: int, k: int):
    """[B, K] within-batch beam indices -> flat row indices into a B*K-major axis."""
    return (beam_idx + jnp.arange(batch)[:, None] * k).reshape(-1)


def _beam_candidates(total, k: int, vocab: int):
    """total [B, P*V] summed log-probs -> top-2K (scores, parent, token).

    2K candidates guarantee >= K non-EOT continuations (each of the <= K
    parents contributes at most one EOT candidate), so the live set never
    starves while EOT candidates are moved to the finished bank."""
    scores, flat = lax.top_k(total, 2 * k)
    return scores, flat // vocab, (flat % vocab).astype(jnp.int32)


def _bank_merge(bank_scores, bank_tokens, cand_scores, cand_tokens):
    """Keep the K best of (existing bank ∪ new candidates) per sequence.

    bank_scores [B, K], bank_tokens [B, K, L], cand_scores [B, C],
    cand_tokens [B, C, L]; scores are already length-penalized. Returns the
    updated ([B, K], [B, K, L]) bank."""
    k = bank_scores.shape[1]
    all_scores = jnp.concatenate([bank_scores, cand_scores], axis=1)
    all_tokens = jnp.concatenate([bank_tokens, cand_tokens], axis=1)
    new_scores, idx = lax.top_k(all_scores, k)
    new_tokens = jnp.take_along_axis(all_tokens, idx[:, :, None], axis=1)
    return new_scores, new_tokens


def _generate_beam(params, cfg, enc_out, max_length: int, num_beams: int,
                   length_penalty: float, early_exit: bool = True,
                   int8_kv: bool = False):
    """Banked beam search: finished hypotheses leave the live set.

    Matches the algorithm family of the reference's engines (HF ``generate``
    beam hypotheses / CT2 ``beam_size``): every step the top-2K candidates are
    split — EOT candidates are banked by length-penalized score, the best K
    unfinished candidates keep decoding — so a beam that finishes early frees
    its slot for further exploration instead of freezing it."""
    batch, s, d = enc_out.shape
    k = num_beams
    lp_pow = jnp.float32(length_penalty)
    vocab = cfg.vocab_size

    # Expand encoder state to B*K rows (beam-major within each batch element).
    enc_rep = jnp.repeat(enc_out, k, axis=0)
    xk, xv = precompute_cross_kv(params, cfg, enc_rep, int8_kv=int8_kv)
    ck, cv = init_cache(cfg, batch * k, max_length)

    prompt = jnp.tile(jnp.asarray(tok.PROMPT_IDS, dtype=jnp.int32)[None],
                      (batch * k, 1))
    prompt_len = prompt.shape[1]

    tokens = jnp.full((batch * k, max_length), tok.PAD_ID, dtype=jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, prompt, (0, 0))

    logits, ck, cv = decoder_step(params, cfg, xk, xv, prompt, jnp.int32(0),
                                  ck, cv, cross_seq_len=s)
    logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
    logp0 = logp.reshape(batch, k, -1)[:, 0]  # beams identical at step 0: [B, V]

    # Seed step: one virtual parent; split top-2K into bank and live.
    c_scores, _, c_tok = _beam_candidates(logp0, k, vocab)  # [B, 2K]
    is_eot = c_tok == tok.EOT_ID
    base = tokens.reshape(batch, k, max_length)[:, :1]  # identical prompt rows
    cand_tokens = jnp.broadcast_to(base, (batch, 2 * k, max_length))
    cand_tokens = cand_tokens.at[:, :, prompt_len].set(c_tok)
    bank_scores, bank_tokens = _bank_merge(
        jnp.full((batch, k), NEG_INF),
        jnp.full((batch, k, max_length), tok.PAD_ID, dtype=jnp.int32),
        jnp.where(is_eot, c_scores, NEG_INF), cand_tokens)  # len 1: 1**p == 1

    live_scores, lv_idx = lax.top_k(jnp.where(is_eot, NEG_INF, c_scores), k)
    lv_tok = jnp.take_along_axis(c_tok, lv_idx, axis=1)     # [B, K]
    tokens = tokens.at[:, prompt_len].set(lv_tok.reshape(-1))
    lengths = jnp.ones((batch, k), dtype=jnp.int32)  # generated tokens per beam

    def cond(state):
        (tokens, pos, ck, cv, live_scores, lengths, cur,
         bank_scores, bank_tokens) = state
        if not early_exit:
            return pos + 1 < max_length
        # A sequence is done when no live beam's current-length-normalized
        # score can still beat its worst banked hypothesis (HF's default
        # ``early_stopping=False`` heuristic; the bank must be full first
        # since empty slots sit at NEG_INF).
        best_live = jnp.max(
            live_scores / lengths.astype(jnp.float32) ** lp_pow, axis=1)
        worst_bank = jnp.min(bank_scores, axis=1)
        return jnp.logical_and(pos + 1 < max_length,
                               jnp.any(best_live > worst_bank))

    def body(state):
        (tokens, pos, ck, cv, live_scores, lengths, cur,
         bank_scores, bank_tokens) = state
        logits, ck, cv = decoder_step(params, cfg, xk, xv, cur[:, None], pos,
                                      ck, cv, cross_seq_len=s)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        total = live_scores.reshape(-1, 1) + logp             # [B*K, V]
        c_scores, c_parent, c_tok = _beam_candidates(
            total.reshape(batch, k * vocab), k, vocab)        # [B, 2K]
        is_eot = c_tok == tok.EOT_ID

        # Bank the EOT candidates at their length-penalized score.
        cand_len = jnp.take_along_axis(lengths, c_parent, axis=1) + 1
        cand_pen = c_scores / cand_len.astype(jnp.float32) ** lp_pow
        parent_rows = _beam_rows(c_parent, batch, k)          # [B*2K]
        cand_tokens = jnp.take(tokens, parent_rows, axis=0).reshape(
            batch, 2 * k, max_length)
        cand_tokens = lax.dynamic_update_slice(
            cand_tokens, c_tok[:, :, None], (0, 0, pos + 1))
        bank_scores, bank_tokens = _bank_merge(
            bank_scores, bank_tokens,
            jnp.where(is_eot, cand_pen, NEG_INF), cand_tokens)

        # Continue with the K best unfinished candidates.
        live_scores, lv_idx = lax.top_k(jnp.where(is_eot, NEG_INF, c_scores), k)
        lv_parent = jnp.take_along_axis(c_parent, lv_idx, axis=1)
        lv_tok = jnp.take_along_axis(c_tok, lv_idx, axis=1)
        rows = _beam_rows(lv_parent, batch, k)
        tokens = jnp.take(tokens, rows, axis=0)
        ck = jnp.take(ck, rows, axis=1)
        cv = jnp.take(cv, rows, axis=1)
        lengths = jnp.take_along_axis(lengths, lv_parent, axis=1) + 1
        nxt = lv_tok.reshape(-1)
        tokens = lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        return (tokens, pos + 1, ck, cv, live_scores, lengths, nxt,
                bank_scores, bank_tokens)

    state = (tokens, jnp.int32(prompt_len), ck, cv, live_scores, lengths,
             lv_tok.reshape(-1), bank_scores, bank_tokens)
    (tokens, _, _, _, live_scores, lengths, _,
     bank_scores, bank_tokens) = lax.while_loop(cond, body, state)

    # Best of bank ∪ live (live covers budget exhaustion before K finishes).
    live_pen = live_scores / lengths.astype(jnp.float32) ** lp_pow
    all_scores = jnp.concatenate([bank_scores, live_pen], axis=1)
    all_tokens = jnp.concatenate(
        [bank_tokens, tokens.reshape(batch, k, max_length)], axis=1)
    best = jnp.argmax(all_scores, axis=1)                     # [B]
    return jnp.take_along_axis(
        all_tokens, best[:, None, None], axis=1)[:, 0]
