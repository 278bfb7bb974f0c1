"""Export direction (VERDICT r2 item 5): our checkpoints -> HF Whisper layout.

The reference consumes a model as one HF directory (weights + tokenizer +
WhisperSeg config metadata, reference model.py:625-644); these tests prove a
WhisperSeg-TPU finetune becomes exactly that:

  1. round-trip ours -> HF dir -> ours is lossless (exact teacher-forced
     logits + greedy transcripts, config metadata preserved, frame head
     restored);
  2. real ``transformers`` loads the exported directory and produces the
     SAME teacher-forced logits and greedy continuations as our decoder;
  3. the exported tokenizer decodes our ids to the same strings and
     re-encodes reference-style label text to the same ids;
  4. GQA checkpoints export as mathematically identical MHA.
"""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from whisperseg_tpu import tokenizer as wtok
from whisperseg_tpu.models.config import WhisperConfig
from whisperseg_tpu.models.convert_hf import import_hf_checkpoint
from whisperseg_tpu.models.export_hf import export_hf_checkpoint
from whisperseg_tpu.models.whisper import (decoder_forward_train,
                                           encoder_forward, init_params)


def tiny_cfg(**kw):
    base = dict(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        max_source_positions=50, max_target_positions=64,
        total_spec_columns=100, compute_dtype="float32",
        cluster_codebook={"Vocal": 0, "Chirp": 1},
        default_segmentation_config={"sr": 16000, "spec_time_step": 0.01,
                                     "min_frequency": 0, "max_length": 32},
        current_step=123,
    )
    base.update(kw)
    return WhisperConfig(**base)


def _logits(params, cfg, feats, ids):
    enc = encoder_forward(params, cfg, feats)
    return np.asarray(decoder_forward_train(params, cfg, enc, ids))


def _rand_feats(cfg, b=2, seed=0):
    r = np.random.RandomState(seed)
    return jnp.asarray(
        r.randn(b, cfg.num_mel_bins, cfg.total_spec_columns).astype(np.float32))


def _rand_ids(cfg, b=2, l=12, seed=1):
    r = np.random.RandomState(seed)
    ids = r.randint(0, wtok.VOCAB_SIZE, size=(b, l))
    ids[:, :3] = wtok.PROMPT_IDS
    return jnp.asarray(ids.astype(np.int32))


# ------------------------------------------------------------------ round-trip


def test_roundtrip_ours_to_hf_to_ours(tmp_path):
    cfg = tiny_cfg(frame_head=True, frame_head_clusters=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "frame_head" in params

    out = str(tmp_path / "hf")
    export_hf_checkpoint(params, cfg, out)
    p2, c2 = import_hf_checkpoint(out, total_spec_columns=None)

    assert c2.total_spec_columns == cfg.total_spec_columns
    assert c2.cluster_codebook == cfg.cluster_codebook
    assert c2.default_segmentation_config == cfg.default_segmentation_config
    assert c2.current_step == cfg.current_step
    assert c2.frame_head and c2.frame_head_clusters == 2
    assert c2.max_source_positions == cfg.max_source_positions

    feats, ids = _rand_feats(cfg), _rand_ids(cfg)
    np.testing.assert_allclose(_logits(p2, c2, feats, ids),
                               _logits(params, cfg, feats, ids),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2["frame_head"]["h2_w"]),
                               np.asarray(params["frame_head"]["h2_w"]),
                               atol=0)

    from whisperseg_tpu.decode import generate

    t1 = np.asarray(generate(params, cfg, feats, max_length=16))
    t2 = np.asarray(generate(p2, c2, feats, max_length=16))
    np.testing.assert_array_equal(t1, t2)


def test_roundtrip_preserves_extra_tokens(tmp_path):
    """An imported-finetune re-export keeps extended-vocabulary pieces and
    their exact BPE encodings (merge ORDER, not just the piece set)."""
    cfg = tiny_cfg(cluster_codebook={"a": 11, "b": 123},
                   extra_tokens=["12", "23"],
                   cluster_encodings={"11": ["1", "1"], "123": ["1", "23"]},
                   vocab_size=wtok.VOCAB_SIZE + 128)
    params = init_params(jax.random.PRNGKey(1), cfg)
    out = str(tmp_path / "hf")
    export_hf_checkpoint(params, cfg, out)

    p2, c2 = import_hf_checkpoint(out, total_spec_columns=None)
    assert c2.extra_tokens == ["12", "23"]
    assert c2.cluster_encodings == {"11": ["1", "1"], "123": ["1", "23"]}
    assert c2.vocab_size == cfg.vocab_size

    feats, ids = _rand_feats(cfg), _rand_ids(cfg)
    np.testing.assert_allclose(_logits(p2, c2, feats, ids),
                               _logits(params, cfg, feats, ids),
                               atol=1e-5, rtol=1e-5)


def test_merges_reproduce_encodings_or_raise(tmp_path):
    from whisperseg_tpu.models.export_hf import _merges_for_encodings

    # consistent: '123' -> ['12','3'] via merge ('1','2')
    lines = _merges_for_encodings({"123": ["12", "3"], "12": ["12"]})
    assert lines == ["1 2"]
    # inconsistent partitions cannot be represented by one merge table
    with pytest.raises(ValueError, match="cannot reproduce"):
        _merges_for_encodings({"12": ["1", "2"], "124": ["12", "4"]})


# ------------------------------------------------------- transformers parity


def test_transformers_loads_export_with_logit_parity(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = tiny_cfg(frame_head=True, frame_head_clusters=1)
    params = init_params(jax.random.PRNGKey(2), cfg)
    out = str(tmp_path / "hf")
    export_hf_checkpoint(params, cfg, out)

    hf = transformers.WhisperForConditionalGeneration.from_pretrained(out)
    hf = hf.eval()
    assert hf.config.total_spec_columns == cfg.total_spec_columns
    assert hf.config.cluster_codebook == cfg.cluster_codebook

    feats, ids = _rand_feats(cfg), _rand_ids(cfg)
    ours = _logits(params, cfg, feats, ids)
    with torch.no_grad():
        theirs = hf(input_features=torch.from_numpy(np.asarray(feats)),
                    decoder_input_ids=torch.from_numpy(np.asarray(ids)),
                    ).logits.numpy()
    np.testing.assert_allclose(theirs, ours, atol=2e-4, rtol=2e-4)

    # greedy continuation parity (HF generate vs our decode)
    from whisperseg_tpu.decode import generate

    with torch.no_grad():
        hf_ids = hf.generate(
            input_features=torch.from_numpy(np.asarray(feats)),
            decoder_input_ids=torch.from_numpy(
                np.asarray([[*wtok.PROMPT_IDS]] * 2, dtype=np.int64)),
            max_length=16, num_beams=1, do_sample=False).numpy()
    ours_ids = np.asarray(generate(params, cfg, feats, max_length=16))
    prompt = list(wtok.PROMPT_IDS)
    for b in range(2):
        h = [int(t) for t in hf_ids[b] if t != wtok.PAD_ID]
        o = [int(t) for t in ours_ids[b] if t != wtok.PAD_ID]
        # this transformers version returns the continuation without the
        # supplied decoder_input_ids prompt; ours includes it — strip both.
        # HF also stops emitting after EOT while ours pads — compare up to
        # and including the first EOT
        if h[:3] == prompt:
            h = h[3:]
        assert o[:3] == prompt
        o = o[3:]
        if wtok.EOT_ID in o:
            o = o[: o.index(wtok.EOT_ID) + 1]
        if wtok.EOT_ID in h:
            h = h[: h.index(wtok.EOT_ID) + 1]
        assert h == o, f"batch {b}: HF {h} != ours {o}"


def test_exported_tokenizer_round_trips(tmp_path):
    transformers = pytest.importorskip("transformers")

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    out = str(tmp_path / "hf")
    export_hf_checkpoint(params, cfg, out)

    tk = transformers.WhisperTokenizer.from_pretrained(out)
    # decode our ids -> surfaces
    ids = [wtok.SOT_ID, wtok.timestamp_id(5), wtok.TOKEN_TO_ID["1"],
           wtok.TOKEN_TO_ID["2"], wtok.timestamp_id(17), wtok.EOT_ID]
    text = tk.decode(ids, skip_special_tokens=False)
    assert "<|5|>" in text and "12" in text and "<|17|>" in text
    # encode reference-style label text -> our ids
    enc = tk("<|unknown|><|5|>12<|17|>", add_special_tokens=False).input_ids
    assert enc == [wtok.SPECIES_TOKEN_IDS["unknown"], wtok.timestamp_id(5),
                   wtok.TOKEN_TO_ID["1"], wtok.TOKEN_TO_ID["2"],
                   wtok.timestamp_id(17)]


# ----------------------------------------------------------------------- GQA


def test_gqa_exports_as_identical_mha(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = tiny_cfg(num_kv_heads=2)
    params = init_params(jax.random.PRNGKey(4), cfg)
    out = str(tmp_path / "hf")
    export_hf_checkpoint(params, cfg, out)

    cfg_json = json.load(open(os.path.join(out, "config.json")))
    assert cfg_json["whisperseg_gqa_kv_heads"] == 2

    feats, ids = _rand_feats(cfg), _rand_ids(cfg)
    ours = _logits(params, cfg, feats, ids)

    hf = transformers.WhisperForConditionalGeneration.from_pretrained(out)
    with torch.no_grad():
        theirs = hf.eval()(
            input_features=torch.from_numpy(np.asarray(feats)),
            decoder_input_ids=torch.from_numpy(np.asarray(ids))).logits.numpy()
    np.testing.assert_allclose(theirs, ours, atol=2e-4, rtol=2e-4)

    # and the re-import (now MHA) still matches
    p2, c2 = import_hf_checkpoint(out, total_spec_columns=None)
    assert c2.kv_heads == c2.num_heads
    np.testing.assert_allclose(_logits(p2, c2, feats, ids), ours,
                               atol=1e-5, rtol=1e-5)
