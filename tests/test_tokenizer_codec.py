import numpy as np
import pytest

from whisperseg_tpu import codec
from whisperseg_tpu import tokenizer as tok


def test_vocab_layout():
    assert tok.VOCAB_SIZE == 1024  # MXU-tile aligned
    assert tok.ID_TO_TOKEN[0] == "0"
    assert tok.ID_TO_TOKEN[9] == "9"
    assert tok.ID_TO_TOKEN[tok.EOT_ID] == "<|endoftext|>"
    assert tok.ID_TO_TOKEN[tok.TIMESTAMP_BASE] == "<|0|>"
    assert tok.ID_TO_TOKEN[tok.TIMESTAMP_BASE + 1000] == "<|1000|>"
    assert tok.TOKEN_TO_ID["<|zebra_finch|>"] == tok.SPECIES_BASE


def test_text_round_trip():
    text = "<|unknown|><|0|>7<|6|><|16|>12<|18|>"
    ids = tok.encode_text(text)
    assert tok.decode_ids(ids) == text
    assert tok.decode_ids(ids, skip_special_tokens=True) == "712"


def test_time_to_col_round_half_even():
    # numpy round-half-to-even semantics (reference datautils.py:323-324)
    step = 0.0025
    assert codec.time_to_col(0.0025, step, 1000) == 0  # 0.5 -> 0
    assert codec.time_to_col(0.0075, step, 1000) == 2  # 1.5 -> 2
    assert codec.time_to_col(10.0, step, 1000) == 1000  # clipped
    assert codec.col_to_time(7, step) == pytest.approx(0.035)


def test_build_target_and_shift():
    ids = codec.build_target_ids(
        species="zebra_finch",
        onsets=[0.0, 0.04],
        offsets=[0.03, 0.09],
        cluster_ids=[7, 12],
        spec_time_step=0.0025,
        total_spec_columns=1000,
    )
    # prompt + species + (ts 0, '7', ts 6) + (ts 8, '1','2', ts 18) + eot
    expected = list(tok.PROMPT_IDS) + [
        tok.species_token("zebra_finch"),
        tok.timestamp_id(0), 7, tok.timestamp_id(6),
        tok.timestamp_id(8), 1, 2, tok.timestamp_id(18),
        tok.EOT_ID,
    ]
    assert ids == expected

    inputs, labels = codec.shift_for_training(ids, max_length=16)
    assert len(inputs) == len(labels) == 16
    assert inputs[: len(ids) - 1] == ids[:-1]
    assert labels[: len(ids) - 1] == ids[1:]
    assert all(x == tok.PAD_ID for x in inputs[len(ids) - 1:])
    assert all(x == -100 for x in labels[len(ids) - 1:])

    # truncation keeps max_length+1 then shifts
    inputs2, labels2 = codec.shift_for_training(ids, max_length=5)
    assert inputs2 == ids[:5]
    assert labels2 == ids[1:6]


def test_parse_segments_basic():
    inv = {7: "a", 12: "b"}
    ids = codec.build_target_ids(
        "unknown", [0.0, 0.04], [0.03, 0.09], [7, 12], 0.0025, 1000
    )
    segs = codec.parse_segments_from_ids(ids, 0.0025, inv)
    assert len(segs) == 2
    assert segs[0] == [0.0, pytest.approx(0.03), "a"]
    assert segs[1] == [pytest.approx(0.04), pytest.approx(0.09), "b"]


def test_parse_regex_equivalence():
    """Token scan must match the reference regex findall semantics."""
    import re

    matcher = re.compile(r"<\|([0-9]+)\|>(\d+?)<\|([0-9]+)\|>")
    inv = {i: str(i) for i in range(100)}
    step = 0.01
    cases = [
        "<|5|>12<|8|>",
        "<|1|>2<|3|>4<|5|>",  # closing ts cannot reopen
        "<|5|><|8|>9<|10|>",  # empty digits -> retry at next ts
        "<|notimestamps|><|unknown|><|0|>1<|2|><|endoftext|>",
        "<|7|>3",  # incomplete
        "12<|5|>",  # digits without opening ts
        "<|5|>12<|8|><|8|>1<|9|>",
    ]
    for text in cases:
        got = codec.parse_segments_from_text(text, step, inv)
        want = []
        for on, cid, off in matcher.findall(text):
            onset = int(on) * step * 2
            offset = int(off) * step * 2
            if int(cid) in inv and offset - onset > 0:
                want.append([onset, offset, inv[int(cid)]])
        assert got == want, text


def test_parse_drops_unknown_and_nonpositive():
    inv = {1: "x"}
    # unknown cluster 9, zero-length segment
    text = "<|0|>9<|5|><|3|>1<|3|><|4|>1<|6|>"
    segs = codec.parse_segments_from_text(text, 0.01, inv)
    assert segs == [[0.08, 0.12, "x"]]


def test_encode_cluster_string_recorded_bpe_order_wins():
    """cluster_encodings (the checkpoint's recorded BPE piece sequences) is
    authoritative: greedy longest-match over the piece set can pick a
    different partition than the checkpoint's merges produced."""
    from whisperseg_tpu.tokenizer import DIGIT_BASE, VOCAB_SIZE, encode_cluster_string

    extra = {"12": VOCAB_SIZE, "23": VOCAB_SIZE + 1}
    # greedy longest-match-from-left: '12' then '3'
    assert encode_cluster_string("123", extra) == [VOCAB_SIZE, DIGIT_BASE + 3]
    # the checkpoint's BPE merged '23' first: '1' then '23'
    enc = {"123": ["1", "23"]}
    assert encode_cluster_string("123", extra, enc) == [
        DIGIT_BASE + 1, VOCAB_SIZE + 1]
    # a recorded piece without an extended row degrades to per-digit tokens
    enc2 = {"45": ["45"]}
    assert encode_cluster_string("45", extra, enc2) == [
        DIGIT_BASE + 4, DIGIT_BASE + 5]
