"""Self-contained segmentation tokenizer.

The reference delegates tokenization to the frozen HuggingFace BPE vocabulary of
``nccratliri/whisper-large`` extended with 1001 timestamp tokens and species tokens
(reference model.py:110-113). For segmentation, however, the decoder only ever needs:

  * timestamp tokens  ``<|0|>`` .. ``<|1000|>``
  * cluster ids rendered as decimal digits
  * a handful of control / species tokens

so this rebuild uses a compact, fully deterministic 1024-entry vocabulary. This is a
deliberate TPU-first design decision: the decoder's output projection shrinks from
~51k rows to 1024 (a single 128-aligned MXU tile), which makes every autoregressive
decode step dramatically cheaper than the reference's, and removes the runtime
dependency on the HuggingFace hub entirely.

Cluster ids are encoded digit-by-digit ('12' -> ['1','2']), which round-trips exactly
with the reference's regex parser semantics (reference model.py:120,191-207).

Vocabulary layout (total 1024 = 8 * 128, MXU-tile aligned):

    0..9      digits '0'..'9'
    10        <|pad|>
    11        <|endoftext|>
    12        <|startoftranscript|>
    13        <|en|>
    14        <|notimestamps|>
    15..21    species tokens <|zebra_finch|> .. <|animal|>
    22        <|reserved0|>
    23..1023  timestamp tokens <|0|> .. <|1000|>
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence

from .constants import SPECIES_LIST

DIGIT_BASE = 0  # ids 0..9 are the digits '0'..'9'
PAD_ID = 10
EOT_ID = 11
SOT_ID = 12
EN_ID = 13
NOTIMESTAMPS_ID = 14
SPECIES_BASE = 15
RESERVED_ID = 22
TIMESTAMP_BASE = 23
NUM_TIMESTAMPS = 1001  # <|0|> .. <|1000|> inclusive
VOCAB_SIZE = TIMESTAMP_BASE + NUM_TIMESTAMPS  # == 1024

# Decoder prompt used for both training and generation
# (reference model.py:610 uses ["<|startoftranscript|>", "<|en|>", "<|notimestamps|>"]).
PROMPT_IDS = (SOT_ID, EN_ID, NOTIMESTAMPS_ID)

SPECIES_TOKEN_IDS: Dict[str, int] = {
    name: SPECIES_BASE + i for i, name in enumerate(SPECIES_LIST)
}

_SPECIAL_RE = re.compile(r"<\|([^|]*)\|>")


def _build_id_to_token() -> List[str]:
    toks = [str(d) for d in range(10)]
    toks += ["<|pad|>", "<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|notimestamps|>"]
    toks += [f"<|{name}|>" for name in SPECIES_LIST]
    toks += ["<|reserved0|>"]
    toks += [f"<|{i}|>" for i in range(NUM_TIMESTAMPS)]
    assert len(toks) == VOCAB_SIZE
    return toks


ID_TO_TOKEN: List[str] = _build_id_to_token()
TOKEN_TO_ID: Dict[str, int] = {t: i for i, t in enumerate(ID_TO_TOKEN)}


def timestamp_id(col: int) -> int:
    """Token id of the timestamp token <|col|>."""
    if not 0 <= col < NUM_TIMESTAMPS:
        raise ValueError(f"timestamp column {col} out of range [0, {NUM_TIMESTAMPS})")
    return TIMESTAMP_BASE + col


def is_timestamp(token_id: int) -> bool:
    return TIMESTAMP_BASE <= token_id < TIMESTAMP_BASE + NUM_TIMESTAMPS


def is_digit(token_id: int) -> bool:
    return 0 <= token_id < 10


def species_token(species: str) -> int:
    """Species name -> token id; unknown species map to <|unknown|>
    (reference datautils.py:359 uses species_codebook.get(species, '<|unknown|>'))."""
    return SPECIES_TOKEN_IDS.get(species, SPECIES_TOKEN_IDS["unknown"])


def encode_text(text: str) -> List[int]:
    """Tokenize a label/generation text into ids (no prompt, no EOT added).

    Accepts the same surface syntax the reference produces:
    a concatenation of ``<|special|>`` markers and decimal digit runs.
    """
    ids: List[int] = []
    pos = 0
    for m in _SPECIAL_RE.finditer(text):
        for ch in text[pos:m.start()]:
            if ch.isdigit():
                ids.append(ord(ch) - ord("0"))
            elif not ch.isspace():
                raise ValueError(f"cannot tokenize character {ch!r} in {text!r}")
        tok = m.group(0)
        if tok not in TOKEN_TO_ID:
            raise ValueError(f"unknown special token {tok!r}")
        ids.append(TOKEN_TO_ID[tok])
        pos = m.end()
    for ch in text[pos:]:
        if ch.isdigit():
            ids.append(ord(ch) - ord("0"))
        elif not ch.isspace():
            raise ValueError(f"cannot tokenize character {ch!r} in {text!r}")
    return ids


def decode_ids(ids: Sequence[int], skip_special_tokens: bool = False,
               extra_tokens: Sequence[str] = ()) -> str:
    """Token ids -> text. Mirrors tokenizer.batch_decode(skip_special_tokens=False)
    of the reference (reference model.py:620).

    ``extra_tokens`` are the checkpoint-specific extended-vocabulary surfaces
    for ids >= VOCAB_SIZE (multi-digit cluster BPE pieces imported from a
    reference finetune; see models/convert_hf.build_token_map — reference
    checkpoints tokenize cluster ids >= 10 as single BPE tokens like '12').
    """
    parts = []
    for i in ids:
        i = int(i)
        if 0 <= i < VOCAB_SIZE:
            tok = ID_TO_TOKEN[i]
        elif VOCAB_SIZE <= i < VOCAB_SIZE + len(extra_tokens):
            tok = extra_tokens[i - VOCAB_SIZE]
        else:
            continue
        if skip_special_tokens and tok.startswith("<|"):
            continue
        parts.append(tok)
    return "".join(parts)


def extended_digits(token_id: int, extra_tokens: Sequence[str]) -> str:
    """Digit surface of an extended token id, or '' if not an extended digit
    token. All extended tokens are all-digit by construction (they exist only
    to mirror multi-digit cluster BPE pieces of imported HF checkpoints)."""
    k = token_id - VOCAB_SIZE
    if 0 <= k < len(extra_tokens) and extra_tokens[k].isdigit():
        return extra_tokens[k]
    return ""


def encode_cluster_string(digits: str, extra_token_ids: Dict[str, int],
                          cluster_encodings: Dict[str, list] = None
                          ) -> List[int]:
    """Encode a cluster-id digit string into token ids.

    ``cluster_encodings`` (checkpoint's recorded per-cluster BPE piece
    sequences, models/convert_hf.derive_extra_tokens) is authoritative when it
    covers ``digits`` — greedy longest-match over the piece SET cannot
    reconstruct merge order (e.g. pieces {'12','23'}: greedy gives '123' ->
    ['12','3'] where the checkpoint's BPE produced ['1','23']). Otherwise:
    greedy longest-match over the extended pieces, falling back to per-digit
    tokens ('12' -> [1, 2]) — the native compact-vocabulary encoding."""
    if cluster_encodings and digits in cluster_encodings:
        ids = []
        for piece in cluster_encodings[digits]:
            if len(piece) == 1:
                ids.append(DIGIT_BASE + (ord(piece) - ord("0")))
            elif piece in extra_token_ids:
                ids.append(extra_token_ids[piece])
            else:  # recorded piece missing its extended row: per-digit
                ids.extend(DIGIT_BASE + (ord(c) - ord("0")) for c in piece)
        return ids
    ids: List[int] = []
    i = 0
    n = len(digits)
    while i < n:
        match = None
        for j in range(n, i, -1):  # longest piece first
            piece = digits[i:j]
            if len(piece) > 1 and piece in extra_token_ids:
                match = (extra_token_ids[piece], j)
                break
        if match is None:
            ids.append(DIGIT_BASE + (ord(digits[i]) - ord("0")))
            i += 1
        else:
            ids.append(match[0])
            i = match[1]
    return ids
