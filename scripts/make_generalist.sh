#!/bin/bash
# Build the pooled multi-species generalist VAD dataset at /tmp/gen.
#
# This is the training recipe for the default pretrained entry — the
# counterpart of the reference's ready multi-species VAD models
# (reference scripts/backend.py:368-375 hardcodes
# nccratliri/whisperseg-{base-,}animal-vad). Every species in the snapshot
# with labeled audio contributes, with per-file frontend configs riding in
# the JSON labels (reference docs/DatasetProcessing.md:86-96 per-file
# config semantics). Clusters are flattened to "Vocal" at train time via
# --ignore_cluster 1 (the "animal-vad" task).
#
# Held-out protocol (cross-file, and cross-individual where the corpus has
# more than one individual):
#   zebra adults     4 individuals; one file per individual held out
#                    (the scripts/make_fixtures.sh /tmp/zf split)
#   zebra juveniles  4 individuals (R3406/R3428/R3549/R3625); one file per
#                    individual held out
#   bengalese finch  1 of 3 snapshot files has labels; the other two are
#                    energy-flat (no song) -> all 3 train (2 as negatives)
#   canary           2 birds; llb16_0602 trains, llb16_1612 tests
#                    (cross-individual)
#   meerkat          ZIP040_*_0{1,2} held out (the /tmp/mk split;
#                    cross-recording, individual ZIP040 keeps one merged
#                    file in train)
#   synthetic mouse  scripts/make_synthetic_usv.py 300 kHz USV corpus
#                    (train split only in /tmp/gen/train; its test file
#                    evaluates from /tmp/ms/test)
#
# Output layout:
#   /tmp/gen/train           pooled training folder (mixed configs)
#   /tmp/gen/test_zf         zebra adults held-out
#   /tmp/gen/test_zfj        zebra juveniles held-out
#   /tmp/gen/test_cn         canary held-out
#   /tmp/gen/test_mk         meerkat held-out
#   (mouse held-out = /tmp/ms/test)
set -e

REF=/root/reference/data/example_subset
cd "$(dirname "$0")/.."

# fixtures supply /tmp/zf, /tmp/mk, /tmp/cn, /tmp/ms splits
[ -d /tmp/zf/train ] || bash scripts/make_fixtures.sh

rm -rf /tmp/gen
mkdir -p /tmp/gen/train /tmp/gen/test_zf /tmp/gen/test_zfj \
         /tmp/gen/test_cn /tmp/gen/test_mk

# ---- zebra finch adults: reuse the /tmp/zf deterministic split
cp /tmp/zf/train/* /tmp/gen/train/
cp /tmp/zf/test/*  /tmp/gen/test_zf/

# ---- zebra finch juveniles: one held-out file per individual
JUV_TEST="zebra_finch_R3406_40921.48179444_1_13_13_22_59 zebra_finch_R3428_40932.31154143_1_24_8_39_14 zebra_finch_R3549_40999.38308720_3_31_10_38_28 zebra_finch_R3625_41057.56475801_5_28_15_41_15"
for f in "$REF"/Zebra_finch/test_juveniles/*.wav; do
    b=$(basename "$f" .wav)
    dest=/tmp/gen/train
    for t in $JUV_TEST; do [ "$b" = "$t" ] && dest=/tmp/gen/test_zfj; done
    cp "$f" "${f%.wav}.json" "$dest/"
done

# ---- bengalese finch: 1 labeled file + 2 empty-label files whose audio
# is energy-flat (verified: p99 RMS < 2.3x median, no events) — genuine
# negative examples, so all three train
cp "$REF"/Bengalese_finch/test/*.wav "$REF"/Bengalese_finch/test/*.json /tmp/gen/train/

# ---- canary: cross-individual
cp /tmp/cn/train/* /tmp/gen/train/
cp /tmp/cn/test/*  /tmp/gen/test_cn/

# ---- meerkat: the /tmp/mk split
cp /tmp/mk/train/* /tmp/gen/train/
cp /tmp/mk/test/*  /tmp/gen/test_mk/

# ---- synthetic 300 kHz mouse USVs (train only; eval uses /tmp/ms/test)
cp /tmp/ms/train/* /tmp/gen/train/

# ---- optional oversampling (v2 recipe): duplicate the under-represented
# species' training files so the slice sampler sees them proportionally
# more often. The shipped v1 model under-fires exactly where training audio
# is scarce (canary 16 s = 3%, meerkat 54 s = 11% of the pool; RESULTS.md
# "Round-3 generalist"), so v2 rebalances by copy-count. Copies carry the
# label JSON (per-file frontend configs ride inside it), so duplicates are
# exact resamples of the same distribution — no augmentation implied.
#   OVERSAMPLE_CANARY=6 OVERSAMPLE_MEERKAT=3 scripts/make_generalist.sh
dup () { # dup <glob-prefix> <extra-copies>
    local prefix=$1 extra=$2 f b i
    for f in /tmp/gen/train/${prefix}*.wav; do
        [ -e "$f" ] || continue
        b="${f%.wav}"
        for i in $(seq 1 "$extra"); do
            cp "$f" "${b}_os${i}.wav"
            cp "${b}.json" "${b}_os${i}.json"
        done
    done
}
[ "${OVERSAMPLE_CANARY:-0}" -gt 0 ] && dup llb "$OVERSAMPLE_CANARY"
[ "${OVERSAMPLE_MEERKAT:-0}" -gt 0 ] && for p in VAL VLM ZIP; do dup "$p" "$OVERSAMPLE_MEERKAT"; done

echo "generalist dataset:"
for d in /tmp/gen/train /tmp/gen/test_zf /tmp/gen/test_zfj /tmp/gen/test_cn /tmp/gen/test_mk; do
    echo "  $d: $(ls $d/*.wav 2>/dev/null | wc -l) wavs"
done
