#!/bin/bash
# Rebuild the /tmp data fixtures used by the experiment log (RESULTS.md).
# /tmp is wiped between sessions; this script is the canonical recipe so
# every round trains/evaluates on the SAME splits.
#
# Zebra finch adults (reference data/example_subset/Zebra_finch/test_adults,
# 18 wav+json pairs across 4 individuals): deterministic 14-train / 4-test
# split holding out ONE file per individual (cross-file generalization on
# every individual). Recorded here because earlier rounds' ad-hoc 14/4
# split was not written down; numbers across rounds are comparable in
# protocol but not file-identical.
#
# Cross-individual split (zf_xind): individual g4p5U held out entirely
# (5 test files), the other three individuals (13 files) train — the
# phase-11a protocol (RESULTS.md).
set -e

REF=/root/reference/data/example_subset
cd "$(dirname "$0")/.."

# ---- zebra finch adults: 14 train / 4 test (one held-out per individual)
TEST_FILES="zebra_finch_g17y2U-f00039 zebra_finch_g19o10U-f00047 zebra_finch_g19o3U-f00975 zebra_finch_g4p5U-f00038"
mkdir -p /tmp/zf/train /tmp/zf/test
for f in "$REF"/Zebra_finch/test_adults/*.wav; do
    b=$(basename "$f" .wav)
    dest=/tmp/zf/train
    for t in $TEST_FILES; do [ "$b" = "$t" ] && dest=/tmp/zf/test; done
    cp "$f" "${f%.wav}.json" "$dest/"
done

# ---- zebra finch cross-individual: g4p5U held out entirely
mkdir -p /tmp/zf_xind/train /tmp/zf_xind/test
for f in "$REF"/Zebra_finch/test_adults/*.wav; do
    b=$(basename "$f" .wav)
    case "$b" in
        *g4p5U*) dest=/tmp/zf_xind/test ;;
        *)       dest=/tmp/zf_xind/train ;;
    esac
    cp "$f" "${f%.wav}.json" "$dest/"
done

# ---- meerkat: 6 files in the snapshot's test/ folder; deterministic
# 4 train / 2 test split — the two ZIP040_*_0{1,2} files held out (the
# individual with three recordings keeps one in train via the merged file)
mkdir -p /tmp/mk/train /tmp/mk/test
for f in "$REF"/Meerkat/test/*.wav; do
    case "$(basename "$f")" in
        ZIP040_2022_ML_0[12].wav) dest=/tmp/mk/test ;;
        *)                        dest=/tmp/mk/train ;;
    esac
    cp "$f" "${f%.wav}.json" "$dest/"
done

# ---- canary: 2 files (different birds) — train on first, test on second
mkdir -p /tmp/cn/train /tmp/cn/test
CN=$(ls "$REF"/Canary/test/*.wav | sort)
first=$(echo "$CN" | head -1); second=$(echo "$CN" | sed -n 2p)
cp "$first" "${first%.wav}.json" /tmp/cn/train/
[ -n "$second" ] && cp "$second" "${second%.wav}.json" /tmp/cn/test/

# ---- synthetic 300 kHz mouse USV + three-cluster tones (generated)
python scripts/make_synthetic_usv.py --out /tmp/ms
python scripts/make_multicluster_tones.py --out /tmp/mc

echo "fixtures:"; for d in /tmp/zf /tmp/zf_xind /tmp/mk /tmp/cn /tmp/ms /tmp/mc; do
    [ -d "$d" ] && echo "  $d: $(find $d -name '*.wav' | wc -l) wavs"
done
