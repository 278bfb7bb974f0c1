#!/usr/bin/env python
"""Apply a model's post-processing rule set to a prediction table.

Counterpart of the reference's ``scripts/post_process_predictions.py``
(PROCESS_TOOLBOX: per-model prediction rewrites; the shipped rule set is the
marmoset e_ts-run -> e_tw phrase merge, reference
post_process_predictions.py:8-88). Reads an ``onset,offset,cluster`` CSV
(scripts/segment.py output) or a JSON prediction dict, applies the named
toolbox entry, and writes the rewritten table.

``--cluster_map`` bridges annotation taxonomies: the snapshot's marmoset
labels use ``marmoset_ts``/``marmoset_ek``/``marmoset_tr`` call types while
the v2.0 rules key on the reference corpus's ``e_ts``/``e_p*`` names —
mapping ``marmoset_ts=e_ts`` lets the twitter-phrase merge run on real
model output from a model trained on the snapshot taxonomy.

    python scripts/post_process_predictions.py --input pred.csv \
        --output pred_pp.csv --model whisperseg-large-marmoset-v2.0 \
        --cluster_map marmoset_ts=e_ts,marmoset_ek=e_pe
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisperseg_tpu.services.post_process import PROCESS_TOOLBOX  # noqa: E402


def read_table(path: str) -> dict:
    if path.endswith(".json"):
        with open(path) as f:
            d = json.load(f)
        return {"onset": list(map(float, d["onset"])),
                "offset": list(map(float, d["offset"])),
                "cluster": list(map(str, d["cluster"]))}
    import pandas as pd

    df = pd.read_csv(path)
    return {"onset": df["onset"].astype(float).tolist(),
            "offset": df["offset"].astype(float).tolist(),
            "cluster": df["cluster"].astype(str).tolist()}


def write_table(path: str, table: dict) -> None:
    if path == "buffer":
        print("onset,offset,cluster")
        for o, f, c in zip(table["onset"], table["offset"], table["cluster"]):
            print(f"{o},{f},{c}")
        return
    if path.endswith(".json"):
        with open(path, "w") as f:
            json.dump(table, f)
        return
    import pandas as pd

    pd.DataFrame(table).to_csv(path, index=False)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help=".csv or .json prediction")
    ap.add_argument("--output", required=True,
                    help=".csv/.json output path, or 'buffer' for stdout")
    ap.add_argument("--model", default="whisperseg-large-marmoset-v2.0",
                    help="PROCESS_TOOLBOX entry to apply")
    ap.add_argument("--cluster_map", default="",
                    help="comma-separated old=new cluster renames applied "
                         "BEFORE the rules (taxonomy bridge)")
    args = ap.parse_args(argv)

    if args.model not in PROCESS_TOOLBOX:
        raise SystemExit(f"unknown model {args.model!r}; toolbox entries: "
                         f"{sorted(PROCESS_TOOLBOX)}")
    table = read_table(args.input)
    if args.cluster_map:
        mapping = dict(pair.split("=", 1)
                       for pair in args.cluster_map.split(","))
        table["cluster"] = [mapping.get(c, c) for c in table["cluster"]]

    before = len(table["onset"])
    out = PROCESS_TOOLBOX[args.model](table)
    write_table(args.output, out)
    from collections import Counter

    stats = {"segments_in": before, "segments_out": len(out["onset"]),
             "clusters_out": dict(Counter(out["cluster"]))}
    print(json.dumps(stats), file=sys.stderr)


if __name__ == "__main__":
    main()
