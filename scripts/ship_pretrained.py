#!/usr/bin/env python
"""Install a finished checkpoint as a built-in ready-to-use model.

Counterpart of the reference's act of publishing a finetune to the hub as a
ready entry (reference scripts/backend.py:368-375 hardcodes the two published
``nccratliri/whisperseg-*-animal-vad`` names; Upload_Model.ipynb does the
publishing). Here "publishing" is dropping the checkpoint under
``<repo>/pretrained/<name>/`` — every such directory auto-registers by name
through ``hub.builtin_models()`` (CLI / service / backend / GUI / bench).

Storage is narrowed to bfloat16 (halves the artifact; params restore as
float32 — F1-identical held-out, RESULTS.md "Round-3 generalist") and the
round trip is verified before the entry goes live. A README.md is NOT
generated — write the model card by hand.

    python scripts/ship_pretrained.py --checkpoint /tmp/gentiny/final_checkpoint \
        --name whisperseg-tiny-animal-vad
"""
import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisperseg_tpu.checkpoint import load_checkpoint, save_checkpoint  # noqa: E402
from whisperseg_tpu.hub import pretrained_dir  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="finished training checkpoint dir")
    ap.add_argument("--name", required=True, help="built-in model name (pretrained/<name>)")
    ap.add_argument("--force", type=int, default=0, help="1: overwrite an existing entry")
    args = ap.parse_args()

    dest = os.path.join(pretrained_dir(), args.name)
    if os.path.exists(dest):
        if not args.force:
            raise SystemExit(f"{dest} exists; pass --force 1 to replace it")
        shutil.rmtree(dest)

    params, config = load_checkpoint(args.checkpoint, as_jax=False)
    save_checkpoint(dest, params, config, dtype="bfloat16")

    # verify the bf16 round trip before the entry goes live
    rt, rt_config = load_checkpoint(dest, as_jax=False)
    flat_a = {}
    flat_b = {}

    def _flat(tree, out, prefix=""):
        for k, v in tree.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                _flat(v, out, key + "/")
            else:
                out[key] = np.asarray(v)

    _flat(params, flat_a)
    _flat(rt, flat_b)
    assert flat_a.keys() == flat_b.keys()
    worst = 0.0
    for k in flat_a:
        a, b = flat_a[k].astype(np.float32), flat_b[k].astype(np.float32)
        denom = np.maximum(np.abs(a), 1e-6)
        worst = max(worst, float(np.max(np.abs(a - b) / denom)))
    # bf16 has 8 mantissa bits: relative error is bounded by 2^-8
    assert worst <= 2.0 ** -8 + 1e-6, f"bf16 round-trip rel err {worst}"
    size_mb = os.path.getsize(os.path.join(dest, "params.npz")) / 1e6
    print(f"shipped {args.name}: {dest} ({size_mb:.0f} MB bf16, "
          f"step {rt_config.current_step}, rel-err {worst:.2e})")
    print("write the model card: ", os.path.join(dest, "README.md"))


if __name__ == "__main__":
    main()
