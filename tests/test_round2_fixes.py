"""Regression tests for the round-1 advisor findings (ADVICE.md).

Covers: best-validation checkpoint protection from max_to_keep rotation,
DataLoader producer-exception relay, and the qdot int4 mode guard.
"""

import numpy as np
import pytest

from whisperseg_tpu.checkpoint import (
    finalize_best_checkpoint,
    list_checkpoints,
    save_training_checkpoint,
)
from whisperseg_tpu.data import DataLoader, VocalSegDataset
from whisperseg_tpu.models.config import WhisperConfig


def _tiny_params():
    return {"encoder": {"w": np.ones((2, 2), np.float32)},
            "decoder": {"w": np.zeros((2, 2), np.float32)}}


def test_best_checkpoint_survives_max_to_keep_rotation(tmp_path):
    """A best-validation save must not be pruned by later periodic saves
    (ADVICE.md finding #1: finalize would silently fall back to the newest)."""
    folder = str(tmp_path / "model")
    cfg = WhisperConfig(d_model=2, encoder_layers=1, decoder_layers=1,
                        num_heads=1, d_ff=4)
    params = _tiny_params()
    best = 100
    save_training_checkpoint(folder, params, cfg, best, max_to_keep=2)
    # Later periodic saves rotate past max_to_keep while protecting `best`.
    for step in (200, 300, 400, 500):
        save_training_checkpoint(folder, params, cfg, step, max_to_keep=2,
                                 keep_step=best)
    kept = [c.split("checkpoint-")[-1] for c in list_checkpoints(folder)]
    assert "100" in kept, "best-validation checkpoint was pruned"
    final = finalize_best_checkpoint(folder, best)
    assert final is not None and final.endswith("final_checkpoint")
    import json, os
    meta = json.load(open(os.path.join(final, "config.json")))
    assert meta["current_step"] == best


def test_unprotected_rotation_still_prunes(tmp_path):
    folder = str(tmp_path / "model")
    cfg = WhisperConfig(d_model=2, encoder_layers=1, decoder_layers=1,
                        num_heads=1, d_ff=4)
    params = _tiny_params()
    for step in (1, 2, 3, 4):
        save_training_checkpoint(folder, params, cfg, step, max_to_keep=2)
    kept = [c.split("checkpoint-")[-1] for c in list_checkpoints(folder)]
    assert kept == ["3", "4"]


class _BrokenDataset(VocalSegDataset):
    def __init__(self, n):
        self._n = n

    def __len__(self):
        return self._n

    def __getitem__(self, idx):
        raise RuntimeError("boom in __getitem__")

    # bucketing reads label_list; provide a homogeneous dummy
    @property
    def label_list(self):
        return [{"sr": 16000, "spec_time_step": 0.01} for _ in range(self._n)]


@pytest.mark.parametrize("num_workers", [1, 4])
def test_dataloader_relays_producer_exception(num_workers):
    """A dying producer must not leave the consumer blocked in q.get()
    (ADVICE.md finding #3); the item exception is re-raised in the consumer."""
    loader = DataLoader(_BrokenDataset(8), batch_size=4, shuffle=False,
                        num_workers=num_workers)
    with pytest.raises(RuntimeError, match="boom in __getitem__"):
        for _ in loader:
            pass


def test_qdot_rejects_non_default_mode_for_int4():
    """mode='w8a8' with int4 params must raise, not silently run w4a16
    (ADVICE.md finding #2)."""
    import jax.numpy as jnp

    from whisperseg_tpu.ops.quant import qdot, quantize4

    w = np.random.default_rng(0).standard_normal((16, 8)).astype(np.float32)
    qt = quantize4(jnp.asarray(w))
    x = jnp.ones((2, 16), jnp.float32)
    out = qdot(x, qt)  # default mode works
    assert out.shape == (2, 8)
    with pytest.raises(ValueError, match="int4"):
        qdot(x, qt, mode="w8a8")


def test_dataset_uses_extended_cluster_tokens():
    """VocalSegDataset with extra_token_ids emits the merged multi-digit
    token in training targets (finetune-an-import consistency)."""
    import numpy as np

    from whisperseg_tpu import tokenizer as tok
    from whisperseg_tpu.data import VocalSegDataset

    sr, step = 16000, 0.01
    label = {"sr": sr, "spec_time_step": step, "min_frequency": 0,
             "species": "unknown",
             "onset": np.array([0.5]), "offset": np.array([1.5]),
             "cluster_id": np.array([12]), "cluster": ["c12"]}
    audio = np.zeros(int(sr * 2.0), np.float32)
    ds = VocalSegDataset([audio], [label], max_length=24,
                         total_spec_columns=100,
                         extra_token_ids={"12": tok.VOCAB_SIZE})
    item = ds[0]
    assert tok.VOCAB_SIZE in item["decoder_input_ids"].tolist()
    ds2 = VocalSegDataset([audio], [label], max_length=24,
                          total_spec_columns=100)
    item2 = ds2[0]
    assert tok.VOCAB_SIZE not in item2["decoder_input_ids"].tolist()
    assert 1 in item2["decoder_input_ids"].tolist()  # digit '1'
