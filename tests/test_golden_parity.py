"""Golden-output parity vs the published checkpoints (VERDICT r2 item 6).

Network egress is unavailable in the build environment, so these tests SKIP
unless the published model is already in the local cache (or reachable).
The moment weights exist, ``pytest tests/test_golden_parity.py`` — or the
one-command ``python scripts/golden_parity.py`` — asserts the reference's
recorded zebra-finch prediction (reference README.md:324) and mouse F1
scores (reference docs/Evaluation.md:26-37).

The harness itself (golden constants, wav presence, tolerance logic) is
always tested so it cannot rot while waiting for egress.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import golden_parity as gp  # noqa: E402


def _published_model_available() -> str:
    """Cache-only resolution (never attempts a download inside the suite)."""
    import hashlib

    from whisperseg_tpu.hub import model_cache_dir

    name = gp.DEFAULT_MODEL
    if os.environ.get("WHISPERSEG_GOLDEN_MODEL"):
        return os.environ["WHISPERSEG_GOLDEN_MODEL"]
    digest = hashlib.sha256(name.encode()).hexdigest()
    target = os.path.join(model_cache_dir(), digest)
    if os.path.isdir(target) and os.listdir(target):
        return target
    return ""


published = _published_model_available()


@pytest.mark.skipif(not published,
                    reason="published checkpoint not cached (no egress); "
                           "seed $WHISPERSEG_MODEL_CACHE or set "
                           "$WHISPERSEG_GOLDEN_MODEL to enable")
def test_published_model_reproduces_goldens():
    from whisperseg_tpu.segmenter import Segmenter

    model_path = gp.resolve_model(published)
    seg = Segmenter.from_pretrained(model_path)
    zebra = gp.check_zebra_golden(seg, tolerance_s=0.005)
    assert zebra["match"], zebra
    mouse = gp.check_mouse_scores(model_path)
    if "skipped" not in mouse:
        assert mouse["match"], mouse


# ------------------------- harness self-tests (always run, no weights) ----


def test_golden_constants_are_consistent():
    assert len(gp.GOLDEN_ZEBRA["onset"]) == 17
    assert len(gp.GOLDEN_ZEBRA["offset"]) == 17
    assert len(gp.GOLDEN_ZEBRA["cluster"]) == 17
    on, off = np.array(gp.GOLDEN_ZEBRA["onset"]), np.array(
        gp.GOLDEN_ZEBRA["offset"])
    assert np.all(off > on)
    assert np.all(np.diff(on) > 0)
    assert 0.96 < gp.GOLDEN_MOUSE["segment_F1"] < 0.97
    assert 0.97 < gp.GOLDEN_MOUSE["frame_F1"] < 0.98


@pytest.mark.skipif(not os.path.exists(gp.GOLDEN_WAV),
                    reason="reference example data absent")
def test_golden_wav_is_present_and_long_enough():
    from whisperseg_tpu.audio.io import get_audio_duration

    # the recorded prediction ends at 6.043 s — the wav must cover it
    assert get_audio_duration(gp.GOLDEN_WAV) > 6.043


def test_check_zebra_golden_matches_itself(monkeypatch):
    """The comparison logic accepts the golden itself (exact and with
    tolerance) and rejects a shifted prediction."""

    class FakeSeg:
        def __init__(self, pred):
            self.pred = pred

        def segment(self, *a, **k):
            return self.pred

    monkeypatch.setattr(gp, "load_wav_for_test", None, raising=False)
    if not os.path.exists(gp.GOLDEN_WAV):
        pytest.skip("reference example data absent")

    exact = gp.check_zebra_golden(FakeSeg(dict(gp.GOLDEN_ZEBRA)), 0.0)
    assert exact["match"]
    tol = gp.check_zebra_golden(FakeSeg({
        "onset": [t + 0.004 for t in gp.GOLDEN_ZEBRA["onset"]],
        "offset": list(gp.GOLDEN_ZEBRA["offset"]),
        "cluster": list(gp.GOLDEN_ZEBRA["cluster"])}), 0.005)
    assert tol["match"]
    shifted = gp.check_zebra_golden(FakeSeg({
        "onset": [t + 0.05 for t in gp.GOLDEN_ZEBRA["onset"]],
        "offset": list(gp.GOLDEN_ZEBRA["offset"]),
        "cluster": list(gp.GOLDEN_ZEBRA["cluster"])}), 0.005)
    assert not shifted["match"]


def test_mouse_check_skips_without_wav():
    res = gp.check_mouse_scores("unused-model-path")
    # the snapshot strips the mouse wav; when someone restores it this skip
    # disappears and the real scores run
    assert "skipped" in res or "match" in res
