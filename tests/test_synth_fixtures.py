"""Tests for the synthetic-fixture generators used by the experiment log:

* scripts/make_synthetic_under_label.py — synthesizes audio UNDER a real
  annotation whose wav is stripped from the snapshot
  (reference data/example_subset/.MISSING_LARGE_BLOBS), preserving the
  label's exact timing/cluster statistics and preset;
* scripts/make_multicluster_tones.py — the multi-cluster acceptance fixture
  (every natural corpus in the snapshot is single-cluster).
"""

import json
import os
import sys
import wave

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from scripts.make_multicluster_tones import main as mc_main  # noqa: E402
from scripts.make_synthetic_under_label import main as sul_main  # noqa: E402
from whisperseg_tpu.data import read_label  # noqa: E402


def _read_wav(path):
    with wave.open(path, "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        sr = w.getframerate()
        y = np.frombuffer(w.readframes(w.getnframes()), "<i2") / 32767.0
    return y, sr


def _band_energy(y, sr, f0, width=0.15):
    spec = np.abs(np.fft.rfft(y)) ** 2
    freqs = np.fft.rfftfreq(len(y), 1 / sr)
    band = (freqs > f0 * (1 - width)) & (freqs < f0 * (1 + width))
    return spec[band].sum() / max(spec.sum(), 1e-12)


@pytest.mark.parametrize("style", ["tone", "harmonic"])
def test_synth_under_label_obeys_annotation(tmp_path, style):
    label = {"onset": [0.2, 0.8, 1.5], "offset": [0.5, 1.1, 1.9],
             "cluster": ["a", "b", "a"], "species": "unknown", "sr": 16000,
             "min_frequency": 0, "spec_time_step": 0.01,
             "min_segment_length": 0.1, "tolerance": 0.2, "eps": 0.2}
    lp = tmp_path / "clip.json"
    lp.write_text(json.dumps(label))
    out = tmp_path / "out"
    sul_main(["--labels", str(lp), "--out_dir", str(out), "--style", style,
              "--seed", "7"])

    y, sr = _read_wav(str(out / "clip.wav"))
    assert sr == 16000
    # file covers the last offset plus the 0.5 s tail
    assert abs(len(y) / sr - (1.9 + 0.5)) < 0.05
    # the label json is copied verbatim next to the wav (preset intact)
    copied = json.loads((out / "clip.json").read_text())
    assert copied == label
    # and the pair feeds the data layer directly
    parsed = read_label(str(out / "clip.json"))
    assert parsed["onset"] == label["onset"]

    # audible events exactly inside the annotated spans: every annotated
    # span is much louder than every annotated gap
    def rms(t0, t1):
        seg = y[int(t0 * sr):int(t1 * sr)]
        return float(np.sqrt(np.mean(seg ** 2)))

    quiet = max(rms(0.0, 0.15), rms(0.55, 0.75), rms(1.15, 1.45))
    loud = min(rms(0.25, 0.45), rms(0.85, 1.05), rms(1.55, 1.85))
    assert loud > 10 * quiet

    # distinct clusters get distinct spectral signatures: tone style via the
    # spectral peak (cluster center frequency), harmonic style via the
    # fundamental (per-cluster f0 folded from the signature frequency)
    seg_a = y[int(0.22 * sr):int(0.48 * sr)]
    seg_b = y[int(0.82 * sr):int(1.08 * sr)]

    def peak(seg, f_max=None):
        spec = np.abs(np.fft.rfft(seg))
        freqs = np.fft.rfftfreq(len(seg), 1 / sr)
        if f_max is not None:
            spec = spec[freqs < f_max]
            freqs = freqs[freqs < f_max]
        return freqs[spec.argmax()]

    f_max = 300.0 if style == "harmonic" else None  # fundamental band
    fa, fb = peak(seg_a, f_max), peak(seg_b, f_max)
    assert abs(fa - fb) / max(fa, fb) > (0.15 if style == "tone" else 0.05)


def test_multicluster_tones_scaled_config(tmp_path):
    out = tmp_path / "mc"
    mc_main(["--out", str(out), "--n_clusters", "4", "--n_train", "2",
             "--n_test", "1", "--dur", "3.0", "--seed", "1"])

    for split, count in (("train", 2), ("test", 1)):
        wavs = sorted((out / split).glob("*.wav"))
        assert len(wavs) == count
        for wav in wavs:
            label = json.loads(wav.with_suffix(".json").read_text())
            y, sr = _read_wav(str(wav))
            assert sr == label["sr"] == 16000
            names = set(label["cluster"])
            assert names <= {"c0", "c1", "c2", "c3"}
            # each annotated burst concentrates energy near its own
            # cluster's band (bands are log-spaced 900..6500 Hz)
            freqs = np.geomspace(900.0, 6500.0, 4)
            for on, off, cl in zip(label["onset"], label["offset"],
                                   label["cluster"]):
                seg = y[int(on * sr):int(off * sr)]
                f0 = freqs[int(cl[1:])]
                # FM sweep is ±8%, so a ±15% band holds most tone energy
                assert _band_energy(seg, sr, f0) > 0.5, (wav.name, cl, on)
