"""Log-mel frontend parity tests against the installed HuggingFace extractor,
which is the exact component the reference delegates to (reference audio_utils.py:45-76)."""

import numpy as np
import pytest

from whisperseg_tpu.audio import Frontend, mel_filter_bank
from whisperseg_tpu.constants import n_fft_for_sr


def _hf_reference_extractor(sr, spec_time_step, min_frequency, max_frequency):
    """Build the same extractor the reference builds (audio_utils.py:45-76)."""
    transformers = pytest.importorskip("transformers")
    from transformers import WhisperFeatureExtractor
    from transformers.audio_utils import mel_filter_bank as hf_mel

    hop_length = int(spec_time_step * sr)
    n_fft = n_fft_for_sr(sr)
    fe = WhisperFeatureExtractor(
        feature_size=80,
        sampling_rate=sr,
        hop_length=hop_length,
        chunk_length=30,
        n_fft=n_fft,
        padding_value=0.0,
        return_attention_mask=False,
    )
    fe.mel_filters = hf_mel(
        num_frequency_bins=1 + n_fft // 2,
        num_mel_filters=80,
        min_frequency=min_frequency,
        max_frequency=max_frequency if max_frequency is not None else sr // 2,
        sampling_rate=sr,
        norm="slaney",
        mel_scale="slaney",
    )
    return fe


CONFIGS = [
    # (sr, spec_time_step, min_frequency)  — the species presets from
    # reference config/segment_config.json
    (32000, 0.0025, 0),          # zebra / bengalese finch
    (48000, 0.0025, 0),          # marmoset
    (300000, 0.0005, 35000),     # mouse (exotic: n_fft=4096, min_frequency!=0)
    (16000, 0.01, 0),            # human
    (22050, 0.0025, 0),          # non-integer spec_time_step * sr
]


@pytest.mark.parametrize("sr,step,min_f", CONFIGS)
def test_mel_filterbank_matches_hf(sr, step, min_f):
    from transformers.audio_utils import mel_filter_bank as hf_mel

    n_fft = n_fft_for_sr(sr)
    ours = mel_filter_bank(1 + n_fft // 2, 80, min_f, sr // 2, sr)
    theirs = hf_mel(
        num_frequency_bins=1 + n_fft // 2,
        num_mel_filters=80,
        min_frequency=min_f,
        max_frequency=sr // 2,
        sampling_rate=sr,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


@pytest.mark.parametrize("sr,step,min_f", CONFIGS)
def test_numpy_frontend_matches_hf(sr, step, min_f):
    fe = _hf_reference_extractor(sr, step, min_f, None)
    fr = Frontend(sr, step, min_f)
    rng = np.random.RandomState(0)
    # one second of noisy chirp
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * (min_f + 1000) * t) + 0.1 * rng.randn(sr)).astype(
        np.float32
    )
    theirs = fe(wav, sampling_rate=sr, padding="do_not_pad")["input_features"][0]
    ours = fr.log_mel_numpy(wav)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("sr,step,min_f", CONFIGS[:3])
def test_jax_frontend_matches_numpy(sr, step, min_f):
    fr = Frontend(sr, step, min_f)
    rng = np.random.RandomState(1)
    n = int(sr * 0.5)
    clips = rng.randn(3, n).astype(np.float32) * 0.2
    ours = np.asarray(fr.log_mel_batch(clips))
    for b in range(clips.shape[0]):
        ref = fr.log_mel_numpy(clips[b])
        assert ours[b].shape == ref.shape
        np.testing.assert_allclose(ours[b], ref, atol=2e-4)


def test_features_for_clips_padding():
    fr = Frontend(16000, 0.01, 0)
    clips = np.random.RandomState(2).randn(2, 16000).astype(np.float32)
    total = 150  # clip gives 100 cols -> needs 50 padded cols
    feats = np.asarray(fr.features_for_clips(clips, total))
    assert feats.shape == (2, 80, total)
    for b in range(2):
        min_val = feats[b, :, :100].min()
        np.testing.assert_allclose(feats[b, :, 100:], min_val, atol=1e-6)


def test_features_for_clips_truncation():
    fr = Frontend(16000, 0.01, 0)
    clips = np.random.RandomState(3).randn(1, 16000).astype(np.float32)
    feats = np.asarray(fr.features_for_clips(clips, 60))
    assert feats.shape == (1, 80, 60)
    full = np.asarray(fr.log_mel_batch(clips))
    np.testing.assert_allclose(feats[0], full[0, :, :60], atol=1e-6)


def test_zero_audio_gives_constant_features():
    fr = Frontend(32000, 0.0025, 0)
    clips = np.zeros((1, 80000), dtype=np.float32)
    feats = np.asarray(fr.features_for_clips(clips, 1000))
    # log10(1e-10) = -10 -> floor -> (x+4)/4 = -1.5 everywhere
    np.testing.assert_allclose(feats, -1.5, atol=1e-6)
