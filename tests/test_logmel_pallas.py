"""TPU frontend formulation tests, runnable on CPU: the conv-DFT path via XLA
and the Pallas mel-projection kernel via interpret mode, both against the
float64 numpy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperseg_tpu.audio.frontend import Frontend
from whisperseg_tpu.ops.logmel_pallas import dft_bank, melproject_pallas


@pytest.mark.parametrize("sr,step,minf", [(32000, 0.0025, 0), (16000, 0.01, 0)])
def test_conv_dft_matches_numpy(sr, step, minf):
    fr = Frontend(sr, step, minf)
    rng = np.random.RandomState(0)
    clips = (rng.randn(2, sr // 2) * 0.2).astype(np.float32)

    pad = fr.n_fft // 2
    x = jnp.pad(jnp.asarray(clips), ((0, 0), (pad, pad)), mode="reflect")
    bank = jnp.asarray(dft_bank(fr.n_fft))
    f_pad = bank.shape[0] // 2
    num_frames = 1 + (x.shape[1] - fr.n_fft) // fr.hop_length
    reim = jax.lax.conv_general_dilated(
        x[:, None, :], bank, window_strides=(fr.hop_length,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:, :, :num_frames - 1]

    re = np.asarray(reim[:, :f_pad, :])
    im = np.asarray(reim[:, f_pad:, :])
    power = re ** 2 + im ** 2
    n_freq = fr.n_fft // 2 + 1
    melspec = np.maximum(
        1e-10, np.einsum("bkf,km->bmf", power[:, :n_freq], fr.mel_filters))
    log_spec = np.log10(melspec)
    mx = log_spec.max(axis=(1, 2), keepdims=True)
    ours = (np.maximum(log_spec, mx - 8.0) + 4.0) / 4.0

    for b in range(clips.shape[0]):
        ref = fr.log_mel_numpy(clips[b])
        np.testing.assert_allclose(ours[b], ref, atol=3e-4)


def test_melproject_pallas_interpret_matches_reference():
    fr = Frontend(32000, 0.0025, 0)
    rng = np.random.RandomState(1)
    clips = (rng.randn(2, 16000) * 0.2).astype(np.float32)

    pad = fr.n_fft // 2
    x = jnp.pad(jnp.asarray(clips), ((0, 0), (pad, pad)), mode="reflect")
    bank = jnp.asarray(dft_bank(fr.n_fft))
    num_frames = 1 + (x.shape[1] - fr.n_fft) // fr.hop_length
    reim = jax.lax.conv_general_dilated(
        x[:, None, :], bank, window_strides=(fr.hop_length,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:, :, :num_frames - 1]

    log_spec = np.asarray(
        melproject_pallas(reim, jnp.asarray(fr.mel_filters), fr.n_fft,
                          interpret=True)
    )
    mx = log_spec.max(axis=(1, 2), keepdims=True)
    ours = (np.maximum(log_spec, mx - 8.0) + 4.0) / 4.0
    for b in range(clips.shape[0]):
        ref = fr.log_mel_numpy(clips[b])
        np.testing.assert_allclose(ours[b], ref, atol=3e-4)


def test_dft_bank_shape_and_zero_padding():
    bank = dft_bank(512)
    assert bank.shape == (2 * 384, 1, 512)  # 257 -> 384 lane padding
    assert np.all(bank[257:384] == 0)
    assert np.all(bank[384 + 257:] == 0)
    # DC row = window itself (cos(0) = 1)
    from whisperseg_tpu.audio.frontend import periodic_hann

    np.testing.assert_allclose(bank[0, 0], periodic_hann(512), atol=1e-7)


def test_melproject_pallas_odd_row_count_pads_not_tile1():
    """A (batch x frames) count with no power-of-two tile >= 8 divisor pads
    the rows instead of degrading to 1-sublane blocks (unsafe; see
    ops/cross_attention.py)."""
    fr = Frontend(32000, 0.0025, 0)
    rng = np.random.RandomState(3)
    b, f = 1, 13  # rows = 13: not divisible by 8
    f_pad = ((fr.n_fft // 2 + 1 + 127) // 128) * 128
    reim = jnp.asarray(rng.randn(b, 2 * f_pad, f).astype(np.float32))
    out = np.asarray(melproject_pallas(
        reim, jnp.asarray(fr.mel_filters), fr.n_fft, interpret=True))
    assert out.shape == (b, 80, f)
    # reference: power -> mel -> log10 in numpy
    re = np.asarray(reim[:, :f_pad, :])
    im = np.asarray(reim[:, f_pad:, :])
    power = (re ** 2 + im ** 2)[:, : fr.n_fft // 2 + 1, :]
    ref = np.log10(np.maximum(fr.mel_filters.T @ power[0], 1e-10))
    np.testing.assert_allclose(out[0], ref, atol=2e-5)
