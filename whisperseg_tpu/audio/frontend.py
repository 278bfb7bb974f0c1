"""Log-mel spectrogram frontend.

Replicates the exact numerics of the reference's feature extraction
(reference audio_utils.py:45-76 + transformers WhisperFeatureExtractor
``_np_extract_fbank_features``): periodic hann window, centered power-2 STFT with
``frame_length = n_fft``, slaney mel filterbank with configurable min/max frequency,
``log10(max(mel, 1e-10))``, drop of the last STFT frame, per-clip ``max - 8`` floor,
and ``(x + 4) / 4`` scaling.

Two implementations are provided:

  * :meth:`Frontend.log_mel_numpy` — float64 scalar-loop-free numpy version used as
    the CPU-exact oracle (parity-tested against the installed HF extractor).
  * :func:`log_mel_batch` — a batched float32 JAX version used on TPU: framing via
    ``conv_general_dilated_patches`` (one XLA op), rFFT, mel matmul on the MXU.
    All shapes are static so every (sr, spec_time_step) pair compiles exactly once.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..constants import NUM_MEL_BINS, n_fft_for_sr
from .mel import mel_filter_bank


def periodic_hann(n: int) -> np.ndarray:
    """Periodic hann window of length n (HF window_function(..., periodic=True))."""
    return np.hanning(n + 1)[:-1]


@dataclass(frozen=True)
class Frontend:
    """Feature-extraction geometry for one (sr, spec_time_step, band) configuration.

    Mirrors reference WhisperSegFeatureExtractor (audio_utils.py:45-76):
    ``hop = int(spec_time_step * sr)``, ``n_fft = n_fft_for_sr(sr)``,
    band defaults [0, sr // 2].
    """

    sr: int
    spec_time_step: float
    min_frequency: float = 0.0
    max_frequency: Optional[float] = None
    hop_length: int = field(init=False)
    n_fft: int = field(init=False)

    def __post_init__(self):
        object.__setattr__(self, "hop_length", int(self.spec_time_step * self.sr))
        object.__setattr__(self, "n_fft", n_fft_for_sr(self.sr))
        if self.max_frequency is None:
            object.__setattr__(self, "max_frequency", self.sr // 2)

    @functools.cached_property
    def mel_filters(self) -> np.ndarray:
        """(1 + n_fft//2, 80) slaney filterbank (reference audio_utils.py:68-76)."""
        return mel_filter_bank(
            num_frequency_bins=1 + self.n_fft // 2,
            num_mel_filters=NUM_MEL_BINS,
            min_frequency=float(self.min_frequency),
            max_frequency=float(self.max_frequency),
            sampling_rate=self.sr,
        )

    @functools.cached_property
    def window(self) -> np.ndarray:
        return periodic_hann(self.n_fft)

    def num_columns(self, num_samples: int) -> int:
        """Spectrogram columns produced for a waveform of ``num_samples`` samples
        (centered STFT frame count minus the dropped last frame)."""
        return num_samples // self.hop_length

    # ------------------------------------------------------------------ numpy oracle

    def log_mel_numpy(self, waveform: np.ndarray) -> np.ndarray:
        """Exact float64 replication of the HF numpy pipeline -> (80, N // hop)."""
        n_fft, hop = self.n_fft, self.hop_length
        pad = n_fft // 2
        x = np.pad(waveform.astype(np.float64), (pad, pad), mode="reflect")
        num_frames = 1 + (len(x) - n_fft) // hop
        idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
        frames = x[idx] * self.window.astype(np.float64)[None, :]
        # HF stores the FFT result as complex64 before taking |.|^2.
        spec = np.fft.rfft(frames, axis=-1).astype(np.complex64)
        power = np.abs(spec, dtype=np.float64) ** 2
        melspec = np.maximum(1e-10, power @ self.mel_filters)  # (frames, 80)
        log_spec = np.log10(melspec).T.astype(np.float32)  # (80, frames)
        log_spec = log_spec[:, :-1]  # drop last frame
        log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
        return ((log_spec + 4.0) / 4.0).astype(np.float32)

    # ------------------------------------------------------------------- JAX batched

    def log_mel_batch(self, clips) -> "jax.Array":
        """Batched float32 TPU path: (B, N) waveforms -> (B, 80, N // hop) features."""
        import jax.numpy as jnp

        window = jnp.asarray(self.window, dtype=jnp.float32)
        mel = jnp.asarray(self.mel_filters, dtype=jnp.float32)
        return _log_mel_batch_jax(clips, window, mel, self.hop_length, self.n_fft)

    def features_for_clips(self, clips: np.ndarray, total_spec_columns: int) -> "jax.Array":
        """(B, N) fixed-length clips -> (B, 80, total_spec_columns), truncating or
        right-padding with each clip's min value (reference model.py:150-163)."""
        import jax.numpy as jnp

        feats = self.log_mel_batch(jnp.asarray(clips, dtype=jnp.float32))
        cols = feats.shape[-1]
        if cols >= total_spec_columns:
            return feats[:, :, :total_spec_columns]
        pad_value = jnp.min(feats, axis=(1, 2), keepdims=True)
        pad = jnp.broadcast_to(
            pad_value, (feats.shape[0], feats.shape[1], total_spec_columns - cols)
        )
        return jnp.concatenate([feats, pad], axis=-1)


@functools.partial(
    __import__("jax").jit, static_argnames=("hop_length", "n_fft")
)
def _log_mel_batch_jax(clips, window, mel, hop_length: int, n_fft: int):
    """Gather-framing + rFFT formulation (fast and float64-class accurate on
    CPU; on TPU the conv-DFT formulation below is used instead)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        return _log_mel_batch_tpu(clips, mel, hop_length, n_fft)

    pad = n_fft // 2
    x = jnp.pad(clips, ((0, 0), (pad, pad)), mode="reflect")
    # Frame extraction as a static gather: (B, F, n_fft).
    num_frames = 1 + (x.shape[1] - n_fft) // hop_length
    idx = (
        jnp.arange(num_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    frames = x[:, idx] * window[None, None, :]  # (B, F, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, F, n_freq)
    melspec = jnp.maximum(1e-10, jnp.einsum(
        "bfk,km->bfm", power, mel, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST))
    log_spec = jnp.log10(melspec).transpose(0, 2, 1)  # (B, 80, F)
    log_spec = log_spec[:, :, :-1]  # drop last frame
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0


def _log_mel_batch_tpu(clips, mel, hop_length: int, n_fft: int):
    """TPU formulation: framing + windowing + DFT folded into ONE strided
    convolution against the window-folded cos/sin bank (an MXU matmul — TPU
    gathers are slow and jnp.fft is not competitive), then fused
    power -> mel -> log, in Pallas when the geometry allows.

    ``precision=HIGHEST`` keeps the DFT in true f32 (default MXU precision is a
    single bf16 pass, which is audibly wrong after log compression).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.logmel_pallas import dft_bank, melproject_pallas, pallas_ok

    pad = n_fft // 2
    x = jnp.pad(clips, ((0, 0), (pad, pad)), mode="reflect")
    bank = jnp.asarray(dft_bank(n_fft))  # (2 * f_pad, 1, n_fft), window folded in
    f_pad = bank.shape[0] // 2
    num_frames = 1 + (x.shape[1] - n_fft) // hop_length

    reim = lax.conv_general_dilated(
        x[:, None, :], bank, window_strides=(hop_length,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, 2 * f_pad, F)
    reim = reim[:, :, : num_frames - 1]  # drop last frame now (saves work)

    if pallas_ok(n_fft):
        log_spec = melproject_pallas(reim, mel, n_fft)  # (B, 80, F-1)
    else:
        re = reim[:, :f_pad, :]
        im = reim[:, f_pad:, :]
        power = re * re + im * im  # (B, f_pad, F-1)
        n_freq = mel.shape[0]
        melspec = jnp.maximum(1e-10, jnp.einsum(
            "bkf,km->bmf", power[:, :n_freq, :], mel,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
        log_spec = jnp.log10(melspec)
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0
