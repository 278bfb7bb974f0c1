"""TPU log-mel frontend kernels.

The BASELINE.json north star asks for the frontend (framing, window, DFT, mel,
log-compress) as a fused TPU kernel. The TPU-optimal decomposition found by
measurement is:

  1. **conv-DFT** (XLA): framing + hann window + real DFT folded into ONE
     strided convolution against a precomputed window-folded cos/sin filterbank
     — a single MXU op. (A gather-based framing like the CPU path is an order of
     magnitude slower on TPU; jnp.fft is not competitive either; and a pure
     Pallas framing kernel is impossible for hops that are not 128-lane
     aligned, e.g. the standard 80-sample hop.) Runs at
     ``precision=HIGHEST`` — the default single-pass bf16 MXU precision is
     catastrophically wrong after log compression.
  2. **melproject_pallas**: a Pallas kernel fusing |.|^2 -> mel matmul ->
     clip -> log10 over aligned frame tiles, so the power spectrum — the
     largest intermediate, (B, n_freq, frames) — never exists in HBM.

``dft_bank`` / ``melproject_pallas`` are consumed by audio/frontend.py's TPU
path; ``pallas_ok`` gates the kernel (falls back to XLA ops outside its
envelope).
"""

from __future__ import annotations

import functools
import math

import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=16)
def dft_bank(n_fft: int) -> np.ndarray:
    """Window-folded real-DFT conv filterbank, shape (2 * f_pad, 1, n_fft).

    Output channel k in [0, f_pad) is cos, channel f_pad + k is -sin, with the
    periodic hann window folded in; rows for k >= n_fft//2 + 1 are zero padding
    up to the 128-lane multiple.
    """
    from ..audio.frontend import periodic_hann

    n_freq = n_fft // 2 + 1
    f_pad = _round_up(n_freq, 128)
    window = periodic_hann(n_fft)
    k = np.arange(n_freq)
    n = np.arange(n_fft)
    ang = 2.0 * math.pi * np.outer(k, n) / n_fft
    bank = np.zeros((2 * f_pad, 1, n_fft), np.float32)
    bank[:n_freq, 0, :] = np.cos(ang) * window[None, :]
    bank[f_pad:f_pad + n_freq, 0, :] = -np.sin(ang) * window[None, :]
    return bank


def pallas_ok(n_fft: int) -> bool:
    """The fused mel-projection kernel needs the (f_pad, 128) mel matrix and a
    (tile, 2*f_pad) block in VMEM — comfortable for all supported n_fft."""
    import jax

    return jax.default_backend() == "tpu" and n_fft <= 8192


def melproject_pallas(reim, mel, n_fft: int, interpret: bool = False):
    """(B, 2 * f_pad, F) DFT re/im -> (B, 80, F) log10 mel spectrogram.

    Fuses power + mel projection + floor + log10 in one pass over frame tiles;
    the (B, f_pad, F) power spectrogram never hits HBM.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, two_f_pad, f = reim.shape
    f_pad = two_f_pad // 2
    n_freq, n_mel = mel.shape  # static shape info, works on tracers

    assert n_mel <= 128, f"mel bins {n_mel} exceed the kernel's 128-lane tile"
    mel_p = jnp.zeros((f_pad, 128), jnp.float32)
    mel_p = mel_p.at[:n_freq, :n_mel].set(mel.astype(jnp.float32))

    # operate frames-major: (B, F, 2 * f_pad)
    x = reim.transpose(0, 2, 1).reshape(b * f, two_f_pad)
    rows = b * f
    tile = 256
    while rows % tile != 0 and tile > 8:
        tile //= 2
    rows_p = rows
    if rows % tile != 0:
        # No power-of-two tile >= 8 divides the row count: pad rows up to a
        # multiple of 8 instead of degrading to tile=1 — sub-8-sublane blocks
        # are unsafe on this hardware (ops/cross_attention.py) and a
        # one-row-per-program grid is overhead-bound.
        tile = 8
        rows_p = -(-rows // tile) * tile
        x = jnp.pad(x, ((0, rows_p - rows), (0, 0)))

    def kernel(x_ref, mel_ref, out_ref):
        f32 = jnp.float32
        re = x_ref[:, :f_pad]
        im = x_ref[:, f_pad:]
        power = re * re + im * im
        melspec = jnp.maximum(
            jnp.dot(power, mel_ref[:, :], preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST),
            1e-10,
        )
        out_ref[:, :] = jnp.log(melspec) * f32(1.0 / math.log(10.0))

    out = pl.pallas_call(
        kernel,
        grid=(rows_p // tile,),
        in_specs=[
            pl.BlockSpec((tile, two_f_pad), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, 128), jnp.float32),
        interpret=interpret,
    )(x, mel_p)

    return out[:rows].reshape(b, f, 128)[:, :, :n_mel].transpose(0, 2, 1)
