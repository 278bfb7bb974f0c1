"""Int8 weight quantization for inference.

The TPU-native counterpart of CTranslate2's ``int8_float16`` mode (the
reference's default conversion, convert_hf_to_ct2.py + train.py:313-317):
weights are stored per-output-channel int8, activations are dynamically
quantized per row at matmul time, accumulation is int32 on the MXU, and the
result is rescaled in float32.

Why: the autoregressive decode step is HBM-bandwidth-bound on the weight
stream; int8 halves the bytes read vs bf16 (4x vs f32), and v5e MXUs run int8
at twice the bf16 rate.

``QuantTensor`` is a registered pytree node, so quantized weights ride through
``lax.scan`` over stacked layers and through jit exactly like plain arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantTensor:
    """Per-output-channel symmetric int8 weight + float32 scale.

    values: int8, shape [..., in, out]; scale: float32, shape [..., 1, out].
    """

    def __init__(self, values, scale):
        self.values = values
        self.scale = scale

    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim

    def astype(self, dtype):  # no-op: storage dtype is fixed
        return self

    def tree_flatten(self):
        return (self.values, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def quantize(w, axis: int = -1) -> QuantTensor:
    """Symmetric per-channel int8 quantization along ``axis`` (the output dim)."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # reduce the `in` dim
    scale = amax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    values = jnp.clip(jnp.round(w / safe), -127, 127).astype(jnp.int8)
    return QuantTensor(values, scale)


def qdot(x, qt: QuantTensor, mode: str = "w8a16"):
    """x [..., in] @ QuantTensor [in, out] -> float32 [..., out].

    mode="w8a16" (default): weight-only quantization — int8 weights are
    dequantized to bf16 on the fly (fused into the weight load by XLA) and the
    matmul runs in bf16 on the MXU with f32 accumulation. Halves the HBM weight
    stream vs bf16 with negligible numeric change (measured: identical
    transcripts on converged models).

    mode="w8a8": dynamic per-row activation quantization + int8 x int8 -> int32.
    Kept for experimentation; on v5e the int8 dot was measured SLOWER than
    bf16 inside the decode scan (it misses the MXU fast path), so it is not the
    default.
    """
    dims_last = x.ndim - 1
    if mode == "w8a16":
        if (jax.default_backend() == "tpu" and qt.values.ndim == 2
                and _pallas_w8_ok(x.shape, qt.values.shape)):
            return _qdot_pallas_w8a16(x, qt)
        # XLA:CPU cannot emit bf16 dots; f32 there (numerically a superset)
        cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        w = qt.values.astype(cdt) * qt.scale.astype(cdt)
        return jax.lax.dot_general(
            x.astype(cdt), w,
            dimension_numbers=(((dims_last,), (qt.values.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    x = x.astype(jnp.float32)
    row_amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    row_scale = jnp.where(row_amax > 0, row_amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x / row_scale), -127, 127).astype(jnp.int8)
    dims = (((dims_last,), (qt.values.ndim - 2,)), ((), ()))
    if jax.default_backend() == "tpu":
        acc = jax.lax.dot_general(
            xq, qt.values, dimension_numbers=dims,
            preferred_element_type=jnp.int32,
        )
    else:
        # XLA:CPU miscompiles int8 dots inside scan; int8 values are exactly
        # representable in f32, so this is bit-identical after rescale.
        acc = jax.lax.dot_general(
            xq.astype(jnp.float32), qt.values.astype(jnp.float32),
            dimension_numbers=dims, preferred_element_type=jnp.float32,
        )
    # scale shape [..., 1, out] -> broadcast over the row dims
    scale = jnp.squeeze(qt.scale, axis=-2)
    return acc.astype(jnp.float32) * row_scale * scale


def _pallas_w8_ok(x_shape, w_shape) -> bool:
    """Fused kernel envelope: lane-aligned dims, weight tile fits VMEM, and a
    SMALL row count — the kernel keeps the whole activation block in VMEM, so
    it targets the latency-bound decode step (few rows, weight-stream-bound);
    large-M matmuls (encoder / prefill) are compute-bound and stay on XLA."""
    k_dim, out = w_shape
    m = 1
    for d in x_shape[:-1]:
        m *= d
    return (
        k_dim % 128 == 0 and out % 128 == 0 and 1 <= m <= 512
        and k_dim * min(out, 512) <= 4 * 1024 * 1024  # int8 bytes per tile
    )


def _qdot_pallas_w8a16(x, qt: "QuantTensor"):
    """Fused dequant-matmul: int8 weights are dequantized to bf16 *in VMEM*,
    so the bf16 weight copy never exists in HBM (XLA materializes it, tripling
    the weight traffic the quantization was supposed to save)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    k_dim, out = qt.values.shape
    x2 = x.reshape(-1, k_dim)
    m = x2.shape[0]
    m_pad = -(-m // 8) * 8
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    out_tile = min(out, 512)

    def kernel(x_ref, w_ref, s_ref, o_ref):
        w = w_ref[:, :].astype(jnp.bfloat16) * s_ref[:, :].astype(jnp.bfloat16)
        o_ref[:, :] = jnp.dot(
            x_ref[:, :].astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32,
        )

    y = pl.pallas_call(
        kernel,
        grid=(out // out_tile,),
        in_specs=[
            pl.BlockSpec((m_pad, k_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_dim, out_tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, out_tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, out), jnp.float32),
    )(x2, qt.values, qt.scale)

    return y[:m].reshape(*orig_shape[:-1], out)


_QUANT_LEAF_NAMES = {
    "q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w",
    "xq_w", "xk_w", "xv_w", "xo_w",
}


def quantize_params(params):
    """Quantize all large projection weights of a model pytree for inference.

    Embeddings, convolutions, positions, norms, and biases stay in their
    floating dtype (they are small and/or used via gather)."""
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k in _QUANT_LEAF_NAMES:
                out[k] = quantize(v)
            else:
                out[k] = v
        return out

    return walk(params)


def cast_float_leaves(params, dtype):
    """Cast plain floating-point leaves to ``dtype``, leaving QuantTensors
    (already int8 + f32 scales) untouched."""
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif isinstance(v, QuantTensor):
                out[k] = v
            elif hasattr(v, "astype") and jnp.issubdtype(v.dtype, jnp.floating):
                out[k] = v.astype(dtype)
            else:
                out[k] = v
        return out

    return walk(params)
