"""MHA -> grouped-query attention checkpoint conversion.

GQA divides the decode step's dominant HBM stream — the cross-attention K/V
(see BENCH.md) — by ``num_heads / num_kv_heads``. Pretrained Whisper weights
are MHA; the standard recipe (GQA paper) initializes the grouped K/V
projections by mean-pooling the original heads within each group and then
uptrains briefly. This module does the conversion; ``train.py`` on the target
dataset does the uptraining.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .config import WhisperConfig


def _pool_kv(w, num_heads: int, kv_heads: int, head_dim: int, is_bias: bool):
    """Mean-pool head groups along the output dim of a K/V projection.

    w: [..., D, H*hd] (weight) or [..., H*hd] (bias) -> kv-head-sized output.
    """
    g = num_heads // kv_heads
    if is_bias:
        shape = w.shape[:-1] + (kv_heads, g, head_dim)
        return jnp.mean(w.reshape(shape), axis=-2).reshape(
            w.shape[:-1] + (kv_heads * head_dim,))
    shape = w.shape[:-1] + (kv_heads, g, head_dim)
    return jnp.mean(w.reshape(shape), axis=-2).reshape(
        w.shape[:-1] + (kv_heads * head_dim,))


def convert_to_gqa(params, cfg: WhisperConfig, num_kv_heads: int):
    """(params, cfg) with MHA -> (params', cfg') with ``num_kv_heads`` K/V heads.

    Query/output projections and everything else are untouched; K/V projections
    (self and cross, encoder and decoder) are mean-pooled per group. The result
    approximates the original model and should be uptrained
    (``--initial_model_path <converted>``) before production use.
    """
    assert cfg.num_heads % num_kv_heads == 0, "num_kv_heads must divide num_heads"
    assert cfg.kv_heads == cfg.num_heads, "model is already grouped"
    h, hd = cfg.num_heads, cfg.head_dim

    def convert_layers(layers, names):
        out = dict(layers)
        for name in names:
            if name not in layers:
                continue
            out[name] = _pool_kv(layers[name], h, num_kv_heads, hd,
                                 is_bias=name.endswith("_b"))
        return out

    new_params = {
        "encoder": dict(params["encoder"]),
        "decoder": dict(params["decoder"]),
    }
    new_params["encoder"]["layers"] = convert_layers(
        params["encoder"]["layers"], ["k_w", "v_w", "v_b"])
    new_params["decoder"]["layers"] = convert_layers(
        params["decoder"]["layers"],
        ["k_w", "v_w", "v_b", "xk_w", "xv_w", "xv_b"])

    new_cfg = dataclasses.replace(cfg, num_kv_heads=num_kv_heads)
    new_cfg.cluster_codebook = dict(cfg.cluster_codebook)
    new_cfg.default_segmentation_config = dict(cfg.default_segmentation_config)
    return jax.tree.map(jnp.asarray, new_params), new_cfg
