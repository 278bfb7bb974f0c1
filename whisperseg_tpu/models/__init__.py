from .config import WhisperConfig, make_config
from .whisper import (
    cross_entropy_loss,
    decoder_forward_train,
    decoder_step,
    encoder_forward,
    ensure_frame_head,
    frame_head_forward,
    frame_head_loss,
    init_cache,
    init_frame_head,
    init_params,
    num_parameters,
    precompute_cross_kv,
)

__all__ = [
    "WhisperConfig",
    "make_config",
    "cross_entropy_loss",
    "decoder_forward_train",
    "decoder_step",
    "encoder_forward",
    "ensure_frame_head",
    "frame_head_forward",
    "frame_head_loss",
    "init_cache",
    "init_frame_head",
    "init_params",
    "num_parameters",
    "precompute_cross_kv",
]
