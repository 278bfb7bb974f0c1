"""WhisperSeg-TPU: a TPU-native (JAX/XLA/Pallas) vocal segmentation framework.

A from-scratch rebuild of the capabilities of nianlonggu/WhisperSeg: a Whisper-style
encoder-decoder that reads log-mel spectrograms of human/animal vocalizations and
*generates* segment annotations as token sequences ``<|onset|>cluster<|offset|>``,
plus the training, evaluation, serving, and data tooling around it.

Unlike the reference (PyTorch + CTranslate2 dual inference engines), a single JAX
model implementation serves both training and fast inference; batching, sharding
and autoregressive decoding are expressed with jit/pjit over a device mesh.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "Segmenter":
        from .segmenter import Segmenter

        return Segmenter
    if name == "evaluate":
        from . import evaluate

        return evaluate
    if name == "load_audio":
        from .audio.io import load_audio

        return load_audio
    raise AttributeError(name)
