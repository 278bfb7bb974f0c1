"""The public segmentation API.

``Segmenter.segment(audio, sr, ...)`` reproduces the full algorithmic pipeline of
the reference (reference model.py:397-470) on TPU:

  1. sliding-window + multi-trial slicing with per-trial shifted zero left-pad
     (reference model.py:127-166)
  2. batched log-mel features — ONE jitted device call per batch instead of the
     reference's per-window CPU FFT loop
  3. batched autoregressive generation (greedy/top-k/beam) — a single XLA while
     loop per batch (replaces HF generate / CTranslate2)
  4. token-level parse -> per-trial window-boundary merge -> clamp/sort/min-length
     filter (reference model.py:191-281)
  5. multi-trial consolidation: DBSCAN clustering or frame voting
     (reference model.py:284-394)
  6. 3-decimal rounding, FFT-blur correction (+/- n_fft/2/sr with midpoint
     collapse), exact-duplicate removal (reference model.py:439-468)

One Segmenter instance serves both production inference and validation-during-
training (the reference needs three classes for this: WhisperSegmenter,
WhisperSegmenterFast, WhisperSegmenterForEval).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import codec
from .audio.frontend import Frontend
from .consolidation import (
    consolidate_by_clustering,
    consolidate_by_voting,
    merge_window_boundaries,
)
from .constants import RATIO_DECODING_TIME_STEP_TO_SPEC_TIME_STEP as RATIO
from .constants import fft_time_delta
from .models.config import WhisperConfig
from .scoring import frame_score as _frame_score
from .scoring import segment_score as _segment_score


def _blur_correct_and_dedup(final: Dict[str, list],
                            time_delta: float) -> Dict[str, list]:
    """FFT-blur correction with midpoint collapse (reference model.py:439-455)
    followed by exact-duplicate removal after sorting (reference
    model.py:457-468). Shared by ``segment`` and ``segment_streaming``."""
    onsets, offsets = [], []
    for onset, offset in zip(final["onset"], final["offset"]):
        c_on, c_off = onset + time_delta, offset - time_delta
        if c_on > c_off:
            c_on = c_off = (onset + offset) / 2
        onsets.append(c_on)
        offsets.append(c_off)
    final["onset"], final["offset"] = onsets, offsets

    if final["onset"]:
        clean: List[Tuple[float, float, str]] = []
        for onset, offset, cluster in sorted(
            zip(final["onset"], final["offset"], final["cluster"]),
            key=lambda x: x[0],
        ):
            if not clean or (onset, offset, cluster) != clean[-1]:
                clean.append((onset, offset, cluster))
        final["onset"] = [c[0] for c in clean]
        final["offset"] = [c[1] for c in clean]
        final["cluster"] = [c[2] for c in clean]
    return final


def _round_and_rededup(final: Dict[str, list],
                       precision_bits: int) -> Dict[str, list]:
    """Final rounding (reference model.py:457-468 precision_bits) + re-dedup:
    post-processing stages emit sub-millisecond boundary positions, and two
    nearby decoded segments can snap to the SAME event peaks (frame_refine)
    or round to identical boundaries, re-creating duplicates the earlier
    dedup (which ran pre-post-processing) could not see."""
    final["onset"] = [float(np.round(t, precision_bits))
                      for t in final["onset"]]
    final["offset"] = [float(np.round(t, precision_bits))
                       for t in final["offset"]]
    if final["onset"]:
        clean = []
        # full-tuple sort: with an onset-only key, a same-onset row with a
        # different offset can sit BETWEEN two identical rows and the
        # adjacent-only comparison would miss the duplicate
        for row in sorted(zip(final["onset"], final["offset"],
                              final["cluster"])):
            if not clean or row != clean[-1]:
                clean.append(row)
        final["onset"] = [c[0] for c in clean]
        final["offset"] = [c[1] for c in clean]
        final["cluster"] = [c[2] for c in clean]
    return final


def _tracks_from_window_frames(probs: np.ndarray, cluster: np.ndarray,
                               duration_s: float,
                               spec_time_step: float) -> Dict[str, np.ndarray]:
    """Assemble the frame-track dict from per-window frame-head outputs.

    ``probs`` [N, S, 3] / ``cluster`` [N, S] are the head's outputs for the
    N non-overlapping trial-0 windows of one audio, in time order; the
    concatenated tracks are truncated to the audio's own length on the
    decoder time base (quantum = spec_time_step * RATIO)."""
    probs = probs.reshape(-1, 3)
    cluster = cluster.reshape(-1)
    quantum = spec_time_step * RATIO
    n_t = int(np.ceil(duration_s / quantum)) if duration_s else 0
    probs, cluster = probs[:n_t], cluster[:n_t]
    return {"vocal": probs[:, 0], "onset": probs[:, 1],
            "offset": probs[:, 2], "cluster": cluster,
            "quantum": quantum}


class Segmenter:
    """Segmentation front-door over a (params, config) model pytree.

    ``inference_dtype='bfloat16'`` (default) casts the weights once for
    inference: the autoregressive decode loop is HBM-bandwidth-bound on the
    weight stream, so halving the bytes read per step nearly doubles decode
    throughput with no accuracy cost at the F1 level (layernorm/softmax/logits
    still accumulate in float32)."""

    def __init__(self, params, config: WhisperConfig,
                 inference_dtype: str = "bfloat16", mesh=None):
        if inference_dtype in ("int8", "int4"):
            # int8 = CT2 int8_float16 equivalent: int8 projection weights,
            # bf16 rest. int4 = w4a16 group-wise packed weights (halves the
            # decode weight stream again; beyond-reference capability).
            from .ops.quant import cast_float_leaves, quantize_params

            bits = 8 if inference_dtype == "int8" else 4
            params = cast_float_leaves(
                quantize_params(params, bits=bits), "bfloat16")
        elif inference_dtype is not None:
            import jax
            import jax.numpy as jnp

            target = jnp.dtype(inference_dtype)
            params = jax.tree.map(
                lambda x: x.astype(target) if hasattr(x, "astype") else x, params
            )
        self.mesh = mesh
        if mesh is not None:
            # replicate weights, shard the window batch over the "data" axis —
            # the mesh counterpart of the reference's thread-per-GPU inference
            # fan-out (reference model.py:169-189)
            import jax

            from .parallel.mesh import replicated

            params = jax.device_put(params, replicated(mesh))
        self.params = params
        self.config = config
        self.total_spec_columns = config.total_spec_columns
        self.cluster_codebook: Dict[str, int] = dict(config.cluster_codebook)
        self.default_segmentation_config: Dict = dict(config.default_segmentation_config)
        self.precision_bits = 3

    # ------------------------------------------------------------------ plumbing

    @classmethod
    def from_pretrained(cls, model_path: str,
                        inference_dtype: str = "bfloat16") -> "Segmenter":
        """Load a checkpoint directory — ours (params.npz) or a reference-style
        HuggingFace one (model.safetensors / pytorch_model.bin + tokenizer
        files), which is imported on the fly (models/convert_hf.py) so a
        reference user can point this framework directly at an existing
        WhisperSeg finetune (reference model.py:625-644)."""
        import os

        from .hub import download_model

        # resolve names (built-in models, cache entries) to a directory
        # FIRST, then dispatch on its contents
        resolved = (model_path if os.path.isdir(model_path)
                    else download_model(model_path))
        if os.path.exists(os.path.join(resolved, "params.npz")):
            from .checkpoint import load_checkpoint

            params, config = load_checkpoint(resolved)
        else:
            from .models.convert_hf import import_hf_checkpoint

            params, config = import_hf_checkpoint(resolved,
                                                  total_spec_columns=None)
        return cls(params, config, inference_dtype=inference_dtype)

    def set_draft_model(self, model_path: str, spec_k: int = 4):
        """Enable greedy speculative decoding: a small draft checkpoint (e.g.
        a whisper-tiny finetune of the same dataset) proposes ``spec_k``
        tokens per step and the main model verifies them in one forward.
        Output is exactly the main model's greedy transcript; speed scales
        with draft/target agreement (decode.generate_speculative). Applies
        to greedy requests only (num_beams <= 1, unconstrained)."""
        import os
        import sys

        if not os.environ.get("WS_SPEC_NO_WARN"):
            # Measured on THIS tunneled-TPU environment (RESULTS.md): the
            # per-dispatch latency floor makes a draft step cost the same as
            # a target step, so speculative decoding ran 0.27x-0.44x the
            # speed of plain greedy despite 0.99-1.0 token agreement. Don't
            # let the flag silently slow users down; the win condition is
            # co-located hardware where a draft step is genuinely cheaper.
            print(
                "Warning: speculative decoding was measured SLOWER than plain "
                "greedy decoding in dispatch-latency-bound environments "
                "(0.27x-0.44x on a tunneled TPU; RESULTS.md). Re-measure on "
                "your hardware with scripts/bench_spec.py before enabling in "
                "production; set WS_SPEC_NO_WARN=1 to silence this warning.",
                file=sys.stderr,
            )
        from .checkpoint import load_checkpoint

        dparams, dcfg = load_checkpoint(model_path)
        import jax
        import jax.numpy as jnp

        dparams = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "astype") and x.dtype == jnp.float32 else x, dparams)
        self.draft = (dparams, dcfg)
        self.spec_k = spec_k
        self.__dict__["_segment_fn_cache"] = {}

    @property
    def inverse_cluster_codebook(self) -> Dict[int, str]:
        return {v: k for k, v in self.cluster_codebook.items()}

    def update_cluster_codebook(self, cluster_codebook: Dict[str, int]):
        """(reference model.py:597-601)"""
        self.cluster_codebook = dict(cluster_codebook)
        self.config.cluster_codebook = dict(cluster_codebook)

    # ------------------------------------------------------------------- slicing

    def slice_audio_windows(
        self, audio: np.ndarray, sr: int, spec_time_step: float, num_trials: int
    ) -> Tuple[np.ndarray, List[Tuple[int, float, float]]]:
        """Multi-trial sliding windows (reference model.py:127-166).

        Returns (clips [N, clip_samples] float32 — zero-padded to full length,
        meta list of (trial_id, offset_time_seconds, actual_duration_seconds)).
        """
        clip_duration = self.total_spec_columns * spec_time_step
        clip_samples = int(clip_duration * sr)
        clips, meta = [], []
        for trial_id in range(num_trials):
            padding_time = (
                np.round(clip_duration * trial_id / num_trials / spec_time_step)
                * spec_time_step
            )
            num_pad = int(padding_time * sr)
            padded = np.concatenate(
                [np.zeros(num_pad, dtype=np.float32), np.asarray(audio, np.float32)]
            )
            # The loop must run at least once even for empty audio
            # (reference model.py:145-146).
            for pos in range(0, max(len(padded), 1), clip_samples):
                clip = padded[pos:pos + clip_samples]
                full = np.zeros(clip_samples, dtype=np.float32)
                full[: len(clip)] = clip
                clips.append(full)
                meta.append((trial_id, pos / sr - padding_time, len(clip) / sr))
        return np.stack(clips), meta

    # ---------------------------------------------------------------- generation

    def _segment_fn(self, frontend: Frontend, max_length: int, num_beams: int,
                    top_k: int, constrained: bool = False,
                    int8_kv: bool = False, top_p: float = 1.0,
                    want_frames: bool = False):
        """One fused jitted computation: raw audio clips -> log-mel features ->
        autoregressive decode -> token ids. Fusing the frontend into the decode
        call halves host->device round trips per batch (which dominate when the
        device is reached over a network tunnel).

        ``want_frames=True`` additionally feeds the SAME encoder output
        through the frame head and returns ``(tokens, probs [B,S,3],
        cluster [B,S])`` — the fitted frame post-processing then costs zero
        extra encoder runs (the encoder is ~80% of the pipeline at the
        production plateau, BENCH.md)."""
        import jax

        from .decode import generate, generate_speculative

        use_spec = (getattr(self, "draft", None) is not None
                    and num_beams <= 1 and top_k <= 1 and not constrained
                    and top_p >= 1.0 and not int8_kv)
        key = (frontend.sr, frontend.spec_time_step, frontend.min_frequency,
               frontend.max_frequency, max_length, num_beams, top_k,
               constrained, int8_kv, use_spec, top_p, want_frames)
        cache = self.__dict__.setdefault("_segment_fn_cache", {})
        if key not in cache:
            total = self.total_spec_columns
            cfg = self.config

            if use_spec:
                # draft params ride as a jit argument via functools.partial-
                # style binding at call time, NOT as a closure capture —
                # captured pytrees are baked into the program as constants and
                # re-uploaded through the compile path (GBs for real models).
                dcfg = self.draft[1]
                spec_k = self.spec_k

                def fn(params, dparams, clips, rng, length_penalty):
                    feats = frontend.features_for_clips(clips, total)
                    return generate_speculative(params, cfg, dparams, dcfg,
                                                feats, max_length=max_length,
                                                spec_k=spec_k)
            elif want_frames:
                import jax.numpy as jnp

                from .models.whisper import (encoder_forward,
                                             frame_head_forward)

                def fn(params, clips, rng, length_penalty):
                    feats = frontend.features_for_clips(clips, total)
                    enc = encoder_forward(params, cfg, feats)
                    tokens = generate(params, cfg, feats, rng=rng,
                                      max_length=max_length,
                                      num_beams=num_beams,
                                      top_k=top_k, top_p=top_p,
                                      length_penalty=length_penalty,
                                      constrained=constrained,
                                      int8_kv=int8_kv, enc_out=enc)
                    logits = frame_head_forward(params, cfg, enc)
                    probs = jax.nn.sigmoid(logits[..., :3])
                    if logits.shape[-1] > 3:
                        cl = jnp.argmax(logits[..., 3:], axis=-1)
                        cl = cl.astype(jnp.int32)
                    else:
                        cl = jnp.full(logits.shape[:2], -1, dtype=jnp.int32)
                    return tokens, probs, cl
            else:
                def fn(params, clips, rng, length_penalty):
                    feats = frontend.features_for_clips(clips, total)
                    return generate(params, cfg, feats, rng=rng,
                                    max_length=max_length, num_beams=num_beams,
                                    top_k=top_k, top_p=top_p,
                                    length_penalty=length_penalty,
                                    constrained=constrained, int8_kv=int8_kv)

            jitted = jax.jit(fn)
            if use_spec:
                def with_draft(params, clips, rng, length_penalty,
                               _j=jitted, _self=self):
                    return _j(params, _self.draft[0], clips, rng,
                              length_penalty)

                jitted = with_draft
            cache[key] = jitted
        return cache[key]

    def _generate_tokens(
        self,
        clips: np.ndarray,  # [N, clip_samples] raw audio windows
        frontend: Frontend,
        batch_size: int,
        max_length: int,
        num_beams: int,
        top_k: int,
        length_penalty: float,
        seed: int,
        status_monitor: Optional[dict],
        constrained: bool = False,
        int8_kv: bool = False,
        top_p: float = 1.0,
        collect_frames: bool = False,
    ):
        """Run the fused frontend+decode computation over fixed-size batches
        (last batch zero-padded so every call reuses one compiled executable).

        Returns the token lists, or with ``collect_frames=True`` a tuple
        ``(token_lists, probs [N, S, 3], cluster [N, S])`` where the frame
        tracks come from the same encoder pass as the decode (no second
        encoder run)."""
        import jax
        import jax.numpy as jnp

        fn = self._segment_fn(frontend, max_length, num_beams, top_k,
                              constrained, int8_kv, top_p,
                              want_frames=collect_frames)
        n = clips.shape[0]
        out: List[List[int]] = []
        probs_parts, cl_parts = [], []
        rng = jax.random.PRNGKey(seed)
        for pos in range(0, n, batch_size):
            chunk = clips[pos:pos + batch_size]
            real = chunk.shape[0]
            if real < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - real,) + chunk.shape[1:],
                                     chunk.dtype)]
                )
            rng, sub = jax.random.split(rng)
            chunk_dev = jnp.asarray(chunk)
            if self.mesh is not None:
                from .parallel.mesh import batch_sharding

                chunk_dev = jax.device_put(chunk_dev, batch_sharding(self.mesh))
            result = fn(self.params, chunk_dev, sub,
                        float(length_penalty))
            if collect_frames:
                tokens, probs, cl = result
                probs_parts.append(np.asarray(probs)[:real])
                cl_parts.append(np.asarray(cl)[:real])
            else:
                tokens = result
            out += np.asarray(tokens)[:real].tolist()
            if status_monitor is not None:
                status_monitor["progress"] = int(
                    np.round(min(pos + batch_size, n) / n * 100)
                )
        if collect_frames:
            return out, np.concatenate(probs_parts), np.concatenate(cl_parts)
        return out

    def warmup(self, sr: int, spec_time_step: Optional[float] = None,
               min_frequency: Optional[float] = None, batch_size: int = 8,
               max_length: Optional[int] = None, num_beams: int = 4,
               top_k: int = 1):
        """Pre-compile the fused segment computation for one configuration so
        the first real request doesn't pay the (minutes-scale on tunneled
        backends) compile cost. Call at service startup."""
        if spec_time_step is None:
            spec_time_step = self.default_segmentation_config.get(
                "spec_time_step", 0.0025)
        if min_frequency is None:
            min_frequency = self.default_segmentation_config.get(
                "min_frequency", 0)
        if max_length is None:
            # compile the SAME program a default request will use
            max_length = int(self.default_segmentation_config.get(
                "max_length", 448))
        clip_samples = int(self.total_spec_columns * spec_time_step * sr)
        clips = np.zeros((batch_size, clip_samples), dtype=np.float32)
        frontend = Frontend(sr, spec_time_step, min_frequency)
        self._generate_tokens(clips, frontend, batch_size, max_length,
                              num_beams, top_k, 1.0, 0, None)
        if "frame_head" in self.params:
            # pre-compile the frame-VAD path too (frame_mode requests)
            self.frame_probs(np.zeros(clip_samples, np.float32), sr,
                             spec_time_step=spec_time_step,
                             min_frequency=min_frequency,
                             batch_size=batch_size)

    # --------------------------------------------------------------- frame head

    def _frame_fn(self, frontend: Frontend):
        """Jitted fused computation: raw audio clips -> log-mel features ->
        encoder -> frame-head probabilities. Returns (probs [B, S, 3] float32
        — vocal/onset/offset sigmoids — and cluster ids [B, S] int32, -1 when
        the model has no cluster channel)."""
        import jax
        import jax.numpy as jnp

        from .models.whisper import encoder_forward, frame_head_forward

        key = ("frame", frontend.sr, frontend.spec_time_step,
               frontend.min_frequency, frontend.max_frequency)
        cache = self.__dict__.setdefault("_segment_fn_cache", {})
        if key not in cache:
            total = self.total_spec_columns
            cfg = self.config

            def fn(params, clips):
                feats = frontend.features_for_clips(clips, total)
                enc = encoder_forward(params, cfg, feats)
                logits = frame_head_forward(params, cfg, enc)
                probs = jax.nn.sigmoid(logits[..., :3])
                if logits.shape[-1] > 3:
                    cl = jnp.argmax(logits[..., 3:], axis=-1).astype(jnp.int32)
                else:
                    cl = jnp.full(logits.shape[:2], -1, dtype=jnp.int32)
                return probs, cl

            cache[key] = jax.jit(fn)
        return cache[key]

    def frame_probs(
        self,
        audio,
        sr: int,
        spec_time_step: Optional[float] = None,
        min_frequency: Optional[float] = None,
        batch_size: int = 8,
    ) -> Dict[str, np.ndarray]:
        """Per-timestamp-quantum frame-head probabilities for a whole audio.

        Requires a model trained with ``--frame_head``. Returns a dict with
        ``vocal`` / ``onset`` / ``offset`` float32 arrays of shape [T]
        (T = ceil(duration / quantum)), ``cluster`` int32 [T] (argmax cluster
        id, -1 without a cluster channel), and scalar ``quantum`` — the grid
        period ``spec_time_step * RATIO`` seconds (= one decoder timestamp
        step, so these tracks live on the decoder's own time base)."""
        if "frame_head" not in self.params:
            raise ValueError(
                "this model has no frame head; train with --frame_head")
        if min_frequency is None:
            min_frequency = self.default_segmentation_config.get("min_frequency", 0)
        if spec_time_step is None:
            spec_time_step = self.default_segmentation_config.get(
                "spec_time_step", 0.0025)

        audio = np.asarray(audio, dtype=np.float32)
        clips, _meta = self.slice_audio_windows(audio, sr, spec_time_step, 1)
        frontend = Frontend(sr, spec_time_step, min_frequency)
        fn = self._frame_fn(frontend)

        import jax.numpy as jnp

        # One in-flight frame computation per segmenter: frame_probs runs on
        # the CALLER's thread (unlike _generate_tokens, which a
        # BatchingSegmenter routes through its single worker), so concurrent
        # frame_mode service requests would otherwise each dispatch their own
        # device batches and stack up device memory.
        lock = self.__dict__.setdefault("_frame_lock", threading.Lock())
        probs_parts, cl_parts = [], []
        n = clips.shape[0]
        with lock:
            for pos in range(0, n, batch_size):
                chunk = clips[pos:pos + batch_size]
                real = chunk.shape[0]
                if real < batch_size:
                    chunk = np.concatenate(
                        [chunk, np.zeros((batch_size - real,) + chunk.shape[1:],
                                         chunk.dtype)])
                p, c = fn(self.params, jnp.asarray(chunk))
                probs_parts.append(np.asarray(p)[:real])
                cl_parts.append(np.asarray(c)[:real])
        return _tracks_from_window_frames(
            np.concatenate(probs_parts), np.concatenate(cl_parts),
            len(audio) / sr if len(audio) else 0.0, spec_time_step)

    def segment_from_frames(
        self,
        audio,
        sr: int,
        spec_time_step: Optional[float] = None,
        min_frequency: Optional[float] = None,
        batch_size: int = 8,
        vocal_threshold: Optional[float] = None,
        cut_threshold: Optional[float] = None,
        boundary_snap: Optional[int] = None,
        min_segment_length: Optional[float] = None,
        gap_cut: Optional[int] = None,
    ) -> Dict[str, list]:
        """Decoder-free segmentation from the frame head (fast VAD mode).

        One encoder pass per window — the autoregressive decode stage is
        removed entirely. How much wall-clock that saves depends on where
        decode sits in the pipeline: at the production bench plateau decode
        is ~20% (BENCH.md), and in dispatch-bound environments small
        workloads measure near-parity (scripts/bench_frames.py: 0.94x on 4
        files over the tunnel) — the win here is QUALITY (RESULTS.md), with
        speed a secondary benefit on co-located hardware. Pipeline
        (refine.segments_from_tracks): threshold the vocal track into runs;
        cut runs at interior positions where both the onset and offset event
        tracks exceed ``cut_threshold`` (two vocalizations merged without a
        gap — the structural failure mode of weak seq2seq models,
        DEVNOTES.md); snap each boundary to the nearest event-track peak
        within ``boundary_snap`` positions with parabolic sub-quantum
        interpolation; FFT-blur correction as in ``segment()``.

        Threshold defaults follow the standard precedence chain: explicit
        arg > checkpoint's default_segmentation_config
        (``frame_vocal_threshold`` / ``frame_cut_threshold`` /
        ``frame_boundary_snap``, e.g. fitted by scripts/fit_frame_mode.py)
        > literal (0.5 / 0.5 / 2)."""
        if min_frequency is None:
            min_frequency = self.default_segmentation_config.get("min_frequency", 0)
        if spec_time_step is None:
            spec_time_step = self.default_segmentation_config.get(
                "spec_time_step", 0.0025)
        if min_segment_length is None:
            min_segment_length = spec_time_step * RATIO
        dsc = self.default_segmentation_config
        if vocal_threshold is None:
            vocal_threshold = dsc.get("frame_vocal_threshold", 0.5)
        if cut_threshold is None:
            cut_threshold = dsc.get("frame_cut_threshold", 0.5)
        if boundary_snap is None:
            boundary_snap = int(dsc.get("frame_boundary_snap", 2))
        if gap_cut is None:
            gap_cut = int(dsc.get("frame_gap_cut", 0))

        tracks = self.frame_probs(audio, sr, spec_time_step=spec_time_step,
                                  min_frequency=min_frequency,
                                  batch_size=batch_size)
        from .refine import segments_from_tracks

        return segments_from_tracks(
            tracks, len(np.asarray(audio)) / sr, fft_time_delta(sr),
            self.inverse_cluster_codebook, vocal_threshold=vocal_threshold,
            cut_threshold=cut_threshold, boundary_snap=boundary_snap,
            min_segment_length=min_segment_length,
            precision_bits=self.precision_bits, gap_cut=gap_cut)

    # ----------------------------------------------------------------- streaming

    def _stream_frame_tracks(self, stream, spec_time_step: float,
                             min_frequency: float, batch_size: int,
                             status_monitor: Optional[dict] = None):
        """frame_probs over an AudioStream: one pass, O(chunk) memory.

        Returns the same tracks dict as :meth:`frame_probs` (the tracks
        themselves are tiny — 16 bytes per timestamp quantum — so they are
        accumulated whole)."""
        import jax.numpy as jnp

        if "frame_head" not in self.params:
            raise ValueError(
                "this model has no frame head; train with --frame_head")
        sr = stream.sr
        clip_samples = int(self.total_spec_columns * spec_time_step * sr)
        frontend = Frontend(sr, spec_time_step, min_frequency)
        fn = self._frame_fn(frontend)
        lock = self.__dict__.setdefault("_frame_lock", threading.Lock())

        probs_parts, cl_parts = [], []
        pend: List[np.ndarray] = []
        total_samples = 0
        n_windows = 0

        def flush(force=False):
            while len(pend) >= batch_size or (force and pend):
                take = pend[:batch_size]
                del pend[:batch_size]
                real = len(take)
                chunk = np.stack(take)
                if real < batch_size:
                    chunk = np.concatenate(
                        [chunk, np.zeros((batch_size - real, clip_samples),
                                         np.float32)])
                p, c = fn(self.params, jnp.asarray(chunk))
                probs_parts.append(np.asarray(p)[:real])
                cl_parts.append(np.asarray(c)[:real])

        with lock:
            carry = np.zeros(0, np.float32)
            for chunk in stream:
                total_samples += len(chunk)
                buf = np.concatenate([carry, chunk]) if len(carry) else chunk
                nwin = len(buf) // clip_samples
                for k in range(nwin):
                    pend.append(buf[k * clip_samples:(k + 1) * clip_samples])
                n_windows += nwin
                carry = buf[nwin * clip_samples:].copy()
                flush()
                if status_monitor is not None and stream.duration:
                    status_monitor["progress"] = int(np.round(min(
                        total_samples / sr / stream.duration, 1.0) * 100))
            if len(carry) or n_windows == 0:
                tail = np.zeros(clip_samples, np.float32)
                tail[: len(carry)] = carry
                pend.append(tail)
            flush(force=True)

        probs = np.concatenate(probs_parts).reshape(-1, 3)
        cluster = np.concatenate(cl_parts).reshape(-1)
        quantum = spec_time_step * RATIO
        n_t = int(np.ceil(total_samples / sr / quantum)) if total_samples else 0
        probs, cluster = probs[:n_t], cluster[:n_t]
        return {"vocal": probs[:, 0], "onset": probs[:, 1],
                "offset": probs[:, 2], "cluster": cluster,
                "quantum": quantum}, total_samples

    def segment_streaming(
        self,
        path: str,
        sr: Optional[int] = None,
        *,
        chunk_seconds: float = 60.0,
        channel_id: Optional[int] = None,
        frame_mode: bool = False,
        min_frequency: Optional[float] = None,
        spec_time_step: Optional[float] = None,
        min_segment_length: Optional[float] = None,
        eps: Optional[float] = None,
        time_per_frame_for_voting: Optional[float] = None,
        consolidation_method: str = "clustering",
        max_length: Optional[int] = None,
        batch_size: int = 4,
        num_trials: int = 1,
        num_beams: int = 4,
        top_k: int = 1,
        top_p: float = 1.0,
        length_penalty: float = 1.0,
        status_monitor: Optional[dict] = None,
        seed: int = 0,
        constrained: bool = False,
        int8_kv: bool = False,
        vocal_threshold: Optional[float] = None,
        cut_threshold: Optional[float] = None,
        boundary_snap: Optional[int] = None,
        gap_cut: Optional[int] = None,
        merge_gap_ms: Optional[float] = None,
        frame_split: Optional[float] = None,
        frame_refine_ms: Optional[float] = None,
        frame_filter: Optional[float] = None,
    ) -> Dict[str, list]:
        """Segment a FILE of arbitrary length at bounded memory.

        Beyond-reference capability: the reference (and :meth:`segment`)
        holds the whole recording in RAM — a one-hour 300 kHz mouse recording
        is ~4.3 GB before features. This streams the file in
        ``chunk_seconds`` chunks (audio/stream.py: WAVs stream natively off
        disk with exact chunked resampling; compressed formats fall back to a
        one-shot decode) and keeps only per-trial carry buffers of at most
        one window each, so peak memory is O(chunk + batch windows) while the
        output is IDENTICAL to ``segment(load_audio(path))`` for
        deterministic decoding (greedy/beam; sampling paths draw different
        but equally valid randomness per flushed batch).

        ``sr=None`` resolves to the model's default_segmentation_config
        ``sr``, else the file's native rate. ``frame_mode=True`` runs the
        decoder-free frame-VAD path (:meth:`segment_from_frames`) instead of
        the seq2seq decode. Post-processing: the token-level pipeline,
        ``merge_gap_ms``, and the learned frame-head knobs (``frame_split`` /
        ``frame_refine_ms`` / ``frame_filter`` — the chain
        scripts/fit_postprocess.py fits) are fully supported; the
        energy-envelope knobs (``split_merged_db`` / ``refine_boundaries_ms``)
        need random access to the raw audio and are SKIPPED with a warning if
        the checkpoint's fitted defaults enable them — use :meth:`segment`
        when those matter more than memory.
        """
        import sys

        from .audio.stream import AudioStream
        from .refine import (apply_frame_postprocess, merge_small_gaps,
                             segments_from_tracks)

        dsc = self.default_segmentation_config
        if min_frequency is None:
            min_frequency = dsc.get("min_frequency", 0)
        if spec_time_step is None:
            spec_time_step = dsc.get("spec_time_step", 0.0025)
        if min_segment_length is None:
            min_segment_length = spec_time_step * RATIO
        if sr is None:
            sr = dsc.get("sr")  # None -> file native rate

        stream = AudioStream(path, sr=sr, chunk_seconds=chunk_seconds,
                             channel_id=channel_id)
        try:
            sr = stream.sr
            time_delta = fft_time_delta(sr)

            if frame_mode:
                if vocal_threshold is None:
                    vocal_threshold = dsc.get("frame_vocal_threshold", 0.5)
                if cut_threshold is None:
                    cut_threshold = dsc.get("frame_cut_threshold", 0.5)
                if boundary_snap is None:
                    boundary_snap = int(dsc.get("frame_boundary_snap", 2))
                if gap_cut is None:
                    gap_cut = int(dsc.get("frame_gap_cut", 0))
                tracks, total_samples = self._stream_frame_tracks(
                    stream, spec_time_step, min_frequency, batch_size,
                    status_monitor)
                return segments_from_tracks(
                    tracks, total_samples / sr, time_delta,
                    self.inverse_cluster_codebook,
                    vocal_threshold=vocal_threshold, cut_threshold=cut_threshold,
                    boundary_snap=boundary_snap,
                    min_segment_length=min_segment_length,
                    precision_bits=self.precision_bits, gap_cut=gap_cut)

            # ----- decode path: same default chain as segment() -----
            if merge_gap_ms is None:
                merge_gap_ms = dsc.get("merge_gap_ms", 0)
            if frame_split is None:
                frame_split = dsc.get("frame_split", 0)
            if frame_refine_ms is None:
                frame_refine_ms = dsc.get("frame_refine_ms", 0)
            if frame_filter is None:
                frame_filter = dsc.get("frame_filter", 0)
            if eps is None:
                eps = spec_time_step * RATIO * 4
            if time_per_frame_for_voting is None:
                time_per_frame_for_voting = spec_time_step
            if max_length is None:
                max_length = int(dsc.get("max_length", 448))
            if dsc.get("split_merged_db") or dsc.get("refine_boundaries_ms"):
                print("Warning: the checkpoint's fitted split_merged_db/"
                      "refine_boundaries_ms post-processing needs random access "
                      "to the raw audio and is skipped in streaming mode; use "
                      "segment() if it matters more than memory.",
                      file=sys.stderr)

            clip_duration = self.total_spec_columns * spec_time_step
            clip_samples = int(clip_duration * sr)
            frontend = Frontend(sr, spec_time_step, min_frequency)

            # per-trial carry buffers, pre-seeded with the trial's shifted
            # zero left-pad — the streaming counterpart of slice_audio_windows
            # (reference model.py:127-166); window content and meta are identical
            pad_time, carries, win_count = [], [], []
            for trial_id in range(num_trials):
                p = (np.round(clip_duration * trial_id / num_trials
                              / spec_time_step) * spec_time_step)
                pad_time.append(p)
                carries.append(np.zeros(int(p * sr), np.float32))
                win_count.append(0)

            token_lists: List[List[int]] = []
            meta: List[Tuple[int, float, float]] = []
            pend_clips: List[np.ndarray] = []
            pend_meta: List[Tuple[int, float, float]] = []
            total_samples = 0
            flush_idx = 0

            # fitted frame post-processing: emit the frame tracks from the
            # decode pass's own encoder run over trial-0 windows instead of
            # a second streaming pass over the file (same fusion as
            # segment(); the speculative fused program doesn't expose the
            # encoder output, so it keeps the two-pass fallback)
            use_spec = (getattr(self, "draft", None) is not None
                        and num_beams <= 1 and top_k <= 1 and not constrained
                        and top_p >= 1.0 and not int8_kv)
            need_frames = ((frame_split or frame_refine_ms or frame_filter)
                           and "frame_head" in self.params)
            fuse_frames = need_frames and not use_spec
            probs0_parts: List[np.ndarray] = []
            cl0_parts: List[np.ndarray] = []

            def flush(force=False):
                nonlocal flush_idx
                while len(pend_clips) >= batch_size or (force and pend_clips):
                    take = pend_clips[:batch_size]
                    del pend_clips[:batch_size]
                    # a distinct seed per flushed batch so sampling paths don't
                    # repeat the same draws (deterministic decodes are unaffected)
                    gen = self._generate_tokens(
                        np.stack(take), frontend, batch_size, max_length,
                        num_beams, top_k, length_penalty, seed + flush_idx, None,
                        constrained=constrained, int8_kv=int8_kv, top_p=top_p,
                        collect_frames=fuse_frames)
                    take_meta = pend_meta[:len(take)]
                    if fuse_frames:
                        tokens, probs, cl = gen
                        # trial-0 rows arrive in time order across flushes
                        rows = [i for i, m in enumerate(take_meta)
                                if m[0] == 0]
                        if rows:
                            probs0_parts.append(probs[rows])
                            cl0_parts.append(cl[rows])
                    else:
                        tokens = gen
                    token_lists.extend(tokens)
                    meta.extend(take_meta)
                    del pend_meta[:len(take)]
                    flush_idx += 1

            for chunk in stream:
                total_samples += len(chunk)
                for t in range(num_trials):
                    buf = (np.concatenate([carries[t], chunk])
                           if len(carries[t]) else chunk)
                    nwin = len(buf) // clip_samples
                    for k in range(nwin):
                        pend_clips.append(
                            buf[k * clip_samples:(k + 1) * clip_samples])
                        pend_meta.append(
                            (t, win_count[t] * clip_samples / sr - pad_time[t],
                             clip_samples / sr))
                        win_count[t] += 1
                    carries[t] = buf[nwin * clip_samples:].copy()
                flush()
                if status_monitor is not None and stream.duration:
                    status_monitor["progress"] = int(np.round(min(
                        total_samples / sr / stream.duration, 1.0) * 100))

            # trailing partial window per trial; a trial with no windows at all
            # (empty audio) still emits one (reference model.py:145-146)
            for t in range(num_trials):
                if len(carries[t]) or win_count[t] == 0:
                    tail = np.zeros(clip_samples, np.float32)
                    tail[: len(carries[t])] = carries[t]
                    pend_clips.append(tail)
                    pend_meta.append(
                        (t, win_count[t] * clip_samples / sr - pad_time[t],
                         len(carries[t]) / sr))
            flush(force=True)

            audio_duration = total_samples / sr
            final = self._parse_generation(
                token_lists, meta, min_segment_length, audio_duration,
                spec_time_step, num_trials, eps, time_per_frame_for_voting,
                consolidation_method,
            )
            final = _blur_correct_and_dedup(final, time_delta)

            if merge_gap_ms:
                final = merge_small_gaps(final, gap_s=merge_gap_ms / 1000.0)

            if need_frames:
                if fuse_frames:
                    tracks = _tracks_from_window_frames(
                        np.concatenate(probs0_parts),
                        np.concatenate(cl0_parts),
                        audio_duration, spec_time_step)
                else:
                    # speculative fallback: second pass over the file
                    tracks, _ = self._stream_frame_tracks(
                        stream, spec_time_step, min_frequency, batch_size)
                final = apply_frame_postprocess(
                    final, tracks, time_delta, frame_split=frame_split,
                    frame_refine_ms=frame_refine_ms, frame_filter=frame_filter,
                    min_len_s=min_segment_length)

            return _round_and_rededup(final, self.precision_bits)
        finally:
            stream.close()

    # ------------------------------------------------------------------- parsing

    def _parse_generation(
        self,
        token_lists: List[List[int]],
        meta: List[Tuple[int, float, float]],
        min_segment_length: float,
        audio_duration: float,
        spec_time_step: float,
        num_trials: int,
        eps: float,
        time_per_frame_for_voting: float,
        consolidation_method: str,
    ) -> Dict[str, list]:
        """(reference model.py:210-281)"""
        inverse = self.inverse_cluster_codebook
        per_trial_windows: Dict[int, List[List[List]]] = {}
        for tokens, (trial_id, offset_time, _dur) in zip(token_lists, meta):
            segs = codec.parse_segments_from_ids(
                tokens, spec_time_step, inverse,
                extra_tokens=self.config.extra_tokens)
            for s in segs:
                s[0] += offset_time
                s[1] += offset_time
            per_trial_windows.setdefault(trial_id, []).append(segs)

        trials_results = []
        for trial_id in per_trial_windows:
            merged = merge_window_boundaries(per_trial_windows[trial_id])
            for s in merged:
                s[0] = max(0.0, s[0])
                s[1] = min(s[1], audio_duration)
            merged.sort(key=lambda s: s[0])
            merged = [s for s in merged if s[1] - s[0] >= min_segment_length]
            trials_results.append(
                {
                    "onset": [s[0] for s in merged],
                    "offset": [s[1] for s in merged],
                    "cluster": [s[2] for s in merged],
                }
            )

        # thread-local: segment() runs on the caller's thread even behind a
        # BatchingSegmenter, so concurrent service requests each see their
        # own request's consolidation stats
        tls = self.__dict__.setdefault("_consolidation_tls",
                                       threading.local())
        tls.stats = None
        if num_trials == 1:
            final = trials_results[0]
        elif consolidation_method == "clustering":
            min_samples = max(2, int(np.ceil(num_trials * 0.5)))
            stats = {}
            final = consolidate_by_clustering(trials_results, eps, min_samples,
                                              stats=stats)
            stats["noise_fraction"] = (stats["n_noise"] / stats["n_input"]
                                       if stats["n_input"] else 0.0)
            # gate scales with num_trials: even sparse audio (>=2 segments
            # per trial on average) can exhibit the collapse — observed on a
            # real fixture with 6 input segments all discarded
            stats["low_agreement"] = (stats["n_input"] >= 2 * num_trials
                                      and stats["noise_fraction"] > 0.5)
            tls.stats = stats
            if stats["low_agreement"]:
                # the recall-collapse mode: trials disagree so much that
                # DBSCAN discards most segments as noise (RESULTS.md —
                # frame F1 0.41 at trials=3 vs 0.71 at trials=1 on a weak
                # model). Reference anchor: model.py:291-337.
                import warnings

                warnings.warn(
                    f"multi-trial consolidation discarded "
                    f"{stats['n_noise']}/{stats['n_input']} segments "
                    f"({stats['noise_fraction']:.0%}) as cross-trial "
                    f"disagreement — the model's predictions are unstable "
                    f"under window shifts; num_trials=1 will likely have "
                    f"much better recall", stacklevel=2)
        else:
            final = consolidate_by_voting(
                trials_results, time_per_frame_for_voting, self.cluster_codebook
            )

        final["onset"] = [float(np.round(t, self.precision_bits)) for t in final["onset"]]
        final["offset"] = [float(np.round(t, self.precision_bits)) for t in final["offset"]]
        return final

    # ---------------------------------------------------------------- public API

    @property
    def last_consolidation_stats(self) -> Optional[dict]:
        """Cross-trial agreement stats of THIS thread's most recent
        ``segment()`` call with ``num_trials > 1`` and clustering
        consolidation (None otherwise): ``n_input`` / ``n_noise`` /
        ``n_clusters`` / ``noise_fraction`` / ``low_agreement``. Thread-local
        so concurrent service requests don't read each other's stats."""
        tls = self.__dict__.get("_consolidation_tls")
        return getattr(tls, "stats", None) if tls is not None else None

    def segment(
        self,
        audio: np.ndarray,
        sr: int,
        min_frequency: Optional[float] = None,
        spec_time_step: Optional[float] = None,
        min_segment_length: Optional[float] = None,
        eps: Optional[float] = None,
        time_per_frame_for_voting: Optional[float] = None,
        consolidation_method: str = "clustering",
        max_length: Optional[int] = None,
        batch_size: int = 4,
        num_trials: int = 1,
        num_beams: int = 4,
        top_k: int = 1,
        top_p: float = 1.0,
        length_penalty: float = 1.0,
        status_monitor: Optional[dict] = None,
        seed: int = 0,
        constrained: bool = False,
        int8_kv: bool = False,
        refine_boundaries_ms: Optional[float] = None,
        split_merged_db: Optional[float] = None,
        merge_gap_ms: Optional[float] = None,
        frame_split: Optional[float] = None,
        frame_refine_ms: Optional[float] = None,
        frame_filter: Optional[float] = None,
    ) -> Dict[str, list]:
        """Segment one audio array -> {"onset": [...], "offset": [...], "cluster": [...]}.

        Default resolution follows reference model.py:398-425: explicit arg >
        model's default_segmentation_config > literal fallback.
        """
        if min_frequency is None:
            min_frequency = self.default_segmentation_config.get("min_frequency", 0)
        if spec_time_step is None:
            spec_time_step = self.default_segmentation_config.get("spec_time_step", 0.0025)
        # Post-processing knobs follow the same precedence chain; a fitted
        # combination (scripts/fit_postprocess.py) stored in the checkpoint's
        # default_segmentation_config activates by default. Pass an explicit
        # 0 to disable a stage the checkpoint enables.
        if merge_gap_ms is None:
            merge_gap_ms = self.default_segmentation_config.get("merge_gap_ms", 0)
        if split_merged_db is None:
            split_merged_db = self.default_segmentation_config.get("split_merged_db", 0)
        if refine_boundaries_ms is None:
            refine_boundaries_ms = self.default_segmentation_config.get(
                "refine_boundaries_ms", 0)
        if frame_split is None:
            frame_split = self.default_segmentation_config.get("frame_split", 0)
        if frame_refine_ms is None:
            frame_refine_ms = self.default_segmentation_config.get(
                "frame_refine_ms", 0)
        if frame_filter is None:
            frame_filter = self.default_segmentation_config.get(
                "frame_filter", 0)
        if min_segment_length is None:
            min_segment_length = spec_time_step * RATIO
        if eps is None:
            eps = spec_time_step * RATIO * 4
        if time_per_frame_for_voting is None:
            time_per_frame_for_voting = spec_time_step
        if max_length is None:
            # train.py stamps its --max_length into the checkpoint's defaults:
            # a model finetuned at 100 decodes with the budget it trained at
            # (448-token programs compile ~10x slower and buy nothing there)
            max_length = int(self.default_segmentation_config.get(
                "max_length", 448))

        audio = np.asarray(audio, dtype=np.float32)
        clips, meta = self.slice_audio_windows(audio, sr, spec_time_step, num_trials)

        # Fitted frame post-processing needs the frame tracks; emit them
        # from the decode pass's own encoder run over the trial-0 windows
        # (identical to frame_probs' windows) instead of a second full
        # encoder pass. Speculative decoding uses a different fused program
        # that doesn't expose the encoder output — it falls back to the
        # two-pass frame_probs below.
        use_spec = (getattr(self, "draft", None) is not None
                    and num_beams <= 1 and top_k <= 1 and not constrained
                    and top_p >= 1.0 and not int8_kv)
        need_frames = ((frame_split or frame_refine_ms or frame_filter)
                       and "frame_head" in self.params)
        fuse_frames = need_frames and not use_spec

        frontend = Frontend(sr, spec_time_step, min_frequency)
        gen = self._generate_tokens(
            clips, frontend, batch_size, max_length, num_beams, top_k,
            length_penalty, seed, status_monitor, constrained=constrained,
            int8_kv=int8_kv, top_p=top_p, collect_frames=fuse_frames,
        )
        if fuse_frames:
            token_lists, all_probs, all_cl = gen
            n0 = sum(1 for m in meta if m[0] == 0)  # trial-0 window count
            tracks = _tracks_from_window_frames(
                all_probs[:n0], all_cl[:n0], len(audio) / sr, spec_time_step)
        else:
            token_lists = gen

        final = self._parse_generation(
            token_lists, meta, min_segment_length, len(audio) / sr,
            spec_time_step, num_trials, eps, time_per_frame_for_voting,
            consolidation_method,
        )

        time_delta = fft_time_delta(sr)
        final = _blur_correct_and_dedup(final, time_delta)

        # Opt-in post-processing chain (merge -> split -> refine; beyond
        # reference, see refine.py for rationale and the canonical order).
        from .refine import apply_frame_postprocess, apply_postprocess

        final = apply_postprocess(
            final, audio, sr, merge_gap_ms=merge_gap_ms,
            split_merged_db=split_merged_db,
            refine_boundaries_ms=refine_boundaries_ms,
            min_len_s=min_segment_length)

        # Learned (frame-head) post-processing: split decoder merges at
        # event-track cuts, snap boundaries to event peaks (refine.py). The
        # tracks normally come for free from the decode pass above
        # (fuse_frames); only the speculative path pays a second encoder
        # pass via frame_probs.
        if need_frames:
            if not fuse_frames:
                tracks = self.frame_probs(
                    audio, sr, spec_time_step=spec_time_step,
                    min_frequency=min_frequency, batch_size=batch_size)
            final = apply_frame_postprocess(
                final, tracks, time_delta, frame_split=frame_split,
                frame_refine_ms=frame_refine_ms, frame_filter=frame_filter,
                min_len_s=min_segment_length)

        return _round_and_rededup(final, self.precision_bits)

    # ------------------------------------------------------------------- scoring

    def segment_score(self, prediction, label, target_cluster=None, tolerance=None):
        """(reference model.py:493-516)"""
        if tolerance is None:
            tolerance = self.default_segmentation_config.get("spec_time_step", 0.0025) * 4
        return _segment_score(prediction, label, target_cluster, tolerance)

    def frame_score(self, prediction, label, target_cluster=None,
                    time_per_frame_for_scoring=None):
        """(reference model.py:518-569)"""
        if time_per_frame_for_scoring is None:
            time_per_frame_for_scoring = min(
                0.001, self.default_segmentation_config.get("spec_time_step", 0.0025)
            )
        return _frame_score(prediction, label, target_cluster,
                            time_per_frame_for_scoring)
