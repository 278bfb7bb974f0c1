"""Continuous cross-request window batching for serving.

The reference serializes HTTP requests with a global semaphore — one request
owns the model at a time (reference segment_service.py:58-60,110). On TPU the
decode step cost is dominated by per-iteration latency, so batching windows
*across concurrent requests* is nearly free throughput: a single worker thread
drains a queue of window-work items, groups items that share the same
(frontend, decode-parameter) signature into one fused device call up to
``max_batch_size`` windows, and distributes the token lists back to the waiting
requests.

``BatchingSegmenter`` is a drop-in ``Segmenter``: ``segment()`` keeps its exact
semantics (slicing, parsing, consolidation all happen on the calling thread);
only the device-facing ``_generate_tokens`` is routed through the shared
batcher.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..segmenter import Segmenter


@dataclass
class _WorkItem:
    clips: np.ndarray                      # [n, clip_samples]
    key: Tuple                             # batching signature
    frontend: object
    max_length: int
    num_beams: int
    top_k: int
    length_penalty: float
    seed: int
    constrained: bool = False
    int8_kv: bool = False
    top_p: float = 1.0
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[List[List[int]]] = None
    error: Optional[BaseException] = None


class BatchingSegmenter(Segmenter):
    """Segmenter with a continuous cross-request window batcher."""

    def __init__(self, *args, max_batch_size: int = 32,
                 max_wait_ms: float = 5.0, min_bucket: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        # device calls pad to the smallest power-of-two bucket >= the real
        # window count (floor ``min_bucket``, cap ``max_batch_size``) instead
        # of always padding to max_batch_size: a lightly-fused group then
        # runs a narrower (faster-per-iteration) decode program, at the cost
        # of one compile per bucket actually seen (r4 serving bench: seq2seq
        # CB was a wash partly because every call paid the full-width decode)
        self.min_bucket = min_bucket
        self._queue: "queue.Queue[_WorkItem]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _bucket(self, n: int) -> int:
        b = max(self.min_bucket, 1)
        if self.mesh is not None:
            # a sharded batch axis must divide over the mesh's devices
            b = max(b, int(np.prod(self.mesh.devices.shape)))
        while b < n:
            b *= 2
        return min(b, self.max_batch_size)

    # --------------------------------------------------------------- requests

    def _generate_tokens(self, clips, frontend, batch_size, max_length,
                         num_beams, top_k, length_penalty, seed,
                         status_monitor, constrained=False, int8_kv=False,
                         top_p=1.0, collect_frames=False):
        if collect_frames:
            # the fused decode+frame-head program returns per-request frame
            # tracks that cannot be regrouped across fused batches; run it
            # directly on the caller's thread (same serialization contract
            # as frame_probs — Segmenter's per-instance frame lock)
            return super()._generate_tokens(
                clips, frontend, batch_size, max_length, num_beams, top_k,
                length_penalty, seed, status_monitor, constrained=constrained,
                int8_kv=int8_kv, top_p=top_p, collect_frames=True)
        # seed participates in the grouping key: the worker decodes a fused
        # group with the HEAD item's seed, so two sampled requests with
        # different explicit seeds must not share a batch (greedy requests —
        # top_k == 1 and top_p == 1 — ignore the seed and may still fuse)
        sampled = top_k > 1 or float(top_p) < 1.0
        key = (frontend.sr, frontend.spec_time_step, frontend.min_frequency,
               frontend.max_frequency, clips.shape[1], max_length, num_beams,
               top_k, float(length_penalty), constrained, int8_kv,
               float(top_p), seed if sampled else 0)
        item = _WorkItem(np.asarray(clips, np.float32), key, frontend,
                         max_length, num_beams, top_k, float(length_penalty),
                         seed, constrained, int8_kv, float(top_p))
        self._queue.put(item)
        item.done.wait()
        if item.error is not None:
            raise item.error
        if status_monitor is not None:
            status_monitor["progress"] = 100
        return item.result

    # ----------------------------------------------------------------- worker

    def _collect(self) -> List[_WorkItem]:
        """One head item, then same-key items until the batch is full or the
        wait window closes."""
        head = self._queue.get()
        group = [head]
        total = head.clips.shape[0]
        deadline = self.max_wait_ms / 1000.0
        while total < self.max_batch_size:
            try:
                nxt = self._queue.get(timeout=deadline)
            except queue.Empty:
                break
            if nxt.key != head.key:
                # different signature: park it back for the next round
                self._queue.put(nxt)
                break
            group.append(nxt)
            total += nxt.clips.shape[0]
        return group

    def _run(self):
        import jax
        import jax.numpy as jnp

        while True:
            group = self._collect()
            head = group[0]
            try:
                fn = self._segment_fn(head.frontend, head.max_length,
                                      head.num_beams, head.top_k,
                                      head.constrained, head.int8_kv,
                                      head.top_p)
                clips = np.concatenate([it.clips for it in group], axis=0)
                n = clips.shape[0]
                # each item's [start, start+len) slice of the fused axis
                starts = np.cumsum([0] + [it.clips.shape[0] for it in group])
                outs: List[List[int]] = []

                def release_ready():
                    # early per-item release: an item whose windows are all
                    # decoded returns to its waiter NOW — its parsing /
                    # consolidation overlaps the remaining chunks' device
                    # time instead of being held hostage by them
                    for it, s in zip(group, starts):
                        k = it.clips.shape[0]
                        if not it.done.is_set() and s + k <= len(outs):
                            it.result = outs[s:s + k]
                            it.done.set()

                rng = jax.random.PRNGKey(head.seed)
                pos = 0
                while pos < n:
                    real = min(n - pos, self.max_batch_size)
                    batch = self._bucket(real)
                    real = min(real, batch)
                    chunk = clips[pos:pos + real]
                    if real < batch:
                        chunk = np.concatenate(
                            [chunk, np.zeros((batch - real,) + chunk.shape[1:],
                                             chunk.dtype)])
                    rng, sub = jax.random.split(rng)
                    chunk_dev = jnp.asarray(chunk)
                    if self.mesh is not None:
                        from ..parallel.mesh import batch_sharding

                        chunk_dev = jax.device_put(chunk_dev,
                                                   batch_sharding(self.mesh))
                    tokens = fn(self.params, chunk_dev, sub,
                                head.length_penalty)
                    outs += np.asarray(tokens)[:real].tolist()
                    pos += real
                    release_ready()
            except BaseException as e:  # propagate to still-waiting items
                for it in group:
                    if not it.done.is_set():
                        it.error = e
                        it.done.set()
