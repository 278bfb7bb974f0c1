"""Continuous cross-request batching: correctness and actual batch sharing."""

import threading

import numpy as np
import pytest

import jax

from whisperseg_tpu.models import WhisperConfig, init_params
from whisperseg_tpu.segmenter import Segmenter
from whisperseg_tpu.services.batching import BatchingSegmenter


def tiny_cfg():
    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=50, max_target_positions=32,
        total_spec_columns=100, compute_dtype="float32",
    )
    cfg.cluster_codebook = {"v": 0}
    return cfg


@pytest.fixture(scope="module")
def pair():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    plain = Segmenter(params, cfg, inference_dtype=None)
    batched = BatchingSegmenter(params, cfg, inference_dtype=None,
                                max_batch_size=8, max_wait_ms=20)
    return plain, batched


def test_batched_matches_plain(pair):
    plain, batched = pair
    audio = np.random.RandomState(0).randn(24000).astype(np.float32) * 0.1
    p1 = plain.segment(audio, 16000, spec_time_step=0.01, max_length=16,
                       num_beams=1, batch_size=8)
    p2 = batched.segment(audio, 16000, spec_time_step=0.01, max_length=16,
                         num_beams=1, batch_size=8)
    assert p1 == p2


def test_concurrent_requests_share_batches(pair):
    plain, batched = pair
    calls = []
    orig_fn_cache = batched._segment_fn_cache if hasattr(
        batched, "_segment_fn_cache") else None

    # wrap the fused fn to record per-call batch sizes
    fn_key_fn = batched._segment_fn

    def spying_segment_fn(frontend, max_length, num_beams, top_k,
                          constrained=False, int8_kv=False, top_p=1.0):
        fn = fn_key_fn(frontend, max_length, num_beams, top_k, constrained,
                       int8_kv, top_p)

        def wrapped(params, clips, rng, lp):
            calls.append(int(clips.shape[0]))
            return fn(params, clips, rng, lp)

        return wrapped

    batched._segment_fn = spying_segment_fn  # type: ignore

    rng = np.random.RandomState(1)
    audios = [rng.randn(16000).astype(np.float32) * 0.1 for _ in range(6)]
    expected = [plain.segment(a, 16000, spec_time_step=0.01, max_length=16,
                              num_beams=1) for a in audios]

    results = [None] * 6

    def worker(i):
        results[i] = batched.segment(audios[i], 16000, spec_time_step=0.01,
                                     max_length=16, num_beams=1)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for got, want in zip(results, expected):
        assert got == want
    # 6 concurrent single-window requests must have shared device calls
    assert len(calls) < 6, calls


def test_batched_error_propagates(pair):
    _, batched = pair
    with pytest.raises(Exception):
        # absurd spec_time_step -> hop 0 -> error must reach the caller,
        # not kill the worker
        batched.segment(np.zeros(1000, np.float32), 16000, spec_time_step=1e-9)
    # worker still alive afterwards
    audio = np.zeros(16000, np.float32)
    out = batched.segment(audio, 16000, spec_time_step=0.01, max_length=16,
                          num_beams=1)
    assert set(out) == {"onset", "offset", "cluster"}


def test_collect_frames_bypasses_fusion():
    """The fused decode+frame-head program returns per-request frame tracks
    that cannot be regrouped across fused batches, so collect_frames=True
    must take the direct (non-batching) path and return the identical
    (tokens, probs, clusters) triple as a plain Segmenter."""
    cfg = tiny_cfg()
    cfg.frame_head = True
    cfg.frame_head_clusters = 1
    params = init_params(jax.random.PRNGKey(1), cfg)
    plain = Segmenter(params, cfg, inference_dtype=None)
    batched = BatchingSegmenter(params, cfg, inference_dtype=None,
                                max_batch_size=8, max_wait_ms=20)
    from whisperseg_tpu.audio.frontend import Frontend

    frontend = Frontend(16000, 0.01, 0)
    clips = (np.random.RandomState(2).randn(3, 16000) * 0.1
             ).astype(np.float32)
    t1, p1, c1 = plain._generate_tokens(
        clips, frontend, 4, 16, 1, 1, 1.0, 0, None, collect_frames=True)
    t2, p2, c2 = batched._generate_tokens(
        clips, frontend, 4, 16, 1, 1, 1.0, 0, None, collect_frames=True)
    assert t1 == t2
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(c1, c2)


def test_bucket_sizes():
    """Device calls pad to the smallest power-of-two bucket, not max."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    b = BatchingSegmenter(params, cfg, inference_dtype=None,
                          max_batch_size=32, max_wait_ms=5, min_bucket=4)
    assert [b._bucket(n) for n in (1, 4, 5, 8, 9, 17, 40)] == \
        [4, 4, 8, 8, 16, 32, 32]


def test_early_release_returns_first_item_before_group_end(pair):
    """An item fully decoded in an earlier chunk is released to its waiter
    while later chunks are still on the device (no group-end hostage)."""
    import time

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    batched = BatchingSegmenter(params, cfg, inference_dtype=None,
                                max_batch_size=4, max_wait_ms=100,
                                min_bucket=4)

    fn_key_fn = batched._segment_fn

    def slow_segment_fn(*a, **k):
        fn = fn_key_fn(*a, **k)

        def wrapped(params, clips, rng, lp):
            time.sleep(0.25)  # make per-chunk device time observable
            return fn(params, clips, rng, lp)

        return wrapped

    batched._segment_fn = slow_segment_fn  # type: ignore

    rng = np.random.RandomState(3)
    # two 3-window requests with one shared key -> one group, two chunks
    # (window = total_spec_columns * spec_time_step = 1 s = 16000 samples)
    audios = [rng.randn(3 * 16000).astype(np.float32) * 0.1
              for _ in range(2)]
    done_at = [None, None]

    def worker(i):
        batched.segment(audios[i], 16000, spec_time_step=0.01, max_length=16,
                        num_beams=1)
        done_at[i] = time.monotonic()

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    threads[0].start()
    time.sleep(0.02)  # deterministic queue order: request 0 is the head
    threads[1].start()
    for t in threads:
        t.join()
    # head item decodes in chunk 1 and must return ~a full chunk earlier
    assert done_at[0] < done_at[1] - 0.1, done_at
