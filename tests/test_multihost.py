import jax

from whisperseg_tpu.parallel.multihost import initialize, per_host_batch_slice


def test_initialize_noop_on_single_host():
    initialize()  # must not raise on single host


def test_per_host_batch_slice_single_host():
    s = per_host_batch_slice(32)
    assert (s.start, s.stop) == (0, 32 // jax.process_count())
