import jax

from whisperseg_tpu.parallel.multihost import initialize, per_host_batch_slice


def test_initialize_noop_on_single_host():
    initialize()  # must not raise on single host


def test_per_host_batch_slice_single_host():
    s = per_host_batch_slice(32)
    assert (s.start, s.stop) == (0, 32 // jax.process_count())


def test_two_process_distributed_training_step(tmp_path):
    """REAL multi-process run: two OS processes, 4 virtual devices each, join
    the distributed runtime through multihost.initialize and execute one
    data-parallel training step over the global 8-device mesh — the gradient
    all-reduce crosses the process boundary (the DCN path of a TPU pod).
    Both processes must report the identical finite loss."""
    import os
    import re
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        m = re.search(r"MULTIHOST_LOSS ([0-9.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1]
    assert 0 < losses[0] < 100


def test_per_host_batch_slice_rejects_indivisible_batch():
    from whisperseg_tpu.parallel.multihost import per_host_batch_slice

    import pytest

    # single-process jax: divisible works, indivisible raises
    assert per_host_batch_slice(8) == slice(0, 8)
    import jax

    if jax.process_count() == 1:
        assert per_host_batch_slice(7) == slice(0, 7)  # 7 % 1 == 0
