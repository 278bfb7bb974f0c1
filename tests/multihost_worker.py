"""Worker for the real multi-process test (tests/test_multihost.py).

Launched twice by the parent test; each process owns 4 virtual CPU devices
and joins the distributed runtime via whisperseg_tpu.parallel.multihost —
the same call path a TPU pod host uses. Runs ONE data-parallel training step
over the 8-device global mesh (gradient all-reduce crosses the process
boundary over TCP, the DCN stand-in) and prints the loss; the parent asserts
both processes print the same finite value.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from whisperseg_tpu.parallel.multihost import (
        initialize,
        per_host_batch_slice,
    )

    initialize(coordinator, n_proc, pid)
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 4 * n_proc, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np

    from whisperseg_tpu.models import WhisperConfig, init_params
    from whisperseg_tpu.parallel import batch_sharding, make_mesh, shard_params
    from whisperseg_tpu.training.trainer import build_train_step, make_optimizer

    cfg = WhisperConfig(
        d_model=64, encoder_layers=1, decoder_layers=1, num_heads=2, d_ff=128,
        vocab_size=1024, max_source_positions=16, max_target_positions=16,
        total_spec_columns=32, compute_dtype="float32",
    )
    mesh = make_mesh(len(jax.devices()))
    params = shard_params(mesh, init_params(jax.random.PRNGKey(0), cfg), cfg)
    opt, _ = make_optimizer(params, 1e-4, 0.01, 10, 100, "linear",
                            freeze_encoder=False)
    opt_state = opt.init(params)
    step = build_train_step(cfg, opt)

    global_batch = 8
    rng = np.random.default_rng(0)  # same seed on every process
    feats = rng.standard_normal((global_batch, 80, 32)).astype(np.float32)
    ids = np.zeros((global_batch, 8), np.int32)
    labels = np.ones((global_batch, 8), np.int32)
    shd = batch_sharding(mesh)
    local = per_host_batch_slice(global_batch)

    def to_global(x):
        return jax.make_array_from_process_local_data(shd, x[local])

    batch = {"input_features": to_global(feats),
             "decoder_input_ids": to_global(ids),
             "labels": to_global(labels)}
    _, _, loss = step(params, opt_state, batch, jax.random.PRNGKey(1))
    print(f"MULTIHOST_LOSS {float(np.asarray(loss)):.6f}", flush=True)


if __name__ == "__main__":
    main()
