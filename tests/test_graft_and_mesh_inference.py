"""Driver entry points and mesh-sharded inference on the virtual device mesh."""

import numpy as np
import pytest

import jax


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    assert compiled is not None


@pytest.mark.parametrize("n", [8, 4, 3])
def test_dryrun_multichip(n):
    import __graft_entry__ as ge

    if len(jax.devices()) < n:
        pytest.skip("not enough virtual devices")
    ge.dryrun_multichip(n)


def test_mesh_sharded_segmenter():
    from whisperseg_tpu.models import WhisperConfig, init_params
    from whisperseg_tpu.parallel import make_mesh
    from whisperseg_tpu.segmenter import Segmenter

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4, d_ff=128,
        vocab_size=1024, max_source_positions=50, max_target_positions=32,
        total_spec_columns=100, compute_dtype="float32",
    )
    cfg.cluster_codebook = {"v": 0}
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(4)

    seg_plain = Segmenter(params, cfg, inference_dtype=None)
    seg_mesh = Segmenter(params, cfg, inference_dtype=None, mesh=mesh)

    audio = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
    # batch 4 divides over 4 devices
    p1 = seg_plain.segment(audio, 16000, spec_time_step=0.01, max_length=16,
                           batch_size=4, num_beams=1)
    p2 = seg_mesh.segment(audio, 16000, spec_time_step=0.01, max_length=16,
                          batch_size=4, num_beams=1)
    assert p1 == p2
