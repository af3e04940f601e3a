"""Multi-chip decode: utterance batch sharded over an 8-virtual-device mesh
must reproduce the single-device generation exactly."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import init_params
from qpnet_tpu.models.generate import batch_fast_generate
from qpnet_tpu.parallel import make_mesh


def test_sharded_decode_matches_single_device():
    assert len(jax.devices()) == 8
    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      upsampling_factor=5)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, F = 8, 10
    n = F * cfg.upsampling_factor - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F * cfg.upsampling_factor), 2.0, np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)

    single = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=3,
                                 engine="xla", compute_dtype=jnp.float32)
    mesh = make_mesh(8)
    sharded = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=3,
                                  engine="xla", compute_dtype=jnp.float32,
                                  mesh=mesh)
    np.testing.assert_array_equal(np.stack(single), np.stack(sharded))


def test_sharded_pallas_decode_matches_single_chip():
    """The pallas engine under the mesh (shard_map, one kernel per chip,
    interpret mode on the virtual CPU devices) must reproduce the
    single-chip pallas engine bit-for-bit — the counter PRNG keys off
    GLOBAL utterance indices, so sharding must not change the streams."""
    assert len(jax.devices()) == 8
    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      upsampling_factor=4)
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B, F = 8, 10
    n = F * cfg.upsampling_factor - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.repeat(rng.uniform(1.0, 3.0, (B, F)), cfg.upsampling_factor,
                  axis=1).astype(np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)

    single = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=7,
                                 engine="pallas", interpret=True)
    mesh = make_mesh(4)  # B=8 over 4 devices: 2 utterances per chip
    sharded = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=7,
                                  engine="pallas", interpret=True,
                                  mesh=mesh)
    np.testing.assert_array_equal(np.stack(single), np.stack(sharded))


@pytest.mark.slow
def test_sharded_pallas_per_chip_split_matches_single_chip(monkeypatch):
    """A per-chip batch above the throughput-optimal kernel size splits
    into balanced sub-batches INSIDE the shard_map (sequentially per chip)
    instead of dropping to the scan engine — and stays bit-identical to
    the unsplit single-chip pallas engine (global b_offset per slice)."""
    from qpnet_tpu.models import generate as G
    assert len(jax.devices()) == 8
    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      upsampling_factor=4)
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    B, F = 24, 8
    n = F * cfg.upsampling_factor - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.repeat(rng.uniform(1.0, 3.0, (B, F)), cfg.upsampling_factor,
                  axis=1).astype(np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)

    single = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=11,
                                 engine="pallas", interpret=True)
    # 2 devices x 12 local utterances with an 8-slot optimum: each chip
    # must run ragged balanced slices (8 + 4-padded-to-8), sequentially
    monkeypatch.setattr(G, "PALLAS_OPT_BATCH", 8)
    monkeypatch.setattr(G, "pallas_engine_available",
                        lambda *a, **k: True)
    seen = {}
    real_mesh_path = G._pallas_mesh_path

    def spy_mesh_path(*args, **kw):
        seen["sub_B"] = args[-1] if not kw else kw.get("sub_B", args[-1])
        return real_mesh_path(*args, **kw)

    monkeypatch.setattr(G, "_pallas_mesh_path", spy_mesh_path)
    mesh = make_mesh(2)
    sharded = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=11,
                                  engine="pallas", interpret=True,
                                  mesh=mesh)
    assert seen["sub_B"] == 8, f"expected per-chip split, got {seen}"
    np.testing.assert_array_equal(np.stack(single), np.stack(sharded))


@pytest.mark.slow
def test_sharded_pallas_pads_ragged_batch():
    """B not divisible by the mesh size: the batch pads internally and the
    padding rows are dropped from the result."""
    assert len(jax.devices()) == 8
    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      upsampling_factor=4)
    params = init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    B, F = 5, 8
    n = F * cfg.upsampling_factor - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F * cfg.upsampling_factor), 2.0, np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)

    single = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=5,
                                 engine="pallas", interpret=True)
    mesh = make_mesh(4)
    sharded = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=5,
                                  engine="pallas", interpret=True,
                                  mesh=mesh)
    assert len(sharded) == B
    np.testing.assert_array_equal(np.stack(single), np.stack(sharded))


def test_sharded_decode_pads_odd_batch():
    """A batch not divisible by the mesh size (any list tail) pads by
    replicating the last utterance and still matches the single-device
    output row-for-row."""
    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      upsampling_factor=5)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    B, F = 3, 6
    n = F * cfg.upsampling_factor - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F * cfg.upsampling_factor), 2.0, np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)

    single = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=3,
                                 engine="xla", compute_dtype=jnp.float32,
                                 mode="argmax")
    mesh = make_mesh(2)
    sharded = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=3,
                                  engine="xla", compute_dtype=jnp.float32,
                                  mode="argmax", mesh=mesh)
    np.testing.assert_array_equal(np.stack(single), np.stack(sharded))


@pytest.mark.slow
def test_sharded_streaming_pads_local_batch_to_sublane(monkeypatch):
    """Ring-streaming-active mesh decode must pad so the PER-CHIP batch is
    8-aligned (Mosaic HBM<->VMEM window DMAs), not just a multiple of the
    mesh size: n_dev=4 with B=20 gives local_B=5, which the compiled
    kernel would reject — the mesh path pads B to 32 (8/chip) and slices
    the pad off, bit-identical to the single-chip engine."""
    assert len(jax.devices()) == 8
    import qpnet_tpu.ops.gen_kernel as GK
    from qpnet_tpu.models import generate as G

    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                      dilationF_depth=6, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      kernel_size=2, upsampling_factor=4)
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    B, F = 20, 6
    n = F * cfg.upsampling_factor - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F * cfg.upsampling_factor), 2.0, np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)

    monkeypatch.setattr(GK, "choose_stream_min_dil",
                        lambda *a, **k: (32, True))

    single = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=13,
                                 engine="pallas", interpret=True)

    seen = {}
    real_sharded = G._pallas_sharded_path

    def spy_sharded(params_, cfg_, x_seed, *args, **kw):
        seen["B_pad"] = x_seed.shape[0]
        return real_sharded(params_, cfg_, x_seed, *args, **kw)

    monkeypatch.setattr(G, "_pallas_sharded_path", spy_sharded)
    mesh = make_mesh(4)
    sharded = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=13,
                                  engine="pallas", interpret=True,
                                  mesh=mesh)
    assert seen["B_pad"] == 32, (
        f"streaming-active mesh decode must pad to 8 per chip, ran at "
        f"global batch {seen.get('B_pad')}")
    assert len(sharded) == B
    np.testing.assert_array_equal(np.stack(single), np.stack(sharded))
