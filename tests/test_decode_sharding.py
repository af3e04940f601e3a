"""Multi-chip decode: utterance batch sharded over an 8-virtual-device mesh
must reproduce the single-device generation exactly."""

import jax
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
