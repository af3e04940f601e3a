"""Model structure tests: parameter count vs the reference architecture,
shape contracts, causality, and upsampling semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import count_params, forward, init_params
from qpnet_tpu.models.qpnet import upsample_aux


def tiny_cfg(**kw):
    base = dict(n_quantize=256, n_aux=5, n_resch=16, n_skipch=8,
                dilationF_depth=2, dilationF_repeat=2,
                dilationA_depth=2, dilationA_repeat=1,
                kernel_size=2, upsampling_factor=10)
    base.update(kw)
    return ModelConfig(**base)


def reference_param_count(cfg: ModelConfig) -> int:
    """Parameter count computed from the reference module shapes
    (reference qpnet.py:174-237)."""
    Q, A, R, S = cfg.n_quantize, cfg.n_aux, cfg.n_resch, cfg.n_skipch
    k, up = cfg.kernel_size, cfg.upsampling_factor
    n = R * Q * k + R              # causal conv
    n += up + 1                    # ConvTranspose2d(1,1,(1,up)) weight+bias
    per_fixed = 2 * (R * R * k + R) + 2 * (A * R + R) + (R * S + S) + (R * R + R)
    per_adapt = 2 * 2 * (R * R + R) + 2 * (A * R + R) + (R * S + S) + (R * R + R)
    n += per_fixed * len(cfg.dilationsF) + per_adapt * len(cfg.dilationsA)
    n += S * S + S + S * Q + Q     # post-net
    return n


def fused_bias_deficit(cfg: ModelConfig) -> int:
    """Our fused b_gate folds the reference's redundant additive biases
    (dil conv + aux conv per branch; plus convP in adaptive blocks) into one
    2R vector — identical function, fewer stored parameters."""
    R = cfg.n_resch
    return 2 * R * len(cfg.dilationsF) + 4 * R * len(cfg.dilationsA)


def test_default_model_is_24M():
    cfg = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    n = count_params(params)
    assert n + fused_bias_deficit(cfg) == reference_param_count(cfg)
    assert 23_000_000 < n < 25_000_000


@pytest.mark.parametrize("name", ["default", "Rd10Rr3Ed4Er1"])
def test_named_networks_param_count(name):
    cfg = ModelConfig.from_network_name(name)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert count_params(params) + fused_bias_deficit(cfg) == reference_param_count(cfg)


def test_forward_shapes_and_finite():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, F = 2, 12
    T = F * cfg.upsampling_factor
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(B, T)).astype(np.int32)
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, T), 2.3, dtype=np.float32)
    logits = forward(params, cfg, jnp.asarray(x), jnp.asarray(h), jnp.asarray(d))
    assert logits.shape == (B, T, cfg.n_quantize)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_forward_is_causal():
    """Changing x at position t must not affect logits at positions < t."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    B, F = 1, 12
    T = F * cfg.upsampling_factor
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, size=(B, T)).astype(np.int32)
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, T), 1.7, dtype=np.float32)
    base = forward(params, cfg, jnp.asarray(x), jnp.asarray(h), jnp.asarray(d))
    t_mut = T - 5
    x2 = x.copy()
    x2[0, t_mut] = (x2[0, t_mut] + 101) % 256
    out = forward(params, cfg, jnp.asarray(x2), jnp.asarray(h), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(base[:, :t_mut]),
                               np.asarray(out[:, :t_mut]), atol=1e-6)
    # and it must affect the position itself (predicting t_mut+1)
    assert not np.allclose(np.asarray(base[:, t_mut]), np.asarray(out[:, t_mut]))


def test_upsample_is_repeat_at_init():
    """ConvTranspose2d init (weight=1, bias=0; reference qpnet.py:56-58)
    makes the upsampler an exact frame repeat."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jnp.asarray(np.random.default_rng(0).normal(size=(2, 7, cfg.n_aux)),
                    jnp.float32)
    up = upsample_aux(params, h, cfg.upsampling_factor)
    expect = jnp.repeat(h, cfg.upsampling_factor, axis=1)
    np.testing.assert_allclose(np.asarray(up), np.asarray(expect), atol=1e-7)


def test_receptive_field_formula():
    cfg = ModelConfig()
    # reference qpnet_train.py:181-198 with default net: 1 + 45 + 15*ceil(maxd)
    assert cfg.receptive_causal == 1
    assert cfg.receptiveF == 45
    assert cfg.receptiveA == 15
    assert cfg.receptive_field(1.0) == 61
    assert cfg.receptive_field(68.9) == 1 + 45 + 15 * 69
