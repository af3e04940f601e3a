"""Quantized decode paths: w8a8 (pallas kernel: dynamic per-row activation
x per-column weight int8) and int8_weights (XLA scan: weight-only
dequantized matmul).

Teacher forcing (tests/test_forced_mode.py machinery) makes the
quantization error measurable per step without chaotic AR divergence:
the quantized logits must stay close to the full-precision engine's on
the SAME input stream.  Plus the VMEM cost-model regression that makes
w8a8 the deep network's only fast-kernel path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import init_params
from qpnet_tpu.models.generate import (
    batch_fast_generate, teacher_forced_logits,
)


def tiny_cfg(**kw):
    base = dict(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                dilationF_depth=2, dilationF_repeat=2,
                dilationA_depth=2, dilationA_repeat=1,
                kernel_size=2, upsampling_factor=5)
    base.update(kw)
    return ModelConfig(**base)


def make_case(cfg, B, F, seed):
    rng = np.random.default_rng(seed)
    up = cfg.upsampling_factor
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.repeat(rng.uniform(1.0, 3.0, size=(B, F)), up,
                  axis=1).astype(np.float32)[:, :n]
    forced = rng.integers(0, cfg.n_quantize, size=(B, n)).astype(np.int32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    return x0, h, forced, d, n


def _logit_metrics(q, ref):
    """(relative RMSE, fraction of steps whose argmax agrees)."""
    rmse = float(np.sqrt(np.mean((q - ref) ** 2)))
    scale = float(np.sqrt(np.mean(ref ** 2))) + 1e-12
    agree = float((q.argmax(-1) == ref.argmax(-1)).mean())
    return rmse / scale, agree


@pytest.mark.slow
def test_w8a8_forced_logits_close_to_bf16():
    """The mmq kernel branch vs the bf16 kernel on the same forced stream:
    per-step logits stay close and the winning class rarely changes."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    x0, h, forced, d, n = make_case(cfg, B=2, F=10, seed=0)
    ref = teacher_forced_logits(params, cfg, x0, h, forced, d,
                                engine="pallas", interpret=True)
    q = teacher_forced_logits(params, cfg, x0, h, forced, d,
                              engine="pallas", interpret=True,
                              quantize="w8a8")
    assert q.shape == ref.shape
    rel_rmse, agree = _logit_metrics(q, ref)
    assert rel_rmse < 0.10, f"w8a8 relative logit RMSE {rel_rmse:.3f}"
    assert agree > 0.90, f"w8a8 argmax agreement {agree:.3f}"


@pytest.mark.slow
def test_int8_weights_forced_logits_close_to_f32():
    """The scan engine's weight-only int8 branch vs its f32 path."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    x0, h, forced, d, n = make_case(cfg, B=2, F=10, seed=1)
    ref = teacher_forced_logits(params, cfg, x0, h, forced, d,
                                engine="xla", compute_dtype=jnp.float32)
    q = teacher_forced_logits(params, cfg, x0, h, forced, d,
                              engine="xla", compute_dtype=jnp.float32,
                              quantize="int8_weights")
    rel_rmse, agree = _logit_metrics(q, ref)
    assert rel_rmse < 0.10, f"int8_weights relative RMSE {rel_rmse:.3f}"
    assert agree > 0.90, f"int8_weights argmax agreement {agree:.3f}"


@pytest.mark.slow
def test_w8a8_free_running_deterministic_and_seeded():
    """The free-running w8a8 kernel: deterministic given a seed, first
    sample identical to bf16 (before any feedback divergence)."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    B, F = 2, 8
    up = cfg.upsampling_factor
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F * up), 2.0, np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    a = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=9,
                            engine="pallas", interpret=True,
                            quantize="w8a8")
    b = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=9,
                            engine="pallas", interpret=True,
                            quantize="w8a8")
    full = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=9,
                               engine="pallas", interpret=True)
    np.testing.assert_array_equal(np.stack(a), np.stack(b))
    np.testing.assert_array_equal(np.stack(a)[:, 0], np.stack(full)[:, 0])


def test_deep_net_w8a8_fits_vmem_where_bf16_does_not():
    """The deep released network's resident bf16 weights exceed the VMEM
    kernel budget at ANY batch; w8a8 halves them and fits at the
    benchmarked operating point (B=8) — the regression pin behind
    `--quantize w8a8` being the deep net's fast decode path."""
    from qpnet_tpu.ops.gen_kernel import VMEM_LIMIT, vmem_cost_bytes
    cfg = ModelConfig.from_network_name("Rd10Rr3Ed4Er1", n_aux=39,
                                        upsampling_factor=110)
    for maxd in (16, 32):
        assert vmem_cost_bytes(cfg, 1, maxd, "none") >= VMEM_LIMIT
        assert vmem_cost_bytes(cfg, 8, maxd, "none") >= VMEM_LIMIT
        assert vmem_cost_bytes(cfg, 8, maxd, "w8a8") < VMEM_LIMIT
    # and the default network still fits in bf16 at the optimal batch
    dft = ModelConfig.from_network_name("default", n_aux=39,
                                        upsampling_factor=110)
    assert vmem_cost_bytes(dft, 64, 32, "none") < VMEM_LIMIT


def test_pack_weights_w8a8_roundtrip():
    """q8 packing: dequantized weights reconstruct the originals within
    one quantization step of the per-column scale."""
    from qpnet_tpu.ops.gen_kernel import pack_weights
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    packed = pack_weights(params, cfg, quantize="w8a8")
    W_in = np.concatenate([
        np.concatenate([np.asarray(p["W_cur"]), np.asarray(p["W_prev"])],
                       axis=0)[None]
        for p in (list(params["fixed"]) + list(params["adaptive"]))])
    deq = np.asarray(packed["W_in"], np.float32) * np.asarray(packed["s_in"])
    np.testing.assert_allclose(deq, W_in, atol=np.abs(W_in).max() / 127.0)
    assert packed["W_in"].dtype == jnp.int8
