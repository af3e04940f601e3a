"""Strict engine equivalence via teacher forcing.

Free-running AR comparisons can only be statistical: one bf16 near-tie
flip and the trajectories diverge chaotically (BENCH_NOTES.md).  Teacher
forcing removes the feedback loop, so BOTH generation engines' per-step
logits must match the teacher-forced `models.qpnet.forward` — and each
other — at EVERY step, to numerical tolerance.  This pins the full
per-step machinery (priming, ring slots, adaptive look-backs, aux frame
caching, post-net) of the scan engine and the pallas mega-kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import forward, init_params
from qpnet_tpu.models.generate import bucket_maxd, teacher_forced_logits
from qpnet_tpu.models.qpnet import upsample_aux


def tiny_cfg(**kw):
    base = dict(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                dilationF_depth=2, dilationF_repeat=2,
                dilationA_depth=2, dilationA_repeat=1,
                kernel_size=2, upsampling_factor=5)
    base.update(kw)
    return ModelConfig(**base)


def make_case(cfg, B, F, seed, d_lo=1.0, d_hi=3.5, seed_len=1):
    """Random forced stream + aux + frame-constant d + seed history."""
    rng = np.random.default_rng(seed)
    up = cfg.upsampling_factor
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.repeat(rng.uniform(d_lo, d_hi, size=(B, F)), up,
                  axis=1).astype(np.float32)[:, :n]
    forced = rng.integers(0, cfg.n_quantize, size=(B, n)).astype(np.int32)
    if seed_len <= 1:
        x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    else:
        x0 = rng.integers(0, cfg.n_quantize,
                          size=(B, seed_len)).astype(np.int32)
    return x0, h, forced, d, n


def forward_oracle_logits(params, cfg, x0, h, forced, d, n):
    """Replay the forced stream through the teacher-forced forward with the
    generation-path conventions (mid-scale pad, replicated first-frame aux
    and d=1 over the history window)."""
    B, F, _ = h.shape
    up = cfg.upsampling_factor
    maxd = bucket_maxd(float(np.ceil(d).max()))
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    if x0.shape[1] >= rf + 1:
        # engine keeps only the last rf+1 seed samples
        hist = x0[:, -(rf + 1):]
    else:
        hist = np.concatenate([
            np.full((B, rf + 1 - x0.shape[1]), cfg.n_quantize // 2,
                    np.int32), x0], axis=1)
    x_full = np.concatenate([hist, forced[:, :-1]], axis=1)
    h_up_real = np.asarray(upsample_aux(params, jnp.asarray(h), up))
    h_up_full = np.concatenate([
        np.repeat(h_up_real[:, :1], rf, axis=1), h_up_real[:, :n]], axis=1)
    d_full = np.concatenate([np.ones((B, rf), np.float32), d[:, :n]], axis=1)
    logits = forward(params, cfg, jnp.asarray(x_full), None,
                     jnp.asarray(d_full), h_up=jnp.asarray(h_up_full))
    return np.asarray(logits)[:, rf: rf + n]


def test_scan_forced_matches_forward_every_step():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    x0, h, forced, d, n = make_case(cfg, B=2, F=12, seed=0)
    ref = forward_oracle_logits(params, cfg, x0, h, forced, d, n)
    got = teacher_forced_logits(params, cfg, x0, h, forced, d,
                                engine="xla", compute_dtype=jnp.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_scan_forced_bf16_close_to_forward():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    x0, h, forced, d, n = make_case(cfg, B=2, F=12, seed=1)
    ref = forward_oracle_logits(params, cfg, x0, h, forced, d, n)
    got = teacher_forced_logits(params, cfg, x0, h, forced, d,
                                engine="xla", compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(got, ref, atol=0.03)


@pytest.mark.slow
def test_pallas_forced_matches_forward_every_step():
    """The mega-kernel's per-step logits vs the teacher-forced forward at
    100% of steps (bf16 kernel internals; measured max delta ~0.007 at
    logit scale ~1)."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(2), cfg)
    x0, h, forced, d, n = make_case(cfg, B=2, F=12, seed=2)
    ref = forward_oracle_logits(params, cfg, x0, h, forced, d, n)
    got = teacher_forced_logits(params, cfg, x0, h, forced, d,
                                engine="pallas", interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=0.03)


@pytest.mark.slow
def test_pallas_forced_matches_scan_forced():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    x0, h, forced, d, n = make_case(cfg, B=3, F=10, seed=3)
    a = teacher_forced_logits(params, cfg, x0, h, forced, d,
                              engine="xla", compute_dtype=jnp.bfloat16)
    b = teacher_forced_logits(params, cfg, x0, h, forced, d,
                              engine="pallas", interpret=True)
    np.testing.assert_allclose(a, b, atol=0.03)


@pytest.mark.slow
def test_pallas_forced_real_seed_history():
    """Non-constant seed history (continuation decode) under teacher
    forcing: guards the ring time-origin convention at every step, not
    just the first sample."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(4), cfg)
    x0, h, forced, d, n = make_case(cfg, B=2, F=10, seed=4, seed_len=40)
    ref = forward_oracle_logits(params, cfg, x0, h, forced, d, n)
    scan = teacher_forced_logits(params, cfg, x0, h, forced, d,
                                 engine="xla", compute_dtype=jnp.float32)
    pal = teacher_forced_logits(params, cfg, x0, h, forced, d,
                                engine="pallas", interpret=True)
    np.testing.assert_allclose(scan, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pal, ref, atol=0.03)


@pytest.mark.slow
def test_pallas_forced_large_dilation():
    """Large pitch dilation factors exercise the deep adaptive ring
    look-backs (slot arithmetic far from the write head)."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(5), cfg)
    x0, h, forced, d, n = make_case(cfg, B=2, F=14, seed=5,
                                    d_lo=5.0, d_hi=7.4)
    ref = forward_oracle_logits(params, cfg, x0, h, forced, d, n)
    got = teacher_forced_logits(params, cfg, x0, h, forced, d,
                                engine="pallas", interpret=True)
    np.testing.assert_allclose(got, ref, atol=0.03)
