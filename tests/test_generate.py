"""Teacher-forced forward == autoregressive generation — the fast-WaveNet
cache-equivalence property (the reference never tests this; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import forward, init_params
from qpnet_tpu.models.generate import (
    batch_fast_generate, bucket_maxd, _generate_scan,
)


def tiny_cfg(**kw):
    base = dict(n_quantize=64, n_aux=4, n_resch=16, n_skipch=8,
                dilationF_depth=2, dilationF_repeat=2,
                dilationA_depth=2, dilationA_repeat=1,
                kernel_size=2, upsampling_factor=5)
    base.update(kw)
    return ModelConfig(**base)


def test_bucket_maxd():
    assert bucket_maxd(1.0) == 1
    assert bucket_maxd(3.2) == 4
    assert bucket_maxd(68.9) == 96
    assert bucket_maxd(300.0) == 300


def _generate_then_verify(cfg, B, n_frames, seed, d_value, mode="argmax"):
    """Generate AR samples, then replay the produced sequence through the
    teacher-forced forward and check each step's prediction matches."""
    params = init_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    up = cfg.upsampling_factor
    n_steps = n_frames * up - 1
    h = rng.normal(size=(B, n_frames, cfg.n_aux)).astype(np.float32)
    d = np.full((B, n_frames * up), d_value, dtype=np.float32)
    x_seed = np.full((B, 1), cfg.n_quantize // 2, dtype=np.int32)

    outs = batch_fast_generate(params, cfg, x_seed, h, [n_steps] * B, d,
                               seed=7, mode=mode,
                               compute_dtype=jnp.float32)
    samples = np.stack(outs)  # (B, n_steps)

    # replay: full sequence = [pad(rf), seed, samples[:-1]] predicts samples
    maxd = bucket_maxd(float(np.ceil(d_value)))
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    x_full = np.concatenate([
        np.full((B, rf), cfg.n_quantize // 2, np.int32),
        x_seed,
        samples[:, :-1]], axis=1)  # length rf+1+n_steps-1
    # sample-rate aux: position rf+i uses h_up[i]; context replicates h_up[0]
    from qpnet_tpu.models.qpnet import upsample_aux
    h_up_real = np.asarray(upsample_aux(params, jnp.asarray(h), up))
    h_up_full = np.concatenate([
        np.repeat(h_up_real[:, :1], rf, axis=1), h_up_real[:, :n_steps]], axis=1)
    d_full = np.concatenate([
        np.ones((B, rf), np.float32), d[:, :n_steps]], axis=1)

    logits = forward(params, cfg, jnp.asarray(x_full), None,
                     jnp.asarray(d_full), h_up=jnp.asarray(h_up_full))
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    # position rf+i-1... logits[t] predicts x[t+1]; generated sample i sits at
    # position rf+i in x_full timeline -> produced by logits at rf+i-1... but
    # generation step i conditions on position t=rf+i and emits sample rf+i+1.
    # x_full[rf+i] pairs with sample[i] emitted from logits[:, rf+i-1]?  No:
    # forward logits[:, t] predicts x[t+1]; sample[i] lives at position rf+1+i,
    # so it must equal argmax(logits[:, rf+i]).
    np.testing.assert_array_equal(pred[:, rf: rf + n_steps], samples)


def test_forward_equals_generate_argmax_unit_dilation():
    _generate_then_verify(tiny_cfg(), B=2, n_frames=8, seed=0, d_value=1.0)


def test_forward_equals_generate_argmax_fractional_dilation():
    _generate_then_verify(tiny_cfg(), B=2, n_frames=8, seed=1, d_value=2.6)


def test_forward_equals_generate_large_dilation():
    _generate_then_verify(tiny_cfg(), B=1, n_frames=10, seed=2, d_value=7.4)


def test_generate_varying_dilation():
    """Per-sample varying d(t) — the quasi-periodic case."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    B, n_frames, up = 2, 8, cfg.upsampling_factor
    n_steps = n_frames * up - 1
    h = rng.normal(size=(B, n_frames, cfg.n_aux)).astype(np.float32)
    d = rng.uniform(1.0, 6.0, size=(B, n_frames * up)).astype(np.float32)
    x_seed = np.full((B, 1), cfg.n_quantize // 2, dtype=np.int32)
    outs = batch_fast_generate(params, cfg, x_seed, h, [n_steps] * B, d,
                               mode="argmax", compute_dtype=jnp.float32)
    maxd = bucket_maxd(float(np.ceil(d.max())))
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    samples = np.stack(outs)
    x_full = np.concatenate([
        np.full((B, rf), cfg.n_quantize // 2, np.int32), x_seed,
        samples[:, :-1]], axis=1)
    from qpnet_tpu.models.qpnet import upsample_aux
    h_up_real = np.asarray(upsample_aux(params, jnp.asarray(h), up))
    h_up_full = np.concatenate([
        np.repeat(h_up_real[:, :1], rf, axis=1), h_up_real[:, :n_steps]], axis=1)
    d_full = np.concatenate([np.ones((B, rf), np.float32), d[:, :n_steps]], axis=1)
    logits = forward(params, cfg, jnp.asarray(x_full), None,
                     jnp.asarray(d_full), h_up=jnp.asarray(h_up_full))
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(pred[:, rf: rf + n_steps], samples)


def test_generate_sampling_deterministic_given_seed():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, n_frames = 2, 6
    n_steps = n_frames * cfg.upsampling_factor - 1
    h = rng.normal(size=(B, n_frames, cfg.n_aux)).astype(np.float32)
    d = np.full((B, n_frames * cfg.upsampling_factor), 2.0, np.float32)
    x_seed = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    a = batch_fast_generate(params, cfg, x_seed, h, [n_steps] * B, d, seed=5)
    b = batch_fast_generate(params, cfg, x_seed, h, [n_steps] * B, d, seed=5)
    c = batch_fast_generate(params, cfg, x_seed, h, [n_steps] * B, d, seed=6)
    np.testing.assert_array_equal(np.stack(a), np.stack(b))
    assert not np.array_equal(np.stack(a), np.stack(c))


def test_generate_unequal_lengths():
    """Shorter utterances are sliced out of the padded batch."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    up = cfg.upsampling_factor
    frames = [6, 4]
    n_samples = [f * up - 1 for f in frames]
    B, Fmax = len(frames), max(frames)
    h = np.zeros((B, Fmax, cfg.n_aux), np.float32)
    d = np.zeros((B, Fmax * up), np.float32)
    for i, f in enumerate(frames):
        h[i, :f] = rng.normal(size=(f, cfg.n_aux))
        d[i, : f * up] = 2.0
    x_seed = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    outs = batch_fast_generate(params, cfg, x_seed, h, n_samples, d)
    assert [len(o) for o in outs] == n_samples


def test_forward_equals_generate_deep_network():
    """The Rd10Rr3Ed4Er1-style deep fixed stack (dilations to 2^9) keeps
    the cache-equivalence property."""
    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=8, n_skipch=8,
                      dilationF_depth=6, dilationF_repeat=1,
                      dilationA_depth=3, dilationA_repeat=1,
                      kernel_size=2, upsampling_factor=5)
    params = init_params(jax.random.PRNGKey(9), cfg)
    rng = np.random.default_rng(9)
    B, n_frames, up = 1, 40, cfg.upsampling_factor
    n_steps = n_frames * up - 1
    h = rng.normal(size=(B, n_frames, cfg.n_aux)).astype(np.float32)
    d = np.full((B, n_frames * up), 1.9, np.float32)
    x_seed = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    outs = batch_fast_generate(params, cfg, x_seed, h, [n_steps] * B, d,
                               mode="argmax", compute_dtype=jnp.float32)
    maxd = bucket_maxd(2.0)
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    samples = np.stack(outs)
    x_full = np.concatenate([
        np.full((B, rf), cfg.n_quantize // 2, np.int32), x_seed,
        samples[:, :-1]], axis=1)
    from qpnet_tpu.models.qpnet import upsample_aux
    h_up_real = np.asarray(upsample_aux(params, jnp.asarray(h), up))
    h_up_full = np.concatenate([
        np.repeat(h_up_real[:, :1], rf, axis=1),
        h_up_real[:, :n_steps]], axis=1)
    d_full = np.concatenate([np.ones((B, rf), np.float32),
                             d[:, :n_steps]], axis=1)
    logits = forward(params, cfg, jnp.asarray(x_full), None,
                     jnp.asarray(d_full), h_up=jnp.asarray(h_up_full))
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(pred[:, rf: rf + n_steps], samples)


def test_large_fitting_batch_routes_to_balanced_slices(monkeypatch):
    """A batch above PALLAS_OPT_BATCH that still fits VMEM must take the
    split path with balanced slices (2x120 padded slots ran at half the
    rate of 2x64 on hardware), not a single oversized kernel."""
    from qpnet_tpu.models import generate as G

    calls = {}

    def fake_split(params, cfg, x_seed, h, d_gen, n_samples_list, maxd,
                   seed, mode, interpret, quantize, const_seed, sub_B):
        calls["sub_B"] = sub_B
        B = h.shape[0]
        return [np.zeros(n, np.int32) for n in n_samples_list]

    monkeypatch.setattr(G, "_pallas_split_path", fake_split)
    monkeypatch.setattr(G, "pallas_engine_available",
                        lambda cfg, B, maxd, quantize="none": True)
    monkeypatch.setattr(
        jax, "devices",
        lambda *a, **k: [type("D", (), {"platform": "tpu"})()])

    cfg = tiny_cfg()
    B, F = 130, 4
    up = cfg.upsampling_factor
    h = np.zeros((B, F, cfg.n_aux), np.float32)
    d = np.ones((B, F * up), np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    out = G.batch_fast_generate(
        np.zeros(0), cfg, x0, h, [F * up - 1] * B, d, seed=1)
    assert calls["sub_B"] == 48          # 3 balanced slices of <=48
    assert len(out) == B

    # at or below the optimal batch the single-call path stays in charge
    calls.clear()
    B2 = G.PALLAS_OPT_BATCH

    def fake_single(params, cfg, x_seed, h, d, n_steps, maxd, seed, mode,
                    interpret, quantize="none", const_seed=False,
                    b_offset=0):
        calls["single"] = True
        return np.zeros((h.shape[0], n_steps), np.int32)

    monkeypatch.setattr(G, "_pallas_path", fake_single)
    h2 = np.zeros((B2, F, cfg.n_aux), np.float32)
    d2 = np.ones((B2, F * up), np.float32)
    x02 = np.full((B2, 1), cfg.n_quantize // 2, np.int32)
    G.batch_fast_generate(np.zeros(0), cfg, x02, h2,
                          [F * up - 1] * B2, d2, seed=1)
    assert calls == {"single": True}
