"""Pallas generation mega-kernel vs the XLA scan path (interpret mode on
CPU): both engines must emit identical argmax trajectories."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import init_params
from qpnet_tpu.models.generate import batch_fast_generate


def tiny_cfg():
    return ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                       dilationF_depth=2, dilationF_repeat=2,
                       dilationA_depth=2, dilationA_repeat=1,
                       kernel_size=2, upsampling_factor=5)


@pytest.mark.slow
def test_pallas_matches_xla_argmax():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, F = 2, 24
    up = cfg.upsampling_factor
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.repeat(rng.uniform(1.0, 3.5, size=(B, F)), up,
                  axis=1).astype(np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    a = batch_fast_generate(params, cfg, x0, h, [n] * B, d, mode="argmax",
                            compute_dtype=jnp.float32, engine="xla")
    b = batch_fast_generate(params, cfg, x0, h, [n] * B, d, mode="argmax",
                            engine="pallas", interpret=True)
    A, Bm = np.stack(a), np.stack(b)
    agree = (A == Bm).mean()
    # bf16-vs-f32 rounding inside the kernel may flip rare near-tie argmax
    # decisions, after which AR trajectories diverge; demand high agreement
    # over the early (pre-divergence) region and report overall
    assert (A[:, 0] == Bm[:, 0]).all(), "first sample must match"
    assert (A[:, :40] == Bm[:, :40]).mean() > 0.85, \
        f"early agreement {(A[:, :40] == Bm[:, :40]).mean():.3f}"


@pytest.mark.slow
def test_pallas_sampling_runs_and_is_deterministic():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B, F = 2, 12
    up = cfg.upsampling_factor
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F * up), 2.0, np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    a = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=9,
                            engine="pallas", interpret=True)
    b = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=9,
                            engine="pallas", interpret=True)
    np.testing.assert_array_equal(np.stack(a), np.stack(b))


@pytest.mark.slow
def test_pallas_matches_xla_with_real_seed_history():
    """Priming with a non-constant seed history (the continuation-decode
    case) must agree between engines from the very first sample — guards
    the ring-slot time-origin convention."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    B, F = 2, 16
    up = cfg.upsampling_factor
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F * up), 2.3, np.float32)
    x_seed = rng.integers(0, cfg.n_quantize, size=(B, 40)).astype(np.int32)
    a = batch_fast_generate(params, cfg, x_seed, h, [n] * B, d,
                            mode="argmax", compute_dtype=jnp.float32,
                            engine="xla")
    b = batch_fast_generate(params, cfg, x_seed, h, [n] * B, d,
                            mode="argmax", engine="pallas", interpret=True)
    A, Bm = np.stack(a), np.stack(b)
    assert (A[:, 0] == Bm[:, 0]).all(), "first sample diverges"
    assert (A[:, :40] == Bm[:, :40]).mean() > 0.85


@pytest.mark.slow
def test_split_path_bit_identical_to_oversized_call():
    """A batch split into VMEM-fitting pallas sub-batches (with global
    b_offset per slice) must reproduce the one-call kernel output exactly —
    the guarantee behind the oversized-batch auto-split in
    batch_fast_generate."""
    from qpnet_tpu.models.generate import (
        _frame_constant, _pallas_path, _pallas_split_path, bucket_maxd,
    )
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    B, F = 5, 10
    up = cfg.upsampling_factor
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.repeat(rng.uniform(1.0, 3.0, size=(B, F)), up,
                  axis=1).astype(np.float32)[:, :n]
    assert _frame_constant(d, up)
    maxd = bucket_maxd(float(np.ceil(d).max()))
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    x_seed = np.full((B, rf + 1), cfg.n_quantize // 2, np.int32)

    one = _pallas_path(params, cfg, x_seed, h, d, n, maxd, seed=7,
                       mode="sampling", interpret=True, const_seed=True)
    rows = _pallas_split_path(params, cfg, x_seed, h, d, [n] * B, maxd,
                              seed=7, mode="sampling", interpret=True,
                              quantize="none", const_seed=True, sub_B=2)
    for i in range(B):
        np.testing.assert_array_equal(one[i, :n], rows[i][:n])


def test_choose_pallas_sub_batch():
    from qpnet_tpu.models.generate import choose_pallas_sub_batch
    from qpnet_tpu.ops import gen_kernel
    cfg = tiny_cfg()
    # a huge batch must come back as a multiple of 8 that fits the budget
    sub = choose_pallas_sub_batch(cfg, 10_000_000, maxd=4)
    assert 0 < sub < 10_000_000 and sub % 8 == 0
    assert gen_kernel.vmem_cost_bytes(cfg, sub, 4, "none") \
        < gen_kernel.VMEM_LIMIT
    # a batch that fits comes back unchanged
    assert choose_pallas_sub_batch(cfg, 4, maxd=4) == 4


def test_choose_pallas_sub_batch_balanced(monkeypatch):
    """Oversized batches split into balanced slices capped at the
    throughput-optimal kernel batch, not the largest VMEM-filling size
    (2x120 padded slots ran at half the rate of 2x64 on hardware)."""
    from qpnet_tpu.models import generate
    from qpnet_tpu.ops import gen_kernel
    cfg = tiny_cfg()
    # pretend slices up to 120 fit but 128 does not
    monkeypatch.setattr(gen_kernel, "vmem_cost_bytes",
                        lambda cfg, B, maxd, q="none": B)
    monkeypatch.setattr(gen_kernel, "VMEM_LIMIT", 121)
    assert generate.choose_pallas_sub_batch(cfg, 128, maxd=4) == 64
    assert generate.choose_pallas_sub_batch(cfg, 136, maxd=4) == 48
    assert generate.choose_pallas_sub_batch(cfg, 200, maxd=4) == 56
    # B that fits outright is untouched
    assert generate.choose_pallas_sub_batch(cfg, 120, maxd=4) == 120
    # small VMEM: cap comes from the budget, still balanced
    monkeypatch.setattr(gen_kernel, "VMEM_LIMIT", 25)
    assert generate.choose_pallas_sub_batch(cfg, 50, maxd=4) == 24


def test_balanced_slice():
    """VMEM-fitting batches above the throughput-optimal kernel size also
    split into balanced slices (sorted callers make them
    length-homogeneous, so each stops at its own longest utterance)."""
    from qpnet_tpu.models.generate import balanced_slice
    assert balanced_slice(128) == 64
    assert balanced_slice(96) == 48
    assert balanced_slice(65) == 40
    assert balanced_slice(130) == 48      # 3 slices of <=48
    assert balanced_slice(40, cap=16) == 16


def test_choose_pallas_sub_batch_small_batches(monkeypatch):
    """When no multiple of 8 fits (or B <= 8), the chooser must still find
    the largest fitting size instead of collapsing to per-utterance calls."""
    from qpnet_tpu.models.generate import choose_pallas_sub_batch
    from qpnet_tpu.ops import gen_kernel
    cfg = tiny_cfg()
    monkeypatch.setattr(gen_kernel, "vmem_cost_bytes",
                        lambda cfg, B, maxd, q="none": B * 10)
    monkeypatch.setattr(gen_kernel, "VMEM_LIMIT", 45)
    # B=8 costs 80 > 45; sizes 4..1 fit (40..10): expect 4, not 1
    assert choose_pallas_sub_batch(cfg, 8, maxd=4) == 4
    assert choose_pallas_sub_batch(cfg, 100, maxd=4) == 4
    monkeypatch.setattr(gen_kernel, "VMEM_LIMIT", 5)
    assert choose_pallas_sub_batch(cfg, 8, maxd=4) == 0


# ---------------------------------------------------------------------------
# Ring streaming (deep networks): fixed rings too large for VMEM live in
# HBM with triple-buffered STREAM_W-slot VMEM windows (gen_kernel.py
# stream_layers/STREAM_W).  The streamed kernel must be BIT-identical to
# the fully resident one — same samples, same carried ring state — for
# one-shot runs and for chunked continuation at window-misaligned offsets.
# ---------------------------------------------------------------------------


def deep_tiny_cfg():
    # dilations 1..32 so the >=32 layer qualifies for streaming
    # (stream_min_dil must be >= 4*STREAM_W = 32 and divide the window)
    return ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                       dilationF_depth=6, dilationF_repeat=1,
                       dilationA_depth=2, dilationA_repeat=1,
                       kernel_size=2, upsampling_factor=10)


def _streamed_inputs(cfg, B, maxd, F, seed=0):
    from qpnet_tpu.models.generate import _pallas_prologue
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(seed)
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal + 1
    x_seed = np.full((B, rf), cfg.n_quantize // 2, np.int32)
    h_pad = np.zeros((F, B, 48), np.float32)
    h_pad[:, :, : cfg.n_aux] = rng.normal(size=(F, B, cfg.n_aux))
    d_frames = np.full((F, 1, B), 2.5, np.float32)
    packed, bufF, bufA, x0 = _pallas_prologue(
        params, cfg, jnp.asarray(x_seed), jnp.asarray(h_pad[0]),
        maxd=maxd, quantize="none", const_seed=True)
    return packed, bufF, bufA, x0, h_pad, d_frames


@pytest.mark.slow
def test_streamed_rings_bit_identical_to_resident():
    """HBM-streamed fixed rings == VMEM-resident rings, samples AND
    carried state, over enough steps that the streamed ring wraps its
    full cycle several times (120 steps / 32-slot ring)."""
    from qpnet_tpu.ops.gen_kernel import pallas_generate

    cfg = deep_tiny_cfg()
    B, maxd, F = 3, 4, 12
    packed, bufF, bufA, x0, h_pad, d_frames = _streamed_inputs(
        cfg, B, maxd, F)
    kw = dict(B=B, maxd=maxd, mode="sampling", interpret=True,
              quantize="none", n_steps=F * cfg.upsampling_factor)
    ref = pallas_generate(packed, cfg, bufF, bufA, x0,
                          jnp.asarray(h_pad, jnp.bfloat16),
                          jnp.asarray(d_frames), 7,
                          stream_min_dil=None, **kw)
    got = pallas_generate(packed, cfg, bufF, bufA, x0,
                          jnp.asarray(h_pad, jnp.bfloat16),
                          jnp.asarray(d_frames), 7,
                          stream_min_dil=32, **kw)
    for r, g, name in zip(ref, got, ["samples", "bufF", "bufA", "x"]):
        assert np.array_equal(np.asarray(r), np.asarray(g)), name


@pytest.mark.slow
def test_streamed_rings_chunked_misaligned_offsets():
    """Chunked continuation with STREAM_W-misaligned step offsets (up=10,
    W=8: offsets 10, 40, 60 all mid-window) must reproduce the one-shot
    streamed run bit-for-bit — partial windows at chunk edges round-trip
    untouched slots unchanged."""
    from qpnet_tpu.ops.gen_kernel import pallas_generate

    cfg = deep_tiny_cfg()
    up = cfg.upsampling_factor
    B, maxd, F = 3, 4, 12
    packed, bufF, bufA, x0, h_pad, d_frames = _streamed_inputs(
        cfg, B, maxd, F)
    kw = dict(B=B, maxd=maxd, mode="sampling", interpret=True,
              quantize="none", stream_min_dil=32)
    one = pallas_generate(packed, cfg, bufF, bufA, x0,
                          jnp.asarray(h_pad, jnp.bfloat16),
                          jnp.asarray(d_frames), 7,
                          n_steps=F * up, **kw)
    pieces, off = [], 0
    state = (bufF, bufA, x0)
    for fchunk in [1, 3, 2, 6]:
        f0, f1 = off // up, off // up + fchunk
        s, *state = pallas_generate(
            packed, cfg, *state,
            jnp.asarray(h_pad[f0:f1], jnp.bfloat16),
            jnp.asarray(d_frames[f0:f1]), 7,
            n_steps=fchunk * up, step_offset=off, **kw)
        pieces.append(np.asarray(s))
        off += fchunk * up
    assert np.array_equal(np.concatenate(pieces, axis=0),
                          np.asarray(one[0]))
    for c, o, name in zip(state, one[1:], ["bufF", "bufA", "x"]):
        assert np.array_equal(np.asarray(c), np.asarray(o)), name


def test_stream_layer_selection_and_cost_model():
    """stream_layers validates thresholds; choose_stream_min_dil prefers
    residency, then the least streaming that fits, then reports no-fit;
    the cost model shrinks when rings stream."""
    from qpnet_tpu.ops.gen_kernel import (VMEM_LIMIT, choose_stream_min_dil,
                                          stream_layers, vmem_cost_bytes)

    cfg = deep_tiny_cfg()
    assert stream_layers(cfg, None) == []
    assert stream_layers(cfg, 32) == [5]
    with pytest.raises(ValueError, match="stream_min_dil"):
        stream_layers(cfg, 8)                 # below 4*STREAM_W
    full = vmem_cost_bytes(cfg, 8, 4)
    streamed = vmem_cost_bytes(cfg, 8, 4, stream_min_dil=32)
    assert streamed < full
    # tiny config fits resident outright
    assert choose_stream_min_dil(cfg, 8, 4) == (None, True)
    # the deep network at bf16/B=8 only fits WITH streaming
    deep = ModelConfig.from_network_name("Rd10Rr3Ed4Er1")
    thr, fits = choose_stream_min_dil(deep, 8, 32, "none")
    assert fits and thr is not None
    assert vmem_cost_bytes(deep, 8, 32, "none") >= VMEM_LIMIT
    assert vmem_cost_bytes(deep, 8, 32, "none",
                           stream_min_dil=thr) < VMEM_LIMIT


def test_fused_batch_ceiling_rejects_the_measured_crash_config():
    """The fused single-jit decode program (prologue + kernel in one XLA
    executable) crashed the TPU worker at streamed bf16 deep-net B=16 at
    EVERY streaming level, while the standalone kernel runs the same
    shape correctly (BENCH_NOTES 'Deep network').  Admission must reject
    exactly the fused crash configs and keep every measured-good one."""
    from qpnet_tpu.ops.gen_kernel import fused_batch_ok
    from qpnet_tpu.models.generate import choose_pallas_sub_batch

    deep = ModelConfig.from_network_name("Rd10Rr3Ed4Er1")
    dflt = ModelConfig.from_network_name("default")
    assert not fused_batch_ok(deep, 16, 32, "none")   # measured crash
    assert not fused_batch_ok(deep, 9, 32, "none")    # pads to 16
    assert fused_batch_ok(deep, 8, 32, "none")        # measured ok (283k)
    assert fused_batch_ok(deep, 7, 32, "none")        # reference batch
    assert fused_batch_ok(deep, 64, 32, "w8a8")       # measured ok (686k)
    assert not fused_batch_ok(deep, 96, 32, "w8a8")   # VMEM no-fit
    assert fused_batch_ok(dflt, 120, 32, "none")      # fully resident
    # oversized bf16 deep batches split into measured-safe B=8 slices
    # (2 x 283k beats the 224k one chunked B=16 program measures)
    assert choose_pallas_sub_batch(deep, 16, 32, "none") == 8
    assert choose_pallas_sub_batch(deep, 64, 32, "w8a8") == 64


def test_bf16_deep_net_oversize_batch_routes_to_safe_slices(monkeypatch):
    """qpnet_decode --batch_size 16 on the bf16 deep net must route into
    B=8 pallas slices (the measured-safe, faster shape), never the fused
    B=16 program that crashes the worker and never the 3x-slower scan."""
    from qpnet_tpu.models import generate as G

    calls = {}

    def fake_split(params, cfg, x_seed, h, d_gen, n_samples_list, maxd,
                   seed, mode, interpret, quantize, const_seed, sub_B):
        calls["sub_B"] = sub_B
        return [np.zeros(n, np.int32) for n in n_samples_list]

    def boom(*a, **k):
        raise AssertionError("fused single-call path must not be taken")

    monkeypatch.setattr(G, "_pallas_split_path", fake_split)
    monkeypatch.setattr(G, "_pallas_path", boom)
    monkeypatch.setattr(G, "_generate_scan", boom)  # the scan engine
    monkeypatch.setattr(
        jax, "devices",
        lambda *a, **k: [type("D", (), {"platform": "tpu"})()])

    cfg = ModelConfig.from_network_name("Rd10Rr3Ed4Er1")
    B, F = 16, 2
    up = cfg.upsampling_factor
    h = np.zeros((B, F, cfg.n_aux), np.float32)
    d = np.full((B, F * up), 23.0, np.float32)   # buckets to maxd=32
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    out = G.batch_fast_generate(
        np.zeros(0), cfg, x0, h, [F * up - 1] * B, d, seed=1)
    assert calls["sub_B"] == 8
    assert len(out) == B


@pytest.mark.slow
def test_streaming_pads_batch_to_sublane_multiple(monkeypatch):
    """Mosaic requires the batch (sublane) dim of HBM<->VMEM ring window
    transfers to be 8-aligned, so a streaming-active _pallas_path must
    pad B=7 up to 8 (replicating the last row) and slice the pad back
    off — bit-identical to the resident kernel's un-padded output (the
    counter PRNG keys off row indices, so real rows never see the pad)."""
    import qpnet_tpu.ops.gen_kernel as GK
    from qpnet_tpu.models.generate import batch_fast_generate

    cfg = deep_tiny_cfg()
    B, F = 7, 6
    n = F * cfg.upsampling_factor - 1
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F * cfg.upsampling_factor), 2.5, np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    kw = dict(seed=9, mode="sampling", engine="pallas", interpret=True)

    resident = batch_fast_generate(params, cfg, x0, h, [n] * B, d, **kw)

    calls = []

    def force_stream(cfg_, B_, maxd_, quantize_="none"):
        calls.append(B_)
        return 32, True

    monkeypatch.setattr(GK, "choose_stream_min_dil", force_stream)
    streamed = batch_fast_generate(params, cfg, x0, h, [n] * B, d, **kw)
    assert calls, "streaming chooser was never consulted"
    np.testing.assert_array_equal(np.stack(resident), np.stack(streamed))


@pytest.mark.slow
def test_env_forced_streaming_still_pads_batch(monkeypatch):
    """QPNET_STREAM_MIN_DIL forces a streaming level inside pallas_generate;
    the caller-side batch padding must see the SAME resolved level (shared
    resolve_stream_min_dil helper) — forcing streaming on a B=7 decode
    must run the kernel at a padded B=8, not hit the Mosaic 8-alignment
    failure the padding exists to prevent."""
    import qpnet_tpu.ops.gen_kernel as GK
    from qpnet_tpu.models.generate import batch_fast_generate

    cfg = deep_tiny_cfg()
    B, F = 7, 6
    n = F * cfg.upsampling_factor - 1
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F * cfg.upsampling_factor), 2.5, np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    kw = dict(seed=9, mode="sampling", engine="pallas", interpret=True)

    baseline = batch_fast_generate(params, cfg, x0, h, [n] * B, d, **kw)

    monkeypatch.setenv("QPNET_STREAM_MIN_DIL", "32")
    import qpnet_tpu.models.generate as G
    seen = {}
    real_prep = G._pallas_host_prep

    def spy_prep(cfg_, h_, d_, n_steps_):
        seen["B"] = h_.shape[0]
        return real_prep(cfg_, h_, d_, n_steps_)

    monkeypatch.setattr(G, "_pallas_host_prep", spy_prep)
    forced = batch_fast_generate(params, cfg, x0, h, [n] * B, d, **kw)
    assert seen["B"] == 8, (
        "env-forced streaming must pad B=7 to the 8-sublane multiple "
        f"(got kernel batch {seen.get('B')})")
    np.testing.assert_array_equal(np.stack(baseline), np.stack(forced))


def test_pallas_generate_rejects_unaligned_forced_streaming():
    """A direct pallas_generate call with streaming active and B % 8 != 0
    must fail with a clear error on the compiled path (interpret mode is
    exempt: it simulates the DMAs)."""
    from qpnet_tpu.ops.gen_kernel import pallas_generate

    cfg = deep_tiny_cfg()
    B, maxd, F = 3, 4, 2
    packed, bufF, bufA, x0, h_pad, d_frames = _streamed_inputs(
        cfg, B, maxd, F)
    with pytest.raises(ValueError, match="multiple of 8"):
        pallas_generate(packed, cfg, bufF, bufA, x0,
                        jnp.asarray(h_pad, jnp.bfloat16),
                        jnp.asarray(d_frames), 7, B=B, maxd=maxd,
                        mode="sampling", interpret=False, quantize="none",
                        n_steps=F * cfg.upsampling_factor,
                        stream_min_dil=32)
