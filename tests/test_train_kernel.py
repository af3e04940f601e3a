"""Fused Pallas training kernel (ops/train_kernel.py) vs the XLA block
loop: forward equivalence and PER-LEAF gradient parity, in interpret mode
on CPU.  The gates for adopting the fused step (VERDICT round-2 #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import forward, init_params
from qpnet_tpu.ops import train_kernel as TK
from qpnet_tpu.train.step import masked_ce_loss


def tiny_cfg(**kw):
    base = dict(n_quantize=32, n_aux=5, n_resch=16, n_skipch=8,
                dilationF_depth=3, dilationF_repeat=2,
                dilationA_depth=2, dilationA_repeat=1,
                kernel_size=2, upsampling_factor=4)
    base.update(kw)
    return ModelConfig(**base)


def make_batch(cfg, B, T, seed):
    rng = np.random.default_rng(seed)
    F = T // cfg.upsampling_factor
    return {
        "x": jnp.asarray(rng.integers(0, cfg.n_quantize, (B, T)), jnp.int32),
        "h": jnp.asarray(rng.normal(size=(B, F, cfg.n_aux)), jnp.float32),
        "t": jnp.asarray(rng.integers(0, cfg.n_quantize, (B, T)), jnp.int32),
        "d": jnp.asarray(
            np.repeat(rng.uniform(1.0, 3.0, (B, F)), cfg.upsampling_factor,
                      axis=1)[:, :T], jnp.float32),
        "valid_len": jnp.asarray(T // 2, jnp.int32),
    }


@pytest.fixture(autouse=True)
def small_tile(monkeypatch):
    # production TILE=512 is too coarse for CPU-interpret test sizes
    monkeypatch.setattr(TK, "TILE", 64)


def _loss(params, cfg, batch, dtype, engine):
    logits = forward(params, cfg, batch["x"], batch["h"], batch["d"],
                     compute_dtype=dtype, fixed_engine=engine,
                     interpret=True)
    return masked_ce_loss(logits, batch["t"], batch["valid_len"])


@pytest.mark.parametrize("T", [256, 192 + 32])  # tile-aligned and padded
def test_forward_parity_f32(T):
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, B=2, T=T, seed=0)
    a = forward(params, cfg, batch["x"], batch["h"], batch["d"],
                compute_dtype=jnp.float32, fixed_engine="xla")
    b = forward(params, cfg, batch["x"], batch["h"], batch["d"],
                compute_dtype=jnp.float32, fixed_engine="pallas",
                interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(cfg, B=1, T=256, seed=1)
    a = forward(params, cfg, batch["x"], batch["h"], batch["d"],
                compute_dtype=jnp.bfloat16, fixed_engine="xla")
    b = forward(params, cfg, batch["x"], batch["h"], batch["d"],
                compute_dtype=jnp.bfloat16, fixed_engine="pallas",
                interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0.05, atol=0.05)


def _grad_parity(cfg, B, T, seed, dtype, rtol, atol):
    params = init_params(jax.random.PRNGKey(seed), cfg)
    batch = make_batch(cfg, B=B, T=T, seed=seed)
    la, ga = jax.value_and_grad(_loss)(params, cfg, batch, dtype, "xla")
    lb, gb = jax.value_and_grad(_loss)(params, cfg, batch, dtype, "pallas")
    np.testing.assert_allclose(float(la), float(lb), rtol=rtol)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    assert len(flat_a) == len(flat_b)
    for (path, va), vb in zip(flat_a, flat_b):
        name = jax.tree_util.keystr(path)
        va, vb = np.asarray(va, np.float64), np.asarray(vb, np.float64)
        scale = max(np.abs(va).max(), np.abs(vb).max(), 1e-8)
        err = np.abs(va - vb).max() / scale
        assert err < rtol or np.abs(va - vb).max() < atol, \
            f"{name}: rel {err:.2e} scale {scale:.2e}"


def test_gradient_parity_f32():
    """Per-leaf gradient agreement at 1e-5 (f32) — covers every fixed-stack
    weight, the causal embedding (through do0), the upsampler (through
    dh_up), and the adaptive stack behind the kernel."""
    _grad_parity(tiny_cfg(), B=2, T=256, seed=0, dtype=jnp.float32,
                 rtol=2e-5, atol=1e-7)


@pytest.mark.slow
def test_gradient_parity_f32_unaligned_T():
    _grad_parity(tiny_cfg(), B=1, T=192 + 32, seed=1, dtype=jnp.float32,
                 rtol=2e-5, atol=1e-7)


@pytest.mark.slow
def test_gradient_parity_bf16():
    """bf16 mode: the fused kernel's gradient deviation from f32 truth must
    be no worse than the XLA bf16 step's own deviation (the kernel keeps z
    in f32 where XLA-bf16 rounds it, so exact bf16-vs-bf16 agreement is
    not expected — closeness to the f32 gradient is the real gate)."""
    # width 32: wide enough that bf16 rounding averages instead of a few
    # relu-flip entries dominating the comparison
    cfg = tiny_cfg(n_resch=32, n_skipch=32)
    params = init_params(jax.random.PRNGKey(2), cfg)
    batch = make_batch(cfg, B=1, T=256, seed=2)
    _, g_true = jax.value_and_grad(_loss)(params, cfg, batch,
                                          jnp.float32, "xla")
    _, g_xla = jax.value_and_grad(_loss)(params, cfg, batch,
                                         jnp.bfloat16, "xla")
    _, g_pal = jax.value_and_grad(_loss)(params, cfg, batch,
                                         jnp.bfloat16, "pallas")

    def rel_errs(g):
        # Frobenius-relative: robust to single-element relu-mask flips
        # near zero, which dominate a max-norm at bf16
        errs = {}
        for (path, vt), v in zip(jax.tree_util.tree_leaves_with_path(g_true),
                                 jax.tree_util.tree_leaves(g)):
            vt, v = np.asarray(vt, np.float64), np.asarray(v, np.float64)
            scale = max(np.sqrt(np.mean(vt ** 2)), 1e-8)
            errs[jax.tree_util.keystr(path)] = \
                np.sqrt(np.mean((vt - v) ** 2)) / scale
        return errs

    e_xla, e_pal = rel_errs(g_xla), rel_errs(g_pal)
    sizes = {jax.tree_util.keystr(p): np.size(v) for p, v in
             jax.tree_util.tree_leaves_with_path(g_true)}
    for name in e_xla:
        # tiny leaves (up_w has 4 elements here) carry irreducible bf16
        # flip noise for BOTH engines; every real weight matrix holds the
        # 2x-of-XLA-bf16 rule with a 2e-2 floor
        floor = 2e-2 if sizes[name] >= 64 else 8e-2
        assert e_pal[name] <= max(2.0 * e_xla[name], floor), \
            f"{name}: pallas {e_pal[name]:.2e} vs xla-bf16 {e_xla[name]:.2e}"


@pytest.mark.slow
def test_loss_trajectory_bf16_tracks_f32():
    """bf16 fused-kernel training stays as close to the f32 trajectory as
    bf16 XLA training does (the round-2 bf16-adoption criterion, now
    applied to the kernel)."""
    import optax
    cfg = tiny_cfg()
    batch = make_batch(cfg, B=1, T=256, seed=7)
    tx = optax.adam(3e-3)

    def run(dtype, engine):
        params = init_params(jax.random.PRNGKey(7), cfg)
        opt = tx.init(params)
        losses = []
        for _ in range(12):
            loss, g = jax.value_and_grad(_loss)(params, cfg, batch,
                                                dtype, engine)
            up, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, up)
            losses.append(float(loss))
        return np.asarray(losses)

    lt = run(jnp.float32, "xla")
    lx = run(jnp.bfloat16, "xla")
    lp = run(jnp.bfloat16, "pallas")
    dev_x = np.abs(lx - lt).max()
    dev_p = np.abs(lp - lt).max()
    assert dev_p <= max(2.0 * dev_x, 0.02), (dev_p, dev_x)
    assert lp[-1] < lp[0]


def test_gradient_parity_deep_dilations():
    """Chunked backward: force multiple bwd chunks via a tiny budget."""
    cfg = tiny_cfg(dilationF_depth=4, dilationF_repeat=2)  # 8 layers
    import qpnet_tpu.ops.train_kernel as tk
    chunks = tk.choose_bwd_chunks(tuple(cfg.dilationsF), cfg.n_resch,
                                  cfg.n_skipch, TS=64)
    _grad_parity(cfg, B=1, T=256, seed=3, dtype=jnp.float32,
                 rtol=2e-5, atol=1e-7)


@pytest.mark.slow
def test_gradient_parity_forced_two_chunks(monkeypatch):
    """Explicitly exercise the chunk chaining (do boundary between bwd
    kernel calls)."""
    calls = []
    orig = TK._bwd_call

    def spy(*args, **kw):
        calls.append(kw.get("dils"))
        return orig(*args, **kw)

    monkeypatch.setattr(TK, "_bwd_call", spy)
    monkeypatch.setattr(TK, "VMEM_BUDGET", 1)  # force 1-layer chunks
    _grad_parity(tiny_cfg(), B=1, T=128, seed=4, dtype=jnp.float32,
                 rtol=2e-5, atol=1e-7)
    assert len(calls) == len(tiny_cfg().dilationsF)


def _loss_fused(params, cfg, batch, dtype, maxd_bucket):
    logits = forward(params, cfg, batch["x"], batch["h"], batch["d"],
                     compute_dtype=dtype, fixed_engine="pallas",
                     interpret=True, maxd_bucket=maxd_bucket)
    return masked_ce_loss(logits, batch["t"], batch["valid_len"])


@pytest.mark.parametrize("T", [256, 192 + 32])
def test_adaptive_fused_forward_parity_f32(T):
    """maxd_bucket set => the adaptive stack fuses into the kernel with
    frame-sliced gathers; must reproduce the XLA clip-gather exactly."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(10), cfg)
    batch = make_batch(cfg, B=2, T=T, seed=10)
    a = forward(params, cfg, batch["x"], batch["h"], batch["d"],
                compute_dtype=jnp.float32, fixed_engine="xla")
    b = forward(params, cfg, batch["x"], batch["h"], batch["d"],
                compute_dtype=jnp.float32, fixed_engine="pallas",
                interpret=True, maxd_bucket=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_adaptive_fused_gradient_parity_f32():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(11), cfg)
    batch = make_batch(cfg, B=2, T=256, seed=11)
    la, ga = jax.value_and_grad(_loss)(params, cfg, batch,
                                       jnp.float32, "xla")
    lb, gb = jax.value_and_grad(_loss_fused)(params, cfg, batch,
                                             jnp.float32, 4)
    np.testing.assert_allclose(float(la), float(lb), rtol=2e-5)
    for (path, va), vb in zip(jax.tree_util.tree_leaves_with_path(ga),
                              jax.tree_util.tree_leaves(gb)):
        name = jax.tree_util.keystr(path)
        va, vb = np.asarray(va, np.float64), np.asarray(vb, np.float64)
        scale = max(np.abs(va).max(), np.abs(vb).max(), 1e-8)
        err = np.abs(va - vb).max() / scale
        assert err < 2e-5 or np.abs(va - vb).max() < 1e-7, \
            f"{name}: rel {err:.2e}"


@pytest.mark.slow
def test_adaptive_fused_large_lookback_gradient():
    """Look-backs spanning multiple tiles (maxd*dil > TILE) exercise the
    multi-block history rebuild + carry shifting in the backward."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(12), cfg)
    rng = np.random.default_rng(12)
    B, T = 1, 320
    F = T // cfg.upsampling_factor
    batch = {
        "x": jnp.asarray(rng.integers(0, cfg.n_quantize, (B, T)), jnp.int32),
        "h": jnp.asarray(rng.normal(size=(B, F, cfg.n_aux)), jnp.float32),
        "t": jnp.asarray(rng.integers(0, cfg.n_quantize, (B, T)), jnp.int32),
        # d up to ~60: r = d*dil reaches ~120 >> TILE(64)
        "d": jnp.asarray(np.repeat(rng.uniform(30.0, 60.0, (B, F)),
                                   cfg.upsampling_factor, axis=1)[:, :T],
                         jnp.float32),
        "valid_len": jnp.asarray(T // 2, jnp.int32),
    }
    la, ga = jax.value_and_grad(_loss)(params, cfg, batch,
                                       jnp.float32, "xla")
    lb, gb = jax.value_and_grad(_loss_fused)(params, cfg, batch,
                                             jnp.float32, 64)
    np.testing.assert_allclose(float(la), float(lb), rtol=2e-5)
    for (path, va), vb in zip(jax.tree_util.tree_leaves_with_path(ga),
                              jax.tree_util.tree_leaves(gb)):
        va, vb = np.asarray(va, np.float64), np.asarray(vb, np.float64)
        scale = max(np.abs(va).max(), np.abs(vb).max(), 1e-8)
        assert np.abs(va - vb).max() / scale < 2e-5, \
            jax.tree_util.keystr(path)


def test_loss_trajectory_matches_xla():
    """A short optimization run with the fused kernel tracks the XLA step's
    loss trajectory (f32)."""
    import optax
    cfg = tiny_cfg()
    batch = make_batch(cfg, B=1, T=256, seed=5)
    tx = optax.adam(3e-3)

    def run(engine):
        params = init_params(jax.random.PRNGKey(5), cfg)
        opt = tx.init(params)
        losses = []
        grad_fn = jax.jit(jax.value_and_grad(_loss),
                          static_argnames=("dtype", "engine"),
                          static_argnums=(3, 4)) if False else \
            jax.value_and_grad(_loss)
        for _ in range(12):
            loss, g = grad_fn(params, cfg, batch, jnp.float32, engine)
            up, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, up)
            losses.append(float(loss))
        return losses

    la = run("xla")
    lb = run("pallas")
    np.testing.assert_allclose(la, lb, rtol=1e-3)
    assert lb[-1] < lb[0]
