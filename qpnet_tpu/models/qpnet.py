"""Quasi-Periodic WaveNet — TPU-native formulation.

Same math as the reference model (reference src/nets/qpnet.py:160-312) but
restructured for the TPU/XLA compilation model rather than translated:

* channels-last (B, T, C) layout so every 1x1/k=2 conv is a plain matmul on
  the last axis (C=512 is a multiple of the 128-lane MXU tiling);
* the one-hot + causal input conv (qpnet.py:60-79, 561-564) collapses into
  two embedding lookups — no 256-wide one-hot is ever materialized;
* each k=2 dilated conv (fixed stack, qpnet.py:657-670) is one matmul on the
  current samples plus one matmul on the d-shifted samples;
* the pitch-adaptive stack's data-dependent past sample
  x[t - round(d(t)*dilation)] (qpnet.py:592-640) is a `take_along_axis`
  gather along time — a traced value, so the *dynamic* receptive field never
  changes the compiled shape;
* sigmoid/tanh gate branches are fused into a single (C -> 2C) matmul, and
  skip/residual projections into a single (C -> S+C) matmul;
* sequences are kept full-length and end-aligned: instead of the reference's
  shrinking valid convolutions, past samples are shifted in with zero fill.
  Positions whose receptive field reaches into the fill are garbage but the
  loss/readout only touches the last `batch_length` positions, which are
  bit-equivalent to the reference's cropped computation.

Precision: compute_dtype=float32 is the bit-parity mode (reference math).
compute_dtype=bfloat16 is the mixed-precision training mode: bf16 matmuls
*and* bf16 activation storage between blocks (the step is HBM-bound once
matmuls run at the bf16 MXU rate, so halving activation traffic is the
lever), while cross-block reductions — the skip-connection sum and the
output logits — accumulate in f32, and master weights/optimizer state stay
f32.  Measured on v5e at the reference shape (B=1, 30030-sample window):
72 -> 45 ms/step, with a 400-iteration full-scale training trajectory
matching f32 CE to <0.007.

Rounding note: past-sample indices use round(d*dilation) (round-half-even,
same as reference generation qpnet.py:613-624). The reference's teacher-forced
path rounds (t - d*dilation) jointly (qpnet.py:592-611), which differs only on
exact .5 ties; we use the generation-consistent form on both paths so that
teacher-forced forward == autoregressive generation exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qpnet_tpu.config import ModelConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initialization (matches torch xavier_uniform over the reference conv shapes,
# reference qpnet.py:47-58)
# ---------------------------------------------------------------------------

def _xavier(key, shape, fan_in, fan_out, dtype=jnp.float32):
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    # jitted as ONE program (cfg is frozen/hashable): eagerly this is ~100
    # tiny dispatches plus a host fetch of the split keys — through this
    # image's tunneled TPU that is seconds of RTT when healthy and the first
    # thing to hang when the remote compile service wedges.  One cached
    # executable makes a fresh process's init a disk-cache hit instead.
    Q, A, R, S = cfg.n_quantize, cfg.n_aux, cfg.n_resch, cfg.n_skipch
    k = cfg.kernel_size
    assert k == 2, "kernel_size=2 is the only supported (and reference) value"
    keys = iter(jax.random.split(key, 8 + 8 * (len(cfg.dilationsF) + len(cfg.dilationsA))))

    def res_block(kind: str) -> Params:
        # fixed stack: one k=2 conv per branch -> fan 2R/2R (qpnet.py:213-214)
        # adaptive stack: two k=1 convs per branch -> fan R/R (qpnet.py:89-108)
        fan = 2 * R if kind == "fixed" else R
        return {
            "W_cur": jnp.concatenate(
                [_xavier(next(keys), (R, R), fan, fan, dtype) for _ in range(2)], axis=1),
            "W_prev": jnp.concatenate(
                [_xavier(next(keys), (R, R), fan, fan, dtype) for _ in range(2)], axis=1),
            "W_aux": jnp.concatenate(
                [_xavier(next(keys), (A, R), A, R, dtype) for _ in range(2)], axis=1),
            "b_gate": jnp.zeros((2 * R,), dtype),
            "W_skip": _xavier(next(keys), (R, S), R, S, dtype),
            "b_skip": jnp.zeros((S,), dtype),
            "W_res": _xavier(next(keys), (R, R), R, R, dtype),
            "b_res": jnp.zeros((R,), dtype),
        }

    causal_w = _xavier(next(keys), (2, Q, R), Q * k, R * k, dtype)
    params: Params = {
        # slices of the reference's single (R, Q, 2) causal conv weight
        "embed_prev": causal_w[0],
        "embed_cur": causal_w[1],
        "b_causal": jnp.zeros((R,), dtype),
        # ConvTranspose2d(1,1,(1,up),(1,up)) == per-phase scale + scalar bias,
        # initialized to exact frame repetition (qpnet.py:56-58, 134-158)
        "up_w": jnp.ones((cfg.upsampling_factor,), dtype),
        "up_b": jnp.zeros((), dtype),
        "fixed": [res_block("fixed") for _ in cfg.dilationsF],
        "adaptive": [res_block("adaptive") for _ in cfg.dilationsA],
        "W_post1": _xavier(next(keys), (S, S), S, S, dtype),
        "b_post1": jnp.zeros((S,), dtype),
        "W_post2": _xavier(next(keys), (S, Q), S, Q, dtype),
        "b_post2": jnp.zeros((Q,), dtype),
    }
    return params


def count_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# forward building blocks
# ---------------------------------------------------------------------------

def upsample_aux(params: Params, h: jnp.ndarray, up: int) -> jnp.ndarray:
    """(B, F, A) frame-rate aux -> (B, F*up, A) sample rate.

    Learned per-phase scale/bias shared across channels — the exact function
    computed by the reference's 1-channel ConvTranspose2d (qpnet.py:134-158).
    """
    B, F, A = h.shape
    h_up = jnp.repeat(h, up, axis=1)
    phase = jnp.tile(params["up_w"], F)  # (F*up,)
    return h_up * phase[None, :, None] + params["up_b"]


def shift_time(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """x[:, t-d] with zero fill for t<d (end-aligned causal shift)."""
    if d == 0:
        return x
    pad = [(0, 0), (d, 0)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad)[:, : x.shape[1]]


def _gate(z: jnp.ndarray, R: int) -> jnp.ndarray:
    return jax.nn.sigmoid(z[..., :R]) * jnp.tanh(z[..., R:])


def _matmul(a, w, dtype, out_dtype=jnp.float32):
    """Matmul on the last axis with inputs cast to `dtype`.

    out_dtype controls the *stored* result precision: the mixed-precision
    training path keeps intermediate activations in bf16 (halves the HBM
    traffic that bounds the step once matmuls run at the bf16 MXU rate)
    while reductions that accumulate across blocks (skip sum, logits) stay
    f32.
    """
    return jax.lax.dot_general(
        a.astype(dtype), w.astype(dtype),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=out_dtype)


def _act_dtype(dtype):
    """Activation storage dtype for a given matmul compute dtype: f32 math
    stores f32 (bit-parity mode); bf16 math also *stores* bf16."""
    return jnp.float32 if dtype == jnp.float32 else dtype


def fixed_block(p: Params, o: jnp.ndarray, h_up: jnp.ndarray, dil: int,
                R: int, dtype, *, act_dtype=None
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One fixed residual block (reference qpnet.py:657-670).

    act_dtype overrides the activation storage dtype (the decode engines'
    priming pass keeps f32 accumulation regardless of the matmul dtype so
    primed ring buffers match the per-step scan math bit-for-bit)."""
    act = act_dtype if act_dtype is not None else _act_dtype(dtype)
    z = (_matmul(o, p["W_cur"], dtype, act)
         + _matmul(shift_time(o, dil), p["W_prev"], dtype, act)
         + _matmul(h_up, p["W_aux"], dtype, act)
         + p["b_gate"].astype(act))
    g = _gate(z, R)
    skip = _matmul(g, p["W_skip"], dtype) + p["b_skip"]
    res = _matmul(g, p["W_res"], dtype, act) + p["b_res"].astype(act)
    return o + res, skip


def adaptive_block(p: Params, o: jnp.ndarray, h_up: jnp.ndarray,
                   r: jnp.ndarray, R: int, dtype, *, act_dtype=None
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One pitch-adaptive residual block (reference qpnet.py:626-640).

    r: (B, T) int32 = round(d(t) * dilation), the per-sample look-back.
    act_dtype: see fixed_block.
    """
    B, T, _ = o.shape
    act = act_dtype if act_dtype is not None else _act_dtype(dtype)
    t = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    idx = jnp.clip(t - r, 0, T - 1)
    past = jnp.take_along_axis(o, idx[..., None], axis=1)
    z = (_matmul(o, p["W_cur"], dtype, act)
         + _matmul(past, p["W_prev"], dtype, act)
         + _matmul(h_up, p["W_aux"], dtype, act)
         + p["b_gate"].astype(act))
    g = _gate(z, R)
    skip = _matmul(g, p["W_skip"], dtype) + p["b_skip"]
    res = _matmul(g, p["W_res"], dtype, act) + p["b_res"].astype(act)
    return o + res, skip


def postprocess(params: Params, skip_sum: jnp.ndarray, dtype) -> jnp.ndarray:
    u = jax.nn.relu(skip_sum)
    u = jax.nn.relu(_matmul(u, params["W_post1"], dtype) + params["b_post1"])
    return _matmul(u, params["W_post2"], dtype) + params["b_post2"]


# ---------------------------------------------------------------------------
# teacher-forced forward
# ---------------------------------------------------------------------------

def forward(params: Params, cfg: ModelConfig,
            x: jnp.ndarray, h: jnp.ndarray, d: jnp.ndarray,
            compute_dtype=jnp.float32, h_up: Optional[jnp.ndarray] = None,
            remat: bool = False, fixed_engine: str = "xla",
            interpret: bool = False,
            maxd_bucket: Optional[int] = None) -> jnp.ndarray:
    """Teacher-forced forward over a full window.

    Args:
      x: (B, T) int32 mu-law classes, end-aligned window including the
         receptive-field history (left side may be fill; only the last
         `batch_length` outputs are valid, as in reference qpnet.py:239-312).
      h: (B, T // upsampling_factor, n_aux) standardized frame-rate aux
         (ignored when a precomputed sample-rate `h_up` (B, T, n_aux) is
         given).
      d: (B, T) float32 pitch-dependent dilation factors at sample rate.
      fixed_engine: "xla" runs the fixed stack as the block loop below;
         "pallas" runs it as the fused Pallas fwd+bwd custom-VJP kernel
         (ops/train_kernel.py) — same math, weights resident in VMEM.
         Causal embedding and post-net always stay in XLA.
      maxd_bucket: with fixed_engine="pallas", a static bucket >=
         ceil(max(d)) ALSO fuses the pitch-adaptive stack into the kernel
         (frame-sliced gathers) — requires d to be frame-constant, which
         the training batcher guarantees; None keeps the adaptive stack
         in XLA (any d).
    Returns:
      (B, T, n_quantize) float32 logits; logits[:, t] predicts x[t+1].
    """
    R = cfg.n_resch
    act = _act_dtype(compute_dtype)
    if h_up is None:
        h_up = upsample_aux(params, h, cfg.upsampling_factor)
    h_up = h_up.astype(act)
    # causal input layer: c[t] = E_cur[x[t]] + E_prev[x[t-1]] + b
    o = (jnp.take(params["embed_cur"], x, axis=0)
         + shift_time(jnp.take(params["embed_prev"], x, axis=0), 1)
         + params["b_causal"]).astype(act)

    # rematerialize each residual block in the backward pass: stores only the
    # (B, T, R) block boundaries instead of every gate activation — the
    # HBM-for-FLOPs trade that lets batch>1 windows of 30k samples fit
    fblock = jax.checkpoint(fixed_block, static_argnums=(3, 4, 5)) if remat else fixed_block
    ablock = jax.checkpoint(adaptive_block, static_argnums=(4, 5)) if remat else adaptive_block

    skip_sum = jnp.zeros(o.shape[:2] + (cfg.n_skipch,), jnp.float32)
    if fixed_engine == "pallas":
        from qpnet_tpu.ops import train_kernel as TK
        A = cfg.n_aux
        # maxd_bucket set => the adaptive stack fuses into the kernel too
        # (requires frame-constant d, which the training batcher produces)
        fuse_adaptive = maxd_bucket is not None and len(cfg.dilationsA) > 0
        layers = list(params["fixed"]) + (
            list(params["adaptive"]) if fuse_adaptive else [])
        W = {
            "W_in": jnp.stack([
                jnp.concatenate([p["W_cur"], p["W_prev"]], axis=0)
                for p in layers]),
            "W_aux": jnp.stack([
                jnp.pad(p["W_aux"], ((0, TK.AUX_PAD - A), (0, 0)))
                for p in layers]),
            "b_gate": jnp.stack([p["b_gate"] for p in layers]),
            "W_out": jnp.stack([
                jnp.concatenate([p["W_skip"], p["W_res"]], axis=1)
                for p in layers]),
            "b_res": jnp.stack([p["b_res"] for p in layers]),
        }
        B, T = o.shape[:2]
        up = cfg.upsampling_factor
        TS = TK.tile_for(up)
        Tp = -(-T // TS) * TS
        o_pad = jnp.pad(o, ((0, 0), (0, Tp - T), (0, 0)))
        h_pad = jnp.pad(h_up, ((0, 0), (0, Tp - T), (0, TK.AUX_PAD - A)))
        dtype_name = ("bfloat16" if compute_dtype == jnp.bfloat16
                      else "float32")
        if fuse_adaptive:
            d_frames = jnp.pad(
                d[:, ::up].astype(jnp.float32),
                ((0, 0), (0, Tp // up - d[:, ::up].shape[1])),
                constant_values=1.0)
            static = (tuple(cfg.dilationsF), tuple(cfg.dilationsA),
                      int(maxd_bucket), up, R, cfg.n_skipch)
        else:
            d_frames = None
            static = (tuple(cfg.dilationsF), (), 1, up, R, cfg.n_skipch)
        o_fx, skip = TK.fixed_stack_fused(
            static, dtype_name, interpret, W, o_pad, h_pad, d_frames)
        o = o_fx[:, :T]
        skip_sum = skip_sum + skip[:, :T] \
            + sum(p["b_skip"] for p in layers)
        adaptive_rest = [] if fuse_adaptive else \
            list(zip(params["adaptive"], cfg.dilationsA))
    else:
        for p, dil in zip(params["fixed"], cfg.dilationsF):
            o, skip = fblock(p, o, h_up, dil, R, compute_dtype)
            skip_sum = skip_sum + skip
        adaptive_rest = list(zip(params["adaptive"], cfg.dilationsA))
    for p, dil in adaptive_rest:
        r = jnp.round(d * dil).astype(jnp.int32)
        o, skip = ablock(p, o, h_up, r, R, compute_dtype)
        skip_sum = skip_sum + skip
    return postprocess(params, skip_sum, compute_dtype)


@dataclasses.dataclass
class QPNet:
    """Convenience wrapper bundling config + pure functions."""

    cfg: ModelConfig
    compute_dtype: Any = jnp.float32

    def init(self, key: jax.Array) -> Params:
        return init_params(key, self.cfg)

    def apply(self, params: Params, x, h, d) -> jnp.ndarray:
        return forward(params, self.cfg, x, h, d, self.compute_dtype)
