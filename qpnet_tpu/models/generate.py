"""Autoregressive fast-WaveNet generation as a single `lax.scan`.

The reference generates one sample per Python iteration with per-layer
buffer concatenation and `cuda.empty_cache()` calls (reference
qpnet.py:314-559) — tens of thousands of kernel launches per second of audio.
Here the entire loop is one compiled scan:

* per-layer ring buffers live in the scan carry; reads/writes are
  O(channels) dynamic-slice ops at slot `t mod size` — no rolling copies;
* the per-step layer stack is two fused matmuls per residual block
  ([current; past] @ W_in and gate @ [W_skip | W_res]);
* buffers are primed by one teacher-forced pass over the padded history
  (mirroring reference qpnet.py:354-440: pad value = n_quantize//2, the
  *upsampled* aux replicate-padded at sample level, dilation factors 1.0);
* finished utterances keep generating into padding instead of the
  reference's dynamic batch shrink (qpnet.py:527-557) — static shapes win
  under XLA; callers slice `samples[i, :n_samples[i]]`.

The per-sample look-back of adaptive layer `l` is r = round(d(t) * dil_l),
identical to reference `_generate_dilated_index` (qpnet.py:613-624).

The maximum dilation factor is *bucketed* to a static value so buffer sizes
compile once per bucket; a larger bucket only enlarges buffers, never changes
results.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models.qpnet import (
    Params, _gate, _matmul, adaptive_block, fixed_block, shift_time,
    upsample_aux,
)

MAXD_BUCKETS = (1, 2, 4, 8, 16, 32, 48, 64, 96, 128)


def bucket_maxd(maxd: float) -> int:
    for b in MAXD_BUCKETS:
        if maxd <= b:
            return b
    return int(np.ceil(maxd))


def _quantize_int8(w: jnp.ndarray):
    """Per-output-column symmetric int8 weight quantization."""
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _fused_weights(params: Params, dtype, quantize: str = "none"):
    """Pre-concatenate per-layer weights for the one-matmul-per-block step.

    quantize="int8_weights" stores the two large per-block matrices as int8 with
    per-column scales — weight-only quantization that halves the per-step
    HBM weight traffic, which is the AR generation bottleneck (the whole
    24M-param model streams from HBM every emitted sample).
    """
    def fuse(p):
        W_in = jnp.concatenate([p["W_cur"], p["W_prev"]], axis=0)
        W_out = jnp.concatenate([p["W_skip"], p["W_res"]], axis=1)
        d = {
            "W_aux": p["W_aux"].astype(dtype),
            "b_gate": p["b_gate"].astype(jnp.float32),
            "b_skip": p["b_skip"].astype(jnp.float32),
            "b_res": p["b_res"].astype(jnp.float32),
        }
        if quantize == "int8_weights":
            d["W_in_q"], d["s_in"] = _quantize_int8(W_in)
            d["W_out_q"], d["s_out"] = _quantize_int8(W_out)
        else:
            d["W_in"] = W_in.astype(dtype)
            d["W_out"] = W_out.astype(dtype)
        return d

    return ([fuse(p) for p in params["fixed"]],
            [fuse(p) for p in params["adaptive"]])


def _wmatmul(x, p, key, dtype):
    """x @ W for a fused weight entry, dequantizing int8 on the fly (the
    convert+scale fuses into the matmul operand read under XLA)."""
    if key + "_q" in p:
        y = _matmul(x, p[key + "_q"].astype(dtype), dtype)
        return y * p["s_" + key.split("_")[1]]
    return _matmul(x, p[key], dtype)


def _prime_activations(params: Params, cfg: ModelConfig,
                       x_ctx: jnp.ndarray, h_up_ctx: jnp.ndarray,
                       d_ctx: jnp.ndarray, dtype):
    """Teacher-forced pass over the history context; returns the list of
    layer-*input* activations (causal output first), shape (B, Tc, R) each."""
    R = cfg.n_resch
    o = (jnp.take(params["embed_cur"], x_ctx, axis=0)
         + shift_time(jnp.take(params["embed_prev"], x_ctx, axis=0), 1)
         + params["b_causal"]).astype(jnp.float32)
    acts = [o]
    # act_dtype=f32: priming must match the per-step scan body, which
    # accumulates z/out in f32 (bf16 `dtype` only selects the matmul
    # input precision here, exactly as in the step)
    for p, dil in zip(params["fixed"], cfg.dilationsF):
        o, _ = fixed_block(p, o, h_up_ctx, dil, R, dtype,
                           act_dtype=jnp.float32)
        acts.append(o)
    for p, dil in zip(params["adaptive"], cfg.dilationsA):
        r = jnp.round(d_ctx * dil).astype(jnp.int32)
        o, _ = adaptive_block(p, o, h_up_ctx, r, R, dtype,
                              act_dtype=jnp.float32)
        acts.append(o)
    return acts  # len = 1 + nF + nA; acts[i] is input of layer i


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "maxd", "mode", "compute_dtype",
                     "quantize", "const_seed"))
def _generate_scan(params: Params, cfg: ModelConfig,
                   x_seed: jnp.ndarray, h: jnp.ndarray, d: jnp.ndarray,
                   key: jax.Array, n_steps: int, maxd: int,
                   mode: str = "sampling",
                   compute_dtype=jnp.bfloat16,
                   quantize: str = "none",
                   const_seed: bool = False,
                   forced_x=None) -> jnp.ndarray:
    """Core compiled generation.

    Args:
      x_seed: (B, rf+1) int32 — mid-scale-padded seed history; the last
              element is the seed sample (timeline position rf).
      h: (B, F, A) frame-rate standardized aux (zero-padded across batch).
         Upsampled on device; sample position rf+i reads h_up[:, i] — the
         history context [0, rf) reads a replicate-pad of h_up[:, 0]
         (reference qpnet.py:343-364 pads the upsampled aux with 'replicate').
      d: (B, >= n_steps) float32 sample-rate dilation factors for the
         generated region (position rf+i uses d[:, i]).
      forced_x: (B, n_steps) int32, required iff mode="forced" — the
         sample each step emits (teacher forcing) in place of its own
         sampled/argmax feedback.
    Returns:
      (B, n_steps) int32 generated mu-law samples; in forced mode,
      (B, n_steps, n_quantize) f32 per-step logits instead.
    """
    R, S = cfg.n_resch, cfg.n_skipch
    dilsF, dilsA = cfg.dilationsF, cfg.dilationsA
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    B = x_seed.shape[0]
    assert x_seed.shape[1] == rf + 1

    h_up = upsample_aux(params, h, cfg.upsampling_factor)  # (B, F*up, A)

    fixedW, adaptW = _fused_weights(params, compute_dtype, quantize)
    embed_cur = params["embed_cur"].astype(jnp.float32)
    embed_prev = params["embed_prev"].astype(jnp.float32)
    b_causal = params["b_causal"].astype(jnp.float32)
    W_post1 = params["W_post1"].astype(compute_dtype)
    W_post2 = params["W_post2"].astype(compute_dtype)
    b_post1, b_post2 = params["b_post1"], params["b_post2"]

    # --- prime ring buffers over positions [0, rf-1] (excludes the seed;
    # reference qpnet.py:367 primes on x[:, :-1]); the scan counts absolute
    # time from rf, hence t0=rf (the pallas engine uses t0=0)
    sizesF = list(dilsF)
    sizesA = [maxd * dil for dil in dilsA]
    bufsF, bufsA = _prime_ring_buffers(
        params, cfg, None, h_up[:, 0], maxd, compute_dtype, t0=rf,
        x_seed_alias=x_seed, const_seed=const_seed)

    def step(carry, inp):
        (x_prev, x_cur, bufsF, bufsA, t) = carry
        if mode == "forced":
            h_t, r_t, key_t, f_t = inp
        else:
            h_t, r_t, key_t = inp  # h_t: (B, A); r_t: (B, nA) int32
        o = (jnp.take(embed_cur, x_cur, axis=0)
             + jnp.take(embed_prev, x_prev, axis=0) + b_causal)
        skip_sum = jnp.zeros((B, S), jnp.float32)
        newF: List[jnp.ndarray] = []
        for li, (p, dil) in enumerate(zip(fixedW, dilsF)):
            buf, size = bufsF[li], sizesF[li]
            slot = jax.lax.rem(t, size)
            past = jax.lax.dynamic_slice_in_dim(buf, slot, 1, axis=1)[:, 0]
            z = (_wmatmul(jnp.concatenate([o, past], axis=-1), p, "W_in",
                          compute_dtype)
                 + _matmul(h_t, p["W_aux"], compute_dtype) + p["b_gate"])
            g = _gate(z, R)
            out = _wmatmul(g, p, "W_out", compute_dtype)
            skip_sum = skip_sum + out[:, :S] + p["b_skip"]
            newF.append(jax.lax.dynamic_update_slice_in_dim(
                buf, o[:, None, :].astype(buf.dtype), slot, axis=1))
            o = o + out[:, S:] + p["b_res"]
        newA: List[jnp.ndarray] = []
        for li, (p, dil) in enumerate(zip(adaptW, dilsA)):
            buf, size = bufsA[li], sizesA[li]
            r = jnp.clip(r_t[:, li], 0, size)
            read_slot = jax.lax.rem(t - r + size, size)  # (B,)
            past = jnp.take_along_axis(
                buf, read_slot[:, None, None].astype(jnp.int32), axis=1)[:, 0]
            # r==0 means "current sample" in the teacher-forced gather
            # (idx = t - 0); the ring holds only past values, so select o
            past = jnp.where((r == 0)[:, None], o, past)
            slot = jax.lax.rem(t, size)
            z = (_wmatmul(jnp.concatenate([o, past], axis=-1), p, "W_in",
                          compute_dtype)
                 + _matmul(h_t, p["W_aux"], compute_dtype) + p["b_gate"])
            g = _gate(z, R)
            out = _wmatmul(g, p, "W_out", compute_dtype)
            skip_sum = skip_sum + out[:, :S] + p["b_skip"]
            newA.append(jax.lax.dynamic_update_slice_in_dim(
                buf, o[:, None, :].astype(buf.dtype), slot, axis=1))
            o = o + out[:, S:] + p["b_res"]
        u = jax.nn.relu(skip_sum)
        u = jax.nn.relu(_matmul(u, W_post1, compute_dtype) + b_post1)
        logits = _matmul(u, W_post2, compute_dtype) + b_post2
        if mode == "sampling":
            x_next = jax.random.categorical(key_t, logits, axis=-1).astype(jnp.int32)
        elif mode == "argmax":
            x_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        elif mode == "forced":
            # teacher forcing: feed the given stream back instead of the
            # model's own sample, and emit the full logits — the strict
            # per-step equivalence pin (no chaotic AR divergence)
            x_next = f_t.astype(jnp.int32)
            return (x_cur, x_next, newF, newA, t + 1), \
                logits.astype(jnp.float32)
        else:
            raise ValueError("mode should be sampling, argmax or forced")
        return (x_cur, x_next, newF, newA, t + 1), x_next

    h_steps = jnp.moveaxis(h_up[:, :n_steps], 0, 1)  # (T, B, A)
    d_steps = d[:, :n_steps]
    r_steps = jnp.stack(
        [jnp.round(d_steps * dil).astype(jnp.int32) for dil in dilsA],
        axis=-1)  # (B, T, nA)
    r_steps = jnp.moveaxis(r_steps, 0, 1)  # (T, B, nA)
    keys = jax.random.split(key, n_steps)

    carry0 = (x_seed[:, -2], x_seed[:, -1], bufsF, bufsA, jnp.int32(rf))
    if mode == "forced":
        xs = (h_steps, r_steps, keys, jnp.moveaxis(forced_x, 0, 1))
    else:
        xs = (h_steps, r_steps, keys)
    _, samples = jax.lax.scan(step, carry0, xs)
    return jnp.moveaxis(samples, 0, 1)  # (B, n_steps[, Q])


def _prime_ring_buffers(params: Params, cfg: ModelConfig,
                        x_seed, h0_up, maxd: int, compute_dtype, t0: int,
                        x_seed_alias=None, const_seed: bool = False,
                        ring_pad: int = 0):
    """Teacher-forced priming pass shared by both engines; returns per-layer
    ring buffers laid out for a consumer whose first step is time `t0`
    (the XLA scan counts absolute time from rf; the pallas kernel counts
    from 0 — rolling for the wrong origin misplaces the primed history
    whenever rf % size != 0).

    const_seed=True (the recipe case: a single-sample seed, so the padded
    history is ALL mid-scale): with constant inputs and d=1, the layer
    activations are bitwise time-invariant once past the d=1 receptive
    field (~62 positions), so the priming pass runs over a short window and
    the final activation broadcasts into every ring slot — identical
    buffers at a fraction of the FLOPs (the full pass is O(rf)=O(maxd))."""
    if x_seed is None:
        x_seed = x_seed_alias
    B = x_seed.shape[0]
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    sizesF = list(cfg.dilationsF)
    # ring_pad=1 for the pallas kernel, whose adaptive rings carry one
    # extra slot (write-before-read serves the r=0 look-back)
    sizesA = [maxd * dil + ring_pad for dil in cfg.dilationsA]
    if const_seed:
        # d=1 receptive field + margin; independent of maxd
        W = (cfg.receptive_causal + cfg.receptiveF
             + sum(cfg.dilationsA) + 16)
        x_ctx = jnp.broadcast_to(x_seed[:, :1], (B, W))
        h_up_ctx = jnp.broadcast_to(jnp.asarray(h0_up)[:, None, :],
                                    (B, W, h0_up.shape[-1]))
        d_ctx = jnp.ones((B, W), jnp.float32)
        acts = _prime_activations(params, cfg, x_ctx, h_up_ctx, d_ctx,
                                  compute_dtype)
        bufsF = [jnp.broadcast_to(acts[i][:, -1:], (B, s, acts[i].shape[-1]))
                 for i, s in enumerate(sizesF)]
        bufsA = [jnp.broadcast_to(acts[len(sizesF) + i][:, -1:],
                                  (B, s, acts[0].shape[-1]))
                 for i, s in enumerate(sizesA)]
        return bufsF, bufsA
    h_up_ctx = jnp.broadcast_to(jnp.asarray(h0_up)[:, None, :],
                                (B, rf, h0_up.shape[-1]))
    d_ctx = jnp.ones((B, rf), jnp.float32)
    acts = _prime_activations(params, cfg, jnp.asarray(x_seed[:, :-1]),
                              h_up_ctx, d_ctx, compute_dtype)
    # tail act[:, rf-size:rf] holds times t0-size..t0-1; slot of time tau
    # is tau mod size == (j + t0) mod size for tail index j
    bufsF = [jnp.roll(acts[i][:, rf - s: rf], t0, axis=1)
             for i, s in enumerate(sizesF)]
    bufsA = [jnp.roll(acts[len(sizesF) + i][:, rf - s: rf], t0, axis=1)
             for i, s in enumerate(sizesA)]
    return bufsF, bufsA


def _pallas_device_core(params, cfg, x_seed, h_pad, d_frames, seed,
                        b_offset, maxd, n_steps, mode, interpret,
                        quantize="none", const_seed: bool = False,
                        x_forced=None):
    """Device-side pallas pipeline: weight packing, the priming pass,
    buffer layout, and the mega-kernel.  Pure traced function — jitted
    directly for single-chip, or called per-shard under shard_map."""
    from qpnet_tpu.ops.gen_kernel import pack_weights, pallas_generate
    B = x_seed.shape[0]
    A = cfg.n_aux
    packed = pack_weights(params, cfg, quantize)
    h0_up = h_pad[0, :, :A] * params["up_w"][0] + params["up_b"]
    bufsF, bufsA = _prime_ring_buffers(params, cfg, x_seed, h0_up, maxd,
                                       jnp.float32, t0=0,
                                       const_seed=const_seed, ring_pad=1)
    bufF0 = jnp.concatenate(
        [jnp.moveaxis(b, 0, 1).astype(jnp.bfloat16) for b in bufsF], axis=0)
    bufA0 = jnp.concatenate(
        [jnp.moveaxis(b, 0, 1).astype(jnp.bfloat16) for b in bufsA], axis=0)
    x0 = jnp.stack([x_seed[:, -2], x_seed[:, -1]]).astype(jnp.int32)
    out = pallas_generate(
        packed, cfg, bufF0, bufA0, x0,
        h_pad.astype(jnp.bfloat16), d_frames, seed,
        B=B, maxd=maxd, n_steps=n_steps, mode=mode, interpret=interpret,
        quantize=quantize, b_offset=b_offset, x_forced=x_forced)[0]
    if mode != "forced" and cfg.n_quantize <= 256:
        # mu-law classes fit uint8: quarters the device->host transfer
        # (the tunnel round-trip is a fixed cost of every decode call)
        return out.astype(jnp.uint8)
    return out


@functools.partial(
    jax.jit, static_argnames=("cfg", "maxd", "quantize", "const_seed"))
def _pallas_prologue(params, cfg, x_seed, h_pad0, maxd, quantize,
                     const_seed):
    """Weight packing + ring priming for the chunked decode path: one jit,
    outputs stay device-resident across the per-chunk kernel calls."""
    from qpnet_tpu.ops.gen_kernel import pack_weights
    B = x_seed.shape[0]
    A = cfg.n_aux
    packed = pack_weights(params, cfg, quantize)
    h0_up = h_pad0[:, :A] * params["up_w"][0] + params["up_b"]
    bufsF, bufsA = _prime_ring_buffers(params, cfg, x_seed, h0_up, maxd,
                                       jnp.float32, t0=0,
                                       const_seed=const_seed, ring_pad=1)
    bufF0 = jnp.concatenate(
        [jnp.moveaxis(b, 0, 1).astype(jnp.bfloat16) for b in bufsF], axis=0)
    bufA0 = jnp.concatenate(
        [jnp.moveaxis(b, 0, 1).astype(jnp.bfloat16) for b in bufsA], axis=0)
    x0 = jnp.stack([x_seed[:, -2], x_seed[:, -1]]).astype(jnp.int32)
    return packed, bufF0, bufA0, x0


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "maxd", "n_steps", "mode", "interpret",
                     "quantize", "const_seed"))
def _pallas_device_path(params, cfg, x_seed, h_pad, d_frames, seed,
                        b_offset, maxd, n_steps, mode, interpret,
                        quantize="none", const_seed: bool = False,
                        x_forced=None):
    """Single-chip jit of the pallas pipeline.  (Running the prologue
    eagerly costs seconds of per-op dispatch + host round-trips.)

    b_offset: traced scalar — this call's first utterance's GLOBAL batch
    index, so a batch split into VMEM-fitting sub-batches samples the same
    PRNG streams as one oversized call would."""
    return _pallas_device_core(params, cfg, x_seed, h_pad, d_frames, seed,
                               b_offset, maxd, n_steps, mode, interpret,
                               quantize, const_seed, x_forced)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "maxd", "n_steps", "mode", "interpret",
                     "quantize", "const_seed", "mesh", "sub_B"))
def _pallas_sharded_path(params, cfg, x_seed, h_pad, d_frames, seed,
                         maxd, n_steps, mode, interpret, quantize,
                         const_seed, mesh, sub_B=0):
    """Multi-chip pallas decode: the utterance batch shards over the `dp`
    mesh axis, each chip runs the full VMEM-resident kernel on its slice —
    the mesh-native form of the reference's per-GPU process fan-out
    (qpnet_decode.py:322-331) at full per-chip speed.  The counter-based
    sampling PRNG keys off the GLOBAL utterance index, so output is
    bit-identical to the single-chip engine.

    sub_B > 0 splits each chip's slice into balanced sub-batches run
    sequentially per chip (the mesh form of _pallas_split_path): a
    per-chip batch over the VMEM budget or the 64-slot throughput optimum
    keeps the pallas engine instead of falling back to the ~3x slower
    scan.  b_offset stays the GLOBAL row index, so splitting is invisible
    in the output here too."""
    from jax.sharding import PartitionSpec as P
    shard_map = jax.shard_map

    n_dev = mesh.devices.size
    B = x_seed.shape[0]
    local_B = B // n_dev

    def one_slice(params, x_seed, h_pad, d_frames, seed, b_off):
        return _pallas_device_core(
            params, cfg, x_seed, h_pad, d_frames, seed, b_off,
            maxd, n_steps, mode, interpret, quantize, const_seed)

    def per_shard(params, x_seed, h_pad, d_frames, seed):
        base = jax.lax.axis_index("dp") * local_B
        if sub_B <= 0 or sub_B >= local_B:
            return one_slice(params, x_seed, h_pad, d_frames, seed, base)
        outs = []
        for s0 in range(0, local_B, sub_B):
            s1 = min(s0 + sub_B, local_B)
            pad = sub_B - (s1 - s0)
            xs = x_seed[s0:s1]
            hs = h_pad[:, s0:s1]
            ds = d_frames[:, :, s0:s1]
            if pad:
                # final short slice pads up to sub_B: one kernel shape
                xs = jnp.concatenate(
                    [xs, jnp.repeat(xs[-1:], pad, 0)], 0)
                hs = jnp.concatenate(
                    [hs, jnp.repeat(hs[:, -1:], pad, 1)], 1)
                ds = jnp.concatenate(
                    [ds, jnp.repeat(ds[:, :, -1:], pad, 2)], 2)
            out = one_slice(params, xs, hs, ds, seed, base + s0)
            outs.append(out[:, :, : s1 - s0])
        return jnp.concatenate(outs, axis=2)

    return shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P("dp"), P(None, "dp"), P(None, None, "dp"), P()),
        out_specs=P(None, None, "dp"),
        check_vma=False,
    )(params, x_seed, h_pad, d_frames, seed)


def _pallas_host_prep(cfg: ModelConfig, h: np.ndarray, d: np.ndarray,
                      n_steps: int):
    """Frame-major kernel input layout (h as bf16 — the kernel computes in
    bf16 anyway, and it halves the host->device transfer)."""
    import ml_dtypes
    from qpnet_tpu.ops.gen_kernel import AUX_PAD
    B, F, A = h.shape
    up = cfg.upsampling_factor
    # bucket n_steps to 10-frame granularity: coarser buckets waste real
    # generation steps (a 100-frame bucket padded 2 s of audio by 25%),
    # finer ones recompile per utterance length.  Decode batches are
    # sorted by length, so one compile serves a whole batch and the
    # in-process cache serves repeats.
    chunk = 10 * up
    n_pad_steps = -(-n_steps // chunk) * chunk
    F_needed = -(-n_pad_steps // up)
    h_pad = np.zeros((F_needed, B, AUX_PAD), np.float32)
    h_pad[:min(F, F_needed), :, :A] = np.moveaxis(h, 0, 1)[:F_needed]
    if F < F_needed:
        h_pad[F:] = h_pad[F - 1]
    d_frames = np.ones((F_needed, 1, B), np.float32)
    d_fr = d[:, ::up]
    d_frames[:min(d_fr.shape[1], F_needed), 0] = \
        np.moveaxis(d_fr, 0, 1)[:F_needed]
    return h_pad.astype(ml_dtypes.bfloat16), d_frames, n_pad_steps


_to_uint8 = jax.jit(lambda a: a.astype(jnp.uint8))

# full chunks of this many frames bound the distinct kernel compiles for a
# production corpus: any utterance decodes as N full chunks + one 10-frame-
# bucketed tail, so the in-process compile cache tops out at ~1 + chunk/10
# kernels instead of one per distinct utterance length
DECODE_CHUNK_FRAMES = int(os.environ.get("QPNET_DECODE_CHUNK_FRAMES", "400"))


def _pallas_path(params: Params, cfg: ModelConfig, x_seed: np.ndarray,
                 h: np.ndarray, d: np.ndarray, n_steps: int, maxd: int,
                 seed: int, mode: str, interpret: bool,
                 quantize: str = "none",
                 const_seed: bool = False,
                 b_offset: int = 0) -> np.ndarray:
    """Generation via the VMEM-resident mega-kernel (ops/gen_kernel.py)."""
    from qpnet_tpu.ops.gen_kernel import resolve_stream_min_dil
    B_req = x_seed.shape[0]
    # ring streaming DMAs (W, B, R) windows between HBM and VMEM, and
    # Mosaic requires the sublane dim (B) of a sliced transfer to be
    # 8-aligned — pad the batch up front (the VMEM cost model already
    # charges the padded batch, so the fit decision is unchanged) by
    # replicating the last utterance; padded rows are sliced off below.
    # The counter PRNG keys off per-row indices, so real rows'
    # streams are identical with and without the padding.
    if (B_req % 8
            and resolve_stream_min_dil(cfg, B_req, maxd, quantize)
            is not None):
        padB = (-B_req) % 8
        x_seed = np.concatenate(
            [x_seed, np.repeat(x_seed[-1:], padB, 0)], 0)
        h = np.concatenate([h, np.repeat(h[-1:], padB, 0)], 0)
        d = np.concatenate([d, np.repeat(d[-1:], padB, 0)], 0)
    h_pad, d_frames, n_pad_steps = _pallas_host_prep(cfg, h, d, n_steps)
    up = cfg.upsampling_factor
    chunk_steps = DECODE_CHUNK_FRAMES * up
    # the fused single-jit program is only admitted under the measured
    # batch ceiling (fused_batch_ok); batch_fast_generate already splits
    # oversized batches before getting here, so this guard only trips for
    # direct callers — who get the standalone-kernel chunked path below,
    # measured safe at batches the fused program crashes at (interpret
    # mode simulates, no crash surface)
    fused_ok = interpret or _fused_batch_ok(
        cfg, x_seed.shape[0], maxd, quantize)
    if n_pad_steps <= chunk_steps and fused_ok:
        # single fused jit (prologue + kernel): the common case and the
        # lowest-overhead one
        out = _pallas_device_path(
            params, cfg, jnp.asarray(x_seed, jnp.int32),
            jnp.asarray(h_pad), jnp.asarray(d_frames),
            jnp.asarray(seed, jnp.int32), jnp.asarray(b_offset, jnp.int32),
            maxd=maxd, n_steps=n_pad_steps, mode=mode, interpret=interpret,
            quantize=quantize, const_seed=const_seed)
        out = np.asarray(jax.device_get(out)).astype(np.int32)[:, 0, :]
        return np.moveaxis(out, 0, 1)[:B_req, :n_steps]

    # long utterance: full chunks with carried ring state + a bucketed
    # tail.  Ring slots, upsampler phase and the PRNG key off the ABSOLUTE
    # sample index (step_offset), so the chunked run is bit-identical to a
    # one-shot call of the same total length.
    from qpnet_tpu.ops.gen_kernel import pallas_generate
    B = h.shape[0]
    packed, bufF, bufA, x0 = _pallas_prologue(
        params, cfg, jnp.asarray(x_seed, jnp.int32), jnp.asarray(h_pad[0]),
        maxd=maxd, quantize=quantize, const_seed=const_seed)
    h_dev = jnp.asarray(h_pad)
    d_dev = jnp.asarray(d_frames)
    seed_dev = jnp.asarray(seed, jnp.int32)
    pieces = []
    off = 0
    while off < n_pad_steps:
        steps = min(chunk_steps, n_pad_steps - off)
        f0_, f1_ = off // up, (off + steps) // up
        samples, bufF, bufA, x0 = pallas_generate(
            packed, cfg, bufF, bufA, x0,
            h_dev[f0_:f1_], d_dev[f0_:f1_], seed_dev,
            B=B, maxd=maxd, n_steps=steps, mode=mode, interpret=interpret,
            quantize=quantize, step_offset=off, b_offset=b_offset)
        if cfg.n_quantize <= 256:
            samples = _to_uint8(samples)
        # keep the loop fully async: dispatch is non-blocking, so every
        # chunk enqueues before any download — fetching here would
        # serialize each chunk's D2H transfer against the next's compute
        pieces.append(samples)
        off += steps
    pieces = [np.asarray(p).astype(np.int32) for p in jax.device_get(pieces)]
    out = np.concatenate(pieces, axis=0)[:, 0, :]
    return np.moveaxis(out, 0, 1)[:B_req, :n_steps]


def _pallas_mesh_path(params: Params, cfg: ModelConfig, x_seed: np.ndarray,
                      h: np.ndarray, d: np.ndarray, n_steps: int, maxd: int,
                      seed: int, mode: str, interpret: bool, quantize: str,
                      const_seed: bool, mesh, n_dev: int,
                      sub_B: int = 0) -> np.ndarray:
    """Sharded pallas decode: pad the batch to a multiple of the mesh size,
    shard over dp, run the kernel per chip (see _pallas_sharded_path);
    sub_B > 0 additionally splits each chip's slice into balanced
    sub-batches."""
    from qpnet_tpu.parallel import batch_sharding, replicated_sharding
    from qpnet_tpu.ops.gen_kernel import resolve_stream_min_dil
    from jax.sharding import NamedSharding, PartitionSpec as P

    B = h.shape[0]
    B_pad = -(-B // n_dev) * n_dev
    # ring-streaming kernels (deep nets) need the PER-CHIP batch 8-aligned
    # for the HBM<->VMEM window DMAs (same invariant as _pallas_path) —
    # padding only to the mesh size can leave local_B % 8 != 0 (e.g.
    # n_dev=4, B=20 -> local_B=5).  Each chip's slice runs either whole
    # (local_B) or in sub_B sub-batches (a multiple of 8 by construction,
    # balanced_slice/choose_pallas_sub_batch), so aligning local_B covers
    # both shapes the kernel actually runs at.
    local_B0 = B_pad // n_dev
    kernel_B = sub_B if 0 < sub_B < local_B0 else local_B0
    # per-shard kernels run as fused prologue+kernel programs, so the
    # measured fused-batch ceiling applies per chip; batch_fast_generate
    # passes a safe sub_B, this covers direct callers
    if not interpret and not _fused_batch_ok(cfg, kernel_B, maxd, quantize):
        sub_B = choose_pallas_sub_batch(cfg, local_B0, maxd, quantize)
        kernel_B = sub_B if 0 < sub_B < local_B0 else local_B0
    if (kernel_B % 8
            and resolve_stream_min_dil(cfg, kernel_B, maxd, quantize)
            is not None):
        B_pad = -(-local_B0 // 8) * 8 * n_dev
    if B_pad != B:
        pad = B_pad - B
        x_seed = np.concatenate([x_seed, np.repeat(x_seed[-1:], pad, 0)], 0)
        h = np.concatenate([h, np.repeat(h[-1:], pad, 0)], 0)
        d = np.concatenate([d, np.repeat(d[-1:], pad, 0)], 0)
    h_pad, d_frames, n_pad_steps = _pallas_host_prep(cfg, h, d, n_steps)

    repl = replicated_sharding(mesh)
    params_dev = jax.device_put(params, repl)
    x_dev = jax.device_put(jnp.asarray(x_seed, jnp.int32),
                           batch_sharding(mesh, 2))
    h_dev = jax.device_put(jnp.asarray(h_pad),
                           NamedSharding(mesh, P(None, "dp", None)))
    d_dev = jax.device_put(jnp.asarray(d_frames),
                           NamedSharding(mesh, P(None, None, "dp")))
    out = _pallas_sharded_path(
        params_dev, cfg, x_dev, h_dev, d_dev, jnp.asarray(seed, jnp.int32),
        maxd, n_pad_steps, mode, interpret, quantize, const_seed, mesh,
        sub_B)
    out = np.asarray(jax.device_get(out)).astype(np.int32)[:, 0, :]
    return np.moveaxis(out, 0, 1)[:B, :n_steps]


def choose_stream_min_dil(cfg: ModelConfig, B: int, maxd: int,
                          quantize: str = "none"):
    """Re-export of ops.gen_kernel.choose_stream_min_dil (the engine
    pickers below and callers like bench live at this level)."""
    from qpnet_tpu.ops.gen_kernel import choose_stream_min_dil as _c
    return _c(cfg, B, maxd, quantize)


def _fused_batch_ok(cfg: ModelConfig, B: int, maxd: int,
                    quantize: str = "none") -> bool:
    """Re-export of ops.gen_kernel.fused_batch_ok: whether the fused
    single-jit program (prologue + kernel) is admitted at kernel batch B
    — the VMEM fit AND the measured streamed-bf16 fused-batch ceiling."""
    from qpnet_tpu.ops.gen_kernel import fused_batch_ok
    return fused_batch_ok(cfg, B, maxd, quantize)


def pallas_engine_available(cfg: ModelConfig, B: int, maxd: int,
                            quantize: str = "none") -> bool:
    # the Mosaic kernel only lowers for TPU (this environment's tunnel
    # backend reports platform "axon" but serves a real TPU)
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        return False
    return _fused_batch_ok(cfg, B, maxd, quantize)


# throughput-optimal kernel batch: per-step cost rises with B well before
# the M=128 MXU tile fills (measured on v5e: B=64 -> 2.55M samples/s,
# B=96 -> 2.14M, B=120-slice splits -> 1.19M aggregate), so oversized
# batches run fastest as balanced slices of at most this size
PALLAS_OPT_BATCH = 64


def balanced_slice(B: int, cap: int = None) -> int:
    """Balanced slice size for splitting a batch of B into chunks of at
    most `cap` (default PALLAS_OPT_BATCH), rounded up to a multiple of 8
    so the compiled kernel-shape set stays small."""
    cap = cap or PALLAS_OPT_BATCH
    n_slices = -(-B // cap)
    return -(-(-(-B // n_slices)) // 8) * 8


def choose_pallas_sub_batch(cfg: ModelConfig, B: int, maxd: int,
                            quantize: str = "none") -> int:
    """Slice size for an oversized decode batch: balanced slices no larger
    than the throughput-optimal kernel batch (and the VMEM budget), as a
    multiple of 8 so the set of compiled kernel shapes stays small.
    Returns 0 if not even one utterance fits.

    Filling VMEM to the brim is the wrong objective — a 128-utterance
    batch sliced as 2x120 padded slots runs at half the rate of 2x64.
    Admission per slice is fused_batch_ok: the VMEM fit plus the measured
    streamed-bf16 fused-program batch ceiling (bf16 deep-net B=16 crashed
    the TPU worker; B=8 slices also measure faster — BENCH_NOTES.md)."""
    if _fused_batch_ok(cfg, B, maxd, quantize):
        return B
    # admission is monotone-decreasing in B (VMEM cost rises with B; the
    # streamed-bf16 fused ceiling is a fixed B cap), so bisect for the
    # largest admitted multiple of 8 instead of scanning down from B —
    # callers pass whole-corpus batches here (--batch_size 0 decodes)
    lo, hi = 0, (B - 1) // 8          # in units of 8; 0 = none fits
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _fused_batch_ok(cfg, 8 * mid, maxd, quantize):
            lo = mid
        else:
            hi = mid - 1
    largest_fit = 8 * lo
    if not largest_fit:
        # no multiple of 8 fits (or B <= 8): largest size that does
        for sub in range(min(7, B - 1), 0, -1):
            if _fused_batch_ok(cfg, sub, maxd, quantize):
                return sub
        return 0
    cap = min(largest_fit, PALLAS_OPT_BATCH)
    n_slices = -(-B // cap)
    balanced = -(-B // n_slices)          # ceil: even split
    return min(-(-balanced // 8) * 8, largest_fit)  # round up to 8, fit


def _pallas_split_path(params: Params, cfg: ModelConfig, x_seed: np.ndarray,
                       h: np.ndarray, d_gen: np.ndarray,
                       n_samples_list: Sequence[int], maxd: int, seed: int,
                       mode: str, interpret: bool, quantize: str,
                       const_seed: bool, sub_B: int) -> List[np.ndarray]:
    """Run the pallas engine over VMEM-fitting sub-batches of an oversized
    batch.  Each slice passes its global row index as b_offset, so the
    counter PRNG produces the same streams as one oversized kernel call
    would — splitting is invisible in the output.  The final short slice
    is padded up to sub_B (one kernel shape instead of two compiles).

    Slices on the common single-call path dispatch asynchronously; fetches
    trail dispatch by a bounded depth, so one slice's D2H transfer never
    serializes against the next slice's compute while the resident device
    output stays O(depth) slices even for whole-corpus (--batch_size 0)
    decodes."""
    B = h.shape[0]
    up = cfg.upsampling_factor
    chunk_steps = DECODE_CHUNK_FRAMES * up
    # slices in flight before the oldest is downloaded: deep enough that
    # typical multi-slice batches (<= 8 slices = 512 utterances) dispatch
    # completely before the first D2H fetch, so a slow fetch can never
    # delay a dispatch, while whole-corpus decodes still cap resident
    # device outputs at O(depth) slices (~56 MB each for 64x 10 s
    # utterances).  (Batch >= 256 throughput is volatile on this image at
    # ANY depth — 1.7-3.0M samples/s run to run while batch 128 holds
    # 2.83-2.84M — so the bench default stays 128; BENCH_NOTES.md.)
    fetch_depth = 8
    rows: List[np.ndarray] = []
    pending = []  # (is_device, out, s0, s1, slice_steps), dispatch order

    def fetch_oldest():
        is_device, out, s0, s1, slice_steps = pending.pop(0)
        if is_device:
            arr = np.asarray(jax.device_get(out)).astype(np.int32)[:, 0, :]
            arr = np.moveaxis(arr, 0, 1)[:, :slice_steps]
        else:
            arr = out
        rows.extend(arr[j] for j in range(s1 - s0))

    for s0 in range(0, B, sub_B):
        s1 = min(s0 + sub_B, B)
        xs, hs, ds = x_seed[s0:s1], h[s0:s1], d_gen[s0:s1]
        pad = sub_B - (s1 - s0)
        if pad:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, 0)], 0)
            hs = np.concatenate([hs, np.repeat(hs[-1:], pad, 0)], 0)
            ds = np.concatenate([ds, np.repeat(ds[-1:], pad, 0)], 0)
        slice_steps = int(max(n_samples_list[s0:s1]))
        h_pad, d_frames, n_pad_steps = _pallas_host_prep(
            cfg, hs, ds[:, :slice_steps], slice_steps)
        if n_pad_steps <= chunk_steps:
            out = _pallas_device_path(
                params, cfg, jnp.asarray(xs, jnp.int32),
                jnp.asarray(h_pad), jnp.asarray(d_frames),
                jnp.asarray(seed, jnp.int32), jnp.asarray(s0, jnp.int32),
                maxd=maxd, n_steps=n_pad_steps, mode=mode,
                interpret=interpret, quantize=quantize,
                const_seed=const_seed)
            pending.append((True, out, s0, s1, slice_steps))
        else:
            # long utterances run the chunked engine (fetches internally;
            # rare in oversized batches, which are throughput workloads)
            res = _pallas_path(params, cfg, xs, hs, ds[:, :slice_steps],
                               slice_steps, maxd, seed, mode, interpret,
                               quantize, const_seed=const_seed, b_offset=s0)
            pending.append((False, res, s0, s1, slice_steps))
        while len(pending) > fetch_depth:
            fetch_oldest()
    while pending:
        fetch_oldest()
    return rows


def _frame_constant(d: np.ndarray, up: int) -> bool:
    """True when the sample-rate dilation track is constant within frames
    (the decode pipeline's repeat-per-frame layout). The pallas engine
    streams d at frame rate, so within-frame variation requires the XLA
    engine."""
    T = (d.shape[1] // up) * up
    if T == 0:
        return True
    dv = d[:, :T].reshape(d.shape[0], -1, up)
    return bool(np.all(dv == dv[:, :, :1]))


def batch_fast_generate(params: Params, cfg: ModelConfig,
                        x: np.ndarray, h: np.ndarray,
                        n_samples_list: Sequence[int], d: np.ndarray,
                        seed: int = 100, mode: str = "sampling",
                        compute_dtype=jnp.bfloat16,
                        quantize: str = "none",
                        engine: str = "auto",
                        interpret: bool = False,
                        mesh=None) -> List[np.ndarray]:
    """Batch AR synthesis — same contract as reference qpnet.py:314-559.

    Args:
      x: (B, T_seed) int32 seed samples (typically a single mu-law zero).
      h: (B, F, A) standardized frame-rate aux features (zero-padded to the
         longest utterance, reference qpnet_decode.py:73-88).
      n_samples_list: samples to generate per utterance (F_i*up - 1).
      d: (B, F*up) float32 pitch-dependent dilation factors at sample rate.
    Returns:
      list of (n_samples_i,) int32 arrays of generated mu-law samples.

    Seed-history caveat: priming replicates h_up[:, 0] and d=1 over the
    whole history window.  For the recipe's single-sample seed this is
    exactly the reference's padding behavior (qpnet.py:354-364); for a
    MULTI-sample seed the reference would use the true aux/dilation track
    of the provided history, so outputs can deviate near the seed boundary
    (a warning is logged).
    """
    B, F, A = h.shape
    maxd = bucket_maxd(float(np.nanmax(np.ceil(d))) if d.size else 1.0)
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    n_steps = int(max(n_samples_list))

    # pad seed history to rf+1 with mid-scale (reference qpnet.py:354-358)
    n_pad = rf + 1 - x.shape[1]
    if n_pad > 0:
        x_seed = np.pad(x, ((0, 0), (n_pad, 0)),
                        constant_values=cfg.n_quantize // 2)
    else:
        x_seed = x[:, -(rf + 1):]
    d_gen = np.pad(d.astype(np.float32),
                   ((0, 0), (0, max(0, n_steps - d.shape[1]))),
                   constant_values=1.0)[:, :n_steps]

    if quantize == "int8":
        raise ValueError(
            "quantize='int8' is ambiguous: use 'w8a8' (pallas engine: "
            "dynamic activation + weight int8) or 'int8_weights' (XLA scan "
            "engine: weight-only dequantized matmul)")
    # engine selection: the pallas mega-kernel streams d at frame rate and
    # needs the resident state to fit VMEM; anything else runs the XLA scan
    frame_const = _frame_constant(d_gen, cfg.upsampling_factor)
    if engine == "pallas" and not frame_const:
        raise ValueError(
            "engine='pallas' streams dilation factors at frame rate; this "
            "input varies d within frames, which would silently change the "
            "adaptive look-backs — use engine='auto' or 'xla'")
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    local_B = -(-B // n_dev)
    pallas_fit = pallas_engine_available(cfg, local_B, maxd, quantize)
    platform_ok = jax.devices()[0].platform in ("tpu", "axon")
    if quantize == "w8a8" and engine == "xla":
        raise ValueError("quantize='w8a8' is a pallas-engine scheme")
    if quantize == "int8_weights" and engine == "pallas":
        raise ValueError("quantize='int8_weights' is an XLA-engine scheme")
    use_pallas = (engine == "pallas"
                  or (engine == "auto" and pallas_fit and frame_const
                      and quantize != "int8_weights"))
    # a batch beyond the VMEM budget OR the measured throughput-optimal
    # kernel size splits into balanced pallas slices (bit-identical via
    # per-slice b_offset; sorted callers make slices length-homogeneous,
    # so each stops at its own longest utterance) instead of dropping to
    # the ~3x slower scan engine / a slower oversized kernel
    split_sub = 0
    if (engine in ("auto", "pallas")
            and (not pallas_fit or B > PALLAS_OPT_BATCH) and platform_ok
            and frame_const and quantize != "int8_weights"
            and mesh is None and not interpret):
        if pallas_fit:
            split_sub = balanced_slice(B)
        else:
            split_sub = choose_pallas_sub_batch(cfg, B, maxd, quantize)
        if split_sub >= B:
            split_sub = 0  # single-call path after all
        if split_sub:
            use_pallas = False
    # under a mesh the same splitting happens PER CHIP inside the shard_map
    # (sequential balanced sub-batches with global b_offset), so multi-chip
    # callers never lose the pallas engine to VMEM/64-slot limits either
    mesh_sub = 0
    if (mesh is not None and engine in ("auto", "pallas")
            and frame_const and quantize != "int8_weights"
            and (platform_ok or interpret)
            and (not pallas_fit or local_B > PALLAS_OPT_BATCH)):
        if pallas_fit:
            mesh_sub = balanced_slice(local_B)
        else:
            mesh_sub = choose_pallas_sub_batch(cfg, local_B, maxd, quantize)
        if mesh_sub >= local_B:
            mesh_sub = 0
        if mesh_sub:
            use_pallas = True
    if quantize == "w8a8" and not use_pallas and not split_sub:
        # the scan engine has no W8A8 scheme; silently decoding in bf16
        # under a quantization flag would misreport the numerics
        raise ValueError(
            "quantize='w8a8' requires the pallas engine, which is "
            "unavailable here (no TPU, VMEM budget, or within-frame "
            "dilation variation) — drop the flag or use 'int8_weights' "
            "with engine='xla'")
    import logging as _logging
    if mesh_sub:
        _logging.info(
            "batch_fast_generate: per-chip batch %d exceeds the %s at "
            "maxd=%d; each chip runs balanced sub-batches of %d inside the "
            "shard_map (bit-identical to the single-chip engine)", local_B,
            "pallas VMEM budget" if not pallas_fit
            else f"throughput-optimal kernel batch ({PALLAS_OPT_BATCH})",
            maxd, mesh_sub)
    elif split_sub:
        _logging.info(
            "batch_fast_generate: batch %d exceeds the %s at maxd=%d; "
            "splitting into sub-batches of %d (bit-identical to one "
            "oversized kernel call)", B,
            "pallas VMEM budget" if not pallas_fit
            else f"throughput-optimal kernel batch ({PALLAS_OPT_BATCH})",
            maxd, split_sub)
    elif engine == "auto" and not use_pallas:
        reasons = []
        if not frame_const:
            reasons.append("dilation factors vary within frames")
        if not pallas_fit:
            platform = jax.devices()[0].platform
            reasons.append(
                f"VMEM budget exceeded (B={local_B}, maxd={maxd})"
                if platform_ok else f"platform={platform}")
        _logging.info(
            "batch_fast_generate: using the XLA scan engine (~3x slower "
            "per chip than pallas) because %s", "; ".join(reasons))
    # single-sample seeds (the recipe case) make the whole priming history
    # constant, enabling the short fixed-point priming pass in both engines
    const_seed = x.shape[1] <= 1
    if not const_seed:
        import logging as _logging
        _logging.warning(
            "batch_fast_generate: %d-sample seed history primes with "
            "replicated first-frame aux and d=1 (not the true history "
            "track); outputs near the seed boundary deviate from the "
            "reference's continuation semantics", x.shape[1])
    if split_sub:
        rows = _pallas_split_path(
            params, cfg, np.asarray(x_seed, np.int32),
            np.asarray(h, np.float32), d_gen, list(n_samples_list), maxd,
            seed, mode, interpret, quantize, const_seed, split_sub)
        return [rows[i][:n] for i, n in enumerate(n_samples_list)]
    if use_pallas and mesh is not None:
        # batch sharded over dp; per-chip VMEM-resident kernels; the
        # counter PRNG keys off global utterance indices so the output is
        # bit-identical to the single-chip engine
        samples = _pallas_mesh_path(
            params, cfg, np.asarray(x_seed, np.int32),
            np.asarray(h, np.float32), d_gen, n_steps, maxd, seed, mode,
            interpret, quantize, const_seed, mesh, n_dev, mesh_sub)
        return [samples[i, : n] for i, n in enumerate(n_samples_list)]
    if use_pallas:
        samples = _pallas_path(params, cfg, np.asarray(x_seed, np.int32),
                               np.asarray(h, np.float32), d_gen, n_steps,
                               maxd, seed, mode, interpret, quantize,
                               const_seed=const_seed)
        return [samples[i, : n] for i, n in enumerate(n_samples_list)]

    key = jax.random.PRNGKey(seed)
    x_in = jnp.asarray(x_seed, jnp.int32)
    h_in = jnp.asarray(h, jnp.float32)
    d_in = jnp.asarray(d_gen, jnp.float32)
    if mesh is not None:
        # multi-chip decode: each utterance's AR chain is independent, so
        # the batch shards over the dp axis with replicated params — the
        # mesh-native form of the reference's per-GPU process fan-out
        # (qpnet_decode.py:322-331).  A batch not divisible by the mesh
        # size pads by replicating the last utterance (padding rows are
        # discarded below via n_samples_list's length).
        from qpnet_tpu.parallel import batch_sharding, replicated_sharding
        pad = (-x_in.shape[0]) % int(mesh.devices.size)
        if pad:
            x_in = jnp.concatenate([x_in, jnp.repeat(x_in[-1:], pad, 0)], 0)
            h_in = jnp.concatenate([h_in, jnp.repeat(h_in[-1:], pad, 0)], 0)
            d_in = jnp.concatenate([d_in, jnp.repeat(d_in[-1:], pad, 0)], 0)
        repl = replicated_sharding(mesh)
        params = jax.device_put(params, repl)
        x_in = jax.device_put(x_in, batch_sharding(mesh, 2))
        h_in = jax.device_put(h_in, batch_sharding(mesh, 3))
        d_in = jax.device_put(d_in, batch_sharding(mesh, 2))
    samples = _generate_scan(
        params, cfg, x_in, h_in, d_in,
        key, n_steps=n_steps, maxd=maxd, mode=mode,
        compute_dtype=compute_dtype, quantize=quantize,
        const_seed=const_seed)
    samples = np.asarray(jax.device_get(samples))
    return [samples[i, : n] for i, n in enumerate(n_samples_list)]


def teacher_forced_logits(params: Params, cfg: ModelConfig,
                          x: np.ndarray, h: np.ndarray,
                          forced: np.ndarray, d: np.ndarray,
                          engine: str = "xla",
                          compute_dtype=jnp.bfloat16,
                          quantize: str = "none",
                          interpret: bool = False) -> np.ndarray:
    """Per-step logits of a generation engine under teacher forcing.

    Runs the SAME per-step machinery as `batch_fast_generate` (ring
    buffers, priming, the pallas mega-kernel or the XLA scan) but feeds
    the engine the given `forced` sample stream instead of its own
    sampled/argmax feedback.  Without the feedback loop there is no
    chaotic AR divergence, so every step's logits are comparable — to the
    teacher-forced `models.qpnet.forward`, and between engines — at full
    tolerance.  This is the strict equivalence pin for engine changes and
    the cheap hardware smoke test for kernel edits.

    Args:
      x: (B, T_seed) seed history (same contract as batch_fast_generate).
      h: (B, F, A) standardized frame-rate aux.
      forced: (B, n_steps) int32 — the sample "emitted" at each step.
      d: (B, >= n_steps) sample-rate dilation factors.
    Returns:
      (B, n_steps, n_quantize) f32 logits; logits[:, i] is the
      distribution step i would have sampled sample i (= forced[:, i])
      from.
    """
    B, F, A = h.shape
    n_steps = int(forced.shape[1])
    maxd = bucket_maxd(float(np.nanmax(np.ceil(d))) if d.size else 1.0)
    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    n_pad = rf + 1 - x.shape[1]
    if n_pad > 0:
        x_seed = np.pad(x, ((0, 0), (n_pad, 0)),
                        constant_values=cfg.n_quantize // 2)
    else:
        x_seed = x[:, -(rf + 1):]
    d_gen = np.pad(d.astype(np.float32),
                   ((0, 0), (0, max(0, n_steps - d.shape[1]))),
                   constant_values=1.0)[:, :n_steps]
    const_seed = x.shape[1] <= 1
    if engine == "xla":
        logits = _generate_scan(
            params, cfg, jnp.asarray(x_seed, jnp.int32),
            jnp.asarray(h, jnp.float32), jnp.asarray(d_gen),
            jax.random.PRNGKey(0), n_steps=n_steps, maxd=maxd,
            mode="forced", compute_dtype=compute_dtype, quantize=quantize,
            const_seed=const_seed,
            forced_x=jnp.asarray(forced, jnp.int32))
        return np.asarray(jax.device_get(logits))
    if engine != "pallas":
        raise ValueError("engine should be 'xla' or 'pallas'")
    h_pad, d_frames, n_pad_steps = _pallas_host_prep(cfg, h, d_gen, n_steps)
    xf = np.zeros((n_pad_steps, 1, B), np.int32)
    xf[:n_steps, 0, :] = np.asarray(forced, np.int32).T
    out = _pallas_device_path(
        params, cfg, jnp.asarray(x_seed, jnp.int32), jnp.asarray(h_pad),
        jnp.asarray(d_frames), jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32), maxd=maxd, n_steps=n_pad_steps,
        mode="forced", interpret=interpret, quantize=quantize,
        const_seed=const_seed, x_forced=jnp.asarray(xf))
    out = np.asarray(jax.device_get(out))[:n_steps]  # (n_steps, B, Q)
    return np.moveaxis(out, 0, 1)


@functools.partial(jax.jit, static_argnames=("cfg", "B", "maxd"))
def _streaming_prime(params, cfg, h_first_frame, B, maxd):
    """StreamingGenerator's priming pass as ONE jitted dispatch: constant
    mid-scale seed history (the recipe's decode seed), ring buffers laid
    out for the pallas kernel's t=0 origin.  h_first_frame: (B, n_aux)
    standardized aux of the group's first frame."""
    rf = (cfg.receptiveF + cfg.receptiveA * maxd
          + cfg.receptive_causal + 1)
    x_seed = jnp.full((B, rf), cfg.n_quantize // 2, jnp.int32)
    h0_up = h_first_frame * params["up_w"][0] + params["up_b"]
    bufsF, bufsA = _prime_ring_buffers(
        params, cfg, x_seed, h0_up, maxd, jnp.float32, t0=0,
        const_seed=True, ring_pad=1)
    bufF = jnp.concatenate(
        [jnp.moveaxis(b, 0, 1).astype(jnp.bfloat16) for b in bufsF],
        axis=0)
    bufA = jnp.concatenate(
        [jnp.moveaxis(b, 0, 1).astype(jnp.bfloat16) for b in bufsA],
        axis=0)
    x0 = jnp.stack([x_seed[:, -2], x_seed[:, -1]]).astype(jnp.int32)
    return bufF, bufA, x0


class StreamingGenerator:
    """Chunked low-latency generation with carried ring state.

    One kernel compile serves ANY output length: each `feed()` call
    generates a whole-frame chunk of samples and returns it, carrying the
    fast-WaveNet ring buffers and the last two samples across calls.  The
    nominal chunk length is `min_chunk_samples` rounded up to whole
    frames; ring slots, upsampler phase and PRNG key off the ABSOLUTE
    sample index, so feeds of any other whole-frame length continue
    exactly (each distinct length is one extra jit key).

    Intended for streaming TTS/serving: bounded memory, constant latency
    per chunk, no per-utterance-length recompiles.
    """

    def __init__(self, params: Params, cfg: ModelConfig, B: int,
                 maxd: int = 32, seed: int = 100, mode: str = "sampling",
                 min_chunk_samples: int = 5500, interpret: bool = False,
                 quantize: str = "none", device=None):
        from qpnet_tpu.ops.gen_kernel import AUX_PAD, pack_weights
        self.cfg, self.B, self.maxd = cfg, B, maxd
        self.seed, self.mode = seed, mode
        self.interpret = interpret
        # "w8a8" halves resident weight VMEM — required to stream the
        # deep Rd10Rr3Ed4Er1 network, whose bf16 weights do not fit
        # (same tradeoff as bin/qpnet_decode --quantize w8a8)
        self.quantize = quantize
        # pin the session to one chip: weight packing, priming and every
        # feed() run under jax.default_device(device), so N sessions on N
        # chips stream concurrently (serve.py's device pool)
        self._device = device
        up = cfg.upsampling_factor
        # the kernel's ring slots / upsampler phase / PRNG key off the
        # ABSOLUTE sample index (step_offset), so any whole-frame chunk
        # continues exactly
        self.chunk = -(-min_chunk_samples // up) * up
        self.chunk_frames = self.chunk // up
        self.aux_pad = AUX_PAD
        # streaming-active kernels (deep nets) DMA (W, B, R) ring windows
        # between HBM and VMEM, and Mosaic requires the batch dim of a
        # sliced transfer to be 8-aligned — run the kernel at a padded
        # internal batch (serving groups pad to powers of two, so B can
        # be 1/2/4) and slice the pad off in feed().  Same invariant as
        # _pallas_path; the VMEM cost model already charges the padded
        # batch, so the fit decision is unchanged.
        from qpnet_tpu.ops.gen_kernel import resolve_stream_min_dil
        thr = resolve_stream_min_dil(cfg, B, maxd, quantize)
        self._kB = B if (thr is None or B % 8 == 0) else B + (-B) % 8
        with self._on_device():
            self._packed = pack_weights(params, cfg, quantize=quantize)
        self._params = params
        self._state = None
        self._offset = 0

    def _on_device(self):
        import contextlib
        if self._device is None:
            return contextlib.nullcontext()
        return jax.default_device(self._device)

    def reset(self, seed: int = None) -> None:
        """Start a new utterance (group): drop the carried ring state and
        restart the absolute step counter, keeping the packed weights and
        compiled kernel (seed/offset are traced operands — no recompile).
        Lets a serving pool reuse one session across groups instead of
        re-packing weights per request."""
        if seed is not None:
            self.seed = seed
        self._state = None
        self._offset = 0

    def _prime(self, h_first_frame: np.ndarray):
        # one jitted dispatch: priming eagerly runs ~100 small ops, each
        # paying this deployment's host<->device round trip — measured
        # ~275 ms of a group's time-to-first-audio before this was fused
        if self._kB != self.B:
            pad = self._kB - self.B
            h_first_frame = np.concatenate(
                [h_first_frame, np.repeat(h_first_frame[-1:], pad, 0)], 0)
        self._state = _streaming_prime(self._params, self.cfg,
                                       jnp.asarray(h_first_frame),
                                       self._kB, self.maxd)

    def feed(self, h_frames: np.ndarray, d_frames: np.ndarray) -> np.ndarray:
        """h_frames: (B, F, n_aux) standardized aux; d_frames: (B, F)
        dilation factors.  Returns (B, F*up) int32 mu-law samples.

        F is normally `chunk_frames`, but ANY F >= 1 continues exactly:
        ring slots, the upsampler phase and the PRNG all key off the
        absolute sample index, so chunk boundaries can fall anywhere on a
        frame.  Each distinct F compiles its own kernel (one extra jit
        key) — serving uses one short first chunk for time-to-first-audio
        and the nominal chunk after (serve.py first_chunk_samples)."""
        from qpnet_tpu.ops.gen_kernel import pallas_generate
        cfg, B = self.cfg, self.B
        F = h_frames.shape[1]
        assert h_frames.shape == (B, F, cfg.n_aux) and F >= 1
        assert d_frames.shape == (B, F)
        if float(np.max(d_frames)) > self.maxd:
            raise ValueError(
                f"dilation factor {float(np.max(d_frames)):.1f} exceeds the "
                f"session's maxd={self.maxd}; recreate the session with a "
                f"larger maxd (ring look-backs would silently saturate)")
        kB = self._kB
        h_pad = np.zeros((F, kB, self.aux_pad), np.float32)
        h_pad[:, :B, : cfg.n_aux] = np.moveaxis(h_frames, 0, 1)
        d_pad = np.ones((F, 1, kB), np.float32)
        d_pad[:, 0, :B] = np.moveaxis(np.asarray(d_frames, np.float32),
                                      0, 1)
        if kB != B:
            h_pad[:, B:] = h_pad[:, B - 1:B]
            d_pad[:, :, B:] = d_pad[:, :, B - 1:B]
        n_steps = F * cfg.upsampling_factor
        with self._on_device():
            if self._state is None:
                self._prime(np.asarray(h_frames[:, 0], np.float32))
            bufF, bufA, x0 = self._state
            samples, bufF, bufA, x0 = pallas_generate(
                self._packed, cfg, bufF, bufA, x0,
                jnp.asarray(h_pad, jnp.bfloat16), jnp.asarray(d_pad),
                self.seed, B=kB, maxd=self.maxd, n_steps=n_steps,
                mode=self.mode, interpret=self.interpret,
                quantize=self.quantize, step_offset=self._offset)
        self._state = (bufF, bufA, x0)
        self._offset += n_steps
        return np.moveaxis(np.asarray(jax.device_get(samples))[:, 0, :B],
                           0, 1)
