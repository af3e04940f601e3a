"""Pallas TPU mega-kernel for autoregressive QPNet generation.

The XLA `lax.scan` path (models/generate.py) is op-latency bound: ~100 HLO
ops per emitted sample cost ~1.6 us/layer in scheduling overhead, and the
24M-param weight set streams from HBM every step.  This kernel runs the
ENTIRE generation loop as one `pallas_call` with a sequential grid over
samples:

  * all weights live in VMEM for the whole call (v5e VMEM is 128MB; the
    bf16 fused weight set is ~47MB) — zero per-step HBM weight traffic;
  * ring buffers are VMEM scratch persisting across grid steps;
  * frame-rate inputs (aux features, dilation factors) are fetched by
    BlockSpec index `t // upsampling_factor`, so HBM traffic occurs only on
    frame boundaries; the 16 aux matmuls are recomputed only there too;
  * fixed-stack buffer reads/writes use the scalar ring slot `t % size`;
    the pitch-adaptive per-utterance look-back r = round(d(t)*dil)
    (reference qpnet.py:613-624) becomes a one-hot masked reduction over
    ring slots — a VPU-friendly gather;
  * sampling uses the on-core PRNG with the Gumbel-max trick, which is
    distribution-equivalent to the reference's softmax Categorical
    (qpnet.py:507-510).

Layer math is identical to models/qpnet.py (same fused [cur;past] @ W_in
and gate @ [W_skip|W_res] formulation); equivalence with the XLA path is
property-tested in interpret mode (tests/test_gen_kernel.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qpnet_tpu.config import ModelConfig

AUX_PAD = 48           # n_aux padded for clean MXU tiling
VMEM_LIMIT = 126 * 1024 * 1024


def pack_weights(params: Dict[str, Any], cfg: ModelConfig,
                 quantize: str = "none") -> Dict[str, Any]:
    """Fuse + pad parameters into the kernel's resident layout (pure jnp so
    it can run inside the jitted generation prologue).

    quantize="int8": the two large per-block matrices are stored int8 with
    per-output-column scales; the MXU runs int8 at twice the bf16 rate and
    the resident weight set shrinks 2x (more VMEM left for batch).

    NOTE: the pallas kernel runs W8A8 (dynamic per-row activation
    quantization, mmq below); the XLA scan engine's quantize="int8" is
    weight-only dequantized matmul — the same flag is a different numeric
    scheme per engine.
    """
    R, S, Q, A = cfg.n_resch, cfg.n_skipch, cfg.n_quantize, cfg.n_aux
    layers = list(params["fixed"]) + list(params["adaptive"])
    L = len(layers)
    W_in = jnp.stack([jnp.concatenate(
        [jnp.asarray(p["W_cur"]), jnp.asarray(p["W_prev"])], axis=0)
        for p in layers])                                    # (L, 2R, 2R)
    W_out = jnp.stack([jnp.concatenate(
        [jnp.asarray(p["W_skip"]), jnp.asarray(p["W_res"])], axis=1)
        for p in layers])                                    # (L, R, S+R)
    W_aux = jnp.stack([
        jnp.pad(jnp.asarray(p["W_aux"], jnp.float32),
                ((0, AUX_PAD - A), (0, 0)))
        for p in layers])                                    # (L, AUX_PAD, 2R)
    up_b = jnp.asarray(params["up_b"], jnp.float32)
    # aux constant: gate bias + upsampler bias routed through W_aux
    c_all = jnp.stack([jnp.asarray(p["b_gate"], jnp.float32)
                       + up_b * jnp.asarray(p["W_aux"],
                                            jnp.float32).sum(axis=0)
                       for p in layers])                     # (L, 2R)
    b_res = jnp.stack([jnp.asarray(p["b_res"], jnp.float32)
                       for p in layers])
    b_skip_sum = sum(jnp.asarray(p["b_skip"], jnp.float32) for p in layers)
    up_len = max(128, -(-cfg.upsampling_factor // 8) * 8)
    up_w = jnp.zeros((up_len,), jnp.float32).at[
        : cfg.upsampling_factor].set(jnp.asarray(params["up_w"],
                                                 jnp.float32))
    out: Dict[str, Any] = {}
    if quantize == "int8":
        def q8(w):
            sc = jnp.maximum(jnp.max(jnp.abs(w), axis=1, keepdims=True),
                             1e-12) / 127.0          # per (layer, col)
            qw = jnp.clip(jnp.round(w / sc), -127, 127).astype(jnp.int8)
            return qw, sc.astype(jnp.float32)
        out["W_in"], out["s_in"] = q8(W_in)
        out["W_out"], out["s_out"] = q8(W_out)
    else:
        out["W_in"] = W_in.astype(jnp.bfloat16)
        out["W_out"] = W_out.astype(jnp.bfloat16)
    out.update({
        "W_aux": W_aux.astype(jnp.bfloat16),
        "c_all": c_all,
        "b_res": b_res,
        "b_skip_sum": b_skip_sum[None, :],
        "up_w": up_w,
        "E_cur": jnp.asarray(params["embed_cur"], jnp.bfloat16),
        "E_prev": jnp.asarray(params["embed_prev"], jnp.bfloat16),
        "b_causal": jnp.asarray(params["b_causal"], jnp.float32)[None, :],
        "W_post1": jnp.asarray(params["W_post1"], jnp.bfloat16),
        "W_post2": jnp.asarray(params["W_post2"], jnp.bfloat16),
        "b_post1": jnp.asarray(params["b_post1"], jnp.float32)[None, :],
        "b_post2": jnp.asarray(params["b_post2"], jnp.float32)[None, :],
    })
    return out


def vmem_cost_bytes(cfg: ModelConfig, B: int, maxd: int,
                    quantize: str = "none") -> int:
    """Rough resident VMEM footprint; callers fall back to the XLA scan
    path when this exceeds the budget (large maxd buckets / batches)."""
    R, S, Q = cfg.n_resch, cfg.n_skipch, cfg.n_quantize
    L = len(cfg.dilationsF) + len(cfg.dilationsA)
    wbytes = 1 if quantize == "int8" else 2
    weights = wbytes * (L * (2 * R) * (2 * R) + L * R * (S + R)) \
        + 2 * (L * AUX_PAD * 2 * R + 2 * Q * R + 2 * S * S)
    bufF = 2 * sum(cfg.dilationsF) * B * R
    bufA = 2 * maxd * sum(cfg.dilationsA) * B * R
    return weights + bufF + bufA + (1 << 23)


def _make_kernel(cfg: ModelConfig, B: int, maxd: int, mode: str,
                 interpret: bool = False, quantize: str = "none"):
    if mode not in ("sampling", "argmax"):
        raise ValueError("mode should be sampling or argmax")
    R, S, Q = cfg.n_resch, cfg.n_skipch, cfg.n_quantize
    dilsF, dilsA = cfg.dilationsF, cfg.dilationsA
    nF, nA = len(dilsF), len(dilsA)
    L = nF + nA
    up = cfg.upsampling_factor
    sizesF = list(dilsF)
    sizesA = [maxd * d for d in dilsA]
    offF = np.cumsum([0] + sizesF)[:-1].tolist()
    offA = np.cumsum([0] + sizesA)[:-1].tolist()
    bf16 = jnp.bfloat16

    def mm(a, b):
        return jax.lax.dot_general(
            a.astype(bf16), b.astype(bf16),
            dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mmq(a, wq, sc):
        """W8A8 dynamic matmul: per-row activation scale x per-col weight
        scale; int8 MXU at 2x the bf16 rate."""
        amax = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                           1e-6)
        aq = jnp.clip(jnp.round(a * (127.0 / amax)), -127,
                      127).astype(jnp.int8)
        zi = jax.lax.dot_general(
            aq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return zi.astype(jnp.float32) * (amax * (1.0 / 127.0)) * sc

    def kernel(seed_ref, upw_ref,             # SMEM scalar prefetch
               h_ref, d_ref,                  # (1,B,AUX_PAD) bf16 / (1,1,B) f32
               W_in_ref, W_out_ref, s_in_ref, s_out_ref,
               W_aux_ref, c_ref, b_res_ref,
               b_skip_ref, E_cur_ref, E_prev_ref, b_causal_ref,
               W_post1_ref, W_post2_ref, b_post1_ref, b_post2_ref,
               bufF0_ref, bufA0_ref, x0_ref,  # primed state
               out_ref,                       # (1, B) int32 output block
               bufF_out_ref, bufA_out_ref, x_out_ref,  # carried state out
               bufF, bufA, x_state, init_sems):
        t = pl.program_id(0)
        n_total = pl.num_programs(0)

        @pl.when(t == 0)
        def _init():
            # primed buffers live in HBM (keeping them VMEM-resident would
            # double the ring-buffer footprint); one DMA each at step 0
            cp1 = pltpu.make_async_copy(bufF0_ref, bufF, init_sems.at[0])
            cp2 = pltpu.make_async_copy(bufA0_ref, bufA, init_sems.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()
            x_state[...] = x0_ref[...]

        w_t = upw_ref[jax.lax.rem(t, up)]
        h_f = h_ref[0]                         # (B, AUX_PAD)

        # causal layer: embeddings via one-hot matmuls
        iota_q = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
        oh_cur = (iota_q == x_state[1][:, None]).astype(bf16)
        oh_prev = (iota_q == x_state[0][:, None]).astype(bf16)
        o = (mm(oh_cur, E_cur_ref[...]) + mm(oh_prev, E_prev_ref[...])
             + b_causal_ref[...]).astype(bf16)                 # (B, R)

        skip_sum = jnp.broadcast_to(b_skip_ref[...], (B, S)).astype(
            jnp.float32)
        d_t = d_ref[0, 0]                                       # (B,)

        for l in range(L):
            if l < nF:
                size = sizesF[l]
                slot = jax.lax.rem(t, size)
                past = bufF[pl.ds(offF[l] + slot, 1), :, :][0]   # (B, R)
            else:
                la = l - nF
                size = sizesA[la]
                r = jnp.round(d_t * dilsA[la]).astype(jnp.int32)
                r = jnp.clip(r, 0, size)
                slot_b = jax.lax.rem(t - r + 2 * size, size)     # (B,)
                # one-hot slot selection, chunked so the 3D mask temporary
                # stays small (a full (size,B,R) f32 copy blows VMEM)
                slot3 = slot_b[None, :, None]                    # (1,B,1) i32
                past = jnp.zeros((B, R), jnp.float32)
                for c0 in range(0, size, 32):
                    cw = min(32, size - c0)       # clamp the final chunk
                    i3 = jax.lax.broadcasted_iota(
                        jnp.int32, (cw, B, R), 0) + c0
                    m3 = (i3 == slot3).astype(bf16)              # (cw,B,R)
                    past = past + jnp.sum(
                        bufA[offA[la] + c0: offA[la] + c0 + cw, :, :]
                        * m3, axis=0)
                # r==0 -> current sample (teacher-forced idx = t - 0);
                # blend with an f32 mask (bool minor-dim inserts are
                # unsupported by Mosaic)
                m0 = (r == 0).astype(jnp.float32)[:, None]
                past = m0 * o.astype(jnp.float32) + (1.0 - m0) * past
            xin = jnp.concatenate([o, past.astype(bf16)], axis=-1)
            if quantize == "int8":
                z_main = mmq(xin.astype(jnp.float32), W_in_ref[l],
                             s_in_ref[l])
            else:
                z_main = mm(xin, W_in_ref[l])
            z = z_main + mm(h_f, W_aux_ref[l]) * w_t + c_ref[l]
            g = (jax.nn.sigmoid(z[:, :R]) * jnp.tanh(z[:, R:])).astype(bf16)
            if quantize == "int8":
                outp = mmq(g.astype(jnp.float32), W_out_ref[l], s_out_ref[l])
            else:
                outp = mm(g, W_out_ref[l])
            skip_sum = skip_sum + outp[:, :S]
            wslot = jax.lax.rem(t, size)
            if l < nF:
                bufF[pl.ds(offF[l] + wslot, 1), :, :] = o[None].astype(bf16)
            else:
                bufA[pl.ds(offA[l - nF] + wslot, 1), :, :] = \
                    o[None].astype(bf16)
            o = (o.astype(jnp.float32) + outp[:, S:]
                 + b_res_ref[l]).astype(bf16)

        u = jnp.maximum(skip_sum, 0.0)
        u = jnp.maximum(mm(u.astype(bf16), W_post1_ref[...])
                        + b_post1_ref[...], 0.0)
        logits = mm(u.astype(bf16), W_post2_ref[...]) + b_post2_ref[...]

        @pl.when(t == n_total - 1)
        def _export_state():
            # stream the final ring state back to HBM so a follow-up chunk
            # can continue exactly where this one stopped
            cp1 = pltpu.make_async_copy(bufF, bufF_out_ref, init_sems.at[0])
            cp2 = pltpu.make_async_copy(bufA, bufA_out_ref, init_sems.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()

        if mode == "sampling":
            if interpret:
                # CPU interpret mode has no pltpu PRNG: xorshift-style hash
                # of (seed, t, lane) — smoke-test quality only
                base = (seed_ref[0] + (t + seed_ref[1])
                        * jnp.uint32(2654435761)).astype(jnp.uint32)
                idx = jax.lax.broadcasted_iota(jnp.uint32, (B, Q), 0) * Q \
                    + jax.lax.broadcasted_iota(jnp.uint32, (B, Q), 1)
                v = base + idx * jnp.uint32(0x9E3779B9)
                v = v ^ (v >> 16); v = v * jnp.uint32(0x7FEB352D)
                v = v ^ (v >> 15); v = v * jnp.uint32(0x846CA68B)
                v = v ^ (v >> 16)
                bits = v
            else:
                pltpu.prng_seed(seed_ref[0] + seed_ref[1] + t)
                bits = pltpu.bitcast(pltpu.prng_random_bits((B, Q)),
                                     jnp.uint32)
            bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
            unif = bits24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
            gumbel = -jnp.log(-jnp.log(unif))
            x_next = jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)
        else:
            x_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        out_ref[0, 0, :] = x_next
        x_state[0, :] = x_state[1, :]
        x_state[1, :] = x_next

        @pl.when(t == n_total - 1)
        def _export_x():
            x_out_ref[...] = x_state[...]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "B", "maxd", "n_steps", "mode", "interpret",
                     "quantize"))
def pallas_generate(packed: Dict[str, Any], cfg: ModelConfig,
                    bufF0: jnp.ndarray, bufA0: jnp.ndarray,
                    x0: jnp.ndarray, h_frames: jnp.ndarray,
                    d_frames: jnp.ndarray, seed,
                    B: int, maxd: int, n_steps: int,
                    mode: str = "sampling",
                    interpret: bool = False,
                    quantize: str = "none",
                    step_offset: int = 0):
    """Run the generation kernel.

    bufF0: (sum(dilsF), B, R) bf16 primed fixed ring buffers, flat-packed
           per layer at offsets cumsum(sizes).
    bufA0: (maxd*sum(dilsA), B, R) bf16 primed adaptive ring buffers.
    x0: (2, B) int32 [x_prev, x_cur] at the seed position.
    h_frames: (F, B, AUX_PAD) bf16 standardized aux (zero-padded dims),
              with F*up >= n_steps.
    d_frames: (F, 1, B) f32 frame-rate dilation factors.
    step_offset: global step index of this chunk's first sample (keeps the
                 PRNG stream continuous across streamed chunks).
    Returns (samples (n_steps,1,B) i32, bufF_out, bufA_out, x_out) — the
    carried ring state enables exact chunked continuation when n_steps is
    a multiple of every ring size and the upsampling factor.
    """
    up = cfg.upsampling_factor
    kernel = _make_kernel(cfg, B, maxd, mode, interpret, quantize)
    nF, nA = len(cfg.dilationsF), len(cfg.dilationsA)
    L = nF + nA
    R = cfg.n_resch
    sumF = sum(cfg.dilationsF)
    sumA = maxd * sum(cfg.dilationsA)

    resident = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32),
                          jnp.asarray(step_offset, jnp.int32)])
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, AUX_PAD), lambda t: (t // up, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda t: (t // up, 0, 0)),
            resident(), resident(), resident(), resident(),
            resident(), resident(), resident(),
            resident(), resident(), resident(), resident(),
            resident(), resident(), resident(), resident(),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            resident(),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sumF, B, R), jnp.bfloat16),
            pltpu.VMEM((sumA, B, R), jnp.bfloat16),
            pltpu.VMEM((2, B), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((sumF, B, R), jnp.bfloat16),
            jax.ShapeDtypeStruct((sumA, B, R), jnp.bfloat16),
            jax.ShapeDtypeStruct((2, B), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            has_side_effects=True),
        interpret=interpret,
    )(seed_arr, packed["up_w"], h_frames, d_frames,
      packed["W_in"], packed["W_out"],
      packed.get("s_in", jnp.ones((1, 1, 1), jnp.float32)),
      packed.get("s_out", jnp.ones((1, 1, 1), jnp.float32)),
      packed["W_aux"], packed["c_all"],
      packed["b_res"], packed["b_skip_sum"],
      packed["E_cur"], packed["E_prev"], packed["b_causal"],
      packed["W_post1"], packed["W_post2"], packed["b_post1"],
      packed["b_post2"], bufF0, bufA0, x0)
