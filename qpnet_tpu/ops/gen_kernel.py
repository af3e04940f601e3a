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

# Ring streaming (deep networks): fixed-stack rings are accessed at slot
# t % size — perfectly sequential — so layers whose ring would blow the
# VMEM budget (Rd10Rr3Ed4Er1's dilations up to 512: 3069 ring slots vs
# the default net's 45) keep their ring in HBM and stage a sliding
# window of STREAM_W slots in VMEM, triple-buffered so the prefetch of
# window k+1 and the write-back of window k-1 overlap window k's
# compute.  Windows are aligned on the ABSOLUTE sample index (W divides
# every streamed dilation — powers of two), so chunked continuation
# stays position-exact for any step_offset: a chunk entering mid-window
# prefetches the full window (its untouched slots are live history) and
# the final partial window writes back read-unmodified slots unchanged.
STREAM_W = 8


def pack_weights(params: Dict[str, Any], cfg: ModelConfig,
                 quantize: str = "none") -> Dict[str, Any]:
    """Fuse + pad parameters into the kernel's resident layout (pure jnp so
    it can run inside the jitted generation prologue).

    quantize="w8a8": the two large per-block matrices are stored int8 with
    per-output-column scales; the MXU runs int8 at twice the bf16 rate and
    the resident weight set shrinks 2x (more VMEM left for batch).

    NOTE: "w8a8" is the pallas kernel's scheme (dynamic per-row activation
    quantization, mmq below); the XLA scan engine's separate
    "int8_weights" scheme is weight-only dequantized matmul.
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
    if quantize == "w8a8":
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
        # one fused (Q, 2R) embedding table: columns [:R] give E_cur[x] for
        # this step, columns [R:] give E_prev[x] for the NEXT step — one
        # one-hot matmul per step instead of two
        "E_cat": jnp.concatenate(
            [jnp.asarray(params["embed_cur"], jnp.bfloat16),
             jnp.asarray(params["embed_prev"], jnp.bfloat16)], axis=1),
        "b_causal": jnp.asarray(params["b_causal"], jnp.float32)[None, :],
        "W_post1": jnp.asarray(params["W_post1"], jnp.bfloat16),
        "W_post2": jnp.asarray(params["W_post2"], jnp.bfloat16),
        "b_post1": jnp.asarray(params["b_post1"], jnp.float32)[None, :],
        "b_post2": jnp.asarray(params["b_post2"], jnp.float32)[None, :],
    })
    return out


def stream_layers(cfg: ModelConfig, stream_min_dil) -> list:
    """Indices of fixed layers whose rings live in HBM (dilation >=
    stream_min_dil).  None = no streaming (all rings VMEM-resident)."""
    if stream_min_dil is None:
        return []
    if stream_min_dil < 4 * STREAM_W:
        # window scheduling needs >= 4 windows per ring cycle so the
        # prefetch of window k+1 never races the write-back of k-1
        raise ValueError(f"stream_min_dil must be >= {4 * STREAM_W}")
    bad = [d for d in cfg.dilationsF
           if d >= stream_min_dil and d % STREAM_W]
    if bad:
        raise ValueError(f"streamed dilations must be multiples of "
                         f"{STREAM_W}, got {bad}")
    return [i for i, d in enumerate(cfg.dilationsF) if d >= stream_min_dil]


def vmem_cost_bytes(cfg: ModelConfig, B: int, maxd: int,
                    quantize: str = "none", stream_min_dil=None) -> int:
    """Rough resident VMEM footprint; callers fall back to the XLA scan
    path when this exceeds the budget (large maxd buckets / batches).
    stream_min_dil: fixed layers with dilation >= it keep their rings in
    HBM and stage STREAM_W-slot windows instead (see stream_layers)."""
    R, S, Q = cfg.n_resch, cfg.n_skipch, cfg.n_quantize
    L = len(cfg.dilationsF) + len(cfg.dilationsA)
    wbytes = 1 if quantize == "w8a8" else 2
    # W_aux is packed bf16 (2 bytes, pack_weights); the per-frame aux
    # projections it produces are f32 and counted in aux_cache below
    weights = wbytes * (L * (2 * R) * (2 * R) + L * R * (S + R)) \
        + 2 * L * AUX_PAD * 2 * R + 2 * (2 * Q * R + 2 * S * S)
    # ring scratch is tiled (8, 128) on the (B, R) minor dims: the batch
    # dimension pads to a multiple of 8 sublanes (a B=5 deep-net kernel
    # allocates its (3069, 8, 512) rings, not (3069, 5, 512))
    B8 = -(-B // 8) * 8
    streamed = set(stream_layers(cfg, stream_min_dil))
    resident_slots = sum(d for i, d in enumerate(cfg.dilationsF)
                         if i not in streamed)
    bufF = 2 * resident_slots * B8 * R
    staging = 2 * len(streamed) * 3 * STREAM_W * B8 * R
    bufA = 2 * (maxd * sum(cfg.dilationsA) + len(cfg.dilationsA)) * B8 * R
    aux_cache = 4 * L * B8 * 2 * R
    return weights + bufF + staging + bufA + aux_cache + (1 << 23)


def _partition_fixed(cfg: ModelConfig, stream_min_dil):
    """Split fixed layers into VMEM-resident and HBM-streamed ring sets.

    Returns (streamed_rows, offF, offF_res, sumF_res, runs): streamed_rows
    maps layer index -> staging row; offF is the flat-pack HBM offset of
    every fixed layer (the priming layout, unchanged by streaming);
    offF_res the VMEM offset of each resident layer; runs the contiguous
    (hbm_off, vmem_off, length) resident spans for init/export DMAs."""
    sizesF = list(cfg.dilationsF)
    offF = np.cumsum([0] + sizesF)[:-1].tolist()
    streamed = stream_layers(cfg, stream_min_dil)
    streamed_rows = {l: i for i, l in enumerate(streamed)}
    offF_res, runs = {}, []
    acc = 0
    for l, size in enumerate(sizesF):
        if l in streamed_rows:
            continue
        offF_res[l] = acc
        if runs and runs[-1][0] + runs[-1][2] == offF[l] \
                and runs[-1][1] + runs[-1][2] == acc:
            runs[-1] = (runs[-1][0], runs[-1][1], runs[-1][2] + size)
        else:
            runs.append((offF[l], acc, size))
        acc += size
    return streamed_rows, offF, offF_res, acc, runs


def choose_stream_min_dil(cfg: ModelConfig, B: int, maxd: int,
                          quantize: str = "none"):
    """Pick the least ring streaming that fits the VMEM budget.

    Returns (stream_min_dil, fits): None/True when every ring is
    VMEM-resident (the fast default), a dilation threshold/True when
    offloading the >= threshold fixed rings to HBM windows makes the
    kernel fit (deep networks: Rd10Rr3Ed4Er1's 3069 ring slots), or
    None/False when even full streaming cannot fit (weights + adaptive
    rings alone exceed the budget -> XLA scan fallback)."""
    if vmem_cost_bytes(cfg, B, maxd, quantize) < VMEM_LIMIT:
        return None, True
    # prefer streaming as few layers as possible: largest threshold first
    for thr in sorted({d for d in cfg.dilationsF
                       if d >= 4 * STREAM_W and d % STREAM_W == 0},
                      reverse=True):
        if vmem_cost_bytes(cfg, B, maxd, quantize,
                           stream_min_dil=thr) < VMEM_LIMIT:
            return thr, True
    return None, False


def resolve_stream_min_dil(cfg: ModelConfig, B: int, maxd: int,
                           quantize: str = "none"):
    """The streaming level pallas_generate will ACTUALLY run at: the
    QPNET_STREAM_MIN_DIL env override (perf/VMEM triage; "none" = fully
    resident) when set, else choose_stream_min_dil's pick.  Every
    batch-padding decision (_pallas_path, _pallas_mesh_path,
    StreamingGenerator) resolves through here, so a forced level can
    never skew the caller's 8-alignment padding away from the kernel's
    real DMA behavior."""
    import os
    forced = os.environ.get("QPNET_STREAM_MIN_DIL")
    if forced:
        return None if forced == "none" else int(forced)
    return choose_stream_min_dil(cfg, B, maxd, quantize)[0]


# Measured fused-program batch ceiling for streamed bf16 kernels (v5e,
# round 5).  The single-jit decode program that fuses the priming prologue
# with the kernel (models/generate.py::_pallas_device_path) crashes the
# TPU worker at bf16 Rd10Rr3Ed4Er1 B=16 — deterministically, at EVERY
# streaming level including the maximum (thr=32) — while the SAME kernel
# runs correctly standalone (the chunked path benches 224k samples/s at
# B=16) and the fused program runs correctly at B=8 (283k).  The kernel's
# scoped-VMEM estimate cannot discriminate (w8a8 B=64 runs fine at a
# HIGHER estimate, 125.8 vs B=16-bf16's 122.2 MiB minimum), so the
# overcommit is XLA's, in the fused executable, on top of Mosaic's scoped
# region — reachable only when streaming is active WITHOUT w8a8's halved
# resident weight set.  Admission therefore caps the FUSED batch at the
# measured-safe 8; callers split larger batches into B=8 slices, which
# also measure FASTER than one B=16 program (2 x 283k vs 224k).  See
# BENCH_NOTES.md "Deep network" for the measurement table.
STREAM_BF16_FUSED_MAX_B = 8


def fused_batch_ok(cfg: ModelConfig, B: int, maxd: int,
                   quantize: str = "none") -> bool:
    """Whether the fused single-jit decode program (priming prologue +
    kernel in one XLA executable) is admitted at kernel batch B: the
    kernel must fit its VMEM budget AND, when ring streaming is active in
    bf16, B must not exceed the measured STREAM_BF16_FUSED_MAX_B ceiling.
    Standalone kernel calls (the chunked decode path, StreamingGenerator
    serving sessions) are NOT subject to the ceiling — they carry no
    fused prologue and run correctly at larger batches."""
    if not choose_stream_min_dil(cfg, B, maxd, quantize)[1]:
        return False
    level = resolve_stream_min_dil(cfg, B, maxd, quantize)
    if level is None or quantize == "w8a8":
        return True
    return B <= STREAM_BF16_FUSED_MAX_B


def _make_kernel(cfg: ModelConfig, B: int, maxd: int, mode: str,
                 interpret: bool = False, quantize: str = "none",
                 stream_min_dil=None):
    if mode not in ("sampling", "argmax", "forced"):
        raise ValueError("mode should be sampling, argmax or forced")
    import os
    ablate = os.environ.get("QPNET_KERNEL_ABLATE", "")  # perf triage only
    R, S, Q = cfg.n_resch, cfg.n_skipch, cfg.n_quantize
    dilsF, dilsA = cfg.dilationsF, cfg.dilationsA
    nF, nA = len(dilsF), len(dilsA)
    L = nF + nA
    up = cfg.upsampling_factor
    sizesF = list(dilsF)
    # +1 slot so this step's write never collides with the deepest
    # look-back read (r spans [0, maxd*dil]; write-before-read serves r=0)
    sizesA = [maxd * d + 1 for d in dilsA]
    s_rows, offF, offF_res, sumF_res, res_runs = _partition_fixed(
        cfg, stream_min_dil)
    n_s = len(s_rows)
    W = STREAM_W
    offA = np.cumsum([0] + sizesA)[:-1].tolist()
    bf16 = jnp.bfloat16
    UNROLL = 2 if up % 2 == 0 else 1

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
               b_skip_ref, E_cat_ref, b_causal_ref,
               W_post1_ref, W_post2_ref, b_post1_ref, b_post2_ref,
               bufF0_ref, bufA0_ref, x0_ref,  # primed state
               xf_ref,                        # (up,1,B) forced samples (forced
                                              # mode; (1,1,B) dummy otherwise)
               out_ref,                       # (up,1,B) i32 samples, or
                                              # (up,B,Q) f32 logits (forced)
               bufF_out_ref, bufA_out_ref, x_out_ref,  # carried state out
               *scratch):
        if n_s:
            (bufF, bufA, x_state, aux_cache, e_prev, pastA_s,
             init_sems, stage, pre_sem, wb_sem) = scratch
        else:
            (bufF, bufA, x_state, aux_cache, e_prev, pastA_s,
             init_sems) = scratch
        g_idx = pl.program_id(0)
        n_total = pl.num_programs(0) * UNROLL
        offs = seed_ref[1]
        # streamed-ring window bookkeeping: windows are W consecutive
        # ABSOLUTE sample indices; k0/k_last bound this chunk's windows
        k0 = offs // W
        k_last = (offs + n_total - 1) // W

        def pre_dma(ls, l, k):
            """Prefetch window k of streamed layer l (HBM ring -> VMEM
            staging slot k%3).  bufF_out_ref aliases bufF0_ref, so the
            ring's canonical storage is the kernel's own output buffer."""
            size = sizesF[l]
            start = jax.lax.rem(k * W, size)
            return pltpu.make_async_copy(
                bufF_out_ref.at[pl.ds(offF[l] + start, W)],
                stage.at[ls, jax.lax.rem(k, 3)],
                pre_sem.at[ls, jax.lax.rem(k, 3)])

        def wb_dma(ls, l, k):
            """Write window k back to the HBM ring."""
            size = sizesF[l]
            start = jax.lax.rem(k * W, size)
            return pltpu.make_async_copy(
                stage.at[ls, jax.lax.rem(k, 3)],
                bufF_out_ref.at[pl.ds(offF[l] + start, W)],
                wb_sem.at[ls, jax.lax.rem(k, 3)])

        @pl.when(g_idx == 0)
        def _init():
            # primed buffers live in HBM (keeping them VMEM-resident would
            # double the ring-buffer footprint); one DMA per resident span
            # at step 0 (streamed layers stay in HBM: only their first
            # window(s) stage in).  Without streaming the single span is
            # the WHOLE buffer — copy by full ref, not a slice: Mosaic
            # requires sliced HBM transfers to have an 8-aligned batch
            # dim, and resident-only kernels must keep supporting any B
            # (the reference decodes at batch 20 and the deep net at 7).
            # Streaming kernels never see unaligned B: the caller pads
            # the batch to a sublane multiple (generate._pallas_path).
            if not n_s:
                cp = pltpu.make_async_copy(bufF0_ref, bufF,
                                           init_sems.at[0])
                cp.start()
                cp.wait()
            else:
                for hbm_off, vmem_off, length in res_runs:
                    cp = pltpu.make_async_copy(
                        bufF0_ref.at[pl.ds(hbm_off, length)],
                        bufF.at[pl.ds(vmem_off, length)],
                        init_sems.at[0])
                    cp.start()
                    cp.wait()
            cp2 = pltpu.make_async_copy(bufA0_ref, bufA, init_sems.at[1])
            cp2.start()
            cp2.wait()
            x_state[...] = x0_ref[...]
            for l, ls in s_rows.items():
                d0 = pre_dma(ls, l, k0)
                d0.start()
                d0.wait()

                @pl.when(k0 + 1 <= k_last)
                def _pre_next(ls=ls, l=l):
                    pre_dma(ls, l, k0 + 1).start()

        # per-sample body; called UNROLL times per grid step so
        # the grid/block bookkeeping amortizes over samples
        def one_step(t):
            # absolute sample index: ring slots, the upsampler phase and
            # the PRNG all key off it, so chunked calls (step_offset) are
            # position-exact regardless of the chunk length
            t_abs = t + seed_ref[1]
            w_t = upw_ref[jax.lax.rem(t_abs, up)]

            if n_s:
                k_cur = t_abs // W
                slot_cur = jax.lax.rem(k_cur, 3)
                pos_cur = jax.lax.rem(t_abs, W)

                # window boundary: rotate the triple-buffered staging —
                # write back window k-1, ensure window k arrived, start
                # prefetching window k+1.  All waits target DMAs issued a
                # full window (W steps) earlier, so they are no-ops in
                # steady state; t > 0 excludes the chunk's first step
                # (init staged window k0).
                @pl.when((pos_cur == 0) & (t > 0))
                def _stream_boundary():
                    k = k_cur
                    for l, ls in s_rows.items():
                        # window k-2's write-back (started at boundary
                        # k-1) must finish before its slot (k+1)%3 is
                        # re-used by window k+1's prefetch below
                        @pl.when(k >= k0 + 2)
                        def _wait_wb(ls=ls, l=l):
                            wb_dma(ls, l, k - 2).wait()
                        wb_dma(ls, l, k - 1).start()
                        pre_dma(ls, l, k).wait()

                        @pl.when(k + 1 <= k_last)
                        def _pre_next(ls=ls, l=l):
                            pre_dma(ls, l, k + 1).start()

            # the aux features are frame-rate: the 16 aux projections change only
            # every `up` samples, so they are recomputed at frame boundaries and
            # read from scratch in between (reference upsamples h then convolves,
            # qpnet.py:263-264 — algebraically the same since the upsampler is a
            # per-phase scalar scale + bias, folded into w_t and c_ref).
            @pl.when(jax.lax.rem(t, up) == 0)
            def _refresh_aux():
                h_f = h_ref[0]                     # (B, AUX_PAD)
                for l in range(L):
                    aux_cache[l] = mm(h_f, W_aux_ref[l])

            # causal layer: ONE one-hot matmul against the fused [E_cur | E_prev]
            # table; the E_prev half is carried in scratch for the next step
            iota_q = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
            oh_cur = (iota_q == x_state[1][:, None]).astype(bf16)

            @pl.when(t == 0)
            def _init_eprev():
                oh_prev = (iota_q == x_state[0][:, None]).astype(bf16)
                e_prev[...] = mm(oh_prev, E_cat_ref[:, R:])

            if "noembed" in ablate:
                o = (jnp.broadcast_to(oh_cur[:, :1].astype(jnp.float32), (B, R))
                     + b_causal_ref[...]).astype(bf16)
            else:
                z2 = mm(oh_cur, E_cat_ref[...])                    # (B, 2R)
                o = (z2[:, :R] + e_prev[...]
                     + b_causal_ref[...]).astype(bf16)             # (B, R)
                e_prev[...] = z2[:, R:]

            skip_sum = jnp.broadcast_to(b_skip_ref[...], (B, S)).astype(
                jnp.float32)

            for l in range(L):
                if l < nF and l in s_rows:
                    # streamed ring: the live window is VMEM-staged; read
                    # o(t-d) at this step's in-window position (the slot
                    # holds the value written d steps ago — prefetched
                    # from the HBM ring), overwritten with o(t) below
                    past = stage[s_rows[l], pl.ds(slot_cur, 1),
                                 pl.ds(pos_cur, 1), :, :][0, 0]       # (B, R)
                elif l < nF:
                    size = sizesF[l]
                    slot = jax.lax.rem(t_abs, size)
                    past = bufF[pl.ds(offF_res[l] + slot, 1), :, :][0]  # (B, R)
                else:
                    # pitch-adaptive look-back r = round(d*dil) differs per
                    # utterance: write this step's o first (so r=0 reads it
                    # back — teacher-forced idx t - 0), then gather each
                    # utterance's slot with scalar ring arithmetic.  The
                    # scalar loop reads 4*B rows/step; the one-hot masked
                    # reduce it replaces read the ENTIRE ring every step
                    # (~10 MB/step at B=20, ~30% of the step time).
                    la = l - nF
                    size = sizesA[la]
                    wslot = jax.lax.rem(t_abs, size)
                    bufA[pl.ds(offA[la] + wslot, 1), :, :] = \
                        o[None].astype(bf16)
                    for b in range(B):
                        if "noadapt" in ablate:
                            r_b = dilsA[la]
                        else:
                            d_b = d_ref[0, 0, b]
                            r_b = jnp.round(d_b * dilsA[la]).astype(
                                jnp.int32)
                            r_b = jnp.clip(r_b, 0, size - 1)
                        slot_b = jax.lax.rem(t_abs - r_b + 2 * size, size)
                        pastA_s[pl.ds(b, 1), :] = bufA[
                            pl.ds(offA[la] + slot_b, 1), pl.ds(b, 1), :][0]
                    past = pastA_s[...]
                xin = jnp.concatenate([o, past.astype(bf16)], axis=-1)
                if "nomm" in ablate:
                    # ablation: keep dataflow alive but skip the big matmuls
                    z_main = jnp.broadcast_to(
                        xin[:, :1].astype(jnp.float32), (B, 2 * R))
                elif quantize == "w8a8":
                    z_main = mmq(xin.astype(jnp.float32), W_in_ref[l],
                                 s_in_ref[l])
                else:
                    z_main = mm(xin, W_in_ref[l])
                z = z_main + aux_cache[l] * w_t + c_ref[l]
                if "nogate" in ablate:
                    g = (z[:, :R] * 0.25 * z[:, R:]).astype(bf16)
                else:
                    g = (jax.nn.sigmoid(z[:, :R])
                         * jnp.tanh(z[:, R:])).astype(bf16)
                if "nomm" in ablate:
                    outp = jnp.broadcast_to(
                        g[:, :1].astype(jnp.float32), (B, S + R))
                elif quantize == "w8a8":
                    outp = mmq(g.astype(jnp.float32), W_out_ref[l], s_out_ref[l])
                else:
                    outp = mm(g, W_out_ref[l])
                skip_sum = skip_sum + outp[:, :S]
                if l < nF and l in s_rows:
                    stage[s_rows[l], pl.ds(slot_cur, 1),
                          pl.ds(pos_cur, 1), :, :] = \
                        o[None, None].astype(bf16)
                elif l < nF:
                    wslot = jax.lax.rem(t_abs, size)
                    bufF[pl.ds(offF_res[l] + wslot, 1), :, :] = \
                        o[None].astype(bf16)
                o = (o.astype(jnp.float32) + outp[:, S:]
                     + b_res_ref[l]).astype(bf16)

            u = jnp.maximum(skip_sum, 0.0)
            if "nopost" in ablate:
                logits = jnp.broadcast_to(u[:, :1], (B, Q))
            else:
                u = jnp.maximum(mm(u.astype(bf16), W_post1_ref[...])
                                + b_post1_ref[...], 0.0)
                logits = mm(u.astype(bf16), W_post2_ref[...]) + b_post2_ref[...]

            @pl.when(t == n_total - 1)
            def _export_state():
                # stream the final ring state back to HBM so a follow-up chunk
                # can continue exactly where this one stopped (full-ref copy
                # when nothing is streamed — see _init on slice alignment)
                if not n_s:
                    cp = pltpu.make_async_copy(bufF, bufF_out_ref,
                                               init_sems.at[0])
                    cp.start()
                    cp.wait()
                else:
                    for hbm_off, vmem_off, length in res_runs:
                        cp = pltpu.make_async_copy(
                            bufF.at[pl.ds(vmem_off, length)],
                            bufF_out_ref.at[pl.ds(hbm_off, length)],
                            init_sems.at[0])
                        cp.start()
                        cp.wait()
                cp2 = pltpu.make_async_copy(bufA, bufA_out_ref, init_sems.at[1])
                cp2.start()
                cp2.wait()
                # streamed rings: the HBM copy is already current up to
                # window k-2; retire window k-1's write-back (started at
                # this window's boundary) and flush the live window k.
                # Untouched slots of a partial final window round-trip
                # their prefetched values — a semantic no-op
                for l, ls in s_rows.items():
                    k = k_last

                    @pl.when(k > k0)
                    def _wait_prev(ls=ls, l=l, k=k):
                        wb_dma(ls, l, k - 1).wait()
                    fin = wb_dma(ls, l, k)
                    fin.start()
                    fin.wait()

            if mode == "forced":
                # teacher-forced mode: the next input sample comes from the
                # forced stream instead of the kernel's own feedback, and the
                # full logits ship out.  This removes the AR feedback loop, so
                # every step's logits are comparable to the teacher-forced
                # `models.qpnet.forward` / XLA scan to numerical tolerance
                # (the strict engine-equivalence pin; free-running
                # trajectories diverge chaotically at the first bf16 tie).
                x_next = xf_ref[pl.ds(jax.lax.rem(t, up), 1), 0, :][0]
            elif mode == "sampling":
                # Counter-based PRNG: a murmur-style finalizer hash of
                # (seed, global step, GLOBAL batch index, class).  Unlike the
                # on-core hardware PRNG, the stream depends only on logical
                # position, so it is (a) identical in interpret and TPU modes
                # — the sampling path is CPU-testable bit-for-bit, (b)
                # invariant to chunked execution (global step via seed_ref[1])
                # and (c) invariant to batch sharding (global utterance index
                # via seed_ref[2]) — multi-chip decode reproduces single-chip
                # output exactly.  seed and step are mixed multiplicatively so
                # adjacent seeds do not alias into time-shifted streams.
                base = ((seed_ref[0].astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
                        ^ (t_abs.astype(jnp.uint32)
                           * jnp.uint32(2654435761)))
                idx = ((jax.lax.broadcasted_iota(jnp.uint32, (B, Q), 0)
                        + seed_ref[2].astype(jnp.uint32)) * jnp.uint32(Q)
                       + jax.lax.broadcasted_iota(jnp.uint32, (B, Q), 1))
                v = base + idx * jnp.uint32(0x9E3779B9)
                v = v ^ (v >> 16); v = v * jnp.uint32(0x7FEB352D)
                v = v ^ (v >> 15); v = v * jnp.uint32(0x846CA68B)
                v = v ^ (v >> 16)
                bits = v
                bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
                unif = bits24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
                gumbel = -jnp.log(-jnp.log(unif))
                x_next = jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)
            else:
                x_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)

            # output block covers one frame (up samples): the HBM DMA fires per
            # frame, not per sample
            if mode == "forced":
                out_ref[pl.ds(jax.lax.rem(t, up), 1), :, :] = \
                    logits[None].astype(jnp.float32)
            else:
                out_ref[pl.ds(jax.lax.rem(t, up), 1), 0, :] = x_next[None]
            x_state[0, :] = x_state[1, :]
            x_state[1, :] = x_next

            @pl.when(t == n_total - 1)
            def _export_x():
                x_out_ref[...] = x_state[...]

        for k in range(UNROLL):
            one_step(g_idx * UNROLL + k)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "B", "maxd", "n_steps", "mode", "interpret",
                     "quantize", "stream_min_dil"))
def pallas_generate(packed: Dict[str, Any], cfg: ModelConfig,
                    bufF0: jnp.ndarray, bufA0: jnp.ndarray,
                    x0: jnp.ndarray, h_frames: jnp.ndarray,
                    d_frames: jnp.ndarray, seed,
                    B: int, maxd: int, n_steps: int,
                    mode: str = "sampling",
                    interpret: bool = False,
                    quantize: str = "none",
                    step_offset: int = 0,
                    b_offset=0,
                    x_forced=None,
                    stream_min_dil="auto"):
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
    b_offset: global index of this shard's first utterance (keeps the PRNG
              stream invariant to batch sharding over a mesh).
    x_forced: (n_steps, 1, B) int32, required iff mode="forced" — the
              sample stream fed back in place of the kernel's own output.
    Returns (samples (n_steps,1,B) i32, bufF_out, bufA_out, x_out) — the
    carried ring state enables exact chunked continuation when n_steps is
    a multiple of every ring size and the upsampling factor.  In forced
    mode the first element is instead the per-step logits
    (n_steps, B, n_quantize) f32.
    """
    up = cfg.upsampling_factor
    assert n_steps % up == 0, "n_steps must cover whole frames"
    U = 2 if up % 2 == 0 else 1   # samples per grid step (matches kernel)
    if stream_min_dil == "auto":
        # deterministic function of static shapes: every shard / call
        # site resolves to the same level, so callers need no plumbing
        # (env override included — see resolve_stream_min_dil)
        stream_min_dil = resolve_stream_min_dil(cfg, B, maxd, quantize)
    if stream_min_dil is not None and B % 8 and not interpret:
        # streamed rings DMA (W, B, R) windows between HBM and VMEM and
        # Mosaic requires the sublane dim of a sliced transfer to be
        # 8-aligned; callers that resolve the level through
        # resolve_stream_min_dil pad the batch before getting here
        # (interpret mode simulates the DMAs, so unaligned B is fine
        # there — the bit-identity tests run streamed kernels at B=3)
        raise ValueError(
            f"ring streaming (stream_min_dil={stream_min_dil}) requires "
            f"the kernel batch to be a multiple of 8, got B={B}; pad the "
            "batch (see _pallas_path) or resolve the level via "
            "resolve_stream_min_dil before calling")
    kernel = _make_kernel(cfg, B, maxd, mode, interpret, quantize,
                          stream_min_dil)
    nF, nA = len(cfg.dilationsF), len(cfg.dilationsA)
    L = nF + nA
    R = cfg.n_resch
    sumF = sum(cfg.dilationsF)
    sumA = maxd * sum(cfg.dilationsA) + len(cfg.dilationsA)
    s_rows, _, _, sumF_res, _ = _partition_fixed(cfg, stream_min_dil)
    n_s = len(s_rows)

    resident = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32),
                          jnp.asarray(step_offset, jnp.int32),
                          jnp.asarray(b_offset, jnp.int32)])
    if mode == "forced":
        if x_forced is None:
            raise ValueError("mode='forced' requires x_forced")
        xf_in = x_forced.astype(jnp.int32)
        xf_spec = pl.BlockSpec((up, 1, B), lambda g: ((g * U) // up, 0, 0))
        out0_shape = jax.ShapeDtypeStruct((n_steps, B, cfg.n_quantize),
                                          jnp.float32)
        out0_spec = pl.BlockSpec((up, B, cfg.n_quantize),
                                 lambda g: ((g * U) // up, 0, 0))
    else:
        xf_in = jnp.zeros((1, 1, B), jnp.int32)
        xf_spec = pl.BlockSpec((1, 1, B), lambda g: (0, 0, 0))
        out0_shape = jax.ShapeDtypeStruct((n_steps, 1, B), jnp.int32)
        out0_spec = pl.BlockSpec((up, 1, B), lambda g: ((g * U) // up, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(n_steps // U,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, AUX_PAD), lambda g: ((g * U) // up, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda g: ((g * U) // up, 0, 0),
                         memory_space=pltpu.SMEM),
            resident(), resident(), resident(), resident(),
            resident(), resident(), resident(),
            resident(), resident(), resident(),
            resident(), resident(), resident(), resident(),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            resident(),
            xf_spec,
        ],
        out_specs=(
            out0_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((max(sumF_res, 1), B, R), jnp.bfloat16),
            pltpu.VMEM((sumA, B, R), jnp.bfloat16),
            pltpu.VMEM((2, B), jnp.int32),
            pltpu.VMEM((L, B, 2 * R), jnp.float32),  # per-frame aux proj
            pltpu.VMEM((B, R), jnp.float32),         # carried E_prev[x_cur]
            pltpu.VMEM((B, R), jnp.bfloat16),        # adaptive gather rows
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([
            # streamed-ring staging: triple-buffered STREAM_W-slot windows
            pltpu.VMEM((n_s, 3, STREAM_W, B, R), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((n_s, 3)),       # prefetch sems
            pltpu.SemaphoreType.DMA((n_s, 3)),       # write-back sems
        ] if n_s else []),
        input_output_aliases={18: 1} if n_s else {},
        out_shape=(
            out0_shape,
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
      packed["E_cat"], packed["b_causal"],
      packed["W_post1"], packed["W_post2"], packed["b_post1"],
      packed["b_post2"], bufF0, bufA0, x0, xf_in)
