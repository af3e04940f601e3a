"""Fused Pallas fwd+bwd for the fixed dilated-conv stack (training).

The teacher-forced training step spends ~12/16 of its FLOPs in the fixed
residual stack (reference hot loop qpnet_train.py:517-531; our XLA step
runs it at ~60% of the bf16 MXU roofline — the gap is spread across
backward fusion boundaries, BENCH_NOTES.md round-2 ablations).  This
module runs that stack as two Pallas kernels with a custom VJP:

  * forward: one kernel, sequential grid over (batch, time tiles); all
    12 blocks' weights resident in VMEM; per-block inputs and gate
    activations [s|t] stream to HBM for the backward (recompute would
    re-pay the dominant W_in matmul);
  * backward: reverse-sequential grid; weight gradients accumulate in
    f32 VMEM across tiles (flushed once at the end); the dilated shift's
    transpose runs as an in-tile shift plus a per-layer carry between
    adjacent tiles.  Layers are processed in CHUNKS sized by a VMEM cost
    model (the f32 dW accumulators are the footprint driver), chained
    through the do boundary gradient.

The pitch-adaptive stack, causal embedding, and post-net stay in XLA:
their per-sample gather/scatter is ~3 ms of the step and XLA handles it
well, while a Pallas gather over arbitrary look-backs would serialize.

Math is identical to models/qpnet.fixed_block (same fused [cur;past] @
W_in and gate @ [W_skip|W_res] formulation, same bf16 storage points);
gradient parity vs jax.value_and_grad of the XLA forward is property-
tested in tests/test_train_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AUX_PAD = 48
VMEM_BUDGET = 100 * 1024 * 1024  # leave headroom for Mosaic temporaries

# time-tile length: big enough for MXU-efficient (TS, 2R) @ (2R, 2R)
# matmuls, small enough that per-tile activation blocks stay modest
TILE = 512


def _mm(a, b, dtype, out_dtype=jnp.float32):
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=out_dtype)


def _mm_tn(a, b, dtype):
    """a^T @ b with contraction on axis 0 of both (for dW = xin^T @ dz)."""
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mm_nt(a, b, dtype):
    """a @ b^T with contraction on axis 1 of both (for dx = dz @ W^T)."""
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _make_fwd_kernel(dils: Sequence[int], R: int, S: int, TS: int,
                     dtype, act):
    L = len(dils)
    maxd = max(dils)

    def kernel(o0_ref, h_ref,
               W_in_ref, W_aux_ref, bg_ref, W_out_ref, br_ref,
               o_out_ref, skip_ref, oall_ref, st_ref,
               carry):
        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _reset():
            # sequence start: the causal shift reads zero fill
            carry[...] = jnp.zeros_like(carry)

        o = o0_ref[0]                           # (TS, R) act dtype
        h = h_ref[0]                            # (TS, AUX_PAD)
        skip = jnp.zeros((TS, S), jnp.float32)
        for l, dil in enumerate(dils):
            oall_ref[l, 0] = o.astype(oall_ref.dtype)
            # shifted[j] = o[j - dil], first dil rows from the previous
            # tile's tail (carried in scratch)
            shifted = jnp.concatenate(
                [carry[l, maxd - dil:], o[: TS - dil]], axis=0)
            carry[l] = o[TS - maxd:]
            xin = jnp.concatenate([o, shifted], axis=-1)   # (TS, 2R)
            z = (_mm(xin, W_in_ref[l], dtype)
                 + _mm(h, W_aux_ref[l], dtype)
                 + bg_ref[l])                              # (TS, 2R) f32
            s = jax.nn.sigmoid(z[:, :R])
            t = jnp.tanh(z[:, R:])
            st_ref[l, 0] = jnp.concatenate([s, t], axis=-1).astype(
                st_ref.dtype)
            g = (s * t).astype(dtype)
            out = _mm(g, W_out_ref[l], dtype)              # (TS, S+R)
            skip = skip + out[:, :S]
            o = (o.astype(jnp.float32) + out[:, S:] + br_ref[l]).astype(act)
        o_out_ref[0] = o
        skip_ref[0] = skip

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dils", "R", "S", "TS", "dtype_name", "interpret"))
def _fwd_call(o0, h_up, W_in, W_aux, b_gate, W_out, b_res,
              dils, R, S, TS, dtype_name, interpret):
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    act = dtype
    B, T, _ = o0.shape
    L = len(dils)
    nT = T // TS
    kernel = _make_fwd_kernel(dils, R, S, TS, dtype, act)
    resident = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TS, R), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, TS, AUX_PAD), lambda b, t: (b, t, 0)),
            resident(), resident(), resident(), resident(), resident(),
        ],
        out_specs=(
            pl.BlockSpec((1, TS, R), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, TS, S), lambda b, t: (b, t, 0)),
            pl.BlockSpec((L, 1, TS, R), lambda b, t: (0, b, t, 0)),
            pl.BlockSpec((L, 1, TS, 2 * R), lambda b, t: (0, b, t, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, R), act),
            jax.ShapeDtypeStruct((B, T, S), jnp.float32),
            jax.ShapeDtypeStruct((L, B, T, R), act),
            jax.ShapeDtypeStruct((L, B, T, 2 * R), act),
        ),
        scratch_shapes=[pltpu.VMEM((L, max(dils), R), act)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(o0, h_up, W_in, W_aux, b_gate, W_out, b_res)


# ---------------------------------------------------------------------------
# backward kernel (one chunk of layers, reverse time order)
# ---------------------------------------------------------------------------

def _make_bwd_kernel(dils: Sequence[int], R: int, S: int, TS: int, dtype):
    """dils: dilations of THIS chunk's layers (outermost first is handled
    by iterating in reverse below)."""
    L = len(dils)
    maxd = max(dils)

    def kernel(do_ref, dskip_ref, oall_ref, oprev_ref, st_ref, h_ref,
               W_in_ref, W_aux_ref, W_out_ref,
               do0_ref, dh_ref, dWin_ref, dWaux_ref, dbg_ref,
               dWout_ref, dbr_ref,
               carry):
        b_idx = pl.program_id(0)
        t_rev = pl.program_id(1)          # 0 = LAST time tile
        nT = pl.num_programs(1)

        @pl.when(jnp.logical_and(b_idx == 0, t_rev == 0))
        def _init_acc():
            dWin_ref[...] = jnp.zeros_like(dWin_ref)
            dWaux_ref[...] = jnp.zeros_like(dWaux_ref)
            dbg_ref[...] = jnp.zeros_like(dbg_ref)
            dWout_ref[...] = jnp.zeros_like(dWout_ref)
            dbr_ref[...] = jnp.zeros_like(dbr_ref)

        @pl.when(t_rev == 0)
        def _reset_carry():
            carry[...] = jnp.zeros_like(carry)

        is_first_tile = pl.program_id(1) == nT - 1   # earliest time tile
        do = do_ref[0].astype(jnp.float32)           # (TS, R)
        dskip = dskip_ref[0].astype(jnp.float32)     # (TS, S)
        h = h_ref[0]
        dh = jnp.zeros((TS, AUX_PAD), jnp.float32)
        for i in range(L - 1, -1, -1):
            dil = dils[i]
            o = oall_ref[i, 0]                       # (TS, R) stored input
            st = st_ref[i, 0]
            s = st[:, :R].astype(jnp.float32)
            t = st[:, R:].astype(jnp.float32)
            dbr_ref[i] += jnp.sum(do, axis=0)
            dout = jnp.concatenate([dskip, do], axis=-1)  # (TS, S+R)
            g = (s * t).astype(dtype)
            dWout_ref[i] += _mm_tn(g, dout.astype(dtype), dtype)
            dg = _mm_nt(dout.astype(dtype), W_out_ref[i], dtype)  # (TS, R)
            dz = jnp.concatenate(
                [dg * t * s * (1.0 - s), dg * s * (1.0 - t * t)],
                axis=-1)                                   # (TS, 2R) f32
            dbg_ref[i] += jnp.sum(dz, axis=0)
            dzc = dz.astype(dtype)
            # aux-side grads in f32: the 48-column matmuls are a rounding
            # error of the step cost, and the upsampler's few parameters
            # (up_w/up_b) see every bit of dh precision
            dh = dh + _mm_nt(dz, W_aux_ref[i].astype(jnp.float32),
                             jnp.float32)
            dWaux_ref[i] += _mm_tn(h.astype(jnp.float32), dz, jnp.float32)
            # xin = [o, shifted(o)]; shifted head rows come from the
            # previous (earlier) tile's stored tail
            prev_tail = oprev_ref[i, 0, TS - dil:, :]
            prev_tail = jnp.where(is_first_tile,
                                  jnp.zeros_like(prev_tail), prev_tail)
            shifted = jnp.concatenate([prev_tail, o[: TS - dil]], axis=0)
            xin = jnp.concatenate([o, shifted], axis=-1)
            dWin_ref[i] += _mm_tn(xin, dzc, dtype)
            dxin = _mm_nt(dzc, W_in_ref[i], dtype)         # (TS, 2R)
            dprev = dxin[:, R:]
            # transpose of the shift: row j contributes to position j-dil
            shift_back = jnp.concatenate(
                [dprev[dil:], jnp.zeros((dil, R), jnp.float32)], axis=0)
            from_later = jnp.concatenate(
                [jnp.zeros((TS - maxd, R), jnp.float32),
                 carry[i]], axis=0)
            do = do + dxin[:, :R] + shift_back + from_later
            if dil < maxd:
                carry[i] = jnp.concatenate(
                    [jnp.zeros((maxd - dil, R), jnp.float32), dprev[:dil]],
                    axis=0)
            else:
                carry[i] = dprev[:dil]
        do0_ref[0] = do
        dh_ref[0] = dh

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dils", "R", "S", "TS", "dtype_name", "interpret"))
def _bwd_call(do, dskip, oall, st, h_up, W_in, W_aux, W_out,
              dils, R, S, TS, dtype_name, interpret):
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    B, T, _ = do.shape
    L = len(dils)
    nT = T // TS
    maxd = max(dils)
    kernel = _make_bwd_kernel(dils, R, S, TS, dtype)
    resident = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def rev(b, t):
        return (b, nT - 1 - t, 0)

    def rev4(b, t):
        return (0, b, nT - 1 - t, 0)

    def rev4_prev(b, t):
        # previous (earlier) time tile; clamped at 0, masked in-kernel
        return (0, b, jnp.maximum(nT - 2 - t, 0), 0)

    const = lambda b, t: (0, 0)
    const3 = lambda b, t: (0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TS, R), rev),
            pl.BlockSpec((1, TS, S), rev),
            pl.BlockSpec((L, 1, TS, R), rev4),
            pl.BlockSpec((L, 1, TS, R), rev4_prev),
            pl.BlockSpec((L, 1, TS, 2 * R), rev4),
            pl.BlockSpec((1, TS, AUX_PAD), rev),
            resident(), resident(), resident(),
        ],
        out_specs=(
            pl.BlockSpec((1, TS, R), rev),
            pl.BlockSpec((1, TS, AUX_PAD), rev),
            pl.BlockSpec((L, 2 * R, 2 * R), const3),
            pl.BlockSpec((L, AUX_PAD, 2 * R), const3),
            pl.BlockSpec((L, 2 * R), const),
            pl.BlockSpec((L, R, S + R), const3),
            pl.BlockSpec((L, R), const),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, R), jnp.float32),
            jax.ShapeDtypeStruct((B, T, AUX_PAD), jnp.float32),
            jax.ShapeDtypeStruct((L, 2 * R, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((L, AUX_PAD, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((L, 2 * R), jnp.float32),
            jax.ShapeDtypeStruct((L, R, S + R), jnp.float32),
            jax.ShapeDtypeStruct((L, R), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((L, maxd, R), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(do, dskip, oall, oall, st, h_up, W_in, W_aux, W_out)


# ---------------------------------------------------------------------------
# VMEM cost model + chunking
# ---------------------------------------------------------------------------

def fwd_vmem_cost(L: int, R: int, S: int, maxd: int, TS: int = TILE,
                  dtype_bytes: int = 2) -> int:
    weights = dtype_bytes * L * (2 * R * 2 * R + AUX_PAD * 2 * R
                                 + R * (S + R)) + 4 * L * (2 * R + R)
    carry = dtype_bytes * L * maxd * R
    tiles = dtype_bytes * TS * (R + AUX_PAD + R + S * 2
                                + L * R + L * 2 * R) + 4 * TS * (S + 2 * R)
    return weights + carry + tiles + (1 << 23)


def bwd_chunk_cost(c: int, R: int, S: int, maxd: int, TS: int = TILE,
                   dtype_bytes: int = 2) -> int:
    weights = dtype_bytes * c * (2 * R * 2 * R + AUX_PAD * 2 * R
                                 + R * (S + R))
    dW = 4 * c * (2 * R * 2 * R + AUX_PAD * 2 * R + 2 * R
                  + R * (S + R) + R)
    # streamed blocks are double-buffered by the pipeline (x2)
    acts = 2 * dtype_bytes * c * TS * (R + R + 2 * R)  # oall + oprev + st
    carry = 4 * c * maxd * R
    work = 4 * TS * (2 * R * 3 + R * 2 + S + AUX_PAD * 2)
    return weights + dW + acts + carry + work + (1 << 23)


def choose_bwd_chunks(dils: Sequence[int], R: int, S: int,
                      TS: int = TILE) -> list:
    """Split the layer list into contiguous chunks, each fitting the
    backward kernel's VMEM budget.  Returns a list of (start, end)."""
    L = len(dils)
    chunks = []
    start = 0
    while start < L:
        end = start + 1
        while end < L:
            maxd = max(dils[start:end + 1])
            if bwd_chunk_cost(end + 1 - start, R, S, maxd, TS) \
                    > VMEM_BUDGET:
                break
            end += 1
        chunks.append((start, end))
        start = end
    return chunks


def fixed_stack_available(cfg, B: int, T: int, dtype=jnp.bfloat16) -> bool:
    """True when the fused kernel supports this config on this platform."""
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        return False
    R, S = cfg.n_resch, cfg.n_skipch
    dils = tuple(cfg.dilationsF)
    if max(dils) > TILE:  # carry/concat layout needs dil <= tile length
        return False
    if fwd_vmem_cost(len(dils), R, S, max(dils)) > VMEM_BUDGET:
        return False
    # saved activations (o_all + st) must fit HBM comfortably: 4R bytes
    # per position per layer (bf16)
    act_bytes = 2 * len(dils) * B * T * 4 * R
    return act_bytes < 4 * (1 << 30)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fixed_stack_fused(static, dtype_name, interpret, weights, o0, h_up):
    """Fused fixed stack: (o_out, skip_sum) = stack(o0, h_up).

    static: (dils, R, S) tuple (hashable).
    weights: {"W_in": (L,2R,2R), "W_aux": (L,AUX_PAD,2R), "b_gate": (L,2R),
              "W_out": (L,R,S+R), "b_res": (L,R)} — f32 master copies.
    o0: (B, T, R) activation after the causal layer (act dtype).
    h_up: (B, T, AUX_PAD) upsampled aux, zero-padded channels.
    Returns o_out (B,T,R) act dtype and skip_sum (B,T,S) f32 (without the
    constant b_skip terms — add them outside).
    """
    out, _ = _fused_fwd(static, dtype_name, interpret, weights, o0, h_up)
    return out


def _fused_fwd(static, dtype_name, interpret, weights, o0, h_up):
    dils, R, S = static
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    # weight matrices go in at compute precision: f32 master copies would
    # double the resident VMEM footprint (the kernel casts at the matmul
    # anyway); biases stay f32 (added to f32 accumulators)
    o_out, skip, oall, st = _fwd_call(
        o0, h_up, weights["W_in"].astype(dtype),
        weights["W_aux"].astype(dtype), weights["b_gate"],
        weights["W_out"].astype(dtype), weights["b_res"],
        dils=dils, R=R, S=S, TS=TILE, dtype_name=dtype_name,
        interpret=interpret)
    return (o_out, skip), (oall, st, h_up, weights)


def _fused_bwd(static, dtype_name, interpret, residuals, cotangents):
    dils, R, S = static
    do_out, dskip = cotangents
    oall, st, h_up, weights = residuals
    L = len(dils)
    do = do_out.astype(jnp.float32)
    dh_total = jnp.zeros(h_up.shape, jnp.float32)
    dW = {k: [] for k in ("W_in", "W_aux", "b_gate", "W_out", "b_res")}
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    for start, end in reversed(choose_bwd_chunks(dils, R, S)):
        do, dh, dWin, dWaux, dbg, dWout, dbr = _bwd_call(
            do, dskip.astype(jnp.float32),
            oall[start:end], st[start:end], h_up,
            weights["W_in"][start:end].astype(dtype),
            weights["W_aux"][start:end].astype(dtype),
            weights["W_out"][start:end].astype(dtype),
            dils=tuple(dils[start:end]), R=R, S=S, TS=TILE,
            dtype_name=dtype_name, interpret=interpret)
        dh_total = dh_total + dh
        dW["W_in"].insert(0, dWin)
        dW["W_aux"].insert(0, dWaux)
        dW["b_gate"].insert(0, dbg)
        dW["W_out"].insert(0, dWout)
        dW["b_res"].insert(0, dbr)
    dweights = {k: jnp.concatenate(v, axis=0) for k, v in dW.items()}
    # cotangent dtypes must match the primals (o0/h_up are act dtype)
    return dweights, do.astype(oall.dtype), dh_total.astype(h_up.dtype)


fixed_stack_fused.defvjp(_fused_fwd, _fused_bwd)
