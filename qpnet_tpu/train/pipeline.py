"""Pipeline-parallel training: GPipe microbatch schedule over a `pp` mesh axis.

The reference has no pipeline parallelism (its whole distributed story is
single-process DataParallel, reference qpnet_train.py:416-423); this is the
TPU-native scale-out layout for *deeper* QPNet variants, completing the
dp/tp/sp/pp matrix (`parallel/mesh.py`).  Expert parallelism has no referent
in this model family (no mixture-of-experts), so `ep` stays intentionally
absent.

Design — idiomatic JAX, no hand-rolled send/recv:

* The residual stacks are the pipeline body.  All 16 blocks (12 fixed + 4
  pitch-adaptive) share one parameter structure, so they stack into one
  (L, ...) pytree whose leading layer axis shards over `pp` — each device
  holds L/pp consecutive blocks (one stage).
* Fixed and adaptive blocks unify into a single gather-form block by
  treating the per-block look-back as data: a fixed block with dilation
  `dil` is the adaptive block with r(t) = dil plus a left-edge zero mask
  (the fixed stack zero-fills t < dil, models/qpnet.py::shift_time, while
  the adaptive stack clamps the gather, reference qpnet.py:592-640).  The
  (L, B, T) look-back/mask tables are computed once outside the pipeline.
* The schedule is classic GPipe inside one `jax.shard_map`: M microbatches
  flow through S stages over M+S-1 ticks; the (o, skip) activation carry
  moves stage-to-stage with `lax.ppermute` (XLA lowers it onto ICI
  neighbours), stage 0 injects, stage S-1 records, and a masked `psum`
  replicates the recorded outputs so the post-net/loss run outside the
  pipeline region.  Reverse-mode AD transposes the ppermute automatically,
  so one `jax.value_and_grad` over the whole loss differentiates the
  pipelined forward with the reverse schedule — no manual backward pass.
* The embedding front-end and the post-net/loss stay outside the
  shard_map: they are tiny, and GSPMD partitions them over `dp` as usual.

Numerics: the unified gather-form block performs the same matmuls in the
same order as the dp forward (models/qpnet.py::fixed_block/adaptive_block),
and the masked gather reproduces shift_time's zero fill exactly, so the
pipelined loss is bit-identical to the dp loss at every precision — the
dryrun and tests gate on that.

Bubble fraction is (S-1)/(M+S-1); callers pick M >= 2*S to keep it small.
dp x pp composes (batch over dp, stages over pp); pp x tp/sp does not (the
stage-local block loop would need manual tp collectives) and is rejected.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models.qpnet import (
    Params, _act_dtype, _gate, _matmul, shift_time, upsample_aux,
)


def _stack_blocks(params: Params):
    """Stack the 12 fixed + 4 adaptive block dicts into one (L, ...) tree."""
    blocks = list(params["fixed"]) + list(params["adaptive"])
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def _unified_block(p, o, h_up, r, mask, R: int, dtype):
    """One residual block in gather form.

    r:    (B, T) int32 look-back; mask: (B, T) 0/1 left-edge fill.
    Matches fixed_block when r == dil and mask == (t >= dil); matches
    adaptive_block when mask == 1 (clamped gather), bit-for-bit.
    """
    B, T, _ = o.shape
    act = _act_dtype(dtype)
    t = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    idx = jnp.clip(t - r, 0, T - 1)
    past = jnp.take_along_axis(o, idx[..., None], axis=1) \
        * mask[..., None].astype(o.dtype)
    z = (_matmul(o, p["W_cur"], dtype, act)
         + _matmul(past, p["W_prev"], dtype, act)
         + _matmul(h_up, p["W_aux"], dtype, act)
         + p["b_gate"].astype(act))
    g = _gate(z, R)
    skip = _matmul(g, p["W_skip"], dtype) + p["b_skip"]
    res = _matmul(g, p["W_res"], dtype, act) + p["b_res"].astype(act)
    return o + res, skip


def _lookback_tables(cfg: ModelConfig, d: jnp.ndarray, act):
    """(L, B, T) per-block look-back r and left-edge mask, fixed then
    adaptive — the data that makes all blocks one homogeneous stage body."""
    B, T = d.shape
    t = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    rs, masks = [], []
    for dil in cfg.dilationsF:
        rs.append(jnp.full((B, T), dil, jnp.int32))
        masks.append((t >= dil).astype(act))
    for dil in cfg.dilationsA:
        rs.append(jnp.round(d * dil).astype(jnp.int32))
        masks.append(jnp.ones((B, T), act))
    return jnp.stack(rs), jnp.stack(masks)


def pipeline_forward(params: Params, cfg: ModelConfig,
                     x: jnp.ndarray, h: jnp.ndarray, d: jnp.ndarray,
                     mesh: Mesh, n_microbatches: Optional[int] = None,
                     compute_dtype=jnp.float32,
                     remat: bool = False) -> jnp.ndarray:
    """Teacher-forced forward with the residual stacks pipelined over `pp`.

    Same contract as models.qpnet.forward; requires a mesh with a "pp"
    axis (and optionally "dp"), pp | L and M | per-dp-shard batch.
    """
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    S = axes.get("pp", 1)
    if S <= 1:
        raise ValueError("pipeline_forward needs a pp axis of size > 1")
    if axes.get("tp", 1) > 1 or axes.get("sp", 1) > 1:
        raise ValueError("pp composes with dp only (not tp/sp)")
    L = len(cfg.dilationsF) + len(cfg.dilationsA)
    if L % S:
        raise ValueError(f"pp={S} must divide the {L}-block stack")
    L_local = L // S
    dp = axes.get("dp", 1)
    B, T = x.shape
    M = int(n_microbatches) if n_microbatches else S
    if B % dp or (B // dp) % M:
        raise ValueError(
            f"per-dp-shard batch {B}//{dp} must split into {M} microbatches")
    R, Sk, A = cfg.n_resch, cfg.n_skipch, cfg.n_aux
    act = _act_dtype(compute_dtype)

    # front-end outside the pipeline (replicated over pp, dp-partitioned)
    h_up = upsample_aux(params, h, cfg.upsampling_factor).astype(act)
    o0 = (jnp.take(params["embed_cur"], x, axis=0)
          + shift_time(jnp.take(params["embed_prev"], x, axis=0), 1)
          + params["b_causal"]).astype(act)
    r_all, mask_all = _lookback_tables(cfg, d, act)

    stacked = _stack_blocks(params)
    block = _unified_block
    if remat:
        block = jax.checkpoint(_unified_block, static_argnums=(5, 6))

    def pp_fn(Wl, o0_l, h_l, r_l, mask_l):
        # per-device: Wl holds this stage's L_local blocks; o0_l/h_l the
        # dp-local batch; r_l/mask_l this stage's look-back tables.
        s = jax.lax.axis_index("pp")
        Bl = o0_l.shape[0]
        Bm = Bl // M
        o0m = o0_l.reshape(M, Bm, T, R)
        hm = h_l.reshape(M, Bm, T, A)
        rm = r_l.reshape(L_local, M, Bm, T)
        km = mask_l.reshape(L_local, M, Bm, T)
        perm = [(i, (i + 1) % S) for i in range(S)]

        o_state = jnp.zeros((Bm, T, R), act)
        skip_state = jnp.zeros((Bm, T, Sk), jnp.float32)
        outs_skip = jnp.zeros((M, Bm, T, Sk), jnp.float32)
        for k in range(M + S - 1):
            # stage s works on microbatch m = k - s this tick (garbage
            # compute outside [0, M) is the pipeline bubble and never
            # recorded); stage 0 injects, others consume the carry.
            m = jnp.clip(k - s, 0, M - 1)
            inject = o0m[min(k, M - 1)]
            o_cur = jnp.where(s == 0, inject, o_state)
            skip_cur = jnp.where(s == 0, jnp.zeros_like(skip_state),
                                 skip_state)
            h_cur = jax.lax.dynamic_index_in_dim(hm, m, 0, keepdims=False)
            for l in range(L_local):
                p_l = jax.tree_util.tree_map(lambda a: a[l], Wl)
                r_cur = jax.lax.dynamic_index_in_dim(
                    rm[l], m, 0, keepdims=False)
                k_cur = jax.lax.dynamic_index_in_dim(
                    km[l], m, 0, keepdims=False)
                o_cur, skip = block(p_l, o_cur, h_cur, r_cur, k_cur, R,
                                    compute_dtype)
                skip_cur = skip_cur + skip
            if k >= S - 1:  # last stage finishes microbatch k-(S-1)
                mo = k - (S - 1)
                outs_skip = outs_skip.at[mo].set(
                    jnp.where(s == S - 1, skip_cur, outs_skip[mo]))
            o_state = jax.lax.ppermute(o_cur, "pp", perm)
            skip_state = jax.lax.ppermute(skip_cur, "pp", perm)

        # replicate the last stage's recordings across pp (only the skip
        # sum leaves the pipeline region — postprocess/loss consume it;
        # the final residual state is not an output of the network)
        last = (s == S - 1)
        outs_skip = jax.lax.psum(jnp.where(last, outs_skip, 0), "pp")
        return outs_skip.reshape(Bl, T, Sk)

    dp_spec = P("dp") if "dp" in axes else P(None)
    skip_sum = jax.shard_map(
        pp_fn, mesh=mesh,
        in_specs=(P("pp"),                       # stacked block params
                  P(*dp_spec, None, None),       # o0
                  P(*dp_spec, None, None),       # h_up
                  P("pp", *dp_spec, None),       # r tables
                  P("pp", *dp_spec, None)),      # masks
        out_specs=P(*dp_spec, None, None),
    )(stacked, o0, h_up, r_all, mask_all)

    from qpnet_tpu.models.qpnet import postprocess
    return postprocess(params, skip_sum, compute_dtype)
