"""Training/eval steps: masked cross-entropy, Adam, data-parallel pjit.

Reference semantics: qpnet_train.py:425-431 (Adam lr 1e-4, CrossEntropyLoss
over the last `batch_length` samples, qpnet_train.py:517-531).  Weight decay
follows torch's L2-in-gradient convention (decay added to the gradient
*before* the Adam moments), not decoupled AdamW.

TPU-native structure: one jitted step; when a `Mesh` is supplied the batch is
sharded over the `dp` axis and parameters are replicated — XLA GSPMD inserts
the gradient all-reduce over ICI (replacing torch DataParallel's
scatter/gather, reference qpnet_train.py:416-423).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models.qpnet import Params, forward


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    iterations: jnp.ndarray  # scalar int32


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.0
                   ) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) equivalent
    (reference qpnet_train.py:426-429): L2 term enters the gradient before
    the moment estimates."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
              optax.scale(-lr)]
    return optax.chain(*parts)


def masked_ce_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                   valid_len: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy over the last `valid_len` positions of each
    sequence (reference qpnet_train.py:525-528; all rows share valid_len,
    asserted there)."""
    B, T, Q = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]  # (B, T)
    t = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    mask = (t >= T - valid_len).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def param_sharding_tree(mesh: Mesh, params: Params):
    """NamedSharding pytree for the model parameters under `mesh`.

    Without a `tp` axis (or with tp size 1) everything is replicated —
    the data-parallel layout.  With one, the residual channel dimension
    is tensor-sharded megatron-style (the scaling-book recipe: annotate,
    let GSPMD insert the collectives):

      * gate projections `W_cur/W_prev/W_aux/b_gate` column-parallel
        (the 2R output axis over tp);
      * `W_skip/W_res` row-parallel (the R input axis over tp) — GSPMD
        places the psum where their outputs rejoin the replicated skip
        sum / residual stream;
      * the causal embeddings shard their R output axis;
      * the frame upsampler and the S-channel post-net stay replicated
        (S and the aux dim are small).

    The specs are layout hints, not semantics — GSPMD partitions the
    same math — but an even layout needs tp | R (and even tp so the
    tanh|sigmoid halves of the fused 2R gate axis stay device-local).
    The reference model (R=512) shards up to tp=8 cleanly.  Unnecessary
    for parity at ~24M params (SURVEY.md §2.3); this is the scale-out
    path for wider variants.
    """
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if axes.get("tp", 1) == 1:
        repl = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: repl, params)
    blocks = list(params["fixed"]) + list(params["adaptive"])
    R = blocks[0]["W_res"].shape[0]
    tp = axes["tp"]
    if R % tp:
        raise ValueError(f"tp={tp} must divide n_resch={R}")

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    def block(_):
        return {
            "W_cur": ns(None, "tp"), "W_prev": ns(None, "tp"),
            "W_aux": ns(None, "tp"), "b_gate": ns("tp"),
            "W_skip": ns("tp", None), "b_skip": ns(),
            "W_res": ns("tp", None), "b_res": ns(),
        }

    return {
        "embed_prev": ns(None, "tp"), "embed_cur": ns(None, "tp"),
        "b_causal": ns("tp"), "up_w": ns(), "up_b": ns(),
        "fixed": [block(b) for b in params["fixed"]],
        "adaptive": [block(b) for b in params["adaptive"]],
        "W_post1": ns(), "b_post1": ns(),
        "W_post2": ns(), "b_post2": ns(),
    }


def shard_train_state(mesh: Mesh, state: TrainState) -> TrainState:
    """device_put a TrainState with the mesh's parameter layout.

    The optimizer state mirrors the parameter tree (Adam's mu/nu), so any
    sub-tree structurally identical to the params gets the same sharding;
    scalars (step counts) replicate.
    """
    shard_tree = param_sharding_tree(mesh, state.params)
    repl = NamedSharding(mesh, P())
    pstruct = jax.tree_util.tree_structure(state.params)

    def place(t):
        if jax.tree_util.tree_structure(t) == pstruct:
            return jax.tree_util.tree_map(jax.device_put, t, shard_tree)
        if hasattr(t, "_fields"):                      # optax NamedTuples
            return type(t)(*(place(c) for c in t))
        if isinstance(t, (tuple, list)):
            return type(t)(place(c) for c in t)
        return jax.device_put(t, repl)

    return TrainState(place(state.params), place(state.opt_state),
                      jax.device_put(state.iterations, repl))


def _loss_fn(params, cfg, batch, compute_dtype, remat, fixed_engine="xla",
             maxd_bucket=None):
    logits = forward(params, cfg, batch["x"], batch["h"], batch["d"],
                     compute_dtype=compute_dtype, remat=remat,
                     fixed_engine=fixed_engine, maxd_bucket=maxd_bucket)
    return masked_ce_loss(logits, batch["t"], batch["valid_len"])


def resolve_fixed_engine(fixed_engine: str, cfg: ModelConfig, B: int,
                         T: int, compute_dtype) -> str:
    """'auto' -> 'xla'.  The fused Pallas fwd+bwd kernel
    (ops/train_kernel.py) is a tested opt-in ('pallas'): interleaved
    same-process A/B at the reference shape (B=1, T=30030, bf16, v5e)
    measured XLA 37.3-38.2 ms vs the kernel's best 38.5-38.6 ms
    (TS=880) — XLA's autodiff schedule of this stack is already at the
    kernel's level, so auto keeps the engine with no extra compile cost
    (BENCH_NOTES.md round 3)."""
    if fixed_engine != "auto":
        return fixed_engine
    return "xla"


def make_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    compute_dtype=jnp.float32, remat: bool = True,
                    fixed_engine: str = "auto",
                    n_microbatches: Optional[int] = None):
    """Returns step(state, batch) -> (state, loss).

    batch: {"x": (B,T) i32, "h": (B,F,A) f32, "t": (B,T) i32,
            "d": (B,T) f32, "valid_len": scalar i32}
    fixed_engine: "auto" | "pallas" | "xla" — see resolve_fixed_engine.
    n_microbatches: GPipe microbatch count when the mesh has a pp axis
        (train/pipeline.py); default = pp size.
    """

    # under a mesh the jitted step is GSPMD-partitioned; the fused
    # pallas_call has no partitioning rule, so auto keeps the XLA loop
    # there (single-chip — the reference's training shape — gets the
    # kernel; revisit with shard_map if multi-chip training ever needs it)
    if mesh is not None and fixed_engine == "auto":
        fixed_engine = "xla"
    pp = 1
    if mesh is not None:
        pp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("pp", 1)

    def loss_fn(params, batch, engine, maxd_bucket):
        if pp > 1:
            from qpnet_tpu.train.pipeline import pipeline_forward
            logits = pipeline_forward(
                params, cfg, batch["x"], batch["h"], batch["d"], mesh,
                n_microbatches, compute_dtype, remat=remat)
            return masked_ce_loss(logits, batch["t"], batch["valid_len"])
        return _loss_fn(params, cfg, batch, compute_dtype, remat, engine,
                        maxd_bucket)

    def step(state: TrainState, batch, maxd_bucket=None
             ) -> tuple[TrainState, jnp.ndarray]:
        # shapes are static under jit: resolve the engine at trace time.
        # maxd_bucket (static, from the host-side batch d track) fuses the
        # adaptive stack into the kernel; None keeps it in XLA.
        engine = resolve_fixed_engine(fixed_engine, cfg,
                                      batch["x"].shape[0],
                                      batch["x"].shape[1], compute_dtype)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, engine,
            maxd_bucket if engine == "pallas" else None)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.iterations + 1), loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,), static_argnums=(2,))

    def sharded_step(state, batch):
        return step(state, batch)

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if axes.get("tp", 1) > 1:
        # tensor-parallel layout: the caller commits the state with
        # `shard_train_state(mesh, state)` (trainer does) and the batch
        # with `shard_batch` (dp axis); jit respects the committed
        # shardings and GSPMD inserts the tp collectives
        return jax.jit(sharded_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    return jax.jit(
        sharded_step,
        donate_argnums=(0,),
        in_shardings=(repl, None),  # batch shardings applied by caller
        out_shardings=(repl, repl),
    )


def make_eval_step(cfg: ModelConfig, compute_dtype=jnp.float32):
    """Teacher-forced loss only (reference qpnet_validate.py:420-432)."""

    @jax.jit
    def step(params: Params, batch) -> jnp.ndarray:
        return _loss_fn(params, cfg, batch, compute_dtype, remat=False)

    return step
