"""Shared training loop used by the SI-train and SD-update workers
(the reference duplicates ~500 lines between qpnet_train.py and
qpnet_update.py; here the only difference is the initial-weights source).

Reproduces the reference's operational behavior: streaming prefetched
batches, loss averaging every `intervals` iterations with ETA logging,
`checkpoint-<iter>.pkl` every interval, weights-only `checkpoint-final.pkl`,
`loss-final.yml` history (reference qpnet_train.py:477-567).
"""

from __future__ import annotations

import logging
import os
import signal
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from qpnet_tpu.config import ModelConfig, TrainConfig
from qpnet_tpu.data.batcher import background, train_window_generator
from qpnet_tpu.data.stats import load_scaler
from qpnet_tpu.models import count_params, init_params
from qpnet_tpu.train.checkpoint import (
    load_checkpoint, save_checkpoint, save_final,
)
from qpnet_tpu.train.step import TrainState, make_optimizer, make_train_step


class PreemptionGuard:
    """Cooperative preemption for the training loop.

    TPU pods are routinely evicted with a SIGTERM grace window; the
    reference's crash-stop model (SURVEY.md §5: recovery is a manual
    `--resume`) loses everything since the last interval checkpoint.
    Installed around the training loop, this guard turns the eviction
    notice into a clean save-and-exit: the in-flight step finishes, a
    `checkpoint-<iter>` is written, and the process exits 0 — so a
    restarted job with `--resume auto` continues from the exact
    iteration it left off.

    `QPNET_PREEMPT_AFTER=N` trips the guard after N steps of this
    process — a deterministic fault-injection knob (tests use it to pin
    the save-and-exit path without racing a real signal).

    Multi-host note: signal delivery can skew across a step boundary, so
    the trainer syncs the trip flag every iteration — one host's signal
    stops EVERY host at the same iteration (a lone early exit would
    deadlock the collective batch assembly / orbax save).  The flag
    rides the step's existing valid_len allgather (one DCN host-sync
    per iteration, not two), so the agreed stop lands one step after
    the signal — inside the eviction grace window.  With the pickle
    backend only the lead writes, as at interval checkpoints.
    """

    def __init__(self):
        self.signum: Optional[int] = None
        self._prev = None
        self._installed = False
        after = os.environ.get("QPNET_PREEMPT_AFTER")
        self._after = int(after) if after else None
        self._steps = 0

    def install(self) -> "PreemptionGuard":
        try:
            self._prev = signal.signal(signal.SIGTERM, self._on_signal)
            self._installed = True
        except ValueError:
            # not the main thread (in-process embedding): the env knob
            # still works, the signal hook is simply unavailable
            pass
        return self

    def uninstall(self):
        if self._installed:
            signal.signal(signal.SIGTERM, self._prev)
            self._installed = False

    def _on_signal(self, signum, frame):
        self.signum = signum

    def tripped_after_step(self) -> bool:
        """Call once per completed training iteration."""
        self._steps += 1
        if self._after is not None and self._steps >= self._after:
            return True
        return self.signum is not None


def run_training(cfg: ModelConfig, tcfg: TrainConfig,
                 wav_list: Sequence[str], feat_list: Sequence[str],
                 stats_path: str, expdir: str,
                 feature_type: str = "world",
                 resume: Optional[str] = None,
                 pretrain: Optional[str] = None,
                 mesh=None, n_microbatches: Optional[int] = None) -> None:
    os.makedirs(expdir, exist_ok=True)
    n_proc = jax.process_count()
    is_lead = jax.process_index() == 0
    from qpnet_tpu.train.checkpoint import checkpoint_backend
    save_collective = n_proc > 1 and checkpoint_backend() == "orbax"
    local_bs = tcfg.batch_size
    if n_proc > 1:
        # multi-host: each host reads its slice of the corpus and feeds
        # its share of the global batch (parallel/distributed.py)
        from qpnet_tpu.parallel import host_shard_list
        if mesh is None:
            raise ValueError("multi-host training requires a mesh")
        if tcfg.batch_size % n_proc:
            raise ValueError(
                f"global batch_size {tcfg.batch_size} must divide over "
                f"{n_proc} hosts")
        local_bs = tcfg.batch_size // n_proc
        wav_list = host_shard_list(wav_list)
        feat_list = host_shard_list(feat_list)
        logging.info("host %d/%d: %d utterances, local batch %d",
                     jax.process_index(), n_proc, len(wav_list), local_bs)
    key = jax.random.PRNGKey(tcfg.seed)
    np.random.seed(tcfg.seed)
    params = init_params(key, cfg)
    logging.info("number of model parameters: %d", count_params(params))

    tx = make_optimizer(lr=tcfg.lr, weight_decay=tcfg.weight_decay)
    compute_dtype = (jnp.bfloat16 if getattr(tcfg, "dtype", "float32")
                     in ("bfloat16", "bf16") else jnp.float32)
    # rematerialization trades ~25% step time for activation memory; only
    # needed once the per-device activation footprint gets large (B=1..4
    # f32 windows of 30k samples fit a 16GB v5e without it; bf16 stores
    # halve the footprint, doubling the no-remat headroom — B=8 bf16
    # measured 416 vs 518 ms/step)
    from qpnet_tpu.data.batcher import padded_shape
    per_dev = max(1, tcfg.batch_size // (mesh.size if mesh else 1))
    remat_threshold = 130_000 if compute_dtype == jnp.float32 else 260_000
    remat = per_dev * padded_shape(tcfg.max_length,
                                   cfg.upsampling_factor) > remat_threshold
    if compute_dtype == jnp.bfloat16:
        logging.info("mixed precision: bf16 matmuls/activations, "
                     "f32 master weights and loss accumulation")
    step_fn = make_train_step(cfg, tx, mesh=mesh, remat=remat,
                              compute_dtype=compute_dtype,
                              fixed_engine=getattr(tcfg, "fixed_engine",
                                                   "auto"),
                              n_microbatches=n_microbatches)
    if mesh is not None and dict(zip(mesh.axis_names,
                                     mesh.devices.shape)).get("pp", 1) > 1:
        logging.info(
            "pipeline parallel: %d-block stack over pp=%d GPipe stages",
            len(cfg.dilationsF) + len(cfg.dilationsA),
            dict(zip(mesh.axis_names, mesh.devices.shape))["pp"])

    iterations = 0
    loss_record = []
    flossyml = os.path.join(expdir, "loss-final.yml")
    if resume == "auto":
        # crash-stop recovery: pick up from the newest checkpoint, if any
        import re
        cands = []
        for name in os.listdir(expdir) if os.path.isdir(expdir) else []:
            m = re.fullmatch(r"checkpoint-(\d+)\.(pkl|orbax)", name)
            if m:
                cands.append((int(m.group(1)), name))
        resume = (os.path.join(expdir, max(cands)[1]) if cands else None)
        if resume:
            logging.info("autoresume from %s", resume)
    if resume and not os.path.exists(resume):
        raise FileNotFoundError(
            f"--resume checkpoint {resume} does not exist (refusing to "
            f"silently restart from scratch)")
    if resume and os.path.exists(resume):
        # the template restores the optax namedtuple structure from the
        # orbax backend (no-op for pickle)
        ckpt = load_checkpoint(resume, template={
            "model": params, "optimizer": tx.init(params), "iterations": 0})
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["model"])
        opt_state = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
            ckpt["optimizer"])
        iterations = ckpt["iterations"]
        logging.info("restored from %d-iter checkpoint.", iterations)
        if os.path.exists(flossyml):
            with open(flossyml, encoding="utf-8") as yf:
                loss_record = yaml.safe_load(yf) or []
    else:
        if pretrain:
            ckpt = load_checkpoint(pretrain)
            params = jax.tree_util.tree_map(jnp.asarray, ckpt["model"])
            logging.info("loaded pretrained model %s (fresh optimizer).",
                         pretrain)
        opt_state = tx.init(params)
    state = TrainState(params, opt_state, jnp.int32(iterations))
    if mesh is not None and dict(zip(mesh.axis_names,
                                     mesh.devices.shape)).get("tp", 1) > 1:
        # tensor-parallel layout: commit params/optimizer shards up front
        # so the jitted step never materializes a replicated copy
        from qpnet_tpu.train.step import shard_train_state
        state = shard_train_state(mesh, state)
        logging.info("tensor parallel: channel dims sharded over tp=%d",
                     dict(zip(mesh.axis_names, mesh.devices.shape))["tp"])

    scaler = load_scaler(stats_path, feature_type)
    generator = background(2)(train_window_generator)(
        wav_list, feat_list, cfg,
        feat_transform=scaler.transform,
        feature_type=feature_type,
        batch_length=tcfg.batch_length,
        batch_size=local_bs,
        max_length=tcfg.max_length,
        f0_threshold=tcfg.f0_threshold,
        shuffle=True, seed=tcfg.seed + jax.process_index(), loop=True)

    # losses stay on device until the logging interval: float(loss) every
    # step would block on the async-dispatched step and serialize host batch
    # prep with device compute (a full H2D+sync round-trip per iteration)
    pending_losses = []
    interval_start = time.time()
    logging.info("training start!")
    if mesh is not None:
        from qpnet_tpu.parallel import global_min_and_any, make_global_batch

    from qpnet_tpu.train.step import resolve_fixed_engine
    _engine = resolve_fixed_engine(
        getattr(tcfg, "fixed_engine", "auto"), cfg, local_bs,
        padded_shape(tcfg.max_length, cfg.upsampling_factor),
        compute_dtype) if mesh is None else "xla"
    if _engine == "pallas":
        logging.info("fixed stack + adaptive stack: fused pallas fwd+bwd "
                     "kernels (ops/train_kernel.py)")

    def _maxd_bucket(d_np):
        """Static maxd bucket for the fully-fused (adaptive-in-kernel)
        step.  OFF by default: on v5e the in-kernel adaptive gather lost
        to XLA's take_along_axis in both formulations tried (per-frame
        dynamic slices and whole-tile one-hot selector matmuls;
        BENCH_NOTES.md round 3).  The fused path stays available
        (gradient-parity tested) for configs where it wins; opt in with
        QPNET_FUSE_ADAPTIVE=1."""
        if _engine != "pallas" or not os.environ.get("QPNET_FUSE_ADAPTIVE"):
            return None
        from qpnet_tpu.models.generate import bucket_maxd
        return int(bucket_maxd(float(np.ceil(d_np.max()))))

    guard = PreemptionGuard().install()
    local_tripped = False      # trip state after the previous iteration
    trip_synced = False        # cross-host OR of it (rides the vl gather)
    try:
        for i in range(iterations, tcfg.iters):
            batch_np = generator.next()
            batch_np.pop("window_lens", None)  # host-side diagnostic only
            if mesh is not None:
                batch = make_global_batch(
                    mesh,
                    {k: v for k, v in batch_np.items() if np.ndim(v) > 0})
                # every host must mask the same loss positions; the ONE
                # per-step host sync also carries the preemption flag.
                # Re-sample the raw signal flag HERE (not just the
                # end-of-previous-step check) so a SIGTERM landing
                # between the check and this gather still rides THIS
                # step's sync: the agreed stop then lags the signal by
                # at most one step, not two
                local_tripped = local_tripped or guard.signum is not None
                vl, trip_synced = global_min_and_any(
                    batch_np["valid_len"], local_tripped)
                batch["valid_len"] = jnp.asarray(vl)
                state, loss = step_fn(state, batch)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                state, loss = step_fn(state, batch,
                                      _maxd_bucket(batch_np["d"]))
            pending_losses.append(loss)
            logged = (i + 1) % tcfg.intervals == 0
            if logged:
                avg = float(jnp.mean(jnp.stack(pending_losses)))
                sec = (time.time() - interval_start) / len(pending_losses)
                eta = int((tcfg.iters - (i + 1)) * sec)
                logging.info("(iter:%d) average loss = %.6f (%.3f sec / "
                             "batch) ETA %02d:%02d:%02d", i + 1, avg, sec,
                             eta // 3600, (eta % 3600) // 60, eta % 60)
                loss_record.append(avg)
                pending_losses = []
            saved_here = (i + 1) % tcfg.checkpoint_interval == 0
            if saved_here and (is_lead or save_collective):
                # pickle: only the lead writes (params are replicated);
                # orbax multi-host saves are collective barriers — EVERY
                # process must call or the lead deadlocks in the commit
                # sync
                t_save = time.time()
                save_checkpoint(expdir, state.params, state.opt_state,
                                i + 1)
                # checkpoint-write seconds must not inflate the next
                # logged sec/batch and ETA
                interval_start += time.time() - t_save
                if is_lead:
                    logging.info("%d-iter checkpoint created.", i + 1)
            if logged:
                interval_start = time.time()
            local_tripped = guard.tripped_after_step()
            if n_proc > 1:
                # signal delivery can skew across a step boundary; an
                # unsynchronized exit deadlocks the others (global batch
                # assembly and orbax saves are collective), so hosts
                # agree every step: any host tripped -> all save+exit at
                # the SAME iteration.  The agreement piggybacks on the
                # next step's valid_len allgather (global_min_and_any):
                # one host sync per step, trip acted on one step after
                # the signal lands — still inside the eviction grace
                # window.  (Multi-host without a mesh has no per-step
                # collectives to deadlock, so the local flag suffices.)
                tripped = trip_synced if mesh is not None else local_tripped
            else:
                tripped = local_tripped
            if tripped and (i + 1) < tcfg.iters:
                # eviction notice: persist progress and exit cleanly —
                # `--resume auto` on the replacement job picks up here
                if not saved_here and (is_lead or save_collective):
                    save_checkpoint(expdir, state.params, state.opt_state,
                                    i + 1)
                if is_lead:
                    logging.warning(
                        "preemption%s at iteration %d: checkpoint saved, "
                        "exiting (resume with --resume auto)",
                        f" (signal {guard.signum})" if guard.signum
                        else "", i + 1)
                    with open(flossyml, "w", encoding="utf-8") as yf:
                        yaml.safe_dump([float(x) for x in loss_record], yf)
                return
    finally:
        guard.uninstall()

    if is_lead or save_collective:
        save_final(expdir, state.params)
        if is_lead:
            logging.info("final checkpoint created.")
    if is_lead:
        with open(flossyml, "w", encoding="utf-8") as yf:
            yaml.safe_dump([float(x) for x in loss_record], yf)
