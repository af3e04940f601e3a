"""Validation worker (reference src/bin/qpnet_validate.py): teacher-forced
cross-entropy of one checkpoint over a validation set (single pass, no
shuffle, no gradients); appends {checkpoint-name: loss} to
`validation_result.yml` so the best SD iteration can be picked."""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from qpnet_tpu.config import RunConfig
from qpnet_tpu.data.batcher import train_window_generator
from qpnet_tpu.data.stats import load_scaler
from qpnet_tpu.train import make_eval_step
from qpnet_tpu.train.checkpoint import load_checkpoint
from qpnet_tpu.utils import enable_compile_cache, set_loglevel


def get_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--waveforms", required=True, type=str)
    parser.add_argument("--feats", required=True, type=str)
    parser.add_argument("--stats", required=True, type=str)
    parser.add_argument("--resultdir", required=True, type=str)
    parser.add_argument("--config", required=True, type=str)
    parser.add_argument("--checkpoint", required=True, type=str)
    parser.add_argument("--batch_length", default=20000, type=int)
    parser.add_argument("--batch_size", default=1, type=int)
    parser.add_argument("--max_length", default=30000, type=int)
    parser.add_argument("--f0_threshold", default=0, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--n_gpus", default=1, type=int)
    parser.add_argument("--verbose", default=1, type=int)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_arguments(argv)
    set_loglevel(args.verbose)
    enable_compile_cache()
    for key, value in vars(args).items():
        logging.info("%s = %s", key, str(value))

    run_cfg = RunConfig.load(args.config)
    cfg = run_cfg.model
    ckpt = load_checkpoint(args.checkpoint)
    params = jax.tree_util.tree_map(jnp.asarray, ckpt["model"])

    from qpnet_tpu.bin.qpnet_train import resolve_lists
    args.feature_format = run_cfg.feature_format
    wav_list, feat_list = resolve_lists(args)
    logging.info("number of validation data = %d.", len(wav_list))

    scaler = load_scaler(args.stats, run_cfg.feature_type)
    eval_step = make_eval_step(cfg)
    generator = train_window_generator(
        wav_list, feat_list, cfg,
        feat_transform=scaler.transform,
        feature_type=run_cfg.feature_type,
        batch_length=args.batch_length,
        batch_size=args.batch_size,
        max_length=args.max_length,
        f0_threshold=args.f0_threshold,
        shuffle=False, loop=False)

    losses = []
    for batch_np in generator:
        batch_np.pop("window_lens", None)  # host-side diagnostic only
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        losses.append(float(eval_step(params, batch)))
    mean_loss = float(np.mean(losses)) if losses else float("nan")
    logging.info("validation loss = %.6f over %d batches",
                 mean_loss, len(losses))

    os.makedirs(args.resultdir, exist_ok=True)
    result_path = os.path.join(args.resultdir, "validation_result.yml")
    results = {}
    if os.path.exists(result_path):
        with open(result_path, encoding="utf-8") as f:
            results = yaml.safe_load(f) or {}
    ckpt_name = os.path.basename(args.checkpoint)
    results[ckpt_name] = mean_loss
    with open(result_path, "w", encoding="utf-8") as f:
        yaml.safe_dump(results, f)
    logging.info("wrote %s", result_path)


if __name__ == "__main__":
    main()
