"""Checkpoint save/restore.

File-naming contract matches the reference (`checkpoint-<iter>.pkl` with
model/optimizer/iterations, weights-only `checkpoint-final.pkl`; reference
qpnet_train.py:338-353, 557-563) so recipes and validation sweeps work
unchanged.  Payload is a pickled dict of numpy pytrees (no torch involved);
`model.conf` is JSON via `RunConfig`.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(checkpoint_dir: str, params, opt_state, iterations: int
                    ) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, f"checkpoint-{iterations}.pkl")
    with open(path, "wb") as f:
        pickle.dump({"model": _to_numpy(params),
                     "optimizer": _to_numpy(opt_state),
                     "iterations": int(iterations)}, f)
    return path


def save_final(checkpoint_dir: str, params) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "checkpoint-final.pkl")
    with open(path, "wb") as f:
        pickle.dump({"model": _to_numpy(params)}, f)
    return path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
