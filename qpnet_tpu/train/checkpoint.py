"""Checkpoint save/restore.

Default backend keeps the reference's file-naming contract
(`checkpoint-<iter>.pkl` with model/optimizer/iterations, weights-only
`checkpoint-final.pkl`; reference qpnet_train.py:338-353, 557-563) so
recipes and validation sweeps work unchanged.  Payload is a pickled dict
of numpy pytrees (no torch involved); `model.conf` is JSON via RunConfig.

An orbax backend (`backend="orbax"`, or QPNET_CKPT_BACKEND=orbax) writes
`checkpoint-<iter>.orbax/` directories instead: async-capable, sharded,
and multi-host-safe (every process participates in the save instead of
the lead host pickling a fully-replicated copy).  `load_checkpoint`
auto-detects the format, so the two backends interoperate — e.g. train
with orbax, decode from the same directory.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def _backend(backend):
    return backend or os.environ.get("QPNET_CKPT_BACKEND", "pickle")


def _orbax_save(path: str, payload: dict) -> str:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()
    return path


def save_checkpoint(checkpoint_dir: str, params, opt_state, iterations: int,
                    backend: str = None) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    payload = {"model": _to_numpy(params),
               "optimizer": _to_numpy(opt_state),
               "iterations": int(iterations)}
    if _backend(backend) == "orbax":
        return _orbax_save(
            os.path.join(checkpoint_dir, f"checkpoint-{iterations}.orbax"),
            payload)
    path = os.path.join(checkpoint_dir, f"checkpoint-{iterations}.pkl")
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def save_final(checkpoint_dir: str, params, backend: str = None) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    if _backend(backend) == "orbax":
        return _orbax_save(
            os.path.join(checkpoint_dir, "checkpoint-final.orbax"),
            {"model": _to_numpy(params)})
    path = os.path.join(checkpoint_dir, "checkpoint-final.pkl")
    with open(path, "wb") as f:
        pickle.dump({"model": _to_numpy(params)}, f)
    return path


def checkpoint_backend(backend: str = None) -> str:
    """The effective backend name ("pickle" or "orbax")."""
    return _backend(backend)


def load_checkpoint(path: str, template=None) -> dict:
    """Load either backend's checkpoint; `path` may also name the .pkl
    while only the .orbax twin exists (recipe compatibility).

    template: optional pytree with the desired structure.  Required to
    restore an orbax checkpoint containing non-dict/list nodes — optax
    opt_states are namedtuples, which orbax flattens to dicts/lists
    unless given a target structure.  Ignored by the pickle backend
    (pickle preserves structure natively).
    """
    if os.path.isdir(path) or path.endswith(".orbax"):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        apath = os.path.abspath(path)
        if template is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template)
            return dict(ckptr.restore(apath, abstract))
        return dict(ckptr.restore(apath))
    if not os.path.exists(path) and os.path.isdir(
            path[:-len(".pkl")] + ".orbax"):
        return load_checkpoint(path[:-len(".pkl")] + ".orbax", template)
    with open(path, "rb") as f:
        return pickle.load(f)
