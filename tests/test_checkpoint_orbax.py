"""Orbax checkpoint backend: format interop with the pickle contract."""

import os

import jax
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import init_params
from qpnet_tpu.train.checkpoint import (
    load_checkpoint, save_checkpoint, save_final,
)


def tiny_params():
    cfg = ModelConfig(n_quantize=16, n_aux=3, n_resch=8, n_skipch=4,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=1, dilationA_repeat=1,
                      upsampling_factor=4)
    return init_params(jax.random.PRNGKey(0), cfg)


def assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_matches_pickle(tmp_path):
    """Round-trip with a REAL optax opt_state: orbax flattens namedtuples
    unless restored against a template, and a resumed trainer must hand
    optax a structurally intact state."""
    import jax.numpy as jnp
    from qpnet_tpu.train import make_optimizer

    params = tiny_params()
    tx = make_optimizer(lr=1e-4)
    opt_state = tx.init(params)
    p_pkl = save_checkpoint(str(tmp_path / "a"), params, opt_state, 7,
                            backend="pickle")
    p_orb = save_checkpoint(str(tmp_path / "b"), params, opt_state, 7,
                            backend="orbax")
    assert p_pkl.endswith(".pkl") and p_orb.endswith(".orbax")
    template = {"model": params, "optimizer": tx.init(params),
                "iterations": 0}
    ck1 = load_checkpoint(p_pkl, template=template)
    ck2 = load_checkpoint(p_orb, template=template)
    assert ck1["iterations"] == ck2["iterations"] == 7
    assert_trees_equal(ck1["model"], ck2["model"])
    assert_trees_equal(ck1["optimizer"], ck2["optimizer"])
    # the restored structure must be consumable by optax (namedtuples!)
    assert (jax.tree_util.tree_structure(ck2["optimizer"])
            == jax.tree_util.tree_structure(opt_state))
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    tx.update(grads, ck2["optimizer"], ck2["model"])


def test_load_pkl_path_falls_back_to_orbax_twin(tmp_path):
    """Recipes pass checkpoint-<N>.pkl paths; when training used the orbax
    backend, loading must transparently pick up the .orbax directory."""
    params = tiny_params()
    save_final(str(tmp_path), params, backend="orbax")
    assert not os.path.exists(tmp_path / "checkpoint-final.pkl")
    ck = load_checkpoint(str(tmp_path / "checkpoint-final.pkl"))
    assert_trees_equal(ck["model"], params)


def test_env_selects_backend(tmp_path, monkeypatch):
    monkeypatch.setenv("QPNET_CKPT_BACKEND", "orbax")
    params = tiny_params()
    path = save_final(str(tmp_path), params)
    assert path.endswith(".orbax") and os.path.isdir(path)


def test_trainer_resumes_from_orbax_checkpoint(tmp_path, monkeypatch):
    """End-to-end: train with the orbax backend, auto-resume, and the
    restored optimizer state must drive further steps (regression for the
    namedtuple-flattening crash)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers import make_synthetic_corpus
    from qpnet_tpu.config import TrainConfig
    from qpnet_tpu.data.stats import calc_stats
    from qpnet_tpu.train.trainer import run_training

    monkeypatch.setenv("QPNET_CKPT_BACKEND", "orbax")
    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=8, n_skipch=4,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=1, dilationA_repeat=1,
                      upsampling_factor=10)
    wavs, feats = make_synthetic_corpus(str(tmp_path), n_utts=2, fs=1000,
                                        up=10, n_aux=4)
    stats = str(tmp_path / "stats.h5")
    calc_stats(feats, stats)
    expdir = str(tmp_path / "exp")
    tcfg = TrainConfig(lr=1e-3, iters=2, checkpoint_interval=2,
                       batch_length=300, batch_size=1, max_length=900,
                       intervals=1)
    run_training(cfg, tcfg, wavs, feats, stats, expdir)
    assert os.path.isdir(os.path.join(expdir, "checkpoint-2.orbax"))

    # continue to 4 iterations via auto-resume from the orbax checkpoint
    tcfg4 = TrainConfig(lr=1e-3, iters=4, checkpoint_interval=2,
                        batch_length=300, batch_size=1, max_length=900,
                        intervals=1)
    run_training(cfg, tcfg4, wavs, feats, stats, expdir, resume="auto")
    assert os.path.isdir(os.path.join(expdir, "checkpoint-4.orbax"))
    assert os.path.isdir(os.path.join(expdir, "checkpoint-final.orbax"))
