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
    params = tiny_params()
    opt_state = {"m": jax.tree_util.tree_map(np.zeros_like, params)}
    p_pkl = save_checkpoint(str(tmp_path / "a"), params, opt_state, 7,
                            backend="pickle")
    p_orb = save_checkpoint(str(tmp_path / "b"), params, opt_state, 7,
                            backend="orbax")
    assert p_pkl.endswith(".pkl") and p_orb.endswith(".orbax")
    ck1 = load_checkpoint(p_pkl)
    ck2 = load_checkpoint(p_orb)
    assert ck1["iterations"] == ck2["iterations"] == 7
    assert_trees_equal(ck1["model"], ck2["model"])
    assert_trees_equal(ck1["optimizer"], ck2["optimizer"])


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
