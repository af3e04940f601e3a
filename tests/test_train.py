"""Training step: loss decreases, checkpoint resume round-trips, and the
8-virtual-device data-parallel step matches the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import init_params
from qpnet_tpu.parallel import make_mesh, shard_batch
from qpnet_tpu.train import (
    TrainState, make_eval_step, make_optimizer, make_train_step,
    masked_ce_loss, save_checkpoint, load_checkpoint, save_final,
)


def clone(tree):
    import jax, jax.numpy as jnp
    return jax.tree_util.tree_map(lambda a: jnp.array(a), tree)


def tiny_cfg():
    return ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                       dilationF_depth=2, dilationF_repeat=1,
                       dilationA_depth=2, dilationA_repeat=1,
                       kernel_size=2, upsampling_factor=10)


def synth_batch(cfg, B, T, seed=0):
    rng = np.random.default_rng(seed)
    # learnable structure: a repeating pattern
    pat = rng.integers(0, cfg.n_quantize, size=50)
    seq = np.tile(pat, T // 50 + 2)
    x = np.stack([seq[i: i + T] for i in range(B)]).astype(np.int32)
    t = np.stack([seq[i + 1: i + T + 1] for i in range(B)]).astype(np.int32)
    h = rng.normal(size=(B, T // cfg.upsampling_factor, cfg.n_aux)).astype(np.float32)
    d = np.full((B, T), 2.0, np.float32)
    return {"x": x, "h": h, "t": t, "d": d,
            "valid_len": np.int32(T // 2)}


def test_masked_loss_ignores_prefix():
    cfg = tiny_cfg()
    B, T, Q = 2, 20, cfg.n_quantize
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, T, Q)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, Q, size=(B, T)), jnp.int32)
    l1 = masked_ce_loss(logits, tgt, jnp.int32(5))
    # corrupt the prefix: loss over last 5 unchanged
    logits2 = logits.at[:, :15].set(0.0)
    l2 = masked_ce_loss(logits2, tgt, jnp.int32(5))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_loss_decreases():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(lr=5e-3)
    step = make_train_step(cfg, tx, remat=False)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 2, 200).items()}
    losses = []
    for _ in range(30):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert int(state.iterations) == 30


def test_bf16_forward_close_to_f32():
    """Mixed-precision forward (bf16 matmuls + bf16 activation storage,
    f32 skip/logit accumulation) stays close to the f32 reference path."""
    from qpnet_tpu.models.qpnet import forward
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(2), cfg)
    b = synth_batch(cfg, 2, 200)
    lg32 = forward(params, cfg, b["x"], b["h"], b["d"],
                   compute_dtype=jnp.float32)
    lgbf = forward(params, cfg, b["x"], b["h"], b["d"],
                   compute_dtype=jnp.bfloat16)
    assert lgbf.dtype == jnp.float32  # logits accumulate f32
    scale = np.abs(np.asarray(lg32)).max()
    err = np.abs(np.asarray(lgbf) - np.asarray(lg32)).max()
    assert err < 0.05 * scale + 0.05, (err, scale)


def test_bf16_step_learns():
    """The bf16 train step optimizes: same synthetic task as
    test_loss_decreases, mixed-precision math."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(lr=5e-3)
    step = make_train_step(cfg, tx, remat=False,
                           compute_dtype=jnp.bfloat16)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 2, 200).items()}
    losses = []
    for _ in range(30):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    # master weights stay f32
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state.params))


def test_remat_matches_no_remat():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    tx = make_optimizer(lr=1e-3)
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 2, 100).items()}
    p1, p2 = clone(params), clone(params)
    s1 = TrainState(p1, tx.init(p1), jnp.int32(0))
    s2 = TrainState(p2, tx.init(p2), jnp.int32(0))
    step1 = make_train_step(cfg, tx, remat=False)
    step2 = make_train_step(cfg, tx, remat=True)
    s1, l1 = step1(s1, batch)
    s2, l2 = step2(s2, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(lr=1e-3)
    opt_state = tx.init(params)
    path = save_checkpoint(str(tmp_path), params, opt_state, 42)
    ckpt = load_checkpoint(path)
    assert ckpt["iterations"] == 42
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ckpt["model"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    fpath = save_final(str(tmp_path), params)
    assert "model" in load_checkpoint(fpath)
    assert fpath.endswith("checkpoint-final.pkl")


def test_resume_continues_identically(tmp_path):
    """train 5 steps, checkpoint, train 5 more == train 10 straight."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(2), cfg)
    tx = make_optimizer(lr=1e-3)
    step = make_train_step(cfg, tx, remat=False)
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 1, 100).items()}

    pA, pB = clone(params), clone(params)
    sA = TrainState(pA, tx.init(pA), jnp.int32(0))
    for _ in range(10):
        sA, _ = step(sA, batch)

    sB = TrainState(pB, tx.init(pB), jnp.int32(0))
    for _ in range(5):
        sB, _ = step(sB, batch)
    path = save_checkpoint(str(tmp_path), sB.params, sB.opt_state,
                           int(sB.iterations))
    ckpt = load_checkpoint(path)
    sC = TrainState(
        jax.tree_util.tree_map(jnp.asarray, ckpt["model"]),
        jax.tree_util.tree_map(jnp.asarray, ckpt["optimizer"]),
        jnp.int32(ckpt["iterations"]))
    for _ in range(5):
        sC, _ = step(sC, batch)
    for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sC.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_data_parallel_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    tx = make_optimizer(lr=1e-3)
    batch_np = synth_batch(cfg, 8, 100, seed=5)

    p1, p2 = clone(params), clone(params)
    step_single = make_train_step(cfg, tx, remat=False)
    s1 = TrainState(p1, tx.init(p1), jnp.int32(0))
    s1, l1 = step_single(s1, {k: jnp.asarray(v) for k, v in batch_np.items()})

    mesh = make_mesh(8)
    step_dp = make_train_step(cfg, tx, mesh=mesh, remat=False)
    sharded = shard_batch(mesh, {k: v for k, v in batch_np.items()
                                 if np.ndim(v) > 0})
    sharded["valid_len"] = jnp.asarray(batch_np["valid_len"])
    s2 = TrainState(p2, tx.init(p2), jnp.int32(0))
    s2, l2 = step_dp(s2, sharded)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_eval_step():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    ev = make_eval_step(cfg)
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 2, 100).items()}
    loss = ev(params, batch)
    assert np.isfinite(float(loss))


def test_run_training_with_mesh(tmp_path):
    """run_training(mesh=...) must shard batches over dp and produce the
    standard checkpoint artifacts."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from helpers import make_synthetic_corpus
    from qpnet_tpu.config import TrainConfig
    from qpnet_tpu.data.h5io import write_hdf5, read_hdf5
    from qpnet_tpu.data.stats import calc_stats
    from qpnet_tpu.parallel import make_mesh
    from qpnet_tpu.train.trainer import run_training

    cfg = tiny_cfg()
    wavs, feats = make_synthetic_corpus(str(tmp_path), n_utts=4, fs=1000,
                                        up=10, n_aux=4, seconds=2.0)
    stats = str(tmp_path / "stats.h5")
    calc_stats(feats, stats)
    tcfg = TrainConfig(lr=1e-3, iters=6, checkpoint_interval=3,
                       batch_length=300, batch_size=8, max_length=900,
                       intervals=3)
    mesh = make_mesh(8)
    run_training(cfg, tcfg, wavs, feats, stats, str(tmp_path / "exp"),
                 mesh=mesh)
    assert os.path.exists(str(tmp_path / "exp" / "checkpoint-final.pkl"))
    assert os.path.exists(str(tmp_path / "exp" / "checkpoint-6.pkl"))
    assert os.path.exists(str(tmp_path / "exp" / "loss-final.yml"))


def test_preemption_checkpoint_and_resume(tmp_path, monkeypatch):
    """An eviction mid-run must leave a resumable checkpoint and exit the
    loop cleanly (no checkpoint-final), and `--resume auto` must finish
    the budget from exactly that iteration.  QPNET_PREEMPT_AFTER is the
    deterministic fault-injection stand-in for the SIGTERM a preempted
    TPU slice receives."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from helpers import make_synthetic_corpus
    from qpnet_tpu.config import TrainConfig
    from qpnet_tpu.train.trainer import run_training

    cfg = tiny_cfg()
    wavs, feats = make_synthetic_corpus(str(tmp_path), n_utts=2, fs=1000,
                                        up=10, n_aux=4)
    from qpnet_tpu.data.stats import calc_stats
    stats = str(tmp_path / "stats.h5")
    calc_stats(feats, stats)
    expdir = str(tmp_path / "exp")
    tcfg = TrainConfig(lr=1e-3, iters=9, checkpoint_interval=100,
                       batch_length=300, batch_size=1, max_length=900,
                       intervals=2)
    monkeypatch.setenv("QPNET_PREEMPT_AFTER", "3")
    run_training(cfg, tcfg, wavs, feats, stats, expdir)
    assert os.path.exists(os.path.join(expdir, "checkpoint-3.pkl"))
    assert not os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))
    # the interval log yml reflects completed intervals only
    assert os.path.exists(os.path.join(expdir, "loss-final.yml"))

    monkeypatch.delenv("QPNET_PREEMPT_AFTER")
    run_training(cfg, tcfg, wavs, feats, stats, expdir, resume="auto")
    assert os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))
    from qpnet_tpu.train.checkpoint import load_checkpoint
    # resumed run continued from iteration 3 (not from scratch): the
    # final interval checkpoint budget is the remaining 6 iterations
    assert not os.path.exists(os.path.join(expdir, "checkpoint-100.pkl"))


def test_preemption_guard_signal_path():
    """The guard must trip on a real SIGTERM and restore the previous
    handler on uninstall."""
    import signal

    from qpnet_tpu.train.trainer import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    g = PreemptionGuard().install()
    try:
        assert not g.tripped_after_step()
        signal.raise_signal(signal.SIGTERM)
        assert g.tripped_after_step()
        assert g.signum == signal.SIGTERM
    finally:
        g.uninstall()
    assert signal.getsignal(signal.SIGTERM) is prev


def test_tensor_parallel_step_matches_single_device():
    """A (dp=2, tp=4) mesh step — channel dims tensor-sharded
    megatron-style — must reproduce the single-device trajectory: GSPMD
    partitioning changes the layout, never the math."""
    from qpnet_tpu.parallel import make_mesh, shard_batch
    from qpnet_tpu.train.step import param_sharding_tree, shard_train_state

    cfg = tiny_cfg()                              # n_resch=16: tp=4 divides
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(lr=5e-3)
    batch_np = synth_batch(cfg, 2, 200)

    step1 = make_train_step(cfg, tx, remat=False)
    s1 = TrainState(clone(params), tx.init(clone(params)), jnp.int32(0))
    b1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    losses1 = []
    for _ in range(4):
        s1, l = step1(s1, b1)
        losses1.append(float(l))

    mesh = make_mesh(8, tp=4)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "dp": 2, "tp": 4}
    stepN = make_train_step(cfg, tx, mesh=mesh, remat=False)
    sN = shard_train_state(
        mesh, TrainState(clone(params), tx.init(clone(params)),
                         jnp.int32(0)))
    # the gate weights really are tensor-sharded (not replicated)
    shard_shape = sN.params["fixed"][0]["W_cur"].sharding.shard_shape(
        sN.params["fixed"][0]["W_cur"].shape)
    assert shard_shape[1] == 2 * cfg.n_resch // 4
    bN = shard_batch(mesh, {k: v for k, v in batch_np.items()
                            if np.ndim(v) > 0})
    bN["valid_len"] = jnp.asarray(batch_np["valid_len"])
    lossesN = []
    for _ in range(4):
        sN, l = stepN(sN, bN)
        lossesN.append(float(l))

    np.testing.assert_allclose(lossesN, losses1, rtol=2e-5)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flatN = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, sN.params))
    for a, b in zip(flat1, flatN):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4, atol=1e-6)


def test_tp_rejects_indivisible_channels():
    from qpnet_tpu.parallel import make_mesh
    from qpnet_tpu.train.step import param_sharding_tree

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8, tp=8)                     # 16 % 8 == 0: fine
    param_sharding_tree(mesh, params)
    import pytest
    from qpnet_tpu.config import ModelConfig
    cfg12 = ModelConfig(n_quantize=32, n_aux=4, n_resch=12, n_skipch=8,
                        dilationF_depth=2, dilationF_repeat=1,
                        dilationA_depth=2, dilationA_repeat=1,
                        upsampling_factor=10)
    params12 = init_params(jax.random.PRNGKey(0), cfg12)
    with pytest.raises(ValueError, match="must divide"):
        param_sharding_tree(mesh, params12)


def test_sequence_parallel_step_matches_single_device():
    """(dp=2, sp=4) — the training window's time axis sharded over sp —
    and the full 3-axis (dp=2, tp=2, sp=2) mesh must both reproduce the
    single-device trajectory."""
    from qpnet_tpu.parallel import make_mesh, shard_batch
    from qpnet_tpu.train.step import shard_train_state

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(lr=5e-3)
    batch_np = synth_batch(cfg, 2, 200)

    step1 = make_train_step(cfg, tx, remat=False)
    s1 = TrainState(clone(params), tx.init(clone(params)), jnp.int32(0))
    b1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    losses1 = []
    for _ in range(3):
        s1, l = step1(s1, b1)
        losses1.append(float(l))

    for kw in ({"sp": 4}, {"tp": 2, "sp": 2}):
        mesh = make_mesh(8, **kw)
        stepN = make_train_step(cfg, tx, mesh=mesh, remat=False)
        sN = TrainState(clone(params), tx.init(clone(params)),
                        jnp.int32(0))
        if kw.get("tp", 1) > 1:
            sN = shard_train_state(mesh, sN)
        bN = shard_batch(mesh, {k: v for k, v in batch_np.items()
                                if np.ndim(v) > 0})
        # time axis really is sp-sharded
        assert bN["x"].sharding.shard_shape(bN["x"].shape)[1] \
            == 200 // kw["sp"]
        bN["valid_len"] = jnp.asarray(batch_np["valid_len"])
        lossesN = []
        for _ in range(3):
            sN, l = stepN(sN, bN)
            lossesN.append(float(l))
        np.testing.assert_allclose(lossesN, losses1, rtol=2e-5,
                                   err_msg=str(kw))
