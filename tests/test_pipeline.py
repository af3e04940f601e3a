"""Pipeline-parallel training (train/pipeline.py).

The pp axis runs the 16-block residual stack as GPipe stages inside a
shard_map (activation carry ppermuted stage-to-stage).  The contract under
test: the pipelined schedule is a *pure reordering* — logits bitwise equal
to the dp forward (models/qpnet.py::forward), losses/params matching over
real optimizer steps, and shape misuse rejected loudly.

(The reference has no pipeline parallelism — SURVEY.md §2.3; this is the
scale-out path for deeper variants, validated the same way tp/sp are.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import forward, init_params
from qpnet_tpu.parallel import make_mesh, shard_batch
from qpnet_tpu.train import TrainState, make_optimizer, make_train_step
from qpnet_tpu.train.pipeline import pipeline_forward

CFG = ModelConfig(n_quantize=64, n_aux=8, n_resch=32, n_skipch=16,
                  dilationF_depth=4, dilationF_repeat=3,
                  dilationA_depth=4, dilationA_repeat=1,
                  kernel_size=2, upsampling_factor=10)


def _inputs(rng, B=8, F=12):
    T = F * CFG.upsampling_factor
    x = jnp.asarray(rng.integers(0, CFG.n_quantize, (B, T)), jnp.int32)
    h = jnp.asarray(rng.normal(size=(B, F, CFG.n_aux)), jnp.float32)
    d = jnp.asarray(rng.uniform(1.0, 3.0, (B, T)), jnp.float32)
    return x, h, d


@pytest.mark.parametrize("pp,n_dev,M", [(2, 8, 2), (4, 8, 4)])
def test_pipeline_forward_bitwise(rng, pp, n_dev, M):
    """The GPipe schedule is a reordering, not an approximation: logits
    bitwise-equal to the dp forward (same matmuls, same order, masked
    gather == shift_time zero fill)."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    x, h, d = _inputs(rng)
    ref = forward(params, CFG, x, h, d)
    mesh = make_mesh(n_dev, pp=pp)
    out = jax.jit(lambda p, x, h, d: pipeline_forward(
        p, CFG, x, h, d, mesh, M))(params, x, h, d)
    assert bool(jnp.all(out == ref)), (
        f"pp={pp} logits diverged: max|diff|="
        f"{float(jnp.max(jnp.abs(out - ref))):.3e}")


@pytest.mark.slow
def test_pipeline_forward_bf16_bitwise(rng):
    """Mixed precision pipelines too: the bf16 carry crosses stages
    exactly (ppermute moves bits, not values)."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    x, h, d = _inputs(rng)
    ref = forward(params, CFG, x, h, d, compute_dtype=jnp.bfloat16)
    mesh = make_mesh(2, pp=2)
    out = jax.jit(lambda p, x, h, d: pipeline_forward(
        p, CFG, x, h, d, mesh, 4, compute_dtype=jnp.bfloat16))(
            params, x, h, d)
    assert bool(jnp.all(out == ref))


@pytest.mark.slow
def test_pipeline_train_step_parity(rng):
    """dp x pp gradients match the single-device step's per leaf, and 3
    optimizer steps track its loss trajectory.  (Updated *params* are not
    compared: Adam turns last-ulp gradient reassociation into lr-scale
    update flips wherever a near-zero gradient changes sign, so parameter
    equality is not a meaningful gate — gradients and losses are.)"""
    from qpnet_tpu.train.step import masked_ce_loss
    x, h, d = _inputs(rng)
    T = x.shape[1]
    batch_np = {"x": np.asarray(x), "h": np.asarray(h),
                "t": np.asarray(rng.integers(0, CFG.n_quantize, x.shape),
                                dtype=np.int32),
                "d": np.asarray(d)}
    tx = make_optimizer(lr=1e-4)
    params0 = init_params(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(8, pp=2)  # dp=4 x pp=2
    valid = jnp.asarray(np.int32(T // 2))

    # gradient parity, one evaluation each
    def loss_ref(p, b):
        return masked_ce_loss(forward(p, CFG, b["x"], b["h"], b["d"],
                                      remat=True), b["t"], valid)

    def loss_pp(p, b):
        return masked_ce_loss(
            pipeline_forward(p, CFG, b["x"], b["h"], b["d"], mesh, 2,
                             remat=True), b["t"], valid)

    b_host = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g_ref = jax.grad(loss_ref)(params0, b_host)
    g_pp = jax.jit(jax.grad(loss_pp))(params0, shard_batch(mesh, batch_np))
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    for path, a in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pp[path]), np.asarray(a),
            rtol=1e-4, atol=2e-6, err_msg=f"grad mismatch at {path}")

    # loss trajectory over 3 real optimizer steps
    def run(mesh_, **kw):
        params = init_params(jax.random.PRNGKey(0), CFG)
        step = make_train_step(CFG, tx, mesh=mesh_, remat=True, **kw)
        state = TrainState(params, tx.init(params), jnp.int32(0))
        if mesh_ is not None:
            batch = shard_batch(mesh_, batch_np)
        else:
            batch = dict(b_host)
        batch["valid_len"] = valid
        losses = []
        for _ in range(3):
            state, loss = step(state, batch)
            losses.append(float(loss))
        return losses

    l_ref = run(None)
    l_pp = run(mesh, n_microbatches=2)
    np.testing.assert_allclose(l_pp, l_ref, rtol=1e-5, atol=1e-6)


def test_pipeline_rejects_bad_shapes(rng):
    params = init_params(jax.random.PRNGKey(0), CFG)
    x, h, d = _inputs(rng)
    with pytest.raises(ValueError, match="must divide the 16-block"):
        pipeline_forward(params, CFG, x, h, d, make_mesh(3, pp=3), None)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_forward(params, CFG, x, h, d, make_mesh(8, pp=2), 16)
    with pytest.raises(ValueError, match="pp axis"):
        pipeline_forward(params, CFG, x, h, d, make_mesh(8), None)
    with pytest.raises(ValueError, match="dp only"):
        pipeline_forward(params, CFG, x, h, d,
                         make_mesh(8, pp=2, tp=2), None)
