"""Deep-network (Rd10Rr3Ed4Er1) training coverage at the registry shape.

The reference registers the deep net as a first-class TRAINING entry
(param_model.py:65-73: max_length 22500, batch_length 20000, its own
decode batch), so the batcher's window arithmetic and the training step
must work at its ~3.5k-sample receptive field — not just decode.  These
tests run the REAL registry geometry (34 blocks, dilations to 512,
up=110, max_length=22500) at CPU-sized channels; the full-width hardware
smoke lives in tools/deep_train_smoke.py with its measurements recorded
in BENCH_NOTES.md.
"""

import os
import sys

import numpy as np
import pytest
import jax
import optax

sys.path.insert(0, os.path.dirname(__file__))
from helpers import make_synthetic_corpus  # noqa: E402

from qpnet_tpu.config import ModelConfig  # noqa: E402
from qpnet_tpu.data.batcher import train_window_generator, padded_shape  # noqa: E402
from qpnet_tpu.models.qpnet import init_params  # noqa: E402
from qpnet_tpu.train.step import TrainState, make_train_step  # noqa: E402

MAX_LENGTH = 22500      # _NETWORKS["Rd10Rr3Ed4Er1"] registry values
BATCH_LENGTH = 20000


def deep_cpu_cfg():
    """The registry's deep structure (depth/repeat/kernel/up untouched —
    receptive field 3069 + 15*maxd + 1) at CPU-sized channels."""
    return ModelConfig.from_network_name(
        "Rd10Rr3Ed4Er1", n_quantize=16, n_aux=4, n_resch=8, n_skipch=4)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("deepnet")
    # fs/f0 chosen so d = fs/(f0*dense) lands in the 10-30 range a real
    # 22.05 kHz corpus produces -> maxd ~28 drives a ~3.5k receptive field
    return make_synthetic_corpus(str(tmp), n_utts=3, fs=11025, up=110,
                                 n_aux=4, seconds=2.3, f0_lo=50.0,
                                 f0_hi=120.0)


def test_deep_registry_window_arithmetic(corpus):
    """Windows at max_length=22500 must leave a positive batch length with
    receptive_field + valid_len <= max_length and frame alignment."""
    cfg = deep_cpu_cfg()
    wavs, feats = corpus
    gen = train_window_generator(wavs, feats, cfg,
                                 batch_length=BATCH_LENGTH, batch_size=1,
                                 max_length=MAX_LENGTH, seed=3)
    up = cfg.upsampling_factor
    Tp = padded_shape(MAX_LENGTH, up)
    for _, batch in zip(range(4), gen):
        bl = int(batch["valid_len"])
        assert bl > 0
        assert batch["x"].shape == (1, Tp)
        assert batch["h"].shape == (1, Tp // up, cfg.n_aux)
        # rf from the BATCH's d is a lower bound on the carve-time rf
        # (the batcher used the whole buffer's max d)
        maxd = float(np.nanmax(batch["d"]))
        rf = cfg.receptive_field(maxd)
        # real window content = carve-time rf + bl, frame-aligned by
        # construction; observable as the non-zero aux frames
        t_frames = int(np.sum(np.any(batch["h"][0] != 0, axis=1)))
        assert rf + bl <= t_frames * up <= MAX_LENGTH, (rf, bl, t_frames)
        assert rf > 3069, "deep receptive field should exceed sum(dilsF)"


def test_deep_max_length_below_receptive_field_fails_fast(corpus):
    """max_length smaller than the deep receptive field must raise the
    explanatory ValueError, not emit empty/garbage windows."""
    cfg = deep_cpu_cfg()
    wavs, feats = corpus
    gen = train_window_generator(wavs, feats, cfg, batch_length=2000,
                                 batch_size=1, max_length=3000)
    with pytest.raises(ValueError, match="receptive field"):
        next(gen)


@pytest.mark.slow
def test_deep_training_step_decreases_loss(corpus):
    """An end-to-end deep-structure training step at the registry window
    shape (Tp=22550): finite decreasing loss, params actually move."""
    cfg = deep_cpu_cfg()
    wavs, feats = corpus
    gen = train_window_generator(wavs, feats, cfg,
                                 batch_length=BATCH_LENGTH, batch_size=1,
                                 max_length=MAX_LENGTH, seed=3)
    tx = optax.adam(2e-3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # the step donates its state buffers: snapshot before stepping
    params0 = jax.device_get(params)
    step = make_train_step(cfg, tx)
    state = TrainState(params=params, opt_state=tx.init(params),
                       iterations=0)
    losses = []
    batches = [b for _, b in zip(range(8), gen)]
    for _ in range(3):          # few epochs over the same 8 windows
        for b in batches:
            b = {k: v for k, v in b.items() if k != "window_lens"}
            state, loss = step(state, b)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                         - np.asarray(b, np.float32)))),
        params0, jax.device_get(state.params))
    assert max(jax.tree_util.tree_leaves(moved)) > 0
