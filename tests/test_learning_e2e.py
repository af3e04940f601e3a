"""End-to-end learning: a tiny QPNet overfit on one periodic utterance must
generate audio carrying the conditioning F0 — the full
feature->train->generate->analyze loop actually learns pitch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.data.batcher import train_window_generator
from qpnet_tpu.models import init_params
from qpnet_tpu.models.generate import batch_fast_generate
from qpnet_tpu.ops import dilated_factor
from qpnet_tpu.train import TrainState, make_optimizer, make_train_step
from qpnet_tpu.dsp.world import harvest

FS = 4000
F0 = 150.0
UP = 20


def make_data(seconds=2.0):
    n = int(FS * seconds)
    ph = np.cumsum(np.full(n, F0) / FS)
    x = 0.6 * np.sin(2 * np.pi * ph) + 0.2 * np.sin(4 * np.pi * ph)
    n_frames = n // UP
    h = np.zeros((n_frames, 3), np.float32)
    h[:, 0] = 1.0
    h[:, 1] = F0
    h[:, 2] = 1.0
    return x[: n_frames * UP].astype(np.float32), h


@pytest.mark.slow
def test_overfit_generates_pitch(tmp_path):
    cfg = ModelConfig(n_quantize=64, n_aux=3, n_resch=32, n_skipch=16,
                      dilationF_depth=3, dilationF_repeat=2,
                      dilationA_depth=2, dilationA_repeat=1,
                      kernel_size=2, dense_factor=4, upsampling_factor=UP)
    x, h = make_data()
    from scipy.io import wavfile
    from qpnet_tpu.data.h5io import write_hdf5
    wav_path = str(tmp_path / "wav" / "u.wav")
    feat_path = str(tmp_path / "h5" / "u.h5")
    import os
    os.makedirs(os.path.dirname(wav_path))
    wavfile.write(wav_path, FS, (x * 32767).astype(np.int16))
    write_hdf5(feat_path, "/world", h)

    gen = train_window_generator(
        [wav_path], [feat_path], cfg, batch_length=1500, batch_size=1,
        max_length=3000, shuffle=False, loop=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(lr=3e-3)
    step = make_train_step(cfg, tx, remat=False)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    losses = []
    it = iter(gen)
    for i in range(350):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) * 0.6, \
        (np.mean(losses[:20]), np.mean(losses[-20:]))

    # generate 1 s conditioned on the same features
    n_frames = FS // UP * 1
    h_gen = h[:n_frames][None]
    d = dilated_factor(np.full(n_frames, F0), FS, cfg.dense_factor)
    d = np.repeat(d, UP)[None].astype(np.float32)
    x0 = np.full((1, 1), cfg.n_quantize // 2, np.int32)
    n = n_frames * UP - 1
    out = batch_fast_generate(state.params, cfg, x0, h_gen, [n], d,
                              seed=7, engine="xla",
                              compute_dtype=jnp.float32)[0]
    from qpnet_tpu.ops import decode_mu_law
    wav = decode_mu_law(out, cfg.n_quantize)
    assert np.std(wav[200:]) > 0.02, "generated silence"
    f0_track, _ = harvest(wav[200:] * 8000, FS, f0_floor=80, f0_ceil=350)
    voiced = f0_track > 0
    assert voiced.mean() > 0.4, f"voicing {voiced.mean():.2f}"
    med = np.median(f0_track[voiced])
    assert abs(med - F0) / F0 < 0.1, f"generated pitch {med:.1f} Hz"
