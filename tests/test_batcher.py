"""Streaming window batcher: static shapes, receptive-field arithmetic,
window content vs a manual oracle."""

import numpy as np

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.data.batcher import (
    padded_shape, train_window_generator, validate_length, BackgroundGenerator,
)
from qpnet_tpu.ops import encode_mu_law

from helpers import make_synthetic_corpus


def tiny_cfg():
    return ModelConfig(n_quantize=256, n_aux=4, n_resch=8, n_skipch=8,
                       dilationF_depth=2, dilationF_repeat=1,
                       dilationA_depth=2, dilationA_repeat=1,
                       kernel_size=2, upsampling_factor=10, dense_factor=8)


def test_padded_shape():
    assert padded_shape(30000, 110) == 30030
    assert padded_shape(22500, 110) == 22550
    assert padded_shape(1000, 10) == 1000


def test_validate_length():
    x = np.zeros(1005)
    h = np.zeros((100, 3))
    x2, h2 = validate_length(x, h, 10)
    assert len(x2) == 1000 and len(h2) == 100
    x3, h3 = validate_length(np.zeros(995), np.zeros((100, 3)), 10)
    assert len(x3) == len(h3) * 10


def test_batcher_shapes_and_mask(tmp_path):
    cfg = tiny_cfg()
    wavs, feats = make_synthetic_corpus(str(tmp_path), n_utts=2, fs=1000,
                                        up=10, n_aux=4)
    gen = train_window_generator(
        wavs, feats, cfg, batch_length=300, batch_size=2, max_length=800,
        shuffle=False, loop=False)
    Tp = padded_shape(800, 10)
    n_batches = 0
    for batch in gen:
        n_batches += 1
        assert batch["x"].shape == (2, Tp)
        assert batch["t"].shape == (2, Tp)
        assert batch["h"].shape == (2, Tp // 10, 4)
        assert batch["d"].shape == (2, Tp)
        L = int(batch["valid_len"])
        assert 0 < L <= 300
        # target is input shifted by one inside the real window
        real = Tp - L - 60  # conservative real-region start
        np.testing.assert_array_equal(
            batch["x"][:, -(L - 1):], batch["t"][:, -L:-1])
        assert np.all(batch["d"] > 0)
    assert n_batches >= 2


def test_batcher_window_content_matches_stream(tmp_path):
    """First emitted window must equal the head of the utterance stream."""
    cfg = tiny_cfg()
    wavs, feats = make_synthetic_corpus(str(tmp_path), n_utts=1, fs=1000,
                                        up=10, n_aux=4, seed=3)
    from scipy.io import wavfile
    from qpnet_tpu.data.h5io import read_hdf5
    fs, x_raw = wavfile.read(wavs[0])
    x = np.asarray(x_raw, np.float32) / 32768
    h = read_hdf5(feats[0], "/world")

    gen = train_window_generator(
        wavs, feats, cfg, batch_length=300, batch_size=1, max_length=900,
        shuffle=False, loop=False)
    batch = next(iter(gen))
    L = int(batch["valid_len"])
    Tp = batch["x"].shape[1]
    # find emitted window length: real region is x[0:T+1]
    nz = batch["h"][0].any(axis=1)
    h_bs = int(nz.sum())
    T = h_bs * 10
    np.testing.assert_array_equal(
        batch["x"][0, Tp - T:],
        encode_mu_law(x[: T + 1], 256)[:-1])
    np.testing.assert_allclose(batch["h"][0, -h_bs:], h[:h_bs], rtol=1e-6)


def test_background_generator():
    def gen():
        for i in range(5):
            yield i
    bg = BackgroundGenerator(gen(), max_prefetch=2)
    assert list(bg) == [0, 1, 2, 3, 4]


def test_background_generator_propagates_worker_errors(tmp_path):
    """A corrupt feature file must surface its real cause, not a bare
    StopIteration (regression for the swallowed-exception bug)."""
    import pytest
    from qpnet_tpu.data.batcher import background, train_window_generator
    cfg = tiny_cfg()
    wavs, feats = make_synthetic_corpus(str(tmp_path), n_utts=1, fs=1000,
                                        up=10, n_aux=4)
    # corrupt the h5
    with open(feats[0], "wb") as f:
        f.write(b"not an hdf5 file")
    gen = background(2)(train_window_generator)(
        wavs, feats, cfg, batch_length=300, batch_size=1, max_length=900,
        shuffle=False, loop=False)
    with pytest.raises(RuntimeError, match="data pipeline worker failed"):
        for _ in range(5):
            gen.next()
