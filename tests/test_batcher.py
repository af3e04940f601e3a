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


def test_batches_have_uniform_window_lengths(tmp_path):
    """valid_len = min(per-window bl) looks like it could silently truncate
    loss positions when pitch changes bl mid-batch (the reference instead
    asserts equality, qpnet_train.py:522-523).  In fact the carving loop
    makes mixed batches impossible: a window is only carved when the
    buffer can fill ALL remaining batch slots, and once the first window
    of a batch is carved the conditions for the rest are implied (the
    slide h_ss = bl//up never exceeds the window h_bs = (rf+bl)//up), so
    no utterance append -- the only thing that can change bl -- happens
    mid-batch.  This test pins that invariant on a corpus whose pitch
    range forces bl to change ACROSS batches; min() stays as a safety net.
    """
    cfg = tiny_cfg()
    # utt0 high pitch (small receptive field), utt1 low pitch (large)
    w0, f0_ = make_synthetic_corpus(str(tmp_path / "a"), n_utts=1, fs=1000,
                                    up=10, n_aux=4, f0_lo=120, f0_hi=125,
                                    seed=0)
    w1, f1_ = make_synthetic_corpus(str(tmp_path / "b"), n_utts=1, fs=1000,
                                    up=10, n_aux=4, f0_lo=25, f0_hi=28,
                                    seed=1)
    wavs, feats = w0 + w1, f0_ + f1_
    kw = dict(batch_length=300, max_length=700, shuffle=False, loop=False)

    batches = list(train_window_generator(wavs, feats, cfg, batch_size=2,
                                          **kw))
    all_lens = [b["window_lens"].tolist() for b in batches]
    # the corpus really exercises a bl change (across batches)...
    assert len({tuple(ls) for ls in all_lens}) > 1, all_lens
    for b in batches:
        lens = b["window_lens"]
        # ...but never within one: valid_len loses no loss positions
        assert len(set(lens.tolist())) == 1, all_lens
        L = int(b["valid_len"])
        assert L == int(lens[0])
        for row in range(2):
            # end-aligned real data: targets chain with inputs
            np.testing.assert_array_equal(
                b["x"][row, -(L - 1):], b["t"][row, -L:-1])
