"""Streaming generation: chunked feeds with carried ring state must equal
the one-shot generation on the concatenated conditioning (argmax mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import init_params
from qpnet_tpu.models.generate import StreamingGenerator, _pallas_path


def tiny_cfg():
    return ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                       dilationF_depth=2, dilationF_repeat=2,
                       dilationA_depth=2, dilationA_repeat=1,
                       kernel_size=2, upsampling_factor=5)


@pytest.mark.slow
def test_streaming_matches_one_shot():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, maxd = 2, 4
    sess = StreamingGenerator(params, cfg, B, maxd=maxd, mode="argmax",
                              min_chunk_samples=40, interpret=True)
    F_chunk = sess.chunk_frames
    n_chunks = 3
    F = F_chunk * n_chunks
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F), 2.6, np.float32)

    streamed = []
    for c in range(n_chunks):
        sl = slice(c * F_chunk, (c + 1) * F_chunk)
        streamed.append(sess.feed(h[:, sl], d[:, sl]))
    streamed = np.concatenate(streamed, axis=1)

    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    x_seed = np.full((B, rf + 1), cfg.n_quantize // 2, np.int32)
    d_samples = np.repeat(d, cfg.upsampling_factor, axis=1)
    one_shot = _pallas_path(params, cfg, x_seed, h, d_samples,
                            n_steps=F * cfg.upsampling_factor,
                            maxd=maxd, seed=100, mode="argmax",
                            interpret=True)
    np.testing.assert_array_equal(streamed, one_shot)


@pytest.mark.slow
def test_variable_chunk_feeds_match_one_shot():
    """feed() accepts ANY whole-frame length: ring slots / upsampler
    phase / PRNG key off the absolute sample index, so an irregular chunk
    schedule (short first chunk for TTFB, then nominal) must equal the
    one-shot kernel bitwise."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    B, maxd = 2, 4
    sess = StreamingGenerator(params, cfg, B, maxd=maxd, mode="sampling",
                              min_chunk_samples=40, interpret=True)
    F = 13
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = rng.uniform(1.0, 3.5, (B, F)).astype(np.float32)

    streamed, start = [], 0
    for L in (1, 4, 2, 6):                    # irregular whole-frame chunks
        streamed.append(sess.feed(h[:, start:start + L],
                                  d[:, start:start + L]))
        start += L
    assert start == F
    streamed = np.concatenate(streamed, axis=1)

    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    x_seed = np.full((B, rf + 1), cfg.n_quantize // 2, np.int32)
    d_samples = np.repeat(d, cfg.upsampling_factor, axis=1)
    one_shot = _pallas_path(params, cfg, x_seed, h, d_samples,
                            n_steps=F * cfg.upsampling_factor,
                            maxd=maxd, seed=100, mode="sampling",
                            interpret=True)
    np.testing.assert_array_equal(streamed, one_shot)


@pytest.mark.slow
def test_streaming_w8a8_matches_one_shot_w8a8():
    """The deep released network only streams via --quantize w8a8 (bf16
    weights exceed VMEM); the quantized streaming session must carry ring
    state exactly like the bf16 one — chunked w8a8 == one-shot w8a8."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B, maxd = 2, 4
    sess = StreamingGenerator(params, cfg, B, maxd=maxd, mode="argmax",
                              min_chunk_samples=40, interpret=True,
                              quantize="w8a8")
    F_chunk = sess.chunk_frames
    n_chunks = 2
    F = F_chunk * n_chunks
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F), 2.2, np.float32)

    streamed = np.concatenate(
        [sess.feed(h[:, c * F_chunk:(c + 1) * F_chunk],
                   d[:, c * F_chunk:(c + 1) * F_chunk])
         for c in range(n_chunks)], axis=1)

    rf = cfg.receptiveF + cfg.receptiveA * maxd + cfg.receptive_causal
    x_seed = np.full((B, rf + 1), cfg.n_quantize // 2, np.int32)
    d_samples = np.repeat(d, cfg.upsampling_factor, axis=1)
    one_shot = _pallas_path(params, cfg, x_seed, h, d_samples,
                            n_steps=F * cfg.upsampling_factor,
                            maxd=maxd, seed=100, mode="argmax",
                            interpret=True, quantize="w8a8")
    np.testing.assert_array_equal(streamed, one_shot)


def test_chunked_decode_path_matches_one_shot(monkeypatch):
    """Long utterances decode as full chunks + a bucketed tail with carried
    ring state; the result must be bit-identical to the one-shot kernel
    call (absolute-time slot/PRNG arithmetic)."""
    import jax
    import numpy as np
    from qpnet_tpu.config import ModelConfig
    from qpnet_tpu.models import generate as G
    from qpnet_tpu.models import init_params

    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      upsampling_factor=4)
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    B, F = 2, 30
    up = cfg.upsampling_factor
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.repeat(rng.uniform(1.0, 3.0, (B, F)), up, axis=1).astype(
        np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)

    one_shot = G.batch_fast_generate(params, cfg, x0, h, [n] * B, d,
                                     seed=11, engine="pallas",
                                     interpret=True)
    monkeypatch.setattr(G, "DECODE_CHUNK_FRAMES", 10)  # 3 chunks + tail
    chunked = G.batch_fast_generate(params, cfg, x0, h, [n] * B, d,
                                    seed=11, engine="pallas",
                                    interpret=True)
    np.testing.assert_array_equal(np.stack(one_shot), np.stack(chunked))


@pytest.mark.slow
def test_small_group_streamed_session_pads_batch(monkeypatch):
    """Serving groups pad to powers of two, so a session batch can be
    1/2/4 — below the 8-row sublane alignment Mosaic requires for a
    streaming-active kernel's HBM ring windows.  With streaming forced
    on, a B=2 session must transparently run its kernel at a padded
    internal batch and produce exactly the un-streamed session's
    samples (chunked, across window boundaries)."""
    import qpnet_tpu.ops.gen_kernel as GK

    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                      dilationF_depth=6, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      kernel_size=2, upsampling_factor=10)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    B, maxd = 2, 4
    F_chunk, n_chunks = 4, 3
    F = F_chunk * n_chunks
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.full((B, F), 2.5, np.float32)

    def run():
        sess = StreamingGenerator(params, cfg, B, maxd=maxd,
                                  mode="sampling",
                                  min_chunk_samples=F_chunk * 10,
                                  interpret=True)
        out = [sess.feed(h[:, c * F_chunk:(c + 1) * F_chunk],
                         d[:, c * F_chunk:(c + 1) * F_chunk])
               for c in range(n_chunks)]
        return sess, np.concatenate(out, axis=1)

    ref_sess, ref = run()
    assert ref_sess._kB == B        # resident: no padding

    monkeypatch.setattr(GK, "choose_stream_min_dil",
                        lambda *a, **k: (32, True))
    got_sess, got = run()
    assert got_sess._kB == 8        # streamed: padded to the sublane
    np.testing.assert_array_equal(got, ref)
