"""Serving layer: request batching over StreamingGenerator must be
bit-equivalent to driving the generator directly, trim each stream to
its own length, and survive the TCP transport round trip."""

import json
import socket
import struct

import jax
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import init_params
from qpnet_tpu.models.generate import StreamingGenerator
from qpnet_tpu.ops.mulaw import decode_mu_law
from qpnet_tpu.serve import StreamingService, serve_tcp


def tiny_cfg():
    return ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                       dilationF_depth=2, dilationF_repeat=2,
                       dilationA_depth=2, dilationA_repeat=1,
                       kernel_size=2, upsampling_factor=5)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return cfg, init_params(jax.random.PRNGKey(0), cfg)


def make_service(cfg, params, **kw):
    kw.setdefault("maxd", 4)
    kw.setdefault("mode", "argmax")     # deterministic across group seeds
    kw.setdefault("min_chunk_samples", 40)
    kw.setdefault("gather_window_s", 0.2)
    return StreamingService(params, cfg, interpret=True, **kw)


def test_full_group_matches_direct_generator(model):
    cfg, params = model
    svc = make_service(cfg, params, max_streams=4)
    try:
        rng = np.random.default_rng(1)
        up = cfg.upsampling_factor
        sess_probe = StreamingGenerator(params, cfg, B=4, maxd=4,
                                        mode="argmax", min_chunk_samples=40,
                                        interpret=True)
        Fc = sess_probe.chunk_frames
        F = 2 * Fc
        h = rng.normal(size=(4, F, cfg.n_aux)).astype(np.float32)
        d = rng.uniform(1.0, 3.5, (4, F)).astype(np.float32)
        # max_streams=4 fills the group: all four batch into one session
        handles = [svc.submit(h[i], d[i]) for i in range(4)]
        got = [hd.samples() for hd in handles]

        want = np.concatenate(
            [sess_probe.feed(h[:, c * Fc:(c + 1) * Fc],
                             d[:, c * Fc:(c + 1) * Fc]) for c in range(2)],
            axis=1)
        for i in range(4):
            assert got[i].shape == (F * up,)
            np.testing.assert_array_equal(got[i], want[i])
    finally:
        svc.close()


def test_ragged_lengths_trimmed_per_stream(model):
    cfg, params = model
    svc = make_service(cfg, params, max_streams=4)
    try:
        rng = np.random.default_rng(2)
        up = cfg.upsampling_factor
        Fc = StreamingGenerator(params, cfg, B=1, maxd=4,
                                min_chunk_samples=40,
                                interpret=True).chunk_frames
        lengths = [Fc - 2, Fc, 2 * Fc + 3]
        handles = []
        for F in lengths:
            h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
            d = np.full(F, 2.0, np.float32)
            handles.append(svc.submit(h, d))
        for F, hd in zip(lengths, handles):
            out = hd.samples()
            assert out.shape == (F * up,)
            assert out.dtype == np.int32
            assert (out >= 0).all() and (out < cfg.n_quantize).all()
    finally:
        svc.close()


def test_submit_validation(model):
    cfg, params = model
    svc = make_service(cfg, params)
    try:
        with pytest.raises(ValueError, match="must be"):
            svc.submit(np.zeros((5, cfg.n_aux + 1), np.float32),
                       np.full(5, 2.0, np.float32))
        with pytest.raises(ValueError, match="exceeds"):
            svc.submit(np.zeros((5, cfg.n_aux), np.float32),
                       np.full(5, 99.0, np.float32))
    finally:
        svc.close()


def test_tcp_roundtrip(model):
    cfg, params = model
    svc = make_service(cfg, params)
    srv = serve_tcp(svc, port=0)
    try:
        rng = np.random.default_rng(3)
        up = cfg.upsampling_factor
        F = 10
        h = rng.normal(size=(F, cfg.n_aux)).astype("<f4")
        d = np.full(F, 2.5, "<f4")
        with socket.create_connection(srv.server_address) as s:
            s.sendall(json.dumps({"frames": F}).encode() + b"\n"
                      + h.tobytes() + d.tobytes())
            pcm = b""
            buf = s.makefile("rb")
            while True:
                n = struct.unpack("<I", buf.read(4))[0]
                if n == 0:
                    break
                pcm += buf.read(2 * n)
        got = np.frombuffer(pcm, "<i2")
        assert got.shape == (F * up,)
        # same conditioning through the in-process API must match
        want_mu = svc.submit(h.astype(np.float32),
                             d.astype(np.float32)).samples()
        want = np.clip(decode_mu_law(want_mu, cfg.n_quantize) * 32768,
                       -32768, 32767).astype("<i2")
        np.testing.assert_array_equal(got, want)
    finally:
        srv.shutdown()
        svc.close()
