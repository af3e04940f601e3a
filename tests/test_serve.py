"""Serving layer: request batching over StreamingGenerator must be
bit-equivalent to driving the generator directly, trim each stream to
its own length, and survive the TCP transport round trip."""

import json
import socket
import struct
import threading
import time

import jax
import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import init_params
from qpnet_tpu.models.generate import StreamingGenerator
from qpnet_tpu.ops.mulaw import decode_mu_law
from qpnet_tpu.serve import StreamingService, request_stream, serve_tcp


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
        # an empty request must be rejected, not crash its whole group
        with pytest.raises(ValueError, match="empty"):
            svc.submit(np.zeros((0, cfg.n_aux), np.float32),
                       np.zeros(0, np.float32))
    finally:
        svc.close()


def test_request_stream_helper_and_error_sentinel(model):
    cfg, params = model
    svc = make_service(cfg, params)
    srv = serve_tcp(svc, port=0)
    try:
        rng = np.random.default_rng(4)
        F = 8
        h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
        d = np.full(F, 2.0, np.float32)
        pcm = np.concatenate(list(request_stream(srv.server_address, h, d)))
        assert pcm.shape == (F * cfg.upsampling_factor,)
        assert pcm.dtype == np.int16
        # maxd violation surfaces as RuntimeError via the 0xFFFFFFFF
        # sentinel, never as a garbled chunk
        with pytest.raises(RuntimeError, match="exceeds"):
            list(request_stream(srv.server_address, h,
                                np.full(F, 99.0, np.float32)))
        # a hostile frames count must be rejected BEFORE the handler
        # sizes payload reads (negative/huge F would otherwise block the
        # handler forever waiting on bytes the client never sends)
        import json as _json
        import socket as _socket
        import struct as _struct
        for bad_f in (-1, 0, 2 ** 31):
            with _socket.create_connection(srv.server_address) as s:
                s.sendall(_json.dumps({"frames": bad_f}).encode() + b"\n")
                rf = s.makefile("rb")
                sentinel = _struct.unpack("<I", rf.read(4))[0]
                assert sentinel == 0xFFFFFFFF
                assert b"frames" in rf.readline()
        # a header with no newline must be rejected at the line cap, not
        # buffered unboundedly in the handler's readline()
        from qpnet_tpu.serve import _MAX_WIRE_LINE
        with _socket.create_connection(srv.server_address) as s:
            s.sendall(b"x" * (_MAX_WIRE_LINE + 4096))
            rf = s.makefile("rb")
            sentinel = _struct.unpack("<I", rf.read(4))[0]
            assert sentinel == 0xFFFFFFFF
            assert b"exceeds" in rf.readline()
    finally:
        srv.shutdown()
        svc.close()


def test_raw_frontend_matches_manual_conditioning(model):
    """'raw': true over the wire == frontend applied client-side +
    standardized submit (same bytes out)."""
    cfg, params = model
    from qpnet_tpu.bin.qpnet_serve import make_frontend
    from qpnet_tpu.data.stats import Scaler

    rng = np.random.default_rng(5)
    mean = rng.normal(size=cfg.n_aux)
    scale = rng.uniform(0.5, 2.0, cfg.n_aux)
    scaler = Scaler.from_stats(mean, scale)

    class A:  # the argparse surface make_frontend reads
        f0_dim_index, f0_factor, fs = 1, 1.0, 1000

    class C:
        dense_factor = 4

    frontend = make_frontend(scaler, A, C)
    svc = make_service(cfg, params, frontend=frontend)
    srv = serve_tcp(svc, port=0)
    try:
        F = 12
        feats = np.abs(rng.normal(size=(F, cfg.n_aux))) + 0.1
        feats[:, 1] = rng.uniform(80.0, 200.0, F)      # d = fs/(f0*4) < 4
        got = np.concatenate(
            list(request_stream(srv.server_address, feats)))
        h, d = frontend(feats)
        assert d.max() <= svc.maxd                     # fixture sanity
        want_mu = svc.submit(h, d).samples()
        want = np.clip(decode_mu_law(want_mu, cfg.n_quantize) * 32768,
                       -32768, 32767).astype(np.int16)
        np.testing.assert_array_equal(got, want)
    finally:
        srv.shutdown()
        svc.close()


def test_short_first_chunk_bit_equal_and_smaller(model):
    """first_chunk_samples: the schedule's first chunk shrinks (faster
    first audio) while the full stream stays bit-identical to the
    full-chunk service."""
    cfg, params = model
    rng = np.random.default_rng(9)
    up = cfg.upsampling_factor
    Fc = StreamingGenerator(params, cfg, B=1, maxd=4, min_chunk_samples=40,
                            interpret=True).chunk_frames
    F = 2 * Fc + 3
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    d = rng.uniform(1.0, 3.5, F).astype(np.float32)

    svc_full = make_service(cfg, params, max_streams=1)
    svc_fast = make_service(cfg, params, max_streams=1,
                            first_chunk_samples=2 * up)
    try:
        chunks_fast = list(svc_fast.submit(h, d).chunks())
        chunks_full = list(svc_full.submit(h, d).chunks())
        assert chunks_fast[0].shape[0] == 2 * up          # short first chunk
        assert chunks_full[0].shape[0] == Fc * up
        np.testing.assert_array_equal(np.concatenate(chunks_fast),
                                      np.concatenate(chunks_full))
    finally:
        svc_full.close()
        svc_fast.close()


def test_session_reuse_across_groups_matches_fresh_session(model):
    """The scheduler caches one session per (device, B) and reset()s it
    between groups: group N on a reused session must equal group N on a
    freshly built one (ring state fully cleared, per-group seed applied)."""
    cfg, params = model
    svc = make_service(cfg, params, max_streams=2)
    try:
        rng = np.random.default_rng(7)
        Fc = StreamingGenerator(params, cfg, B=2, maxd=4,
                                min_chunk_samples=40,
                                interpret=True).chunk_frames
        h = rng.normal(size=(2, 2, Fc, cfg.n_aux)).astype(np.float32)
        d = rng.uniform(1.0, 3.5, (2, 2, Fc)).astype(np.float32)
        outs = []
        for g in range(2):                    # two sequential full groups
            handles = [svc.submit(h[g, i], d[g, i]) for i in range(2)]
            outs.append([hd.samples() for hd in handles])
        # each group == a fresh direct session on the same conditioning
        for g in range(2):
            sess = StreamingGenerator(params, cfg, B=2, maxd=4,
                                      mode="argmax", min_chunk_samples=40,
                                      interpret=True)
            want = sess.feed(h[g], d[g])
            for i in range(2):
                np.testing.assert_array_equal(outs[g][i], want[i])
    finally:
        svc.close()


def test_device_pool_spreads_groups(model):
    """devices=2 virtual chips: two full groups run on distinct pinned
    sessions; every stream's output equals the single-device result."""
    cfg, params = model
    devs = jax.devices()[:2]
    assert len(devs) == 2                      # conftest forces 8 CPU devs
    svc = make_service(cfg, params, max_streams=2, devices=devs)
    try:
        rng = np.random.default_rng(8)
        Fc = StreamingGenerator(params, cfg, B=2, maxd=4,
                                min_chunk_samples=40,
                                interpret=True).chunk_frames
        h = rng.normal(size=(4, Fc, cfg.n_aux)).astype(np.float32)
        d = rng.uniform(1.0, 3.5, (4, Fc)).astype(np.float32)
        handles = [svc.submit(h[i], d[i]) for i in range(4)]
        got = [hd.samples() for hd in handles]
        # groups form in submit order ([0,1] then [2,3]); whichever
        # device served them, outputs must equal direct B=2 sessions
        for pair in ((0, 1), (2, 3)):
            sess = StreamingGenerator(params, cfg, B=2, maxd=4,
                                      mode="argmax", min_chunk_samples=40,
                                      interpret=True)
            want = sess.feed(h[list(pair)], d[list(pair)])
            for j, i in enumerate(pair):
                np.testing.assert_array_equal(got[i], want[j])
    finally:
        svc.close()


def test_submit_raw_without_frontend_rejected(model):
    cfg, params = model
    svc = make_service(cfg, params)
    try:
        with pytest.raises(RuntimeError, match="frontend"):
            svc.submit_raw(np.zeros((5, cfg.n_aux)))
    finally:
        svc.close()


def test_qpnet_serve_cli(model, tmp_path):
    """The CLI worker end to end: checkpoint + stats + model.conf on
    disk -> server process wiring -> raw-mode client round trip."""
    from qpnet_tpu.bin import qpnet_serve
    from qpnet_tpu.config import RunConfig
    from qpnet_tpu.data.h5io import write_hdf5
    from qpnet_tpu.train.checkpoint import save_final

    cfg, params = model
    save_final(str(tmp_path), params)
    run_cfg = RunConfig(model=cfg, fs=1000)
    conf = str(tmp_path / "model.conf")
    run_cfg.save(conf)
    stats = str(tmp_path / "stats.h5")
    write_hdf5(stats, "/world/mean", np.zeros(cfg.n_aux))
    write_hdf5(stats, "/world/scale", np.ones(cfg.n_aux))

    with socket.socket() as probe:                    # find a free port
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    srv_thread = threading.Thread(target=qpnet_serve.main, daemon=True, args=([
        "--config", conf, "--stats", stats,
        "--checkpoint", str(tmp_path / "checkpoint-final.pkl"),
        "--host", "127.0.0.1", "--port", str(port),
        "--fs", "1000", "--maxd", "4", "--max_streams", "2",
        "--chunk_samples", "40", "--mode", "argmax",
        "--gather_window_ms", "20", "--interpret", "--verbose", "0"],))
    srv_thread.start()
    F = 9
    rng = np.random.default_rng(6)
    feats = np.abs(rng.normal(size=(F, cfg.n_aux))) + 0.1
    feats[:, 1] = 60.0                                # F0 -> d well < maxd
    deadline = time.time() + 30
    while True:                                       # wait for the bind
        try:
            pcm = np.concatenate(
                list(request_stream(("127.0.0.1", port), feats)))
            break
        except ConnectionRefusedError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    assert pcm.shape == (F * cfg.upsampling_factor,)
    assert pcm.dtype == np.int16


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


def _wait_for(pred, timeout=30.0, step=0.05):
    deadline = time.time() + timeout
    while not pred():
        if time.time() > deadline:
            return False
        time.sleep(step)
    return True


def test_cancel_mid_stream_stops_group_early(model):
    """cancel() mid-stream ends the group's kernel loop once no live
    stream remains: fewer feeds than the schedule, and the chunks seen
    before the cancel are bit-equal to the uncancelled run."""
    cfg, params = model
    Fc = StreamingGenerator(params, cfg, B=1, maxd=4, min_chunk_samples=40,
                            interpret=True).chunk_frames
    F = 6 * Fc
    rng = np.random.default_rng(11)
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    d = rng.uniform(1.0, 3.5, F).astype(np.float32)

    svc_ref = make_service(cfg, params, max_streams=1)
    try:
        full = svc_ref.submit(h, d).samples()
        assert svc_ref.stats["feeds"] == 6
    finally:
        svc_ref.close()

    svc = make_service(cfg, params, max_streams=1)
    try:
        hd = svc.submit(h, d)
        it = hd.chunks()
        first = next(it)
        hd.cancel()
        # the scheduler notices at the next loop head; close() joins it
    finally:
        svc.close()
    np.testing.assert_array_equal(first, full[: len(first)])
    assert svc.stats["feeds"] < 6            # stopped early
    assert svc.stats["streams_cancelled"] == 1
    assert svc.stats["streams_done"] == 0


def test_cancel_pending_request_never_reaches_a_kernel(model):
    """A request cancelled while still queued is dropped before grouping
    and a later live request is unaffected."""
    cfg, params = model
    rng = np.random.default_rng(12)
    F = 4
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    d = np.full(F, 2.0, np.float32)
    # max_streams=2 keeps the scheduler inside the gather window after
    # one submit (predicate needs 2), giving us time to cancel
    svc = make_service(cfg, params, max_streams=2, gather_window_s=1.0)
    try:
        doomed = svc.submit(h, d)
        doomed.cancel()
        assert list(doomed.chunks()) == []
        live = svc.submit(h, d)
        out = live.samples()
        assert out.shape == (F * cfg.upsampling_factor,)
        assert _wait_for(lambda: svc.stats["streams_done"] == 1)
        assert svc.stats["streams_cancelled"] == 1
    finally:
        svc.close()


def test_cancel_unblocks_a_blocked_reader(model):
    cfg, params = model
    # never scheduled: max_streams=2 + long gather window
    svc = make_service(cfg, params, max_streams=2, gather_window_s=5.0)
    try:
        hd = svc.submit(np.zeros((2, cfg.n_aux), np.float32),
                        np.full(2, 2.0, np.float32))
        got = []
        t = threading.Thread(target=lambda: got.extend(hd.chunks()))
        t.start()
        time.sleep(0.1)
        hd.cancel()
        t.join(timeout=10)
        assert not t.is_alive() and got == []
    finally:
        svc.close()


def test_tcp_disconnect_cancels_stream(model):
    """A client that hangs up mid-stream triggers cancel(): the
    scheduler records the cancellation and stops generating."""
    cfg, params = model
    Fc = StreamingGenerator(params, cfg, B=1, maxd=4, min_chunk_samples=40,
                            interpret=True).chunk_frames
    F = 8 * Fc
    rng = np.random.default_rng(13)
    h = rng.normal(size=(F, cfg.n_aux)).astype("<f4")
    d = np.full(F, 2.5, "<f4")
    svc = make_service(cfg, params, max_streams=1)
    srv = serve_tcp(svc, port=0)
    try:
        with socket.create_connection(srv.server_address) as s:
            s.sendall(json.dumps({"frames": F}).encode() + b"\n"
                      + h.tobytes() + d.tobytes())
            buf = s.makefile("rb")
            n = struct.unpack("<I", buf.read(4))[0]
            buf.read(2 * n)                  # one chunk, then hang up
            buf.close()                      # drop the makefile dup too
            # RST on close so the server's next write errors promptly
            s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                         struct.pack("ii", 1, 0))
        assert _wait_for(lambda: svc.stats["streams_cancelled"] == 1)
        assert svc.stats["streams_done"] == 0
    finally:
        srv.shutdown()
        svc.close()


def test_prewarm_builds_sessions_and_output_is_unchanged(model):
    """prewarm() compiles the session buckets before traffic; the served
    stream is bit-identical to a cold service."""
    cfg, params = model
    rng = np.random.default_rng(14)
    F = 7
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    d = np.full(F, 2.0, np.float32)

    svc_cold = make_service(cfg, params, max_streams=2)
    try:
        want = svc_cold.submit(h, d).samples()
    finally:
        svc_cold.close()

    svc = make_service(cfg, params, max_streams=2,
                       first_chunk_samples=2 * cfg.upsampling_factor)
    try:
        svc.prewarm([1, 2])
        # pow2 buckets materialized on the (single) device's session map
        assert sorted(svc._sessions[0]) == [1, 2]
        got = svc.submit(h, d).samples()
    finally:
        svc.close()
    np.testing.assert_array_equal(got, want[: got.shape[0]])
    assert got.shape == want.shape


def test_max_pending_backpressure(model):
    cfg, params = model
    h = np.zeros((2, cfg.n_aux), np.float32)
    d = np.full(2, 2.0, np.float32)
    # predicate needs 4 streams, so 2 submits sit pending for the whole
    # 5 s gather window — the third must bounce off max_pending=2
    svc = make_service(cfg, params, max_streams=4, gather_window_s=5.0,
                      max_pending=2)
    try:
        a = svc.submit(h, d)
        b = svc.submit(h, d)
        with pytest.raises(RuntimeError, match="overloaded"):
            svc.submit(h, d)
    finally:
        svc.close()
    # the queued pair still completed on close-drain
    assert a.samples().shape == b.samples().shape == (2 * cfg.upsampling_factor,)


def test_tcp_postfilter_applies_noise_restoration(model):
    """postfilter_factory (the serving noise-restoration hook): the TCP
    stream equals mu-law decode + a per-stream StreamingEmphasizer
    applied chunk by chunk."""
    from qpnet_tpu.dsp.emphasis import StreamingEmphasizer

    cfg, params = model
    fs, alpha = 1000, 0.41
    mc = np.zeros(6)
    mc[1:3] = [0.3, -0.15]
    factory = lambda: StreamingEmphasizer(fs, mc, alpha, shiftms=5.0)  # noqa: E731

    rng = np.random.default_rng(15)
    Fc = StreamingGenerator(params, cfg, B=1, maxd=4, min_chunk_samples=40,
                            interpret=True).chunk_frames
    F = 2 * Fc + 1
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    d = np.full(F, 2.0, np.float32)

    svc = make_service(cfg, params, max_streams=1,
                       postfilter_factory=factory)
    srv = serve_tcp(svc, port=0)
    try:
        got = np.concatenate(list(request_stream(srv.server_address, h, d)))
        # reference computation: same mu-law chunks (deterministic argmax),
        # same chunk boundaries, fresh filter state
        mu_chunks = list(svc.submit(h, d).chunks())
        pf = factory()
        want = np.concatenate([
            np.clip(pf.process(decode_mu_law(c, cfg.n_quantize)) * 32768,
                    -32768, 32767).astype(np.int16) for c in mu_chunks])
        np.testing.assert_array_equal(got, want)
        # and it actually changed the audio vs the unfiltered stream
        plain = np.concatenate([
            np.clip(decode_mu_law(c, cfg.n_quantize) * 32768,
                    -32768, 32767).astype(np.int16) for c in mu_chunks])
        assert not np.array_equal(got, plain)
    finally:
        srv.shutdown()
        svc.close()


def test_stats_health_probe(model):
    """A {"stats": true} header returns one JSON status line (the
    load-balancer health probe) with live service counters, without
    touching the kernel."""
    from qpnet_tpu.serve import request_stats

    cfg, params = model
    svc = make_service(cfg, params, gather_window_s=0.05)
    srv = serve_tcp(svc, port=0)
    try:
        st = request_stats(srv.server_address)
        assert st["ok"] is True
        assert st["pending"] == 0 and st["devices"] == 1
        assert st["streams_done"] == 0

        rng = np.random.default_rng(5)
        F = 8
        h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
        svc.submit(h, np.full(F, 2.5, np.float32)).samples()
        st = request_stats(srv.server_address)
        assert st["streams_done"] == 1 and st["groups"] == 1
    finally:
        srv.shutdown()
        svc.close()
    # a closed service reports not-ok through a still-running front end
    srv2 = serve_tcp(svc, port=0)
    try:
        assert request_stats(srv2.server_address)["ok"] is False
    finally:
        srv2.shutdown()


def test_idle_dispatch_skips_the_gather_window(model):
    """TTFB regression (adaptive gather): a lone request on an idle
    service dispatches once arrivals go quiet (gather_quiet_s), NOT
    after the full gather_window_s — with a 30 s window the request
    would otherwise sit for 30 s before any kernel ran."""
    cfg, params = model
    svc = make_service(cfg, params, max_streams=4, gather_window_s=30.0,
                       gather_quiet_s=0.05)
    try:
        F = 4
        h = np.zeros((F, cfg.n_aux), np.float32)
        d = np.full(F, 2.0, np.float32)
        t0 = time.monotonic()
        out = svc.submit(h, d).samples()
        wall = time.monotonic() - t0
        assert out.shape == (F * cfg.upsampling_factor,)
        # generous bound for slow CI: far below the 30 s window, the
        # only way to pass is the quiet-dispatch path
        assert wall < 10.0, f"lone request waited {wall:.1f}s to dispatch"
        # default quiet is window/10 — never more than the window
        assert svc.gather_quiet_s == 0.05
    finally:
        svc.close()
    svc2 = make_service(cfg, params, gather_window_s=1.0)
    try:
        assert svc2.gather_quiet_s == pytest.approx(0.1)
    finally:
        svc2.close()


def test_burst_still_batches_into_one_group(model):
    """Quiet-dispatch must not split a tight burst: max_streams requests
    submitted back-to-back land in ONE group (one kernel session), so
    steady-state throughput is unchanged by the TTFB fix."""
    cfg, params = model
    svc = make_service(cfg, params, max_streams=4, gather_window_s=2.0,
                       gather_quiet_s=0.3)
    try:
        F = 4
        h = np.zeros((F, cfg.n_aux), np.float32)
        d = np.full(F, 2.0, np.float32)
        handles = [svc.submit(h, d) for _ in range(4)]
        for hd in handles:
            assert hd.samples().shape == (F * cfg.upsampling_factor,)
        assert svc.stats["groups"] == 1, svc.stats
    finally:
        svc.close()


def test_request_stats_surfaces_error_sentinel():
    """If the server answers the stats probe with the 0xFFFFFFFF error
    sentinel + JSON error line (the rejection protocol), the client
    raises RuntimeError with the server's message — not an opaque
    JSONDecodeError from parsing binary as JSON."""
    from qpnet_tpu.serve import request_stats

    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)

    def fake_server():
        conn, _ = lsock.accept()
        with conn:
            conn.makefile("rb").readline()
            conn.sendall(struct.pack("<I", 0xFFFFFFFF)
                         + (json.dumps({"error": "stats exploded"})
                            + "\n").encode())

    t = threading.Thread(target=fake_server, daemon=True)
    t.start()
    try:
        with pytest.raises(RuntimeError, match="stats exploded"):
            request_stats(lsock.getsockname())
        t.join(5)
    finally:
        lsock.close()
