"""Benchmark: autoregressive synthesis throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline number is aggregate mu-law samples generated per second per
chip for the flagship (default, ~24M-param) QPNet at the throughput-
optimal batch of 128 (runs as two async-dispatched 64-utterance pallas
slices; use --batch 20 for the reference's own decode batch, runQP.py:66
— also above target).  `vs_baseline` is measured against
the BASELINE.md north-star target of 50x real-time at 22.05 kHz per chip
(22050*50 = 1,102,500 samples/s), i.e. vs_baseline > 1.0 beats the target.

The reference implementation generates one sample per Python/CUDA-launch
iteration (qpnet.py:446-557); it has no published RTF numbers (BASELINE.md),
so the target is the only quantitative baseline.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np


def latency_bench(args, cfg, params):
    """Serving latency: steady-state wall time per
    StreamingGenerator.feed() chunk at `--streams` concurrent streams
    (includes the host<->device dispatch+fetch this image's tunnel adds
    to every call — real serving latency on this deployment, an upper
    bound for a locally attached chip).  vs_baseline is the PER-STREAM
    realtime factor: chunk audio seconds per wall second (>1.0 = every
    stream stays ahead of realtime; aggregate capacity = streams x
    that)."""
    import time

    import numpy as np

    from qpnet_tpu.models.generate import StreamingGenerator

    B = args.streams
    sess = StreamingGenerator(params, cfg, B=B, maxd=32, seed=100,
                              mode=args.mode)
    rng = np.random.default_rng(0)
    d_val = args.fs / (args.f0 * cfg.dense_factor)

    def chunk_inputs():
        h = rng.normal(size=(B, sess.chunk_frames, cfg.n_aux)
                       ).astype(np.float32)
        h[:, :, 1] = args.f0
        d = np.full((B, sess.chunk_frames), d_val, np.float32)
        return h, d

    sess.feed(*chunk_inputs())          # prime + compile
    sess.feed(*chunk_inputs())          # warm steady state
    n_chunks = 5 if args.quick else 20
    lats = []
    for _ in range(n_chunks):
        h, d = chunk_inputs()
        t0 = time.perf_counter()
        out = sess.feed(h, d)
        lats.append(time.perf_counter() - t0)
        assert out.shape == (B, sess.chunk)
    lat = float(np.median(lats))
    audio_s = sess.chunk / args.fs
    print(json.dumps({
        "metric": "streaming_chunk_latency_ms",
        "value": round(lat * 1e3, 2),
        "unit": f"ms per {sess.chunk}-sample chunk (B={B})",
        "vs_baseline": round(audio_s / lat, 4),
    }))


def serve_bench(args, cfg, params):
    """End-to-end serving: N concurrent TCP clients stream one utterance
    each through StreamingService's batching layer (gather window, group
    padding, per-chip session) and the wire protocol.  Reports the median
    per-stream realtime factor (audio seconds per wall second, end to
    end) with the median time-to-first-chunk in the unit string —
    vs_baseline > 1.0 means every client stays ahead of realtime."""
    import threading

    from qpnet_tpu.serve import StreamingService, request_stream, serve_tcp

    svc = StreamingService(params, cfg, max_streams=max(args.streams, 1),
                           maxd=32, gather_window_s=0.25, mode=args.mode,
                           seed=100, first_chunk_samples=args.first_chunk,
                           quantize=args.quantize)
    srv = serve_tcp(svc, port=0)
    addr = srv.server_address
    rng = np.random.default_rng(0)
    F = int(args.seconds * args.fs) // cfg.upsampling_factor
    d_val = args.fs / (args.f0 * cfg.dense_factor)
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    h[:, 1] = args.f0
    d = np.full(F, d_val, np.float32)
    audio_s = F * cfg.upsampling_factor / args.fs

    results = []

    def client():
        t0 = time.perf_counter()
        ttfb, n = None, 0
        for chunk in request_stream(addr, h, d):
            if ttfb is None:
                ttfb = time.perf_counter() - t0
            n += len(chunk)
        results.append((ttfb, time.perf_counter() - t0, n))

    def fire(n_clients):
        threads = [threading.Thread(target=client)
                   for _ in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    fire(args.streams)                  # compile at the group's B bucket
    results.clear()
    fire(args.streams)                  # measured run, warm kernel
    srv.shutdown()
    svc.close()
    assert len(results) == args.streams, \
        f"only {len(results)}/{args.streams} clients completed"
    assert all(n == F * cfg.upsampling_factor for _, _, n in results)
    ttfb_ms = float(np.median([r[0] for r in results])) * 1e3
    rtf = audio_s / float(np.median([r[1] for r in results]))
    print(json.dumps({
        "metric": "serving_e2e_per_stream_rtf",
        "value": round(rtf, 4),
        "unit": (f"x realtime/stream ({args.streams} concurrent TCP "
                 f"clients, {audio_s:.1f}s utterances, median TTFB "
                 f"{ttfb_ms:.0f} ms)"),
        "vs_baseline": round(rtf, 4),
    }))


def supervised_main():
    """Run the measurement in a killable child process with a deadline.

    This image's TPU tunnel occasionally wedges a client at backend init
    or on a remote compile — an in-process hang that no try/except can
    catch and that leaves the driver's bench run stuck.  The supervisor
    re-execs this script as a worker in its own process GROUP (a plain
    kill would orphan the hung python, and an orphaned client keeps the
    tunnel wedged for every later one), kills the group on deadline, and
    retries after a quiet backoff — measured wedges recover after a
    fully-quiet window.  QPNET_BENCH_NO_WATCHDOG=1 runs in-process;
    QPNET_BENCH_DEADLINE_S tunes the per-attempt deadline."""
    deadline = float(os.environ.get("QPNET_BENCH_DEADLINE_S", "1500"))
    live: list = []

    def _forward(signum, frame):
        # the worker runs in its own session: killing only this
        # supervisor would orphan a possibly-hung client, which keeps
        # the tunnel wedged for every later process — take the whole
        # group down with us
        for p in live:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        sys.exit(128 + signum)

    signal.signal(signal.SIGTERM, _forward)
    signal.signal(signal.SIGINT, _forward)
    for attempt in range(3):
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             *sys.argv[1:], "--_worker"],
            start_new_session=True)
        live[:] = [proc]
        try:
            rc = proc.wait(timeout=deadline)
            if rc == 0:
                return
            print(f"# bench attempt {attempt + 1} exited rc={rc}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt + 1} hit the {deadline:.0f}s "
                  "deadline (tunnel wedge?); killing the worker group",
                  file=sys.stderr, flush=True)
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
        if attempt < 2:
            quiet = float(os.environ.get(
                "QPNET_BENCH_BACKOFF_S", "60" if attempt == 0 else "480"))
            print(f"# quiet backoff {quiet:.0f}s before retry",
                  file=sys.stderr, flush=True)
            time.sleep(quiet)
    sys.exit(1)


def main():
    if "--_worker" in sys.argv:
        sys.argv.remove("--_worker")
    elif not os.environ.get("QPNET_BENCH_NO_WATCHDOG"):
        return supervised_main()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128,
                    help="decode batch (128 = throughput-optimal on v5e, "
                         "auto-split into two 64-slot kernel slices; the "
                         "reference's own default is 20, runQP.py:66)")
    ap.add_argument("--seconds", type=float, default=2.0,
                    help="audio seconds per utterance")
    ap.add_argument("--quick", action="store_true",
                    help="short run (0.5s utterances)")
    ap.add_argument("--fs", type=int, default=22050)
    ap.add_argument("--f0", type=float, default=120.0,
                    help="pitch of the synthetic aux track (drives the "
                         "adaptive dilation factor)")
    ap.add_argument("--mode", default="sampling",
                    choices=["sampling", "argmax"])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--quantize", default="none",
                choices=["none", "w8a8", "int8_weights"],
                help="w8a8: pallas dynamic int8; int8_weights: "
                     "XLA weight-only dequant")
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "pallas", "xla"])
    ap.add_argument("--network", default="default",
                    help="named network (default | Rd10Rr3Ed4Er1)")
    ap.add_argument("--latency", action="store_true",
                    help="serving-latency mode: StreamingGenerator "
                         "steady-state per-chunk wall latency and "
                         "realtime factor instead of batch throughput")
    ap.add_argument("--streams", type=int, default=1,
                    help="concurrent streams (batch) in --latency mode; "
                         "vs_baseline stays per-stream realtime factor")
    ap.add_argument("--serve", action="store_true",
                    help="end-to-end serving mode: --streams concurrent "
                         "TCP clients through StreamingService's "
                         "batching layer (serve.py); reports per-stream "
                         "realtime factor + TTFB")
    ap.add_argument("--first_chunk", type=int, default=0,
                    help="--serve mode: short first chunk in samples "
                         "(serve.py first_chunk_samples) — cuts TTFB")
    args = ap.parse_args()
    if args.quick:
        args.seconds = 0.5

    import jax
    import jax.numpy as jnp
    from qpnet_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from qpnet_tpu.config import ModelConfig
    from qpnet_tpu.models import init_params
    from qpnet_tpu.models.generate import batch_fast_generate

    cfg = ModelConfig.from_network_name(args.network)
    params = init_params(jax.random.PRNGKey(0), cfg)
    up = cfg.upsampling_factor
    if args.serve:
        return serve_bench(args, cfg, params)
    if args.latency:
        return latency_bench(args, cfg, params)
    B = args.batch
    F = int(args.seconds * args.fs) // up
    n_samples = F * up - 1
    rng = np.random.default_rng(0)
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    h[:, :, 1] = args.f0
    d_val = args.fs / (args.f0 * cfg.dense_factor)
    d = np.full((B, F * up), d_val, np.float32)
    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def run():
        return batch_fast_generate(
            params, cfg, x0, h, [n_samples] * B, d,
            seed=100, mode=args.mode, compute_dtype=dtype,
            quantize=args.quantize, engine=args.engine)

    # warm-up / compile — this environment's remote-compile service
    # occasionally 500s; retry a few times before giving up
    import time as _time
    for attempt in range(4):
        try:
            run()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 3:
                raise
            print(f"# warm-up attempt {attempt + 1} failed "
                  f"({type(e).__name__}); retrying", flush=True)
            _time.sleep(10)
    # best-of-3: wall-clock through the device tunnel is noisy
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    total = B * n_samples
    sps = total / dt
    target = args.fs * 50.0
    # MFU: every generated sample costs ~2 FLOP per matmul parameter
    # (the AR step is one full forward), so achieved = sps * 2 * params
    # against the v5e bf16 peak (197 Tbf16/s; int8 w8a8 runs at the
    # same MXU rate under Mosaic — measured, BENCH_NOTES.md round 2)
    n_params = sum(int(np.prod(np.shape(leaf)))
                   for leaf in jax.tree_util.tree_leaves(params))
    mfu = sps * 2.0 * n_params / 197e12
    print(json.dumps({
        "metric": "ar_synthesis_samples_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / target, 4),
        "mfu": round(mfu, 4),
        "params": n_params,
    }))


if __name__ == "__main__":
    main()
