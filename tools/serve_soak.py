"""Sustained serving soak: N concurrent TCP streams for M minutes.

The serving layer's event-level behavior (batching, cancellation,
backpressure, disconnects) is unit-tested in tests/test_serve.py, but a
production claim needs a time axis: this tool runs a closed-loop load —
each of `--streams` clients requests utterance after utterance for
`--minutes` — and samples process RSS, open file descriptors, service
queue depth, and per-chunk latency over time.  Pass criteria: every
request completes with the right sample count, no error sentinels, and
neither RSS nor fd count grows monotonically between the first and last
thirds of the run (leak detection).

CPU-sized models make this a CI-able soak (tests/test_serve_soak.py
runs a shortened one); full-duration chip runs are recorded in
BENCH_NOTES.md.

usage: python tools/serve_soak.py [--minutes 10] [--streams 64]
         [--seconds 2.0] [--tiny] [--json out.json]
"""

import argparse
import faulthandler
import json
import os
import resource
import signal
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# kill -USR1 <pid> dumps all thread stacks — the first diagnosis step
# when the run sits silent (this image's TPU tunnel occasionally hangs a
# worker at backend init or on a long remote compile)
faulthandler.register(signal.SIGUSR1)


def count_fds() -> int:
    try:
        return len(os.listdir("/proc/self/fd"))
    except OSError:
        return -1


def rss_mib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def current_rss_mib() -> float:
    """Actual current RSS (ru_maxrss is a high-water mark, useless for
    detecting growth over time)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def run_soak(minutes: float, streams: int, seconds: float,
             tiny: bool = False, fs: int = 22050, f0: float = 120.0,
             quantize: str = "none", network: str = "default",
             gather_window_s: float = 0.25,
             sample_every_s: float = 5.0, verbose: bool = True) -> dict:
    if tiny:
        # tiny = local CPU soak: must not grab the chip.  This image's
        # TPU plugin overrides JAX_PLATFORMS at interpreter start, so
        # force it back through jax.config (see tests/conftest.py).
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from qpnet_tpu.config import ModelConfig
    from qpnet_tpu.models.qpnet import init_params
    from qpnet_tpu.serve import (StreamingService, request_stream,
                                 serve_tcp)

    if tiny:
        cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                          dilationF_depth=3, dilationF_repeat=1,
                          dilationA_depth=2, dilationA_repeat=1,
                          kernel_size=2, upsampling_factor=10,
                          dense_factor=8)
        fs = 1000
    else:
        cfg = ModelConfig.from_network_name(network)
    if verbose:
        print(f"# init: platform probe (pid {os.getpid()})", flush=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    if verbose:
        print(f"# init: devices={jax.devices()}", flush=True)

    svc = StreamingService(params, cfg, max_streams=min(streams, 64),
                           maxd=32, gather_window_s=gather_window_s,
                           mode="sampling", seed=100,
                           interpret=interpret,
                           quantize=quantize,
                           max_pending=4 * streams)
    srv = serve_tcp(svc, port=0)
    addr = srv.server_address

    # Compile the serving session for the full-load bucket BEFORE clients
    # start: the soak measures sustained serving, not kernel compile, and
    # an un-prewarmed first group pays the whole compile inside
    # _run_group where the progress output shows nothing but flat
    # zero-completion samples (through this image's TPU tunnel that can
    # be many minutes — indistinguishable from a hang without this).
    if verbose:
        print(f"# init: prewarming session bucket for {streams} streams "
              "(compile; warm via on-disk cache)", flush=True)
    t_pw = time.time()
    # full-load bucket + the half-load one (partial gather windows route
    # there); smaller buckets only appear during shutdown drain
    svc.prewarm([streams] + ([streams // 2] if streams > 1 else []))
    prewarm_s = round(time.time() - t_pw, 1)
    if verbose:
        print(f"# init: prewarm done in {prewarm_s}s", flush=True)

    rng = np.random.default_rng(0)
    F = max(2, int(seconds * fs) // cfg.upsampling_factor)
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    h[:, 1] = f0
    d = np.full(F, fs / (f0 * cfg.dense_factor), np.float32)
    n_expect = F * cfg.upsampling_factor

    stop = threading.Event()
    errors: list = []
    chunk_lat: list = []        # (t_wall, latency) samples
    completions = [0]
    lock = threading.Lock()

    def client(idx: int):
        while not stop.is_set():
            try:
                t_prev = time.perf_counter()
                n = 0
                for chunk in request_stream(addr, h, d):
                    now = time.perf_counter()
                    with lock:
                        chunk_lat.append((time.time(), now - t_prev))
                    t_prev = now
                    n += len(chunk)
                if n != n_expect:
                    with lock:
                        errors.append(f"client {idx}: {n} != {n_expect}")
                    return
                with lock:
                    completions[0] += 1
            except Exception as e:  # noqa: BLE001
                if stop.is_set():
                    return
                with lock:
                    errors.append(f"client {idx}: {type(e).__name__} {e}")
                return

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(streams)]
    t_start = time.time()
    for t in threads:
        t.start()

    samples = []
    deadline = t_start + minutes * 60.0
    while time.time() < deadline and not errors:
        time.sleep(min(sample_every_s, max(0.1, deadline - time.time())))
        s = {"t": round(time.time() - t_start, 1),
             "rss_mib": round(current_rss_mib(), 1),
             "fds": count_fds(),
             "pending": len(svc._pending),
             "done": svc.stats["streams_done"],
             "completions": completions[0]}
        samples.append(s)
        if verbose:
            print(json.dumps(s), flush=True)
    stop.set()
    # let in-flight utterances finish, then tear down
    for t in threads:
        t.join(timeout=60)
    srv.shutdown()
    svc.close()

    lat = np.asarray([l for _, l in chunk_lat[1:]]) if len(chunk_lat) > 1 \
        else np.asarray([0.0])
    third = max(1, len(samples) // 3)
    first_t, last_t = samples[:third], samples[-third:]
    rss_growth = (np.median([s["rss_mib"] for s in last_t])
                  - np.median([s["rss_mib"] for s in first_t]))
    fd_growth = (np.median([s["fds"] for s in last_t])
                 - np.median([s["fds"] for s in first_t]))
    # per-chunk latency stability: median of the last third vs first
    n3 = max(1, len(lat) // 3)
    lat_drift = float(np.median(lat[-n3:]) / max(np.median(lat[:n3]),
                                                 1e-9))
    out = {
        "minutes": minutes, "streams": streams,
        "utterance_s": n_expect / fs,
        "prewarm_s": prewarm_s,
        "completions": completions[0],
        "errors": errors[:5],
        "rss_mib_first_third": round(float(np.median(
            [s["rss_mib"] for s in first_t])), 1),
        "rss_mib_last_third": round(float(np.median(
            [s["rss_mib"] for s in last_t])), 1),
        "rss_growth_mib": round(float(rss_growth), 1),
        "fd_growth": int(fd_growth),
        "pending_final": samples[-1]["pending"] if samples else -1,
        "chunk_latency_ms_median": round(float(np.median(lat)) * 1e3, 1),
        "chunk_latency_ms_p99": round(float(np.percentile(lat, 99)) * 1e3,
                                      1),
        "chunk_latency_drift": round(lat_drift, 3),
        # bool(): rss_growth is a numpy scalar and np.bool_ is not JSON
        # serializable — the chip run died at json.dumps without this
        "ok": bool(not errors and completions[0] > 0
                   and fd_growth <= 4
                   and rss_growth < 64.0
                   and lat_drift < 1.5),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--fs", type=int, default=22050)
    ap.add_argument("--f0", type=float, default=120.0)
    ap.add_argument("--network", default="default")
    ap.add_argument("--quantize", default="none")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-sized model (local soak without a chip)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    from qpnet_tpu.utils.jax_cache import enable_compile_cache
    enable_compile_cache()
    out = run_soak(args.minutes, args.streams, args.seconds,
                   tiny=args.tiny, fs=args.fs, f0=args.f0,
                   quantize=args.quantize, network=args.network)
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
