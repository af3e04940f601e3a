"""Streaming synthesis server: serve a trained QPNet over TCP.

New TPU-native capability with no reference equivalent (the reference
decodes offline file batches only, src/bin/qpnet_decode.py:120-209):
loads a checkpoint + corpus stats, builds the feature frontend
(standardization + pitch-dependent dilation factors — the exact
`qpnet_decode` conditioning contract), and serves concurrent clients
through one batched `StreamingService` (see qpnet_tpu/serve.py: one v5e
chip holds ~64 realtime voice streams).

Clients send raw WORLD aux features and receive int16 PCM chunks as the
chip generates them; `qpnet_tpu.serve.request_stream` is the matching
client helper.

Example:
  python -m qpnet_tpu.bin.qpnet_serve \
      --config exp/.../model.conf --stats data/stats.h5 \
      --checkpoint exp/.../checkpoint-final.pkl --port 8765
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from qpnet_tpu.config import RunConfig
from qpnet_tpu.data.stats import load_scaler
from qpnet_tpu.ops import dilated_factor
from qpnet_tpu.utils import enable_compile_cache, set_loglevel


def get_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, type=str)
    parser.add_argument("--stats", required=True, type=str)
    parser.add_argument("--checkpoint", required=True, type=str)
    parser.add_argument("--host", default="0.0.0.0", type=str)
    parser.add_argument("--port", default=8765, type=int)
    parser.add_argument("--fs", default=22050, type=int)
    parser.add_argument("--f0_dim_index", default=1, type=int)
    parser.add_argument("--f0_factor", default=1.0, type=float)
    parser.add_argument("--maxd", default=32, type=int,
                        help="dilation-factor ceiling for the resident "
                             "kernel; requests above it are rejected")
    parser.add_argument("--max_streams", default=64, type=int,
                        help="largest concurrent batch one session "
                             "serves (64 = v5e VMEM-optimal)")
    parser.add_argument("--n_devices", default=1, type=int,
                        help="spread request groups over this many chips "
                             "(one pinned session pool per chip); "
                             "capacity scales to n_devices * max_streams "
                             "concurrent realtime streams")
    parser.add_argument("--gather_window_ms", default=50.0, type=float,
                        help="CAP on how long any request waits for "
                             "co-batchable traffic after it arrives")
    parser.add_argument("--gather_quiet_ms", default=None, type=float,
                        help="idle chips dispatch once no new request "
                             "arrived for this long (default: "
                             "gather_window_ms/10)")
    parser.add_argument("--chunk_samples", default=5500, type=int,
                        help="minimum samples per streamed chunk "
                             "(latency granularity; 5500 = 250 ms at "
                             "22.05 kHz)")
    parser.add_argument("--first_chunk_samples", default=0, type=int,
                        help=">0: each group's first chunk is this short "
                             "— time-to-first-audio drops roughly "
                             "proportionally (e.g. 1100 = 50 ms of audio "
                             "at 22.05 kHz) at the cost of one extra "
                             "compiled kernel")
    parser.add_argument("--mode", default="sampling",
                        choices=["sampling", "argmax"])
    parser.add_argument("--quantize", default="none",
                        choices=["none", "w8a8"],
                        help="w8a8 halves resident weight VMEM — required "
                             "to serve the deep Rd10Rr3Ed4Er1 network "
                             "(same tradeoff as qpnet_decode)")
    parser.add_argument("--noise_shaping", default=False,
                        action="store_true",
                        help="model was trained on noise-shaped targets "
                             "(run_FE.sh stage 4): apply the recipe's "
                             "noise-RESTORATION filter (differential "
                             "MLSA from the corpus mean mcep + 70 Hz "
                             "low-cut, reference noise_restored.py) to "
                             "each stream as it generates, with carried "
                             "filter state across chunks")
    parser.add_argument("--mcep_dim_start", default=2, type=int)
    parser.add_argument("--mcep_dim_end", default=27, type=int)
    parser.add_argument("--mcep_alpha", default=0.41, type=float)
    parser.add_argument("--mag", default=0.5, type=float)
    parser.add_argument("--shiftms", default=5.0, type=float)
    parser.add_argument("--prewarm", default=None, type=str,
                        help="comma-separated group sizes whose session "
                             "kernels compile BEFORE the socket opens "
                             "(e.g. '1,8,64'; sizes round up to pow2 "
                             "buckets).  With the on-disk compile cache "
                             "a warm start is seconds; without it the "
                             "first request would pay the compile")
    parser.add_argument("--max_pending", default=None, type=int,
                        help="back-pressure: reject new requests once "
                             "this many are queued (default unbounded)")
    parser.add_argument("--seed", default=100, type=int)
    parser.add_argument("--verbose", default=1, type=int)
    parser.add_argument("--interpret", default=False,
                        action="store_true",
                        help="debug: run the generation kernel in pallas "
                             "interpret mode (CPU)")
    return parser.parse_args(argv)


def make_frontend(scaler, args, cfg):
    """Raw aux features (F, n_aux) float64 -> (standardized h, frame-rate
    d), matching bin/qpnet_decode.py's conditioning exactly."""

    def frontend(feats: np.ndarray):
        feats = np.array(feats, np.float64)
        feats[:, args.f0_dim_index] *= args.f0_factor
        d = dilated_factor(
            np.ascontiguousarray(feats[:, args.f0_dim_index]),
            args.fs, cfg.dense_factor)
        h = scaler.transform(feats)
        return h.astype(np.float32), d.astype(np.float32)

    return frontend


def main(argv=None):
    args = get_arguments(argv)
    set_loglevel(args.verbose)
    enable_compile_cache()
    for key, value in vars(args).items():
        logging.info("%s = %s", key, str(value))

    run_cfg = RunConfig.load(args.config)
    cfg = run_cfg.model

    import jax
    import jax.numpy as jnp
    from qpnet_tpu.serve import StreamingService, StreamServer
    from qpnet_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.checkpoint)
    params = jax.tree_util.tree_map(jnp.asarray, ckpt["model"])
    scaler = load_scaler(args.stats, run_cfg.feature_type)

    devices = None
    if args.n_devices > 1:
        devices = jax.devices()[: args.n_devices]
        if len(devices) < args.n_devices:
            raise SystemExit(
                f"--n_devices {args.n_devices} > available "
                f"{len(jax.devices())}")
        logging.info("serving over %d devices", len(devices))

    postfilter_factory = None
    if args.noise_shaping:
        from qpnet_tpu.dsp.emphasis import (StreamingEmphasizer,
                                            emphasis_coefs)
        coefs = emphasis_coefs(args.stats, run_cfg.feature_type,
                               args.mcep_dim_start, args.mcep_dim_end,
                               args.mag, invert=False)
        postfilter_factory = lambda: StreamingEmphasizer(  # noqa: E731
            args.fs, coefs, args.mcep_alpha, shiftms=args.shiftms)
        logging.info("noise restoration filter enabled "
                     "(mcep[%d:%d], mag %.2f, alpha %.3f)",
                     args.mcep_dim_start, args.mcep_dim_end,
                     args.mag, args.mcep_alpha)

    service = StreamingService(
        params, cfg, max_streams=args.max_streams, maxd=args.maxd,
        gather_window_s=args.gather_window_ms / 1000.0,
        gather_quiet_s=(None if args.gather_quiet_ms is None
                        else args.gather_quiet_ms / 1000.0),
        mode=args.mode, seed=args.seed,
        min_chunk_samples=args.chunk_samples,
        first_chunk_samples=args.first_chunk_samples,
        interpret=args.interpret, quantize=args.quantize,
        frontend=make_frontend(scaler, args, cfg), devices=devices,
        max_pending=args.max_pending,
        postfilter_factory=postfilter_factory)
    if args.prewarm:
        buckets = [int(b) for b in args.prewarm.split(",")]
        logging.info("prewarming session buckets %s ...", buckets)
        service.prewarm(buckets)
        logging.info("prewarm done")
    server = StreamServer(service, args.host, args.port)
    logging.info("serving on %s:%d (max %d streams/session, %d-sample "
                 "chunks)", *server.server_address[:2], args.max_streams,
                 service.min_chunk_samples)
    import signal
    import threading

    def _term(signum, frame):
        # SIGTERM (orchestrators' stop signal): stop accepting, then
        # close the service — which drains already-queued groups so
        # in-flight clients get their full streams before exit
        logging.info("SIGTERM: draining in-flight streams")
        raise KeyboardInterrupt

    if threading.current_thread() is threading.main_thread():
        signal.signal(signal.SIGTERM, _term)    # signals are main-thread-only
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logging.info("shutting down")
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
