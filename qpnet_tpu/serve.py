"""Streaming synthesis serving: batch concurrent requests into one kernel.

The AR kernel's per-chunk latency is strongly sub-additive in the number
of streams (bench.py --latency --streams on v5e: 89 ms/chunk at 1
stream, 186 ms at 64 — one chip holds 64 realtime voice streams), so a
production front end should BATCH concurrent utterances into one
StreamingGenerator session rather than running one session per client.
This module is that batching layer:

  * `StreamingService.submit(h, d)` enqueues one utterance's
    conditioning (frame-rate aux features + dilation factors, the same
    contract as `bin/qpnet_decode`) and returns a `StreamHandle` whose
    `chunks()` iterator yields mu-law sample chunks as the chip
    generates them;
  * a scheduler thread (one per chip) gathers co-batchable requests —
    dispatching as soon as arrivals go quiet (`gather_quiet_s`), the
    group is full, or the oldest request has waited `gather_window_s` —
    groups up to `max_streams` of them, pads the group's batch to a
    power of two
    (so distinct jit keys stay O(log max_streams)), and streams the
    whole group through ONE session — per-stream conditioning shorter
    than the group's longest is padded by repeating its last frame and
    the output is trimmed to each utterance's true length;
  * `serve_tcp()` exposes the service over a minimal length-prefixed TCP
    protocol (one connection per utterance, int16 PCM chunks back) for
    clients outside the process.

The reference has no serving path (decode is offline file batches,
reference src/bin/qpnet_decode.py:120-183); the synthesis semantics here
are exactly `StreamingGenerator`'s, which is bit-exact vs one-shot
decoding (tests/test_streaming.py).
"""

from __future__ import annotations

import json
import logging
import queue
import socket
import socketserver
import struct
import threading
import time
from typing import List, Optional

from typing import Callable, Tuple

import numpy as np

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models.generate import StreamingGenerator
from qpnet_tpu.ops.mulaw import decode_mu_law


class StreamHandle:
    """Per-request output stream: an iterator of (n,) int32 mu-law chunks."""

    def __init__(self, n_samples: int):
        self.n_samples = n_samples
        self._q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue()
        self.error: Optional[Exception] = None
        self._cancelled = threading.Event()

    @property
    def cancelled(self) -> bool:
        return self._cancelled.is_set()

    def cancel(self):
        """Abandon the stream (e.g. the client disconnected).  The
        scheduler stops emitting chunks for it, and once every stream in
        its group is cancelled or complete the group's kernel loop stops
        early — cancellation returns real chip time, not just queue
        space.  Safe from any thread, idempotent, and valid at any
        stage (pending requests are dropped before ever being grouped)."""
        self._cancelled.set()
        self._q.put(None)                            # unblock a reader

    def chunks(self):
        while True:
            if self.cancelled:
                return
            item = self._q.get()
            if item is None:
                if self.error is not None:
                    raise self.error
                return
            yield item

    def samples(self) -> np.ndarray:
        """Convenience: block until done, return the full utterance."""
        return np.concatenate(list(self.chunks()))


class _Request:
    def __init__(self, h: np.ndarray, d: np.ndarray, up: int):
        self.h = np.asarray(h, np.float32)          # (F, n_aux)
        self.d = np.asarray(d, np.float32)          # (F,)
        self.handle = StreamHandle(self.h.shape[0] * up)
        self.t_arrival = time.monotonic()


class StreamingService:
    """Batched streaming synthesis over one model.

    params/cfg: the model (e.g. a converted released checkpoint).
    max_streams: largest batch one session serves (64 = the v5e
    VMEM-optimal kernel batch).  gather_window_s: the CAP on how long
    any request waits for co-batchable traffic; an idle chip actually
    dispatches once arrivals stop for gather_quiet_s (default
    window/10) — the latency/throughput knob.  maxd: dilation-factor
    bucket; submit()
    rejects conditioning above it (same contract as StreamingGenerator).
    devices: chips to spread groups over (e.g. jax.devices()); each gets
    its own scheduler worker with sessions pinned to it, multiplying
    capacity by len(devices).  None = one worker on the default device.
    """

    def __init__(self, params, cfg: ModelConfig, max_streams: int = 64,
                 maxd: int = 32, gather_window_s: float = 0.05,
                 gather_quiet_s: Optional[float] = None,
                 mode: str = "sampling", seed: int = 100,
                 min_chunk_samples: int = 5500,
                 first_chunk_samples: int = 0, interpret: bool = False,
                 quantize: str = "none",
                 frontend: Optional[Callable[
                     [np.ndarray], Tuple[np.ndarray, np.ndarray]]] = None,
                 devices: Optional[List] = None,
                 max_pending: Optional[int] = None,
                 postfilter_factory: Optional[Callable[[], object]] = None):
        self.params, self.cfg = params, cfg
        self.frontend = frontend
        # factory returning a per-stream stateful post-filter with a
        # .process(float_wav_chunk) method, applied by the TCP handler
        # after mu-law decoding (e.g. dsp.emphasis.StreamingEmphasizer —
        # the recipe's noise-restoration filter, applied while streaming)
        self.postfilter_factory = postfilter_factory
        self.quantize = quantize
        self.max_streams = max_streams
        self.maxd, self.mode, self.seed = maxd, mode, seed
        self.gather_window_s = gather_window_s
        # adaptive gather: an idle chip dispatches once arrivals go
        # QUIET for this long (default window/10) instead of always
        # sitting out the full window — a lone low-load request or a
        # tight burst starts ~window earlier, while staggered arrivals
        # still batch up to the window cap.  Set explicitly to tune;
        # gather_window_s remains the hard cap on any request's wait
        # for co-batchable traffic.
        self.gather_quiet_s = (gather_quiet_s if gather_quiet_s is not None
                               else gather_window_s / 10.0)
        self._last_arrival = 0.0
        self.min_chunk_samples = min_chunk_samples
        # >0: each group's FIRST chunk is this short (rounded up to whole
        # frames) — time-to-first-audio drops roughly proportionally, at
        # the cost of one extra jit key (feeds of any whole-frame length
        # continue exactly; see StreamingGenerator.feed)
        self.first_chunk_samples = first_chunk_samples
        self.interpret = interpret
        # back-pressure: submit() rejects once this many requests are
        # queued (None = unbounded — fine in-process, set it for servers)
        self.max_pending = max_pending
        self._pending: List[_Request] = []
        self._cv = threading.Condition()
        self._closed = False
        self._groups = 0
        # observability: kernel feeds run / streams fully served /
        # streams cancelled (read them for capacity dashboards; tests
        # use feeds to assert early group termination)
        self.stats = {"groups": 0, "feeds": 0, "streams_done": 0,
                      "streams_cancelled": 0}
        # one scheduler worker per chip: each pins its sessions to its
        # device (StreamingGenerator device=), so a pod slice serves
        # len(devices) groups concurrently off one shared request queue.
        # Session maps (B bucket -> pinned session) live on the service
        # so prewarm() can populate them before traffic arrives.
        self._devices = list(devices) if devices else [None]
        self._sessions: List[dict] = [{} for _ in self._devices]
        self._threads = [
            threading.Thread(target=self._scheduler, args=(dev, sess_map),
                             daemon=True)
            for dev, sess_map in zip(self._devices, self._sessions)]
        for t in self._threads:
            t.start()

    def _make_session(self, B: int, device) -> StreamingGenerator:
        return StreamingGenerator(
            self.params, self.cfg, B=B, maxd=self.maxd, seed=self.seed,
            mode=self.mode, min_chunk_samples=self.min_chunk_samples,
            interpret=self.interpret, quantize=self.quantize,
            device=device)

    def prewarm(self, buckets: Optional[List[int]] = None):
        """Build (and thereby compile) the sessions for the given batch
        buckets up front, so the first real request doesn't pay the
        kernel compile.  `buckets` are request-group sizes; each is
        rounded up to its power-of-two session bucket (default: just
        `max_streams`).  Runs on the calling thread; with the on-disk
        compile cache (utils/jax_cache.py) a warm process start is
        seconds.  Sessions are handed to the scheduler workers, one set
        per device."""
        up = self.cfg.upsampling_factor
        sizes = sorted({1 << (max(1, b) - 1).bit_length()
                        for b in (buckets or [self.max_streams])})
        for sess_map, device in zip(self._sessions, self._devices):
            for B in sizes:
                if B in sess_map:
                    continue
                sess = self._make_session(B, device)
                # compile exactly the schedule shapes _run_group uses:
                # the short first chunk (if configured), then nominal
                shapes = [sess.chunk_frames]
                if self.first_chunk_samples > 0:
                    shapes.insert(0, max(1, -(-self.first_chunk_samples
                                              // up)))
                for F in shapes:
                    sess.feed(np.zeros((B, F, self.cfg.n_aux), np.float32),
                              np.ones((B, F), np.float32))
                sess_map[B] = sess

    def submit(self, h: np.ndarray, d: np.ndarray) -> StreamHandle:
        """h: (F, n_aux) standardized aux frames; d: (F,) dilation
        factors (already F0-scaled as in qpnet_decode).  Returns the
        output handle immediately.  Raises RuntimeError when the
        service is closed or `max_pending` requests are already queued
        (back-pressure: the caller should retry or shed load)."""
        h = np.asarray(h, np.float32)
        d = np.asarray(d, np.float32)
        if h.ndim != 2 or h.shape[1] != self.cfg.n_aux:
            raise ValueError(f"h must be (F, {self.cfg.n_aux}), "
                             f"got {h.shape}")
        if h.shape[0] == 0:
            # an empty utterance inside a group would index h[-1] when
            # padding the batch block — reject it at the door instead
            raise ValueError("empty conditioning (0 frames)")
        if d.shape != (h.shape[0],):
            raise ValueError(f"d must be ({h.shape[0]},), got {d.shape}")
        if float(d.max(initial=0.0)) > self.maxd:
            raise ValueError(f"dilation factor {float(d.max()):.1f} exceeds "
                             f"the service maxd={self.maxd}")
        req = _Request(h, d, self.cfg.upsampling_factor)
        with self._cv:
            if self._closed:
                raise RuntimeError("service is closed")
            if (self.max_pending is not None
                    and len(self._pending) >= self.max_pending):
                raise RuntimeError(
                    f"service overloaded: {len(self._pending)} requests "
                    f"already queued (max_pending={self.max_pending})")
            req.t_arrival = time.monotonic()
            self._last_arrival = req.t_arrival
            self._pending.append(req)
            self._cv.notify()
        return req.handle

    def submit_raw(self, feats: np.ndarray) -> StreamHandle:
        """Submit UNSTANDARDIZED aux features (F, n_aux) — the h5 contract
        of `bin/qpnet_decode`.  The service's `frontend` (e.g. built by
        `bin/qpnet_serve` from the corpus stats + dilation config) maps
        them to (standardized h, frame-rate d)."""
        if self.frontend is None:
            raise RuntimeError(
                "service has no feature frontend; construct it with "
                "frontend= or submit standardized (h, d) via submit()")
        h, d = self.frontend(np.asarray(feats, np.float64))
        return self.submit(h, d)

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        for t in self._threads:
            t.join()

    # ---- scheduler ----

    def _take_group(self) -> Optional[List[_Request]]:
        with self._cv:
            # Idle-aware adaptive gather.  This thread being here means
            # its chip is idle; dispatch the moment further waiting
            # stops buying batching:
            #   * the group is full (max_streams pending), or
            #   * arrivals went quiet (no new request for
            #     gather_quiet_s — a lone request or a finished burst
            #     is not going to grow by waiting longer), or
            #   * the OLDEST pending request has waited the full
            #     gather_window_s (the latency cap; a backlog that aged
            #     while every chip was busy dispatches immediately on
            #     the first chip to free up), or
            #   * the service is closing (drain).
            # Multiple scheduler threads (one per chip) race on the
            # shared queue under this lock, so re-check emptiness after
            # every wait — a peer may have taken everything.
            while True:
                while not self._pending and not self._closed:
                    self._cv.wait()
                if not self._pending:
                    return None                       # closed and drained
                if self._closed or len(self._pending) >= self.max_streams:
                    break
                now = time.monotonic()
                deadline = min(
                    self._pending[0].t_arrival + self.gather_window_s,
                    self._last_arrival + self.gather_quiet_s)
                if deadline <= now:
                    break
                self._cv.wait(deadline - now)
            # requests cancelled while queued never reach a kernel
            live = [r for r in self._pending if not r.handle.cancelled]
            self.stats["streams_cancelled"] += (len(self._pending)
                                                - len(live))
            self._pending = live
            group = self._pending[: self.max_streams]
            del self._pending[: len(group)]
            return group

    def _scheduler(self, device, sessions):
        while True:
            group = self._take_group()
            if group is None:
                return
            if not group:                            # all arrivals cancelled
                continue
            try:
                self._run_group(group, sessions, device)
            except Exception as e:  # noqa: BLE001 — report to all clients
                logging.exception("stream group failed")
                for req in group:
                    req.handle.error = e
                    req.handle._q.put(None)

    def _run_group(self, group: List[_Request], sessions, device):
        cfg = self.cfg
        up = cfg.upsampling_factor
        B_real = len(group)
        B = 1 << (B_real - 1).bit_length()          # pow2 bucket: few jit keys
        with self._cv:
            gidx = self._groups
            self._groups += 1
        sess = sessions.get(B)
        if sess is None:
            sess = self._make_session(B, device)
            sessions[B] = sess
        # reuse the packed weights + compiled kernel (possibly built by
        # prewarm()); fresh ring state and a per-group seed (traced — no
        # recompile)
        sess.reset(seed=self.seed + gidx)
        Fc = sess.chunk_frames
        F_max = max(r.h.shape[0] for r in group)
        # chunk schedule: an optional short first chunk (time-to-first-
        # audio), then nominal chunks
        schedule = []
        if self.first_chunk_samples > 0:
            schedule.append(min(F_max, max(1, -(-self.first_chunk_samples
                                               // up))))
        start = sum(schedule)
        while start < F_max:
            schedule.append(Fc)                      # full chunks only: the
            start += Fc                              # jit key count stays 2
        done = [0] * B_real                          # samples emitted so far
        start = 0
        with self._cv:
            self.stats["groups"] += 1
        for L in schedule:
            # early group termination: once every stream is complete or
            # cancelled, the remaining schedule is pure padding — stop
            # the kernel loop and hand the chip back
            if all(r.handle.cancelled or done[i] >= r.handle.n_samples
                   for i, r in enumerate(group)):
                break
            h_blk = np.zeros((B, L, cfg.n_aux), np.float32)
            d_blk = np.ones((B, L), np.float32)
            for i, r in enumerate(group):
                sl = r.h[start: start + L]
                h_blk[i, : len(sl)] = sl
                d_blk[i, : len(sl)] = r.d[start: start + L]
                if len(sl) < L and len(sl) > 0:
                    h_blk[i, len(sl):] = sl[-1]      # repeat-last padding
                    d_blk[i, len(sl):] = r.d[start + len(sl) - 1]
                elif len(sl) == 0:                   # stream already done
                    h_blk[i] = r.h[-1]
                    d_blk[i] = r.d[-1]
            out = sess.feed(h_blk, d_blk)            # (B, L*up) int32
            start += L
            with self._cv:
                self.stats["feeds"] += 1
            for i, r in enumerate(group):
                if r.handle.cancelled:
                    continue
                take = min(r.handle.n_samples - done[i], out.shape[1])
                if take > 0:
                    r.handle._q.put(out[i, :take].copy())
                    done[i] += take
        with self._cv:
            for i, r in enumerate(group):
                if r.handle.cancelled:
                    self.stats["streams_cancelled"] += 1
                else:
                    self.stats["streams_done"] += 1
        for r in group:
            r.handle._q.put(None)


# ---------------------------------------------------------------------------
# TCP transport
# ---------------------------------------------------------------------------
#
# Wire protocol (one utterance per connection):
#   client -> server: one JSON line {"frames": F} + F*n_aux f32 (h) +
#                     F f32 (d), little-endian.  With {"frames": F,
#                     "raw": true} the payload is just F*n_aux f32 of
#                     UNSTANDARDIZED aux features and the server's
#                     frontend derives (h, d) — the qpnet_decode h5
#                     contract over the wire.
#   server -> client: repeated [u32 n][n x int16 PCM]; n=0 terminates.
#                     On a rejected request the server sends the
#                     sentinel u32 0xFFFFFFFF followed by one JSON line
#                     {"error": ...} instead of any chunk.
#   health/stats:     a header of {"stats": true} (no payload) gets one
#                     JSON line back — {"ok": true, "pending": N,
#                     "devices": D, ...service counters} — and the
#                     connection closes.  This is the load-balancer
#                     health probe and the capacity-dashboard feed.


_ERR_SENTINEL = 0xFFFFFFFF


def _read_exact(rfile, n: int, what: str = "client closed mid-message"
                ) -> bytes:
    """Exact read through a BUFFERED rfile (a prior readline may already
    hold payload bytes in its buffer, so reading the raw socket here
    would deadlock).  Raises ConnectionError(`what`) on a short read."""
    buf = rfile.read(n)
    if len(buf) != n:
        raise ConnectionError(what)
    return buf


# sanity cap on the per-request frame count the TCP server will size
# reads for (~2.8 h of audio at 5 ms frames); a negative or absurd count
# must be rejected BEFORE the handler blocks reading a payload that will
# never arrive
_MAX_WIRE_FRAMES = 2_000_000

# cap on any newline-terminated JSON line on the wire (headers, stats
# bodies, error bodies are all well under 1 KiB) — a peer that streams
# bytes with no newline must not make readline() buffer them unboundedly
_MAX_WIRE_LINE = 1 << 16


def _read_json_line(rfile, what: str) -> dict:
    """Read one bounded, newline-terminated JSON line."""
    line = rfile.readline(_MAX_WIRE_LINE)
    if not line.endswith(b"\n"):
        if len(line) >= _MAX_WIRE_LINE:
            raise ValueError(f"{what} line exceeds {_MAX_WIRE_LINE} bytes")
        raise ConnectionError(f"connection closed mid-{what}")
    return json.loads(line)


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        svc: StreamingService = self.server.service  # type: ignore[attr-defined]
        cfg = svc.cfg
        try:
            header = _read_json_line(self.rfile, "header")
            if header.get("stats"):
                with svc._cv:
                    body = {"ok": not svc._closed,
                            "pending": len(svc._pending),
                            "devices": len(svc._devices),
                            "max_streams": svc.max_streams,
                            **svc.stats}
                self.wfile.write((json.dumps(body) + "\n").encode())
                return
            F = int(header["frames"])
            if not 0 < F <= _MAX_WIRE_FRAMES:
                raise ValueError(f"frames must be in (0, "
                                 f"{_MAX_WIRE_FRAMES}], got {F}")
            feats = np.frombuffer(
                _read_exact(self.rfile, 4 * F * cfg.n_aux),
                "<f4").reshape(F, cfg.n_aux)
            if header.get("raw"):
                handle = svc.submit_raw(feats)
            else:
                d = np.frombuffer(_read_exact(self.rfile, 4 * F), "<f4")
                handle = svc.submit(feats, d)
        except Exception as e:  # noqa: BLE001
            try:
                self.wfile.write(
                    struct.pack("<I", _ERR_SENTINEL)
                    + (json.dumps({"error": str(e)}) + "\n").encode())
            except OSError:
                pass                                 # client already gone
            return
        postfilter = (svc.postfilter_factory()
                      if svc.postfilter_factory else None)
        try:
            for chunk in handle.chunks():
                wav = decode_mu_law(chunk, cfg.n_quantize)
                if postfilter is not None:           # e.g. noise restore
                    wav = postfilter.process(wav)
                pcm = np.clip(wav * 32768,
                              -32768, 32767).astype("<i2")
                self.wfile.write(struct.pack("<I", len(pcm)) + pcm.tobytes())
            self.wfile.write(struct.pack("<I", 0))
        except OSError:
            # Client hung up mid-stream: cancel so the scheduler stops
            # generating for this stream (and stops the whole group's
            # kernel loop once no live stream remains).
            handle.cancel()


class StreamServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True
    # a burst of max_streams simultaneous connects must not overflow the
    # listen backlog (the stdlib default of 5 drops clients with RST)
    request_queue_size = 128

    def __init__(self, service: StreamingService, host: str = "127.0.0.1",
                 port: int = 0):
        super().__init__((host, port), _Handler)
        self.service = service


def serve_tcp(service: StreamingService, host: str = "127.0.0.1",
              port: int = 8765) -> StreamServer:
    """Start the TCP front end in a daemon thread; returns the server
    (use .server_address for the bound port, .shutdown() to stop)."""
    srv = StreamServer(service, host, port)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def request_stats(address) -> dict:
    """Client helper: the {"stats": true} health probe — returns the
    server's JSON status ({"ok", "pending", "devices", ...counters}).
    Raises RuntimeError with the server's error body if the server
    rejected the probe (it replies with the 0xFFFFFFFF sentinel + a JSON
    error line, mirroring request_stream — without the peek the client
    would die on an opaque JSONDecodeError instead)."""
    with socket.create_connection(address) as s:
        s.sendall(json.dumps({"stats": True}).encode() + b"\n")
        rfile = s.makefile("rb")
        head = _read_exact(rfile, 4, "server closed mid-stats")
        if struct.unpack("<I", head)[0] == _ERR_SENTINEL:
            raise RuntimeError(_read_json_line(rfile, "error")["error"])
        line = head + rfile.readline(_MAX_WIRE_LINE - 4)
        if not line.endswith(b"\n"):
            raise ConnectionError("connection closed mid-stats")
        return json.loads(line)


def request_stream(address, h: np.ndarray, d: Optional[np.ndarray] = None):
    """Client helper: send one utterance, yield int16 PCM chunks.

    With `d` given, `h` is standardized conditioning (the submit()
    contract); without, `h` is raw aux features sent with "raw": true
    for the server frontend.  Raises RuntimeError on a server-side
    rejection."""
    h = np.ascontiguousarray(h, "<f4")
    header = {"frames": int(h.shape[0])}
    payload = h.tobytes()
    if d is None:
        header["raw"] = True
    else:
        payload += np.ascontiguousarray(d, "<f4").tobytes()
    with socket.create_connection(address) as s:
        s.sendall(json.dumps(header).encode() + b"\n" + payload)
        rfile = s.makefile("rb")
        while True:
            hdr = _read_exact(rfile, 4, "server closed mid-stream")
            n = struct.unpack("<I", hdr)[0]
            if n == _ERR_SENTINEL:
                raise RuntimeError(
                    _read_json_line(rfile, "error")["error"])
            if n == 0:
                return
            yield np.frombuffer(
                _read_exact(rfile, 2 * n, "server closed mid-chunk"),
                "<i2")
