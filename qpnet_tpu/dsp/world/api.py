"""High-level analysis/synthesis API mirroring the surface the reference
uses from sprocket (FeatureExtractor / Synthesizer; SURVEY.md §2.2), so the
bin/ workloads stay thin.

WorldAnalyzer.analyze(x) -> (f0, spc, ap)    [dio+stonemask, cheaptrick, d4c]
           .mcep(dim, alpha)                 [sp2mc of the envelope]
           .codeap()                         [band aperiodicity, dB]
           .npow()                           [normalized frame power, dB]
WorldSynthesizer.synthesis(f0, mcep, ap, alpha)   [mc2sp -> synthesize]
                .synthesis_diff(x, diffmcep, alpha) [MLSA filtering]
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from qpnet_tpu.dsp.mcep import sp2mc, mc2sp, spectrogram2npow
from qpnet_tpu.dsp.mlsa import synthesis_diff as _mlsa_synthesis_diff
from qpnet_tpu.dsp.world.cheaptrick import cheaptrick
from qpnet_tpu.dsp.world.codec import code_aperiodicity
from qpnet_tpu.dsp.world.d4c import d4c
from qpnet_tpu.dsp.world.dio import dio
from qpnet_tpu.dsp.world.harvest import harvest
from qpnet_tpu.dsp.world.stonemask import stonemask
from qpnet_tpu.dsp.world.synthesis import synthesize


def _bucket_pad_signal(x: np.ndarray, fs: int) -> Tuple[np.ndarray, int]:
    """Zero-pad to a whole-second bucket as float32: (x32, n_valid).

    Both the device F0 and the device spectral stages pad with THIS ONE
    helper so their jits share compile signatures per duration bucket."""
    n = len(x)
    secs = max(1, -(-n // fs))
    x32 = np.zeros(secs * fs, np.float32)
    x32[:n] = x
    return x32, n


class WorldAnalyzer:
    def __init__(self, fs: int = 22050, shiftms: float = 5.0,
                 minf0: float = 40.0, maxf0: float = 800.0,
                 fftl: int = 1024, f0_analyzer: str = "harvest",
                 backend: str = "numpy", f0_backend: str = "host"):
        self.f0_analyzer = f0_analyzer  # "harvest" (sprocket default) | "dio"
        # backend: "numpy" = float64 host path (reference-parity default);
        # "jax" = device-batched CheapTrick/D4C/mcep (float32; ~100x the
        # host throughput on TPU)
        # f0_backend: "host" = numpy harvest/dio (reference-parity
        # default); "jax" = device harvest or dio+stonemask
        # (dsp/world/jax_f0.py) — with backend="jax" the ENTIRE analysis
        # pipeline runs on device
        self.backend = backend
        self.f0_backend = f0_backend
        self.fs = fs
        self.shiftms = shiftms
        self.minf0 = minf0
        self.maxf0 = maxf0
        self.fftl = fftl
        self._f0 = None
        self._spc = None
        self._ap = None
        self._time_axis = None

    def estimate_f0(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """F0 track (harvest or dio+stonemask): (f0, time_axis).

        f0_backend="host": pure numpy — safe to run in worker threads
        overlapping the device spectral stage (see analyze(f0_time=...)).
        f0_backend="jax": the device estimator (jax_f0.jax_harvest, or
        jax_dio + jax_stonemask) with the same whole-second length
        bucketing as analyze(), so the jitted pipeline compiles once per
        duration bucket."""
        x = np.asarray(x, np.float64)
        if self.f0_backend == "jax":
            from qpnet_tpu.dsp.world.jax_f0 import (
                jax_dio, jax_harvest, jax_stonemask,
            )
            n = len(x)
            F = int(n / (self.fs * self.shiftms / 1000.0)) + 1
            x32, _ = _bucket_pad_signal(x, self.fs)
            kw = dict(n_valid=n, f0_floor=float(self.minf0),
                      f0_ceil=float(self.maxf0),
                      frame_period=float(self.shiftms))
            if self.f0_analyzer == "harvest":
                f0 = jax_harvest(x32, self.fs, **kw)
            else:
                f0 = jax_stonemask(x32, jax_dio(x32, self.fs, **kw),
                                   self.fs, **kw)
            time_axis = np.arange(F) * (self.shiftms / 1000.0)
            return np.asarray(f0, np.float64)[:F], time_axis
        if self.f0_analyzer == "harvest":
            return harvest(x, self.fs, f0_floor=self.minf0,
                           f0_ceil=self.maxf0, frame_period=self.shiftms)
        f0, time_axis = dio(x, self.fs, f0_floor=self.minf0,
                            f0_ceil=self.maxf0, frame_period=self.shiftms)
        return stonemask(x, f0, time_axis, self.fs), time_axis

    def extract_all(self, x: np.ndarray, dim: int = 34,
                    alpha: float = 0.455):
        """Fully-fused device extraction: ONE jit dispatch + ONE fetch for
        (f0, mcep, codeap, npow) — the whole per-utterance feature surface.

        Requires backend="jax" AND f0_backend="jax" (either analyzer);
        callers that need the raw spc/ap arrays use analyze() instead.
        Returns dict(f0, time_axis, mcep, codeap, npow), host float64.
        """
        return self.extract_all_fetch(self.extract_all_async(x, dim, alpha))

    def extract_all_async(self, x: np.ndarray, dim: int = 34,
                          alpha: float = 0.455):
        """Dispatch the fused extraction without fetching: returns an
        opaque handle for extract_all_fetch.  jax dispatch is async, so a
        caller can enqueue the next utterance's program while the device
        still runs this one — the worker pipelines dispatch/fetch/h5-write
        across utterances this way (bin/feature_extract.py)."""
        if not (self.backend == "jax" and self.f0_backend == "jax"):
            raise RuntimeError("extract_all needs backend='jax' and "
                               "f0_backend='jax'")
        from qpnet_tpu.dsp.world.jax_analysis import jax_analyze

        x = np.asarray(x, np.float64)
        n = len(x)
        F = int(n / (self.fs * self.shiftms / 1000.0)) + 1
        x32, _ = _bucket_pad_signal(x, self.fs)
        cheaptrick_floor = max(self.minf0, 71.0 * 1024 / self.fftl)
        out = jax_analyze(
            x32, self.fs, n, F, float(alpha), fft_size=self.fftl,
            mcep_dim=dim, f0_floor=float(self.minf0),
            f0_ceil=float(self.maxf0), frame_period=float(self.shiftms),
            cheaptrick_floor=cheaptrick_floor,
            f0_analyzer=self.f0_analyzer)
        return out, F

    def extract_all_fetch(self, handle):
        """Block on a dispatched extract_all_async handle; one batched
        device fetch, host float64 dict."""
        import jax as _jax

        out, F = handle
        f0, mcep, codeap, npow = _jax.device_get(out)
        return {
            "f0": np.asarray(f0, np.float64)[:F],
            "time_axis": np.arange(F) * (self.shiftms / 1000.0),
            "mcep": np.asarray(mcep, np.float64)[:F],
            "codeap": np.asarray(codeap, np.float64)[:F],
            "npow": np.asarray(npow, np.float64)[:F],
        }

    def analyze(self, x: np.ndarray, f0_time=None
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """f0_time: optional precomputed (f0, time_axis) from estimate_f0 —
        lets a caller pipeline host F0 against device spectral analysis."""
        x = np.asarray(x, np.float64)
        if f0_time is not None:
            f0, time_axis = f0_time
        else:
            f0, time_axis = self.estimate_f0(x)
        cheaptrick_floor = max(self.minf0, 71.0 * 1024 / self.fftl)
        if self.backend == "jax":
            from qpnet_tpu.dsp.world.jax_analysis import (
                jax_cheaptrick, jax_d4c,
            )
            F = len(f0)
            # bucket signal/frame lengths to whole seconds so the jitted
            # analysis compiles once per duration bucket instead of once
            # per utterance; n_valid masks the zero pad exactly
            x32, n = _bucket_pad_signal(x, self.fs)
            secs = len(x32) // self.fs
            frames_per_sec = int(round(1000.0 / self.shiftms))
            F_pad = max(F, secs * frames_per_sec + 1)
            f32 = np.zeros(F_pad, np.float32)
            f32[:F] = f0
            t32 = np.arange(F_pad, dtype=np.float32) * (self.shiftms / 1000)
            t32[:F] = time_axis
            spc = np.asarray(jax_cheaptrick(
                x32, f32, t32, self.fs, fft_size=self.fftl,
                f0_floor=cheaptrick_floor, f0_ceil=float(self.maxf0),
                n_valid=n), np.float64)[:F]
            ap = np.asarray(jax_d4c(
                x32, f32, t32, self.fs, fft_size=self.fftl,
                f0_ceil=float(max(self.maxf0, 1000.0)),
                n_valid=n), np.float64)[:F]
        else:
            spc = cheaptrick(x, f0, time_axis, self.fs, fft_size=self.fftl,
                             f0_floor=cheaptrick_floor)
            ap = d4c(x, f0, time_axis, self.fs, fft_size=self.fftl)
        self._f0, self._spc, self._ap = f0, spc, ap
        self._time_axis = time_axis
        return f0, spc, ap

    def _require(self):
        if self._spc is None:
            raise RuntimeError("call analyze() first")

    def mcep(self, dim: int = 34, alpha: float = 0.455) -> np.ndarray:
        self._require()
        if self.backend == "jax":
            from qpnet_tpu.dsp.world.jax_analysis import jax_sp2mc
            # pad to the same whole-second frame buckets as analyze() so
            # the scan compiles once per duration bucket
            F = self._spc.shape[0]
            frames_per_sec = int(round(1000.0 / self.shiftms))
            F_pad = -(-F // frames_per_sec) * frames_per_sec + 1
            spc = np.ones((F_pad, self._spc.shape[1]), np.float32)
            spc[:F] = self._spc
            return np.asarray(jax_sp2mc(spc, dim, alpha), np.float64)[:F]
        return sp2mc(self._spc, dim, alpha)

    def codeap(self) -> np.ndarray:
        self._require()
        return code_aperiodicity(self._ap, self.fs)

    def npow(self) -> np.ndarray:
        self._require()
        return spectrogram2npow(self._spc)


class WorldSynthesizer:
    def __init__(self, fs: int = 22050, fftl: int = 1024,
                 shiftms: float = 5.0, backend: str = "numpy"):
        self.fs = fs
        self.fftl = fftl
        self.shiftms = shiftms
        # backend: "numpy" = float64 host pulse loop (reference-parity
        # default); "jax" = batched device synthesis (jax_synthesize) —
        # same construction, float32, noise realization from the jax PRNG
        self.backend = backend

    def synthesis(self, f0: np.ndarray, mcep: np.ndarray, ap: np.ndarray,
                  alpha: float = 0.455) -> np.ndarray:
        """mcep-domain envelope + full-band aperiodicity -> waveform
        (sprocket Synthesizer.synthesis: mc2sp then WORLD synthesis).
        Units follow the analyzed signal's units (the reference analyzes
        int16-scale floats and writes the synthesis output as int16
        directly, feature_extract.py:267-272)."""
        if self.backend == "jax":
            return self.synthesis_fetch(
                self.synthesis_async(f0, mcep, ap, alpha=alpha))
        sp = mc2sp(mcep, alpha, self.fftl)
        return synthesize(f0, sp, ap, self.fs, frame_period=self.shiftms)

    def synthesis_async(self, f0: np.ndarray, mcep: np.ndarray,
                        ap: np.ndarray, alpha: float = 0.455,
                        seed: int = 0):
        """Dispatch one utterance's device synthesis without fetching —
        jax dispatch is async, so a worker can enqueue utterance k+1
        while the device still renders k (bin/feature_extract.py's
        restore pass pipelines this way).  The frame axis is padded to
        whole-second buckets (repeat-last rows — interpolation clamps
        keep the pulse track over the true frames unchanged) so the jit
        compiles once per duration bucket; output is deterministic per
        (seed, bucket)."""
        f0 = np.asarray(f0, np.float64)
        sp = mc2sp(mcep, alpha, self.fftl)          # host mc2sp: float64
        ap = np.atleast_2d(np.asarray(ap, np.float64))
        F = len(f0)
        n_true = int(F * self.shiftms / 1000.0 * self.fs)
        frames_per_sec = int(round(1000.0 / self.shiftms))
        F_pad = max(1, -(-F // frames_per_sec)) * frames_per_sec
        pad = F_pad - F
        f032 = np.concatenate([f0, np.repeat(f0[-1:], pad)]).astype(
            np.float32)
        sp32 = np.concatenate([sp, np.repeat(sp[-1:], pad, 0)]).astype(
            np.float32)
        ap32 = np.concatenate([ap, np.repeat(ap[-1:], pad, 0)]).astype(
            np.float32)
        # static pulse-slot ceiling: 800 Hz covers speech; double per
        # bucket for higher tracks so the slots never overflow
        ceil = 800.0
        fmax = float(f0.max(initial=0.0))
        while fmax > ceil:
            ceil *= 2.0
        from qpnet_tpu.dsp.world.jax_synthesis import jax_synthesize
        out = jax_synthesize(f032, sp32, ap32, np.uint32(seed), self.fs,
                             frame_period=float(self.shiftms), f0_ceil=ceil)
        return out, n_true

    def synthesis_fetch(self, handle) -> np.ndarray:
        """Block on a synthesis_async handle: float64 waveform."""
        out, n_true = handle
        return np.asarray(out, np.float64)[:n_true]

    def restore_async(self, f0: np.ndarray, mcep: np.ndarray,
                      codeap: np.ndarray, alpha: float = 0.455,
                      seed: int = 0):
        """Fused device restore: mel-cepstrum + CODED aperiodicity ->
        waveform in one dispatch (jax_synthesis.jax_restore) — mc2sp and
        the aperiodicity decode run on device, so the upload is the
        coded features, not full spectra.  Same bucketing/fetch contract
        as synthesis_async."""
        f0 = np.asarray(f0, np.float64)
        mcep = np.atleast_2d(np.asarray(mcep, np.float64))
        codeap = np.atleast_2d(np.asarray(codeap, np.float64))
        F = len(f0)
        n_true = int(F * self.shiftms / 1000.0 * self.fs)
        frames_per_sec = int(round(1000.0 / self.shiftms))
        F_pad = max(1, -(-F // frames_per_sec)) * frames_per_sec
        pad = F_pad - F
        f032 = np.concatenate([f0, np.repeat(f0[-1:], pad)]).astype(
            np.float32)
        mc32 = np.concatenate([mcep, np.repeat(mcep[-1:], pad, 0)]).astype(
            np.float32)
        ca32 = np.concatenate([codeap,
                               np.repeat(codeap[-1:], pad, 0)]).astype(
            np.float32)
        ceil = 800.0
        fmax = float(f0.max(initial=0.0))
        while fmax > ceil:
            ceil *= 2.0
        from qpnet_tpu.dsp.world.jax_synthesis import jax_restore
        out = jax_restore(f032, mc32, ca32, np.float32(alpha),
                          np.uint32(seed), self.fs, fftl=self.fftl,
                          frame_period=float(self.shiftms), f0_ceil=ceil)
        return out, n_true

    def synthesis_diff(self, x: np.ndarray, diffmcep: np.ndarray,
                       alpha: float = 0.455) -> np.ndarray:
        return _mlsa_synthesis_diff(x, diffmcep, alpha, self.shiftms, self.fs)
