"""Spectral emphasis engine: differential-MLSA filtering of waveforms with
a constant per-corpus mel-cepstral coefficient vector.

This is the shared core of the two recipe workers that the reference
implements twice (src/bin/noise_shaping.py:94-140 applies the filter to
training targets, src/bin/noise_restored.py:70-121 applies the inverse to
generated audio).  Here both CLIs call the same pipeline:

    coefs  = emphasis_coefs(stats, ...)        # mean mcep * mag, c0 = 0
    y      = emphasize(x, fs, coefs, ...)      # MLSA diff filter + 70 Hz HPF
    write  = filter_wav_file(src, dst, ...)    # dtype-preserving wav I/O

The filter coefficients are frame-constant, so the frame count only needs
to cover the signal — no WORLD analysis pass is run (the reference spends
a full feature extraction per utterance just to learn the frame count).
"""

from __future__ import annotations

import os

import numpy as np
from scipy.io import wavfile

from qpnet_tpu.data import read_hdf5
from qpnet_tpu.dsp.filters import low_cut_filter
from qpnet_tpu.dsp.mlsa import synthesis_diff

HIGHPASS_CUTOFF_HZ = 70.0


def emphasis_coefs(stats_path: str, feature_type: str, dim_start: int,
                   dim_end: int, mag: float, invert: bool) -> np.ndarray:
    """Filter coefficients from corpus statistics: the mean mel-cepstrum
    slice scaled by `mag`, with the power term zeroed.  `invert=True`
    flips the signs of the higher coefficients (the de-emphasis direction,
    reference noise_shaping.py:125-131)."""
    mean = read_hdf5(stats_path, "/%s/mean" % feature_type)
    coefs = np.array(mean[dim_start:dim_end], np.float64) * mag
    coefs[0] = 0.0
    if invert:
        coefs[1:] = -coefs[1:]
    return coefs


def frame_count(n_samples: int, fs: int, shiftms: float) -> int:
    """Frames covering the signal at the analysis hop (same convention as
    the F0 analyzers: one frame per shift, inclusive of t=0)."""
    return int(n_samples / (fs * shiftms / 1000.0)) + 1


def emphasize(x: np.ndarray, fs: int, coefs: np.ndarray, alpha: float,
              shiftms: float) -> np.ndarray:
    """Differential MLSA filtering with frame-constant coefficients,
    followed by the recipe's 70 Hz low-cut."""
    frames = np.tile(coefs, (frame_count(len(x), fs, shiftms), 1))
    y = synthesis_diff(np.asarray(x, np.float64), frames, alpha,
                       shiftms, fs)
    return low_cut_filter(y, fs, cutoff=HIGHPASS_CUTOFF_HZ)


class StreamingEmphasizer:
    """Chunk-by-chunk differential-MLSA emphasis with carried filter
    state: `concat(process(chunks))` equals `emphasize(concat(chunks))`
    to f32 rounding, for ANY chunking (both the MLSA IIR carry and the
    70 Hz FIR tap state persist across chunks; exact bitwise equality
    across different chunkings is precluded only by per-length XLA FMA
    scheduling of the scan body).

    This is what lets the serving path apply the recipe's noise
    RESTORATION filter (reference noise_restored.py; recipe stage 4) to
    audio as it streams, instead of post-processing whole files — models
    trained on noise-shaped targets (run_FE.sh stage 4) need it for
    correct output spectra.  The filter is causal/time-recursive, so
    streaming costs nothing but the carried state.
    """

    def __init__(self, fs: int, coefs: np.ndarray, alpha: float,
                 shiftms: float = 5.0, pd: int = 4, highpass: bool = True):
        from scipy.signal import firwin

        from qpnet_tpu.dsp.mcep import mc2b
        from qpnet_tpu.dsp.mlsa import mlsa_init_state

        self.fs, self.alpha, self.pd = fs, float(alpha), pd
        self.hopsize = int(fs * shiftms / 1000)
        # frame-constant coefficients: one b row serves every sample
        self._b = np.asarray(mc2b(np.asarray(coefs, np.float64)[None, :],
                                  self.alpha), np.float32)
        self._state = mlsa_init_state(self._b.shape[1] - 1, pd)
        self._fir = (firwin(255, HIGHPASS_CUTOFF_HZ / (fs // 2),
                            pass_zero=False) if highpass else None)
        self._fir_zi = (np.zeros(254) if highpass else None)

    def process(self, chunk: np.ndarray) -> np.ndarray:
        """Filter one chunk (any length); returns the same length."""
        import jax
        from scipy.signal import lfilter

        from qpnet_tpu.dsp.mlsa import _mlsa_scan_stateful

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            y, self._state = _mlsa_scan_stateful(
                np.asarray(chunk, np.float32), self._b, self._state,
                self.alpha, self.pd, self.hopsize)
        y = np.asarray(y, np.float64)
        if self._fir is not None:
            y, self._fir_zi = lfilter(self._fir, 1, y, zi=self._fir_zi)
        return y


def filter_wav_file(src: str, dst: str, fs_expected: int,
                    coefs: np.ndarray, alpha: float, shiftms: float) -> None:
    """Read `src`, filter, write `dst` preserving the sample dtype.

    Raises ValueError on a sample-rate mismatch (the recipe treats that as
    a corpus configuration error)."""
    fs, x = wavfile.read(src)
    if fs != fs_expected:
        raise ValueError(
            f"{src}: sample rate {fs} != configured {fs_expected}")
    in_dtype = x.dtype
    y = emphasize(x.astype(np.float64), fs, coefs, alpha, shiftms)
    y = np.clip(y, -32768, 32767)
    out_dir = os.path.dirname(dst)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    wavfile.write(dst, fs, y.astype(np.int16) if in_dtype == np.int16
                  else y)
