"""D4C band-aperiodicity estimator (Morise 2016, WORLD `d4c`).

Per voiced frame, the aperiodicity in 3 kHz bands is estimated from the
*temporal stability* of the band signal: a periodic component repeats at the
period 1/f0, so the normalized correlation between window-shifted segments
is high; noise decorrelates.  This implementation measures, per band,
  ap^2 = 1 - max(0, r)   with r = normalized autocorrelation at lag fs/f0
computed over a 4-period window, which reproduces D4C's monotone behavior
(pure harmonics -> ap ~ 0, noise -> ap ~ 1) and its band structure
(3000 Hz intervals, coarse values interpolated over the full spectrum in
decode).  Unvoiced frames get ap = 1 - 1e-12 everywhere (WORLD convention).

Returns the full-resolution aperiodicity spectrogram (F, fftl//2+1) with
values in (0, 1], matching pyworld.d4c's output contract.
"""

from __future__ import annotations

import numpy as np

from qpnet_tpu.dsp.world.codec import band_frequencies, expand_coarse
from qpnet_tpu.dsp.world.common import next_pow2

UNVOICED_AP = 1.0 - 1e-12
FLOOR_AP = 1e-6


def _band_signal(x: np.ndarray, fs: int, lo: float, hi: float) -> np.ndarray:
    fftl = next_pow2(len(x))
    X = np.fft.rfft(x, fftl)
    f = np.fft.rfftfreq(fftl, 1.0 / fs)
    mask = ((f >= lo) & (f < hi)).astype(np.float64)
    return np.fft.irfft(X * mask, fftl)[: len(x)]


def _frame_band_aperiodicity(seg: np.ndarray, period: int) -> float:
    """1 - normalized autocorrelation at the pitch period."""
    if len(seg) < 3 * period or period < 2:
        return UNVOICED_AP
    a = seg[:-period]
    b = seg[period:]
    denom = np.sqrt(np.dot(a, a) * np.dot(b, b))
    if denom <= 1e-12:
        return UNVOICED_AP
    r = np.dot(a, b) / denom
    ap2 = np.clip(1.0 - r, FLOOR_AP ** 2, 1.0)
    return float(np.sqrt(ap2))


def d4c(x: np.ndarray, f0: np.ndarray, time_axis: np.ndarray, fs: int,
        fft_size: int = None) -> np.ndarray:
    x = np.asarray(x, np.float64)
    if fft_size is None:
        fft_size = 1 << int(np.ceil(np.log2(3.0 * fs / 71.0 + 1)))
    half = fft_size // 2 + 1
    bands = band_frequencies(fs)          # centers: 3000, 6000, ... Hz
    n_bands = len(bands)
    # band-filtered copies of the signal (shared across frames)
    edges = [(max(0.0, b - 1500.0), min(fs / 2.0, b + 1500.0)) for b in bands]
    band_signals = [_band_signal(x, fs, lo, hi) for lo, hi in edges]

    F = len(f0)
    ap = np.full((F, half), UNVOICED_AP)
    for i in range(F):
        if f0[i] <= 0:
            continue
        period = int(round(fs / f0[i]))
        center = int(round(time_axis[i] * fs))
        w = 2 * period
        lo_i, hi_i = max(0, center - w), min(len(x), center + w)
        vals = [_frame_band_aperiodicity(bs[lo_i:hi_i], period)
                for bs in band_signals]
        ap[i] = expand_coarse(np.asarray(vals), fs, fft_size)
    return np.clip(ap, FLOOR_AP, UNVOICED_AP)
