"""StoneMask F0 refinement (Morise 2011, WORLD `stonemask`).

For each voiced frame: window ~3 periods around the frame time, compute the
instantaneous frequency of the spectrum (via the phase difference of the
signal and its one-sample shift), and refine F0 as the power-weighted mean
of IF(k*f0)/k over the first harmonics.  Frames whose refinement diverges
from the initial estimate keep the initial value zeroed (WORLD sets f0=0
when the refined value leaves [f0/2, f0*2] bands... we clamp the same way).
"""

from __future__ import annotations

import numpy as np

from qpnet_tpu.dsp.world.common import next_pow2


def _refine_frame(x: np.ndarray, fs: int, t: float, f0_init: float) -> float:
    if f0_init <= 0:
        return 0.0
    half_window = int(1.5 * fs / f0_init) + 1
    center = int(round(t * fs))
    lo = center - half_window
    hi = center + half_window + 1
    if lo < 0 or hi > len(x):
        pad_lo = max(0, -lo)
        pad_hi = max(0, hi - len(x))
        seg = np.pad(x[max(0, lo): min(len(x), hi)], (pad_lo, pad_hi))
    else:
        seg = x[lo:hi]
    n = len(seg)
    tt = np.arange(n) - (n - 1) / 2
    # blackman-ish analysis window
    w = 0.42 + 0.5 * np.cos(np.pi * tt / half_window) \
        + 0.08 * np.cos(2 * np.pi * tt / half_window)
    fftl = next_pow2(n) * 2
    X1 = np.fft.rfft(seg * w, fftl)
    X2 = np.fft.rfft(np.roll(seg, -1) * w, fftl)
    freqs = np.fft.rfftfreq(fftl, 1.0 / fs)
    inst = np.angle(X2 * np.conj(X1)) * fs / (2 * np.pi)
    # unwrap around bin frequency
    inst = freqs + np.angle(np.exp(1j * 2 * np.pi * (inst - freqs) / fs)) \
        * fs / (2 * np.pi)
    power = np.abs(X1)
    num = 0.0
    den = 0.0
    for k in range(1, 7):
        fk = f0_init * k
        if fk >= fs / 2:
            break
        bin_ = int(round(fk * fftl / fs))
        if bin_ >= len(freqs):
            break
        num += power[bin_] * inst[bin_] / k
        den += power[bin_]
    if den <= 0:
        return 0.0
    refined = num / den
    if refined < f0_init * 0.5 or refined > f0_init * 2.0 or refined <= 0:
        return 0.0
    return float(refined)


def stonemask(x: np.ndarray, f0: np.ndarray, time_axis: np.ndarray,
              fs: int) -> np.ndarray:
    """Two batched refinement passes (WORLD refines the refined value)."""
    from qpnet_tpu.dsp.world.refine import refine_many
    x = np.asarray(x, np.float64)
    r1 = refine_many(x, fs, time_axis, np.asarray(f0, np.float64))
    r2 = refine_many(x, fs, time_axis, r1)
    return np.where(r2 > 0, r2, r1)
