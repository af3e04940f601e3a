"""Shared WORLD utilities: windows, minimum-phase spectra, interpolation."""

from __future__ import annotations

import numpy as np


def next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def nuttall(n: int) -> np.ndarray:
    """Nuttall window (WORLD's FIR prototype for band filtering)."""
    t = np.linspace(0, 1, n, endpoint=True) if n > 1 else np.zeros(1)
    return (0.355768 - 0.487396 * np.cos(2 * np.pi * t)
            + 0.144232 * np.cos(4 * np.pi * t)
            - 0.012604 * np.cos(6 * np.pi * t))


def minimum_phase_spectrum(log_amp_half: np.ndarray) -> np.ndarray:
    """Half log-amplitude spectrum (fftl//2+1,) -> complex minimum-phase
    spectrum of the same length (cepstral method)."""
    fftl = (len(log_amp_half) - 1) * 2
    c = np.fft.irfft(log_amp_half, n=fftl)
    # fold: double positive quefrencies, zero negative ones
    c[1: fftl // 2] *= 2.0
    c[fftl // 2 + 1:] = 0.0
    return np.exp(np.fft.rfft(c))


def safe_log(x: np.ndarray, floor: float = 1e-300) -> np.ndarray:
    return np.log(np.maximum(x, floor))
