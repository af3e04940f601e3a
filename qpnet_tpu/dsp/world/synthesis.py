"""WORLD synthesis: f0 + spectral envelope + aperiodicity -> waveform.

Pitch-synchronous overlap-add (the WORLD synthesis structure):
  * pulse locations from integrating the interpolated F0 track (unvoiced
    regions tick at DEFAULT_F0 with pure-noise excitation);
  * per pulse, the periodic response is the minimum-phase impulse response
    of sqrt(sp * (1-ap^2)) scaled by sqrt(pulse interval) (line-spectrum
    energy normalization), and the aperiodic response is a white-noise
    burst of one interval filtered by the minimum-phase response of
    sqrt(sp * ap^2);
  * responses are overlap-added at the pulse positions.

Validated by analysis-synthesis round trips (tests/test_world.py): the
resynthesized waveform carries the original F0 track and spectral envelope.
"""

from __future__ import annotations

import numpy as np

from qpnet_tpu.dsp.world.common import minimum_phase_spectrum, safe_log

DEFAULT_F0 = 500.0


def _pulse_times(f0: np.ndarray, time_axis: np.ndarray, fs: int,
                 n_samples: int):
    """Sample indices of excitation pulses + voicing flag per pulse."""
    t = np.arange(n_samples) / fs
    f0_interp = np.interp(t, time_axis, np.where(f0 > 0, f0, 0.0))
    voiced_interp = np.interp(t, time_axis, (f0 > 0).astype(np.float64)) > 0.5
    inst = np.where(voiced_interp & (f0_interp > 0), f0_interp, DEFAULT_F0)
    phase = np.cumsum(2 * np.pi * inst / fs)
    wrapped = phase % (2 * np.pi)
    pulse_mask = np.empty(n_samples, dtype=bool)
    pulse_mask[0] = True
    pulse_mask[1:] = wrapped[1:] < wrapped[:-1]
    idx = np.where(pulse_mask)[0]
    return idx, voiced_interp[idx]


def _frame_interp(arr: np.ndarray, time_axis: np.ndarray, t: float
                  ) -> np.ndarray:
    """Linear interpolation of per-frame spectra at time t (pulse-time
    envelope interpolation removes frame-boundary steps)."""
    F = arr.shape[0]
    pos = t / (time_axis[1] - time_axis[0]) if F > 1 else 0.0
    i0 = int(np.floor(pos))
    if i0 >= F - 1:
        return arr[F - 1]
    if i0 < 0:
        return arr[0]
    w = pos - i0
    return (1.0 - w) * arr[i0] + w * arr[i0 + 1]


def synthesize(f0: np.ndarray, spectrogram: np.ndarray,
               aperiodicity: np.ndarray, fs: int,
               frame_period: float = 5.0, seed: int = 0) -> np.ndarray:
    """Returns float64 waveform of length n_frames * frame_period * fs/1000."""
    f0 = np.asarray(f0, np.float64)
    sp = np.asarray(spectrogram, np.float64)
    ap = np.asarray(aperiodicity, np.float64)
    F, half = sp.shape
    fftl = (half - 1) * 2
    time_axis = np.arange(F) * frame_period / 1000.0
    n_samples = int(F * frame_period / 1000.0 * fs)
    rng = np.random.default_rng(seed)

    pulses, voiced = _pulse_times(f0, time_axis, fs, n_samples)
    out = np.zeros(n_samples + 2 * fftl)

    for k, p in enumerate(pulses):
        interval = (pulses[k + 1] - p) if k + 1 < len(pulses) else \
            (pulses[k] - pulses[k - 1] if k > 0 else fftl)
        interval = max(int(interval), 1)
        t_pulse = p / fs
        frame_sp = np.maximum(_frame_interp(sp, time_axis, t_pulse), 1e-300)
        frame_ap = np.clip(_frame_interp(ap, time_axis, t_pulse),
                           1e-12, 1 - 1e-12)
        if voiced[k]:
            per_pow = frame_sp * (1.0 - frame_ap ** 2)
            mp = minimum_phase_spectrum(0.5 * safe_log(per_pow))
            ir = np.fft.irfft(mp, fftl)
            out[p: p + fftl] += ir * np.sqrt(interval)
            noise_pow = frame_sp * frame_ap ** 2
        else:
            noise_pow = frame_sp
        mpn = minimum_phase_spectrum(0.5 * safe_log(np.maximum(noise_pow,
                                                               1e-300)))
        noise = rng.standard_normal(interval)
        burst = np.fft.irfft(np.fft.rfft(noise, fftl) * mpn, fftl)
        out[p: p + fftl] += burst

    return out[:n_samples]
