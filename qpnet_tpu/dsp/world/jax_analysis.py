"""Jittable (device-runnable) WORLD analysis: vectorized CheapTrick and
mel-cepstrum over whole utterances — the batch feature pipeline can run
under jit on TPU/CPU instead of the per-frame numpy host loops.

F0 estimation stays host-side (DIO/Harvest are sequential heuristics);
given a waveform + F0 track, everything downstream — pitch-synchronous
windowing, f0-adaptive smoothing, liftering, frequency-warped cepstrum —
is expressed as fixed-shape array ops vmapped over frames:

  * the pitch-synchronous Hanning window 0.5+0.5*cos(pi*t*f0/1.5) is zero
    outside +-1.5/f0, so a fixed max-length window slot with the analytic
    window function applied is *exact* (no dynamic shapes);
  * the f0-adaptive fractional-box smoothing becomes a sum over static
    offsets with per-frame overlap weights;
  * freqt's O(M1*M2) warping recursion becomes a lax.scan over input
    cepstrum coefficients carrying the warped accumulator (vectorized over
    frames).

Equivalence with the numpy reference implementations is tested in
tests/test_jax_analysis.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qpnet_tpu.dsp.world.cheaptrick import DEFAULT_F0, Q1


@functools.partial(jax.jit, static_argnames=("fs", "fft_size", "f0_floor"))
def jax_cheaptrick(x: jnp.ndarray, f0: jnp.ndarray, time_axis: jnp.ndarray,
                   fs: int, fft_size: int = 1024,
                   f0_floor: float = 71.0) -> jnp.ndarray:
    """CheapTrick spectral envelope, vectorized over frames.

    x: (n,) float waveform;  f0/time_axis: (F,).
    Returns (F, fft_size//2+1) power spectrogram.
    """
    x = jnp.asarray(x, jnp.float32)
    f0 = jnp.asarray(f0, jnp.float32)
    half = fft_size // 2
    cf0 = jnp.where(f0 > f0_floor / 2, f0, DEFAULT_F0)
    # WORLD's fit guarantee: below f0_low_limit the 3-period window cannot
    # fit fft_size (rfft would silently crop it) -> default F0, like the
    # host path
    f0_low_limit = 3.0 * fs / (fft_size - 3.0)
    cf0 = jnp.where(cf0 < f0_low_limit, DEFAULT_F0, cf0)
    # static window slot sized to the guaranteed-fit maximum
    max_hw = (fft_size - 3) // 2
    centers = jnp.round(time_axis * fs).astype(jnp.int32)

    def frame_ps(center, cf):
        idx = center + jnp.arange(-max_hw, max_hw + 1)
        seg = jnp.where((idx >= 0) & (idx < x.shape[0]),
                        x[jnp.clip(idx, 0, x.shape[0] - 1)], 0.0)
        tt = jnp.arange(-max_hw, max_hw + 1) / fs
        w = jnp.where(jnp.abs(tt) <= 1.5 / cf,
                      0.5 + 0.5 * jnp.cos(jnp.pi * tt * cf / 1.5), 0.0)
        w = w / jnp.sqrt(jnp.sum(w ** 2))
        return jnp.abs(jnp.fft.rfft(seg * w, fft_size)) ** 2

    ps = jax.vmap(frame_ps)(centers, cf0)           # (F, half+1)

    # f0-adaptive fractional box smoothing over width 2*f0/3
    bin_hz = fs / fft_size
    K = int(np.ceil((2.0 * 800.0 / 3.0) / bin_hz / 2)) + 2
    # mirror-extend the spectrum on both edges
    ext = jnp.concatenate([ps[:, 1: K + 1][:, ::-1], ps,
                           ps[:, -K - 1: -1][:, ::-1]], axis=1)
    w_bins = (2.0 * cf0 / 3.0) / bin_hz             # (F,)
    lo = -w_bins / 2.0
    hi = w_bins / 2.0
    offsets = jnp.arange(-K, K)
    # overlap of window [lo, hi] with cell [m, m+1)
    ov = jnp.clip(jnp.minimum(hi[:, None], offsets[None, :] + 1)
                  - jnp.maximum(lo[:, None], offsets[None, :]), 0.0, None)
    ov = ov / jnp.sum(ov, axis=1, keepdims=True)    # (F, 2K)
    sm = jnp.zeros_like(ps)
    for j, m in enumerate(range(-K, K)):
        sm = sm + ov[:, j: j + 1] * ext[:, K + m: K + m + half + 1]
    sm = jnp.maximum(sm, 1e-30)

    # liftering in the cepstral domain
    c = jnp.fft.irfft(jnp.log(sm), n=fft_size, axis=1)  # (F, fftl)
    tau_idx = jnp.arange(fft_size)
    tau = jnp.minimum(tau_idx, fft_size - tau_idx) / fs
    arg = jnp.pi * cf0[:, None] * tau[None, :]
    smooth = jnp.where(arg == 0, 1.0,
                       jnp.sin(jnp.maximum(arg, 1e-30))
                       / jnp.maximum(arg, 1e-30))
    q0 = 1.0 - 2.0 * Q1
    recover = q0 + 2.0 * Q1 * jnp.cos(2 * jnp.pi * cf0[:, None] * tau)
    log_ps = jnp.fft.rfft(c * smooth * recover, axis=1).real
    return jnp.exp(log_ps)


@functools.partial(jax.jit, static_argnames=("order",))
def jax_freqt(c: jnp.ndarray, order: int, alpha) -> jnp.ndarray:
    """freqt warping recursion as lax.scan over input coefficients.

    c: (F, M1+1) -> (F, order+1).
    """
    c = jnp.asarray(c)
    F = c.shape[0]
    b = 1.0 - alpha * alpha

    def step(g, ci):
        d = g
        new = [ci + alpha * d[:, 0]]
        if order >= 1:
            new.append(b * d[:, 0] + alpha * d[:, 1])
        for m in range(2, order + 1):
            new.append(d[:, m - 1] + alpha * (d[:, m] - new[-1]))
        return jnp.stack(new, axis=1), None

    g0 = jnp.zeros((F, order + 1), c.dtype)
    g, _ = jax.lax.scan(step, g0, jnp.moveaxis(c, 1, 0)[::-1])
    return g


@functools.partial(jax.jit, static_argnames=("order",))
def jax_sp2mc(powerspec: jnp.ndarray, order: int, alpha) -> jnp.ndarray:
    """Power spectrogram (F, fftl//2+1) -> mel-cepstra (F, order+1)."""
    logsp = jnp.log(jnp.maximum(powerspec, 1e-30))
    c = jnp.fft.irfft(logsp, axis=-1)
    c = c[:, : powerspec.shape[-1]]
    c = c.at[:, 0].multiply(0.5)
    return jax_freqt(c, order, alpha)
