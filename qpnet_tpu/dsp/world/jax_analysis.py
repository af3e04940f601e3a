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


@functools.partial(jax.jit, static_argnames=("fs", "fft_size", "f0_floor",
                                              "f0_ceil"))
def jax_cheaptrick(x: jnp.ndarray, f0: jnp.ndarray, time_axis: jnp.ndarray,
                   fs: int, fft_size: int = 1024,
                   f0_floor: float = 71.0, f0_ceil: float = 800.0,
                   n_valid=None) -> jnp.ndarray:
    """CheapTrick spectral envelope, vectorized over frames.

    x: (n,) float waveform;  f0/time_axis: (F,).
    f0_ceil (static) sizes the DC-correction and smoothing windows — pass
    the analysis f0_ceil when tracking above 800 Hz (singing corpora).
    n_valid (traced): true signal length when x is padded to a bucketed
    length for compile-cache reuse; samples at index >= n_valid are
    treated as outside the signal.
    Returns (F, fft_size//2+1) power spectrogram.
    """
    x = jnp.asarray(x, jnp.float32)
    f0 = jnp.asarray(f0, jnp.float32)
    if n_valid is None:
        n_valid = x.shape[0]
    half = fft_size // 2
    ceil_f0 = max(float(f0_ceil), DEFAULT_F0)
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
        # exact counterpart of cheaptrick._windowed_power_spectrum: the
        # window spans +-round(1.5*fs/f0) integer samples (not the analytic
        # +-1.5/f0 support), out-of-signal samples are zero-filled, the
        # window-weighted mean is removed, energy-normalized by sum(w^2)
        base = jnp.arange(-max_hw, max_hw + 1)
        half_w = jnp.floor(1.5 * fs / cf + 0.5).astype(jnp.int32)
        mask = jnp.abs(base) <= half_w
        idx = center + base
        seg = jnp.where((idx >= 0) & (idx < n_valid) & mask,
                        x[jnp.clip(idx, 0, x.shape[0] - 1)], 0.0)
        w = jnp.where(mask,
                      0.5 + 0.5 * jnp.cos(jnp.pi * (base / fs) * cf / 1.5),
                      0.0)
        windowed = seg * w
        windowed = windowed - w * (jnp.sum(windowed) / jnp.sum(w))
        windowed = windowed / jnp.sqrt(jnp.sum(w ** 2))
        return jnp.abs(jnp.fft.rfft(windowed, fft_size)) ** 2

    ps = jax.vmap(frame_ps)(centers, cf0)           # (F, half+1)
    # mirror sub-f0 bins (WORLD DCCorrection); window sizes cover ceil_f0
    jmax = min(2 + int(ceil_f0 * fft_size / fs) + 2, half)
    ps = _jax_dc_correct(ps, cf0, fs, fft_size, jmax)

    # f0-adaptive fractional box smoothing over width 2*f0/3
    bin_hz = fs / fft_size
    K = int(np.ceil((2.0 * ceil_f0 / 3.0) / bin_hz / 2)) + 2
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


def _d4c_static(fs: int, fft_size: int):
    """Shape-defining constants of D4C for a given fs (all Python ints /
    numpy arrays, resolved at trace time)."""
    from qpnet_tpu.dsp.world.codec import band_frequencies
    from qpnet_tpu.dsp.world.common import nuttall
    from qpnet_tpu.dsp.world.d4c import (
        FLOOR_F0_D4C, LOVE_TRAIN_LOWEST_F0,
    )
    fft_d4c = 1 << (1 + int(np.log2(4.0 * fs / FLOOR_F0_D4C + 1)))
    fft_lt = 1 << (1 + int(np.log2(3.0 * fs / LOVE_TRAIN_LOWEST_F0 + 1)))
    bands = band_frequencies(fs)
    window_length = int(3000.0 * fft_d4c / fs) * 2 + 2
    c = {
        "fft_d4c": fft_d4c,
        "half_d4c": fft_d4c // 2,
        # max half-window: ratio=4 periods at the 47 Hz D4C floor
        "max_hw": int(np.floor(2.0 * fs / FLOOR_F0_D4C + 0.5)),
        "fft_lt": fft_lt,
        "max_hw_lt": int(np.floor(1.5 * fs / LOVE_TRAIN_LOWEST_F0 + 0.5)),
        "bands": bands,
        "n_bands": len(bands),
        "window": nuttall(window_length),
        "window_length": window_length,
        "boundary": int(np.floor(fft_d4c * 8.0 / window_length + 0.5)),
        "b0": int(np.ceil(100.0 * fft_lt / fs)),
        "b1": int(np.ceil(4000.0 * fft_lt / fs)),
        "b2": min(int(np.ceil(7900.0 * fft_lt / fs)), fft_lt // 2),
        "half_out": fft_size // 2 + 1,
    }
    assert 2 * c["max_hw"] + 1 <= fft_d4c
    assert 2 * c["max_hw_lt"] + 1 <= fft_lt
    return c


def _jax_windowed(x, origin, cf0, fs, ratio, kind, max_hw, n_valid=None):
    """F0-adaptive windowed segment in a fixed (2*max_hw+1,) slot.

    Exact counterpart of common.get_windowed_waveform: indices are edge-
    clipped (not zeroed), the window is evaluated on index offsets, and the
    window-weighted mean is subtracted.  The segment sits time-shifted
    inside the slot relative to the host's 0-origin layout, which is
    immaterial because every D4C quantity built from it (power spectra and
    conj(X1)*X2 centroid cross-spectra) is invariant to a common shift.
    """
    base = jnp.arange(-max_hw, max_hw + 1)
    half = jnp.floor(ratio * fs / cf0 / 2.0 + 0.5).astype(jnp.int32)
    mask = jnp.abs(base) <= half
    n = x.shape[0] if n_valid is None else n_valid
    seg = x[jnp.clip(origin + base, 0, n - 1)]
    posf0 = (2.0 * base / ratio) / fs * cf0
    if kind == "blackman":
        w = (0.42 + 0.5 * jnp.cos(jnp.pi * posf0)
             + 0.08 * jnp.cos(2.0 * jnp.pi * posf0))
    else:  # hanning
        w = 0.5 + 0.5 * jnp.cos(jnp.pi * posf0)
    w = jnp.where(mask, w, 0.0)
    seg = seg * w
    return seg - w * (jnp.sum(seg) / jnp.sum(w)), half


def _jax_dc_correct(spec, cf0, fs, fft_size, jmax):
    """Vectorized common.dc_correction over frames.

    spec: (F, half+1); bins below f0 receive += interp(spec, f0 - f).
    """
    halfp1 = spec.shape[1]
    j = jnp.arange(jmax)
    src = cf0[:, None] * fft_size / fs - j[None, :]
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, halfp1 - 2)
    frac = src - i0
    add = (jnp.take_along_axis(spec, i0, axis=1) * (1.0 - frac)
           + jnp.take_along_axis(spec, i0 + 1, axis=1) * frac)
    n_rep = 1 + (cf0 * fft_size / fs).astype(jnp.int32)  # upper_limit - 1
    add = jnp.where(j[None, :] < n_rep[:, None], add, 0.0)
    return spec.at[:, :jmax].add(add)


def _jax_linear_smoothing(spec, width_hz, fs, fft_size, kmax):
    """Vectorized common.linear_smoothing: per-frame fractional-box
    convolution of width width_hz (F,), mirror-extended at the edges."""
    half = fft_size // 2
    bin_hz = fs / fft_size
    ext = jnp.concatenate([spec[:, 1: kmax + 1][:, ::-1], spec,
                           spec[:, -kmax - 1: -1][:, ::-1]], axis=1)
    w_bins = width_hz / bin_hz
    lo, hi = -w_bins / 2.0, w_bins / 2.0
    offsets = jnp.arange(-kmax, kmax)
    ov = jnp.clip(jnp.minimum(hi[:, None], offsets[None, :] + 1)
                  - jnp.maximum(lo[:, None], offsets[None, :]), 0.0, None)
    ov = ov / jnp.sum(ov, axis=1, keepdims=True)
    out = jnp.zeros_like(spec)
    for jj, m in enumerate(range(-kmax, kmax)):
        out = out + ov[:, jj: jj + 1] * ext[:, kmax + m: kmax + m + half + 1]
    return out


@functools.partial(jax.jit, static_argnames=("fs", "fft_size", "threshold",
                                              "f0_ceil"))
def jax_d4c(x: jnp.ndarray, f0: jnp.ndarray, time_axis: jnp.ndarray,
            fs: int, fft_size: int = 1024,
            threshold: float = 0.85, f0_ceil: float = 1000.0,
            n_valid=None) -> jnp.ndarray:
    """D4C band aperiodicity, vectorized over frames (device-runnable).

    Same algorithm as dsp/world/d4c.py (the host port of WORLD's published
    estimator, reached by the reference through pyworld at
    feature_extract.py:324-327), restructured for XLA: fixed window slots
    with per-frame F0-adaptive masks, batched FFTs, and a static-anchor
    band interpolation.  Equivalence with the host path is tested in
    tests/test_jax_analysis.py.

    x: (n,) waveform; f0/time_axis: (F,).
    Returns (F, fft_size//2+1) aperiodicity in (0, 1].
    """
    from qpnet_tpu.dsp.world.d4c import FLOOR_F0_D4C, UNVOICED_AP
    c = _d4c_static(fs, fft_size)
    x = jnp.asarray(x, jnp.float32)
    f0 = jnp.asarray(f0, jnp.float32)
    if n_valid is None:
        n_valid = x.shape[0]
    ceil_f0 = max(float(f0_ceil), FLOOR_F0_D4C)
    F = f0.shape[0]
    origins = jnp.floor(time_axis * fs + 0.501).astype(jnp.int32)

    # --- love train: low/high band power ratio voicing pre-test ---
    cf0_lt = jnp.maximum(f0, 40.0)
    def love_frame(origin, cf):
        seg, _ = _jax_windowed(x, origin, cf, fs, 3.0, "blackman",
                               c["max_hw_lt"], n_valid)
        ps = jnp.abs(jnp.fft.rfft(seg, c["fft_lt"])) ** 2
        cum = jnp.cumsum(ps)
        return (cum[c["b1"]] - cum[c["b0"]]) / jnp.maximum(
            cum[c["b2"]] - cum[c["b0"]], 1e-30)
    love = jax.vmap(love_frame)(origins, cf0_lt)

    # --- static group delay ---
    cf0 = jnp.maximum(f0, FLOOR_F0_D4C)
    fftd = c["fft_d4c"]

    def centroid():
        """Ramp-weighted spectral cross-centroids at position +-0.25/f0."""
        def one(off_sign):
            pos_shift = off_sign * 0.25 / cf0
            org = jnp.floor((time_axis + pos_shift) * fs + 0.501).astype(jnp.int32)
            def fr(o, cf):
                seg, half = _jax_windowed(x, o, cf, fs, 4.0, "blackman",
                                          c["max_hw"], n_valid)
                power = jnp.sqrt(jnp.sum(seg * seg))
                seg = jnp.where(power > 0.0, seg / jnp.maximum(power, 1e-30),
                                0.0)
                ramp = jnp.arange(-c["max_hw"], c["max_hw"] + 1) + half + 1
                s1 = jnp.fft.rfft(seg, fftd)
                s2 = jnp.fft.rfft(seg * ramp, fftd)
                return s1.real * s2.real + s1.imag * s2.imag
            return jax.vmap(fr)(org, cf0)
        return one(-1.0) + one(1.0)

    jmax = min(2 + int(ceil_f0 * fftd / fs) + 2, fftd // 2)
    kmax = int(np.ceil(ceil_f0 / (fs / fftd) / 2)) + 2

    if c["n_bands"] == 0:
        # narrowband fs (<= ~8 kHz): no 3 kHz coarse bands below
        # fs/2 - 3000 — the spectrum interpolates straight between the DC
        # and Nyquist anchors, exactly as the host path does
        coarse = jnp.zeros((F, 0))
    else:
        static_centroid = _jax_dc_correct(centroid(), cf0, fs, fftd, jmax)

        def smoothed_ps_frame(origin, cf):
            seg, _ = _jax_windowed(x, origin, cf, fs, 4.0, "hanning",
                                   c["max_hw"], n_valid)
            return jnp.abs(jnp.fft.rfft(seg, fftd)) ** 2
        sm_ps = jax.vmap(smoothed_ps_frame)(origins, cf0)
        sm_ps = _jax_dc_correct(sm_ps, cf0, fs, fftd, jmax)
        sm_ps = _jax_linear_smoothing(sm_ps, cf0, fs, fftd, kmax)

        sgd = static_centroid / jnp.maximum(sm_ps, 1e-30)
        sgd = _jax_linear_smoothing(sgd, cf0 / 2.0, fs, fftd, kmax)
        sgd = sgd - _jax_linear_smoothing(sgd, cf0, fs, fftd, kmax)

        # --- coarse aperiodicity per 3 kHz band ---
        wl = c["window_length"]
        hw = wl // 2
        halfd = c["half_d4c"]
        coarse_list = []
        for i in range(c["n_bands"]):
            center = int(3000.0 * (i + 1) * fftd / fs)
            idx = np.arange(center - hw, center - hw + wl)
            valid = (idx >= 0) & (idx <= halfd)
            seg = jnp.where(jnp.asarray(valid)[None, :],
                            sgd[:, jnp.asarray(np.clip(idx, 0, halfd))], 0.0)
            ps = jnp.abs(jnp.fft.rfft(seg * jnp.asarray(c["window"],
                                                        jnp.float32),
                                      fftd, axis=1)) ** 2
            cum = jnp.cumsum(jnp.sort(ps, axis=1), axis=1)
            coarse_list.append(10.0 * jnp.log10(
                jnp.maximum(cum[:, halfd - c["boundary"] - 1], 1e-30)
                / cum[:, halfd]))
        coarse = jnp.stack(coarse_list, axis=1)  # (F, n_bands)
        coarse = jnp.minimum(0.0, coarse + (cf0[:, None] - 100.0) / 50.0)

    # --- interpolate band anchors over the output spectrum ---
    anchors_f = np.concatenate([[0.0], c["bands"], [fs / 2.0]])
    freqs_out = np.arange(c["half_out"]) * fs / fft_size
    si = np.clip(np.searchsorted(anchors_f, freqs_out, side="right") - 1,
                 0, len(anchors_f) - 2)
    frac = np.clip((freqs_out - anchors_f[si])
                   / (anchors_f[si + 1] - anchors_f[si]), 0.0, 1.0)
    anchors_db = jnp.concatenate(
        [jnp.full((F, 1), -60.0), coarse, jnp.full((F, 1), -1e-12)], axis=1)
    ap_db = (anchors_db[:, jnp.asarray(si)] * (1.0 - jnp.asarray(frac, jnp.float32))
             + anchors_db[:, jnp.asarray(si + 1)] * jnp.asarray(frac, jnp.float32))
    ap = 10.0 ** (ap_db / 20.0)

    voiced = (f0 > 0.0) & (love > threshold)
    ap = jnp.where(voiced[:, None], ap, UNVOICED_AP)
    return jnp.clip(ap, 1e-12, UNVOICED_AP)


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


@functools.partial(jax.jit, static_argnames=(
    "fs", "fft_size", "mcep_dim", "f0_floor", "f0_ceil", "frame_period",
    "cheaptrick_floor", "f0_analyzer"))
def jax_analyze(x: jnp.ndarray, fs: int, n_valid, f_valid, alpha,
                fft_size: int = 1024, mcep_dim: int = 34,
                f0_floor: float = 71.0, f0_ceil: float = 800.0,
                frame_period: float = 5.0,
                cheaptrick_floor: float = 71.0,
                f0_analyzer: str = "harvest"):
    """The ENTIRE analysis pipeline — F0, spectral envelope, aperiodicity,
    mel-cepstrum, coded aperiodicity, normalized power — as ONE jit.

    The staged device path dispatches harvest / CheapTrick / D4C / sp2mc
    as four separate programs, which costs four host<->device round trips
    per utterance (a fixed ~25 ms each on tunneled deployments,
    BENCH_NOTES.md methodology section).  Fusing them into one program
    collapses that to a single dispatch + one batched fetch, and lets XLA
    share the windowed-segment gathers between CheapTrick and D4C.

    Covers the same per-utterance surface the reference consumes from
    sprocket's FeatureExtractor (analyze + mcep + codeap + npow,
    reference src/bin/feature_extract.py:324-327).

    x: (n,) waveform padded to a whole-second bucket; n_valid (traced):
    true sample count; f_valid (traced): true frame count — only the
    first f_valid frames enter the npow utterance-mean.  alpha (traced):
    mcep all-pass constant.
    Returns (f0, mcep, codeap, npow) at the PADDED frame count; callers
    slice to f_valid.
    """
    from qpnet_tpu.dsp.world.codec import band_frequencies
    from qpnet_tpu.dsp.world.jax_f0 import (
        jax_dio, jax_harvest, jax_stonemask,
    )

    x = jnp.asarray(x, jnp.float32)
    kw = dict(n_valid=n_valid, f0_floor=f0_floor, f0_ceil=f0_ceil,
              frame_period=frame_period)
    if f0_analyzer == "harvest":
        f0 = jax_harvest(x, fs, **kw)
    else:
        f0 = jax_stonemask(x, jax_dio(x, fs, **kw), fs, **kw)
    F = f0.shape[0]
    # trace-time f64 axis cast to f32 — bit-identical to the staged path's
    # host-side t32 (api.analyze), so fused == staged exactly
    time_axis = jnp.asarray(
        np.arange(F) * (frame_period / 1000.0), jnp.float32)

    spc = jax_cheaptrick(x, f0, time_axis, fs, fft_size=fft_size,
                         f0_floor=cheaptrick_floor, f0_ceil=f0_ceil,
                         n_valid=n_valid)
    ap = jax_d4c(x, f0, time_axis, fs, fft_size=fft_size,
                 f0_ceil=max(f0_ceil, 1000.0), n_valid=n_valid)
    mcep = jax_sp2mc(spc, mcep_dim, alpha)

    # coded aperiodicity: band-center samples in dB (codec.code_aperiodicity)
    half = fft_size // 2 + 1
    bands = band_frequencies(fs)
    idx = np.minimum((bands / (fs / 2.0) * (half - 1)).round().astype(int),
                     half - 1)
    codeap = 20.0 * jnp.log10(jnp.maximum(ap[:, idx], 1e-12))

    # normalized frame power in dB (mcep.spectrogram2npow), with the
    # utterance mean taken over the true frames only
    pows = (spc[:, 0] + spc[:, -1]
            + 2.0 * jnp.sum(spc[:, 1:-1], axis=1)) / fft_size
    mask = jnp.arange(F) < f_valid
    meanpow = jnp.sum(jnp.where(mask, pows, 0.0)) / f_valid
    npow = 10.0 * jnp.log10(jnp.maximum(pows, 1e-30)
                            / jnp.maximum(meanpow, 1e-30))
    return f0, mcep, codeap, npow
