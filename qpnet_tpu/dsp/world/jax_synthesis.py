"""Jittable (device-runnable) WORLD synthesis — the last host-only stage
of the DSP pipeline moved onto the accelerator.

The host path (dsp/world/synthesis.py, the algorithm the reference
reaches through sprocket/pyworld at feature_extract.py:215-274) walks the
excitation pulses in a Python loop: per pulse, a handful of 1024-point
FFTs plus bookkeeping — cheap FLOPs strangled by interpreter overhead.
Here the same construction is expressed as fixed-shape array ops:

  * pulse positions come from an integer-cycle crossing of the cumulative
    instantaneous frequency (identical events to the host's wrapped-phase
    jumps, since the per-sample phase step is always < pi), extracted
    with a static upper bound `P_max = n*ceil(F0)/fs` via
    `jnp.nonzero(size=...)`;
  * every pulse's periodic response (minimum-phase spectrum of
    sqrt(sp*(1-ap^2)), fractional-position phase ramp, DC remover) and
    aperiodic burst (zero-mean masked noise filtered by the minimum-phase
    response of sqrt(sp*ap^2)) are built for ALL pulse slots at once with
    batched FFTs; invalid slots are masked to zero;
  * responses overlap-add with one scatter-add of a (P, fftl) block.

Equivalence with the host path is tested in tests/test_jax_synthesis.py:
pulse times match exactly on the shared fixture, and the deterministic
(periodic-dominant) waveform matches to float32 tolerance.  The noise
realization differs from the host's numpy RNG by construction — like the
host path, it is deterministic per (seed, shape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qpnet_tpu.dsp.world.synthesis import DEFAULT_F0, _dc_remover


def _min_phase(log_amp, fftl: int):
    """Batched minimum-phase spectrum (cepstral method): (P, half+1) real
    log-amplitude -> (P, half+1) complex.  Mirrors
    common.minimum_phase_spectrum's fold (double positive quefrencies,
    keep c[0] and c[fftl/2], zero the negative half)."""
    c = jnp.fft.irfft(log_amp, n=fftl, axis=-1)
    fold = jnp.concatenate([
        jnp.ones(1), 2.0 * jnp.ones(fftl // 2 - 1), jnp.ones(1),
        jnp.zeros(fftl // 2 - 1)])
    return jnp.exp(jnp.fft.rfft(c * fold.astype(c.dtype), axis=-1))


def _pulse_slots(f0, fs: int, frame_period: float, n_samples: int,
                 p_max: int):
    """Excitation pulse slots with a static bound.

    Returns (pulses, shift_s, voiced, valid), each of length p_max + 1
    (one extra slot for the host path's prepended t=0 pulse when the
    first phase wrap falls inside the signal).
    """
    F = f0.shape[0]
    fp_s = frame_period / 1000.0
    # per-sample linear interpolation of the frame-rate track (host:
    # np.interp over the uniform frame grid, clamped at both ends)
    pos = jnp.arange(n_samples) / (fp_s * fs)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(F - 2, 0))
    i1 = jnp.minimum(i0 + 1, F - 1)
    w = jnp.clip(pos - i0, 0.0, 1.0)
    f0v = jnp.where(f0 > 0, f0, 0.0)
    f0_interp = (1.0 - w) * f0v[i0] + w * f0v[i1]
    vflag = (f0 > 0).astype(jnp.float32)
    voiced_interp = ((1.0 - w) * vflag[i0] + w * vflag[i1]) > 0.5
    inst = jnp.where(voiced_interp & (f0_interp > 0), f0_interp, DEFAULT_F0)

    # integer-cycle crossings of the cumulative frequency == the host's
    # wrapped-phase jumps (phase step < pi always)
    cycles = jnp.cumsum(inst / fs)
    ci = jnp.floor(cycles)
    cross = ci[1:] > ci[:-1]
    n_found = jnp.sum(cross)
    found = jnp.nonzero(cross, size=p_max, fill_value=n_samples - 1)[0]
    found = found.astype(jnp.int32)
    valid_f = jnp.arange(p_max) < n_found
    # sub-sample crossing position (host: -y1/(y2-y1) on the wrapped
    # phase), in cycles: (1-r1)/(r2+1-r1) with r = frac(cycles)
    r1 = (cycles - ci)[found]
    r2 = (cycles - ci)[found + 1]
    frac = (1.0 - r1) / jnp.maximum(r2 + 1.0 - r1, 1e-12)
    shift_f = frac / fs

    # host prepends a t=0 pulse when the first wrap is not at sample 0
    prepend = (n_found == 0) | (found[0] != 0)
    z32 = jnp.zeros(1, jnp.int32)
    pulses = jnp.where(
        prepend,
        jnp.concatenate([z32, found]),
        jnp.concatenate([found, jnp.full(1, n_samples - 1, jnp.int32)]))
    shift = jnp.where(
        prepend,
        jnp.concatenate([jnp.zeros(1), shift_f]),
        jnp.concatenate([shift_f, jnp.zeros(1)]))
    valid = jnp.where(
        prepend,
        jnp.concatenate([jnp.ones(1, bool), valid_f]),
        jnp.concatenate([valid_f, jnp.zeros(1, bool)]))
    voiced = voiced_interp[pulses]
    return pulses, shift, voiced, valid


@functools.partial(jax.jit, static_argnames=("fs", "frame_period",
                                             "f0_ceil"))
def jax_synthesize(f0: jnp.ndarray, sp: jnp.ndarray, ap: jnp.ndarray,
                   seed, fs: int, frame_period: float = 5.0,
                   f0_ceil: float = 800.0) -> jnp.ndarray:
    """f0 (F,), spectral envelope sp (F, fftl//2+1), aperiodicity ap
    (F, fftl//2+1) -> waveform (F * frame_period * fs / 1000,) float32.

    `f0_ceil` (static) bounds the pulse count; instantaneous frequency is
    clipped to max(f0_ceil, 500) (a track above the ceiling would
    otherwise overflow the static pulse slots).  `seed` (traced uint32)
    drives the aperiodic-burst PRNG — like the host path's `seed`
    argument, every call with the same seed and shapes reuses the same
    noise realization.
    """
    f0 = jnp.asarray(f0, jnp.float32)
    sp = jnp.asarray(sp, jnp.float32)
    ap = jnp.asarray(ap, jnp.float32)
    F, half1 = sp.shape
    fftl = (half1 - 1) * 2
    fp_s = frame_period / 1000.0
    n_samples = int(F * fp_s * fs)
    ceil_eff = max(float(f0_ceil), DEFAULT_F0)
    p_max = int(n_samples * ceil_eff / fs) + 2

    pulses, shift, voiced, valid = _pulse_slots(
        jnp.minimum(f0, ceil_eff), fs, frame_period, n_samples, p_max)
    P = p_max + 1

    # interval to the next pulse (host: last pulse reuses the previous
    # gap, a lone pulse defaults to fftl)
    nxt = jnp.concatenate([pulses[1:], pulses[-1:]])
    prv = jnp.concatenate([pulses[:1], pulses[:-1]])
    k = jnp.arange(P)
    n_valid_p = jnp.sum(valid)
    interval = jnp.where(
        k == n_valid_p - 1,
        jnp.where(k > 0, pulses - prv, fftl),
        nxt - pulses)
    interval = jnp.maximum(interval, 1)
    # the noise burst lives in an fftl slot (host rfft(noise, fftl) crops
    # longer bursts identically); the energy normalization keeps the
    # true interval
    interval_n = jnp.minimum(interval, fftl)

    # frame-interpolated envelope/aperiodicity at each pulse time (host
    # _frame_interp: clamped linear interpolation between frame rows)
    posf = (pulses.astype(jnp.float32) / fs) / fp_s
    j0 = jnp.clip(jnp.floor(posf).astype(jnp.int32), 0, max(F - 2, 0))
    j1 = jnp.minimum(j0 + 1, F - 1)
    wf = jnp.clip(posf - j0, 0.0, 1.0)[:, None]
    sp_p = jnp.maximum((1.0 - wf) * sp[j0] + wf * sp[j1], 1e-30)
    ap_p = jnp.clip((1.0 - wf) * ap[j0] + wf * ap[j1], 1e-12, 1.0 - 1e-12)
    ap_ratio = ap_p * ap_p

    # periodic response: minimum-phase IR of sp*(1-ap^2), delayed by the
    # fractional pulse position as a spectral phase ramp, DC-removed,
    # scaled by sqrt(interval) (line-spectrum energy normalization)
    periodic_on = voiced & (ap_ratio[:, 0] <= 0.999) & valid
    per_pow = sp_p * (1.0 - ap_ratio)
    mp = _min_phase(0.5 * jnp.log(jnp.maximum(per_pow, 1e-30)), fftl)
    bins = jnp.arange(half1, dtype=jnp.float32)
    coeff = (2.0 * jnp.pi * shift * fs / fftl).astype(jnp.float32)
    ramp = jnp.exp(-1j * (coeff[:, None] * bins[None, :]))
    ir = jnp.fft.irfft(mp * ramp, n=fftl, axis=-1)
    dc_rem = jnp.asarray(_dc_remover(fftl), jnp.float32)
    ir = ir + ir.sum(axis=-1, keepdims=True) * dc_rem[None, :]
    periodic = jnp.where(periodic_on[:, None],
                         ir * jnp.sqrt(interval.astype(jnp.float32))[:, None],
                         0.0)

    # aperiodic burst: zero-mean noise over the pulse interval, filtered
    # by the minimum-phase response of sp*ap^2 (full envelope when the
    # periodic path is gated off)
    noise_pow = jnp.where(periodic_on[:, None], sp_p * ap_ratio, sp_p)
    mpn = _min_phase(0.5 * jnp.log(jnp.maximum(noise_pow, 1e-30)), fftl)
    key = jax.random.fold_in(jax.random.PRNGKey(0),
                             jnp.asarray(seed, jnp.uint32))
    noise = jax.random.normal(key, (P, fftl), jnp.float32)
    nmask = (jnp.arange(fftl)[None, :] < interval_n[:, None]).astype(
        jnp.float32)
    nz = noise * nmask
    nz = nz - nmask * (nz.sum(axis=-1, keepdims=True)
                       / interval_n[:, None].astype(jnp.float32))
    burst = jnp.fft.irfft(jnp.fft.rfft(nz, axis=-1) * mpn, n=fftl, axis=-1)

    resp = (periodic + burst) * valid[:, None].astype(jnp.float32)

    # scatter-free overlap-add: an element scatter of P*fftl arbitrary
    # positions serializes on TPU (measured 0.5 s/utterance).  Instead,
    # time is cut into fftl-sample chunks; a pulse at p = c*fftl + off
    # lands entirely inside the 2*fftl frame anchored at chunk c, so its
    # response is placed there by a spectral phase ramp (exact circular
    # shift, off < fftl so no wrap), all frames are summed with ONE
    # one-hot matmul over pulses (MXU work, no scatter), and the frames
    # overlap-add at static stride fftl.
    n_frames = (n_samples - 1) // fftl + 1
    c_id = pulses // fftl
    off = (pulses - c_id * fftl).astype(jnp.float32)
    S2 = jnp.fft.rfft(resp, n=2 * fftl, axis=-1)
    k2 = jnp.arange(fftl + 1, dtype=jnp.float32)
    S2 = S2 * jnp.exp(-1j * (jnp.pi / fftl) * off[:, None] * k2[None, :])
    onehot = (c_id[:, None] == jnp.arange(n_frames)[None, :]).astype(
        S2.dtype)
    frames = jnp.fft.irfft(jnp.einsum("pk,pc->ck", S2, onehot),
                           n=2 * fftl, axis=-1)
    out = jnp.zeros((n_frames + 1, fftl), jnp.float32)
    out = out.at[:n_frames].add(frames[:, :fftl])
    out = out.at[1:].add(frames[:, fftl:])
    return out.reshape(-1)[:n_samples]


@functools.partial(jax.jit, static_argnames=("fs", "fftl", "frame_period",
                                             "f0_ceil"))
def jax_restore(f0: jnp.ndarray, mcep: jnp.ndarray, codeap: jnp.ndarray,
                alpha, seed, fs: int, fftl: int = 1024,
                frame_period: float = 5.0,
                f0_ceil: float = 800.0) -> jnp.ndarray:
    """The full restore transform — mel-cepstrum + coded aperiodicity ->
    waveform — as ONE device program (the recipe's analysis-synthesis
    check conditions on exactly these h5 datasets, reference
    feature_extract.py:215-274).

    Fusing the envelope/aperiodicity decoding onto the device shrinks the
    per-utterance upload from the full (F, fftl//2+1) spectra (~2.4 MB at
    3 s/22.05 kHz) to the ~100 KB coded features — on tunneled
    deployments the transfer IS the wall clock (on-chip synthesis
    measures ~3.5 ms per 3 s utterance).

    mc2sp is evaluated directly on the warped frequency axis:
    log S(w_k) = 2 * sum_m mc[m] cos(m * beta(w_k)) with beta the
    first-order all-pass phase — the finite warped cosine series the
    mel-cepstrum IS (the host freqt+rfft route truncates the equivalent
    linear-frequency cepstrum at fftl/2; agreement ~1e-15).
    """
    from qpnet_tpu.dsp.world.codec import band_frequencies

    half1 = fftl // 2 + 1
    mcep = jnp.asarray(mcep, jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    w = jnp.linspace(0.0, np.pi, half1).astype(jnp.float32)
    beta = w + 2.0 * jnp.arctan2(alpha * jnp.sin(w),
                                 1.0 - alpha * jnp.cos(w))
    m = jnp.arange(mcep.shape[1], dtype=jnp.float32)
    sp = jnp.exp(2.0 * (mcep @ jnp.cos(m[:, None] * beta[None, :])))

    # decode the coarse aperiodicity (codec contract: linear-in-dB
    # between the anchors [0 Hz: -60 dB, 3 kHz bands: coded, fs/2: ~0 dB])
    bands = band_frequencies(fs)
    anchors_f = np.concatenate([[0.0], bands, [fs / 2.0]])
    freqs = np.linspace(0.0, fs / 2.0, half1)
    si = np.clip(np.searchsorted(anchors_f, freqs, side="right") - 1,
                 0, len(anchors_f) - 2)
    fr = ((freqs - anchors_f[si])
          / (anchors_f[si + 1] - anchors_f[si])).astype(np.float32)
    F = codeap.shape[0]
    anch_db = jnp.concatenate(
        [jnp.full((F, 1), -60.0, jnp.float32),
         jnp.asarray(codeap, jnp.float32),
         jnp.full((F, 1), -1e-12, jnp.float32)], axis=1)
    ap_db = (anch_db[:, jnp.asarray(si)] * (1.0 - jnp.asarray(fr))
             + anch_db[:, jnp.asarray(si + 1)] * jnp.asarray(fr))
    ap = jnp.clip(10.0 ** (ap_db / 20.0), 1e-12, 1.0 - 1e-12)
    return jax_synthesize(f0, sp, ap, seed, fs, frame_period=frame_period,
                          f0_ceil=f0_ceil)


def pulse_times_debug(f0: np.ndarray, fs: int, frame_period: float,
                      f0_ceil: float = 800.0):
    """Host-callable pulse extraction (for equivalence tests against
    synthesis._pulse_times): returns (idx, shift_seconds, voiced) with
    the invalid slots stripped."""
    f0 = np.asarray(f0, np.float32)
    F = len(f0)
    fp_s = frame_period / 1000.0
    n_samples = int(F * fp_s * fs)
    ceil_eff = max(float(f0_ceil), DEFAULT_F0)
    p_max = int(n_samples * ceil_eff / fs) + 2
    pulses, shift, voiced, valid = jax.jit(
        _pulse_slots, static_argnames=("fs", "frame_period", "n_samples",
                                       "p_max"))(
        jnp.minimum(jnp.asarray(f0), ceil_eff), fs, frame_period,
        n_samples, p_max)
    m = np.asarray(valid)
    return (np.asarray(pulses)[m], np.asarray(shift)[m],
            np.asarray(voiced)[m])
