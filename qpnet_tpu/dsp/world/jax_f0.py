"""Device-side (jittable) F0 estimation: harvest AND dio+stonemask.

The host estimators (dsp/world/dio.py, harvest.py) are numpy re-derivations
of WORLD's interval-agreement method; this module re-expresses the same
pipelines as fixed-shape array programs so the FULL feature-extraction
pipeline — F0 included — runs under one jit on TPU (previously F0 was the
one stage pinned to the host, jax_analysis.py docstring).  Both analyzers
share the candidate front-end (_candidate_tracks); they differ in
selection: harvest pools candidates and Viterbi-tracks the contour, dio
takes the per-frame best band and repairs the contour with the
FixF0Contour scans (_fix_contour_scan), then jax_stonemask refines.

TPU-first reformulations (vs the host/numpy shapes of the same stages):

  * candidate-band filtering: the per-band Nuttall-sinc low-pass bank is a
    trace-time constant (depends only on fs/f0 range), so all ~85 channels
    reduce to ONE broadcast spectrum multiply + ONE batched irfft;
  * event-interval tracks: variable-length zero-crossing/peak event lists
    become per-sample prefix scans — `cummax` of masked event times gives
    "previous event", a reversed `cummin` gives "next event", and the
    straddling interval 1/(next-prev) sampled at frame centers replaces
    numpy's interp over a ragged midpoint grid (exact inside a period;
    differs from the host track only by sub-interval interpolation);
  * candidate pooling: per-frame agreement sort over channels + 5% dedup
    runs as a `lax.fori_loop` over channel ranks carrying the (F, K)
    pooled table;
  * refinement: the StoneMask instantaneous-frequency correction evaluates
    windowed DFTs at the 6 harmonic frequencies directly (6 fused
    multiply-reduce sweeps over a static window slot) instead of batched
    full FFTs — no fftl padding, no host-side size bucketing;
  * contour: the {unvoiced + K candidates} Viterbi is a `lax.scan` over
    frames with a (K+1)^2 transition matrix, and the short-voiced-run
    cleanup is two index prefix scans (run start/end) instead of a Python
    walk.

Same capability as the reference's pyworld/harvest F0 stage
(reference src/bin/feature_extract.py:324, SURVEY.md §2.2) with the same
(f0_floor, f0_ceil, frame_period) contract; agreement with the host
implementation is pinned in tests/test_jax_f0.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qpnet_tpu.dsp.world.common import next_pow2
from qpnet_tpu.dsp.world.dio import band_lowpass_responses, decimation_plan

_NEG = -1e30
_POS = 1e30


# ---------------------------------------------------------------------------
# trace-time constants: the decimation geometry and candidate filter bank
# are the host estimators' own (dio.decimation_plan /
# band_lowpass_responses), computed in numpy while tracing
# ---------------------------------------------------------------------------

def _band_bank(n_d: int, fs_d: float, boundaries: np.ndarray):
    """(fftl_d, (n_ch, fftl_d//2+1) float32 responses) sized like
    dio._SpectrumCache: padded past the longest (lowest-band) filter."""
    max_half = int(round(fs_d / boundaries[0] / 2.0))
    fftl_d = next_pow2(n_d + 2 * max_half + 1)
    H = band_lowpass_responses(boundaries, fs_d, fftl_d)
    return fftl_d, H.astype(np.float32)


# ---------------------------------------------------------------------------
# event-interval tracks as prefix scans
# ---------------------------------------------------------------------------

def _straddle_track(sig: jnp.ndarray, fs_d: float, centers: jnp.ndarray,
                    mask_fn, offset: float) -> jnp.ndarray:
    """F0 track at frame-center samples from one event type.

    sig: (C, n) band signals; centers: (F,) sample indices at fs_d.
    mask_fn(s0, s1) -> event-between-samples mask; event time is
    (i + offset + frac)/fs_d with frac the linear zero-crossing position.
    Returns (C, F) f0 values (0 where undefined).
    """
    s0, s1 = sig[:, :-1], sig[:, 1:]
    mask = mask_fn(s0, s1)
    frac = s0 / (s0 - s1 + 1e-30)
    i = jnp.arange(s0.shape[1], dtype=jnp.float32)
    t_ev = jnp.where(mask, (i[None, :] + offset + frac) / fs_d, 0.0)

    prev = jax.lax.cummax(jnp.where(mask, t_ev, _NEG), axis=1)
    nxt = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(mask, t_ev, _POS), axis=1), axis=1), axis=1)

    # frame center c: previous event at sample <= c-1, next at sample >= c
    c = jnp.clip(centers, 1, s0.shape[1] - 1)
    p = prev[:, c - 1]                                  # (C, F)
    q = nxt[:, c]
    interval = q - p
    ok = (p > _NEG / 2) & (q < _POS / 2) & (interval > 1e-6)
    f0 = jnp.where(ok, 1.0 / jnp.maximum(interval, 1e-6), 0.0)
    # match the host's "needs >= 3 events" guard per channel
    enough = jnp.sum(mask, axis=1) >= 3
    return jnp.where(enough[:, None], f0, 0.0)


def _channel_tracks(xbs: jnp.ndarray, fs_d: float,
                    centers: jnp.ndarray) -> jnp.ndarray:
    """(4, C, F) tracks: negzc / poszc / peak / dip (dio.py order)."""
    neg = _straddle_track(xbs, fs_d, centers,
                          lambda a, b: (a > 0) & (b <= 0), 0.0)
    pos = _straddle_track(xbs, fs_d, centers,
                          lambda a, b: (a < 0) & (b >= 0), 0.0)
    d = xbs[:, 1:] - xbs[:, :-1]
    pk = _straddle_track(d, fs_d, centers,
                         lambda a, b: (a > 0) & (b <= 0), 0.5)
    dp = _straddle_track(d, fs_d, centers,
                         lambda a, b: (a < 0) & (b >= 0), 0.5)
    return jnp.stack([neg, pos, pk, dp])


def _candidate_tracks(x, fs: int, n_valid, f0_floor: float, f0_ceil: float,
                      frame_period: float, channels_in_octave: float):
    """Shared candidate front-end of the device estimators: 50 Hz low-cut,
    f0_ceil decimation, Nuttall-sinc band bank, four event-interval tracks.

    Returns (tracks (4, C, F), boundaries (C,) numpy, frame_times (F,),
    masked full-rate signal)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    if n_valid is None:
        n_valid = n
    x = jnp.where(jnp.arange(n) < n_valid, x, 0.0)

    frame_shift = fs * frame_period / 1000.0
    F = int(n / frame_shift) + 1
    frame_times = jnp.arange(F) * (frame_period / 1000.0)

    # low-cut (50 Hz) + decimation in one spectrum pass
    fftl, m, fs_d, n_d = decimation_plan(n, fs, f0_ceil)
    X = jnp.fft.rfft(x, fftl)
    f = jnp.fft.rfftfreq(fftl, 1.0 / fs)
    gain = jnp.clip((f - 25.0) / 25.0, 0.0, 1.0)        # 50 Hz low-cut
    Xg = X * gain
    if m < fftl:
        xd = jnp.fft.irfft(Xg[: m // 2 + 1], m) * (m / fftl)
        xd = xd[:n_d]
    else:
        xd = jnp.fft.irfft(Xg, fftl)[:n]

    # candidate channels: one batched spectrum multiply + irfft
    n_ch = 1 + int(np.log2(f0_ceil / f0_floor) * channels_in_octave)
    boundaries = f0_floor * 2.0 ** ((np.arange(n_ch) + 1)
                                    / channels_in_octave)
    fftl_d, H = _band_bank(n_d, fs_d, boundaries)
    Xd = jnp.fft.rfft(xd.astype(jnp.float32), fftl_d)
    xbs = jnp.fft.irfft(Xd[None, :] * H, fftl_d, axis=-1)[:, :n_d]

    centers = jnp.clip(jnp.round(frame_times * fs_d).astype(jnp.int32),
                       0, n_d - 1)
    tr = _channel_tracks(xbs, fs_d, centers)            # (4, C, F)
    return tr, boundaries, frame_times, x


# ---------------------------------------------------------------------------
# pooling, refinement, contour
# ---------------------------------------------------------------------------

def _pool_candidates(cands: jnp.ndarray, spreads: jnp.ndarray,
                     agreement_threshold: float, max_candidates: int):
    """Best-agreeing, ~5%-deduped candidates per frame: (F, K)."""
    n_ch, F = cands.shape
    order = jnp.argsort(spreads, axis=0)
    sp_sorted = jnp.take_along_axis(spreads, order, axis=0)
    f_sorted = jnp.take_along_axis(cands, order, axis=0)
    K = max_candidates

    def body(r, state):
        pooled, n_chosen = state
        f = jax.lax.dynamic_slice_in_dim(f_sorted, r, 1, 0)[0]      # (F,)
        sp = jax.lax.dynamic_slice_in_dim(sp_sorted, r, 1, 0)[0]
        ok = (sp <= agreement_threshold) & (f > 0)
        dup = jnp.any(jnp.abs(f[:, None] - pooled)
                      < 0.05 * jnp.maximum(pooled, 1e-9), axis=1)
        take = ok & ~dup & (n_chosen < K)
        slot = jax.nn.one_hot(n_chosen, K, dtype=pooled.dtype)      # (F, K)
        pooled = pooled + jnp.where(take[:, None], slot * f[:, None], 0.0)
        n_chosen = n_chosen + take.astype(n_chosen.dtype)
        return pooled, n_chosen

    pooled = jnp.zeros((F, K), jnp.float32)
    n_chosen = jnp.zeros((F,), jnp.int32)
    pooled, _ = jax.lax.fori_loop(0, n_ch, body, (pooled, n_chosen))
    return pooled


N_HARMONICS = 6


def _refine(x: jnp.ndarray, fs: int, frame_times: jnp.ndarray,
            pooled: jnp.ndarray, f0_floor: float, f0_ceil: float,
            n_valid, clamp_range: bool = True) -> tuple:
    """StoneMask IF refinement of every pooled candidate.

    Windowed DFTs evaluated directly at harmonic frequencies over a static
    +-hw_max slot (refine.py's padded-slot trick; the Blackman window is
    zero outside its per-query support, so one common slot is exact).
    Returns (refined (F, K), score (F, K)).
    """
    F, K = pooled.shape
    valid = pooled > 0
    f0c = jnp.where(valid, pooled, 100.0)               # (F, K)
    hw = (1.5 * fs / f0c).astype(jnp.int32) + 1
    hw_max = int(1.5 * fs / f0_floor) + 1

    centers = jnp.round(frame_times * fs).astype(jnp.int32)  # (F,)
    offs = jnp.arange(-hw_max, hw_max + 1)              # (W,)
    idx = centers[:, None] + offs[None, :]              # (F, W)
    inside = (idx >= 0) & (idx < n_valid)
    seg = jnp.where(inside, x[jnp.clip(idx, 0, x.shape[0] - 1)], 0.0)

    tt = offs[None, None, :] / hw[:, :, None]           # (F, K, W)
    w = jnp.where(jnp.abs(tt) <= 1.0,
                  0.42 + 0.5 * jnp.cos(jnp.pi * tt)
                  + 0.08 * jnp.cos(2 * jnp.pi * tt), 0.0).astype(jnp.float32)
    segw = seg[:, None, :].astype(jnp.float32) * w      # (F, K, W)
    seg1 = jnp.concatenate(
        [seg[:, 1:], jnp.zeros_like(seg[:, :1])], axis=1)
    segw1 = seg1[:, None, :].astype(jnp.float32) * w

    ks = jnp.arange(1, N_HARMONICS + 1, dtype=jnp.float32)
    num = jnp.zeros((F, K), jnp.float32)
    den = jnp.zeros((F, K), jnp.float32)
    offs_f = offs.astype(jnp.float32)
    for h in range(N_HARMONICS):
        fk = f0c * (h + 1)                              # (F, K)
        ok = fk < fs / 2
        ph = (2 * jnp.pi / fs) * fk[:, :, None] * offs_f[None, None, :]
        cw, sw = jnp.cos(ph), jnp.sin(ph)
        re1 = jnp.sum(segw * cw, axis=-1)
        im1 = -jnp.sum(segw * sw, axis=-1)
        re2 = jnp.sum(segw1 * cw, axis=-1)
        im2 = -jnp.sum(segw1 * sw, axis=-1)
        # phase advance over one sample -> instantaneous frequency
        cross_im = im2 * re1 - re2 * im1
        cross_re = re2 * re1 + im2 * im1
        inst = jnp.arctan2(cross_im, cross_re) * fs / (2 * jnp.pi)
        dev = inst - fk
        dev = jnp.mod(dev + fs / 2, fs) - fs / 2
        inst = fk + dev
        pk = jnp.where(ok, jnp.sqrt(re1 * re1 + im1 * im1), 0.0)
        num = num + pk * jnp.where(ok, inst, 0.0) / ks[h]
        den = den + pk
    refined = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)
    bad = (~valid) | (refined <= 0) | (refined < f0c * 0.5) \
        | (refined > f0c * 2.0)
    if clamp_range:
        # harvest rejects refinements leaving the analysis range; the
        # stonemask contract (refine.py) keeps them (only the octave test)
        bad = bad | (refined < f0_floor) | (refined > f0_ceil)
    refined = jnp.where(bad, 0.0, refined)
    score = jnp.where(refined > 0, jnp.maximum(
        0.0, 1.0 - 5.0 * jnp.abs(refined - pooled)
        / jnp.maximum(pooled, 1e-9)), 0.0)
    return refined, score


def _viterbi(refined: jnp.ndarray, score: jnp.ndarray,
             transition_cost: float, unvoiced_cost: float) -> jnp.ndarray:
    """Contour tracking over {unvoiced + K candidates}; returns (F,) f0."""
    F, K = refined.shape
    S = K + 1
    INF = 1e30
    emits = jnp.full((F, S), INF)
    emits = emits.at[:, 0].set(unvoiced_cost)
    emits = emits.at[:, 1:].set(jnp.where(refined > 0, 1.0 - score, INF))
    logf = jnp.log(jnp.maximum(refined, 1e-9))          # (F, K)

    def step(carry, inp):
        cost_prev, logf_prev = carry
        emit_t, logf_t = inp
        trans = jnp.full((S, S), unvoiced_cost)
        trans = trans.at[0, 0].set(0.0)
        trans = trans.at[1:, 1:].set(
            transition_cost * jnp.abs(logf_t[:, None] - logf_prev[None, :]))
        tot = cost_prev[None, :] + trans                # (s, p)
        bp = jnp.argmin(tot, axis=1)
        cost = jnp.min(tot, axis=1) + emit_t
        return (cost, logf_t), (cost, bp)

    (_, _), (costs, back) = jax.lax.scan(
        step, (emits[0], logf[0]), (emits[1:], logf[1:]))
    cost_last = jnp.concatenate([emits[:1], costs])[-1]

    s_last = jnp.argmin(cost_last).astype(jnp.int32)

    def back_step(s, bp_t):
        s_prev = bp_t[s]
        return s_prev, s

    # back[t] maps frame-(t+1) states to their frame-t predecessors, so
    # the reversed scan emits [state_{F-1} .. state_1] and its FINAL
    # CARRY is state_0 — it belongs at the front, not s_last at the back
    s0, states_rev = jax.lax.scan(back_step, s_last, jnp.flip(back, axis=0))
    states = jnp.concatenate(
        [s0[None], jnp.flip(states_rev)])               # (F,)
    f0 = jnp.where(states > 0,
                   jnp.take_along_axis(
                       refined, jnp.maximum(states[:, None] - 1, 0),
                       axis=1)[:, 0], 0.0)
    return f0


def _drop_short_runs(f0: jnp.ndarray, min_frames: int) -> jnp.ndarray:
    """Zero voiced runs shorter than min_frames (two index prefix scans)."""
    v = f0 > 0
    n = f0.shape[0]
    iota = jnp.arange(n)
    onset = v & jnp.concatenate([jnp.array([True]), ~v[:-1]])
    start = jax.lax.cummax(jnp.where(onset, iota, -1))
    offset_ = v & jnp.concatenate([~v[1:], jnp.array([True])])
    end = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(offset_, iota, n)), axis=0))
    run_len = end - start + 1
    return jnp.where(v & (run_len < min_frames), 0.0, f0)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "fs", "f0_floor", "f0_ceil", "frame_period", "channels_in_octave",
    "agreement_threshold", "max_candidates", "transition_cost",
    "unvoiced_cost"))
def jax_harvest(x: jnp.ndarray, fs: int, n_valid=None,
                f0_floor: float = 71.0, f0_ceil: float = 800.0,
                frame_period: float = 5.0,
                channels_in_octave: float = 24.0,
                agreement_threshold: float = 0.10,
                max_candidates: int = 6,
                transition_cost: float = 8.0,
                unvoiced_cost: float = 0.35) -> jnp.ndarray:
    """Device-side F0 track; same contract as harvest.harvest.

    x: (n,) waveform, optionally zero-padded to a bucketed length;
    n_valid (traced): true signal length — samples beyond are ignored.
    Returns (F,) f0 where F = n//(fs*frame_period/1000)+1 for the PADDED
    length; callers slice to the true frame count.
    """
    x = jnp.asarray(x, jnp.float32)
    if n_valid is None:
        n_valid = x.shape[0]
    tr, boundaries, frame_times, x = _candidate_tracks(
        x, fs, n_valid, f0_floor, f0_ceil, frame_period, channels_in_octave)
    cand = tr.mean(axis=0)
    spread = jnp.std(tr, axis=0) / jnp.maximum(cand, 1e-9)
    bnd = jnp.asarray(boundaries, jnp.float32)[:, None]
    bad = ((cand < f0_floor) | (cand > f0_ceil)
           | (cand <= bnd / 2) | (cand > bnd * 2)
           | jnp.any(tr <= 0, axis=0))
    cand = jnp.where(bad, 0.0, cand)
    spread = jnp.where(bad, _POS, spread)

    pooled = _pool_candidates(cand, spread, agreement_threshold,
                              max_candidates)           # (F, K)
    refined, score = _refine(x, fs, frame_times, pooled,
                             f0_floor, f0_ceil, n_valid)
    f0 = _viterbi(refined, score, transition_cost, unvoiced_cost)
    min_frames = max(1, int(round(30.0 / frame_period)))
    return _drop_short_runs(f0, min_frames)


# ---------------------------------------------------------------------------
# device DIO + StoneMask (completes the f0_backend="jax" analyzer matrix)
# ---------------------------------------------------------------------------

def _select_best_f0_jax(prev1, prev2, cands_t, allowed_range: float):
    """dio._select_best_f0 on a candidate vector: the candidate closest to
    the half-step linear extrapolation, 0 when even it disagrees."""
    reference = (prev1 * 3.0 - prev2) / 2.0
    errors = jnp.abs(reference - cands_t)
    b = jnp.argmin(errors)
    v = cands_t[b]
    fail = errors[b] / jnp.maximum(reference, 1e-12) >= allowed_range
    return jnp.where(fail, 0.0, v)


def _fix_contour_scan(f0: jnp.ndarray, cands: jnp.ndarray,
                      frame_period: float, allowed_range: float,
                      f0_floor: float) -> jnp.ndarray:
    """dio._fix_contour (WORLD FixF0Contour steps 1-4) as array ops + two
    lax.scans.

    Steps 1-2 (erode discontinuities, require a fully-voiced +-vrm/2
    window) are sliding-window masks.  Steps 3-4 (re-extend each voiced
    section forward/backward one frame at a time, accepting the band
    candidate nearest the extrapolated contour) carry (prev2, prev1,
    extending) through a forward and a reversed scan: inside-section
    frames reset the carry, gap frames extend while the candidate pool
    keeps agreeing, and a failed extension writes its 0 (host `break`
    writes step[j+1]=0) then leaves later gap frames at their step-3
    values.

    cands: (C, F) per-band candidates (0 where invalid).
    """
    n = f0.shape[0]
    vrm = int(0.5 + 1000.0 / frame_period / f0_floor) * 2 + 1
    if n <= vrm:
        return f0
    half = vrm // 2
    iota = jnp.arange(n)

    # step 1: erode discontinuities (voiced onsets included)
    prev = jnp.concatenate([jnp.zeros(1, f0.dtype), f0[:-1]])
    rel = jnp.abs(f0 - prev) / (1e-12 + f0)
    step1 = jnp.where((iota < vrm) | (rel >= allowed_range), 0.0, f0)

    # step 2: voiced only if the whole +-half window is voiced
    voiced = (step1 > 0).astype(jnp.float32)
    csum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(voiced)])
    window_ok = (csum[vrm:] - csum[:-vrm]) >= vrm       # (n-vrm+1,)
    keep = jnp.ones(n, bool).at[half: n - half].set(window_ok)
    step2 = jnp.where(keep, step1, 0.0)

    cands_t = jnp.moveaxis(cands, 0, 1)                 # (F, C)

    def fwd(carry, inp):
        # alive: the extension/section value chain is usable; was_gap:
        # the previous frame was a gap frame (host semantics: the forward
        # loop's LAST write lands on starts[i+1] itself, so an extension
        # chain that survives its gap OVERWRITES the next section's first
        # frame with the select value before the interior resumes)
        prev2, prev1, alive, was_gap = carry
        s2, cv = inp
        inside = s2 > 0.0
        v_ext = _select_best_f0_jax(prev1, prev2, cv, allowed_range)
        overwrite = inside & was_gap & alive
        can = (~inside) & alive & (prev1 > 0.0)
        v = jnp.where(inside, jnp.where(overwrite, v_ext, s2),
                      jnp.where(can, v_ext, 0.0))
        new_alive = inside | (can & (v_ext > 0.0))
        return (prev1, v, new_alive, ~inside), v

    init = (jnp.float32(0.0), jnp.float32(0.0),
            jnp.bool_(False), jnp.bool_(False))
    _, step3 = jax.lax.scan(fwd, init, (step2, cands_t))

    def bwd(carry, inp):
        prev2, prev1, alive, _ = carry                  # values at t+2, t+1
        s2, s3, cv = inp
        inside = s2 > 0.0
        can = (~inside) & alive & (prev1 > 0.0)
        v_ext = _select_best_f0_jax(prev1, prev2, cv, allowed_range)
        # backward extension overwrites forward fills while it succeeds
        # and writes its terminating 0 (host `break` lands the zero);
        # non-extending gap frames keep step 3's value.  Unlike forward,
        # its last write is the gap frame ends[i-1]+1 — section frames
        # are never overwritten going backward.
        v = jnp.where(inside, s3, jnp.where(can, v_ext, s3))
        new_alive = inside | (can & (v_ext > 0.0))
        return (prev1, v, new_alive, ~inside), v

    _, rev = jax.lax.scan(bwd, init,
                          (step2[::-1], step3[::-1], cands_t[::-1]))
    out = rev[::-1]
    # the host backward loop's bound for the first section is limit=1
    # (dio.py _fix_contour step 4): frame 0 is never written, so an
    # extension chain that survives to the start must not voice it
    return out.at[0].set(step3[0])


@functools.partial(jax.jit, static_argnames=(
    "fs", "f0_floor", "f0_ceil", "frame_period", "channels_in_octave",
    "allowed_range"))
def jax_dio(x: jnp.ndarray, fs: int, n_valid=None,
            f0_floor: float = 71.0, f0_ceil: float = 800.0,
            frame_period: float = 5.0,
            channels_in_octave: float = 2.0,
            allowed_range: float = 0.1) -> jnp.ndarray:
    """Device-side DIO F0 track; same contract as dio.dio (without the
    time axis, which is frame_period-implied).

    Shares the candidate front-end with jax_harvest; DIO's selection is
    per-frame best-band (minimal normalized interval spread) instead of
    pooling + Viterbi, followed by the FixF0Contour scans.
    """
    tr, boundaries, frame_times, x = _candidate_tracks(
        x, fs, n_valid, f0_floor, f0_ceil, frame_period, channels_in_octave)
    cand = tr.mean(axis=0)                              # (C, F)
    rel = jnp.std(tr, axis=0)
    bnd = jnp.asarray(boundaries, jnp.float32)[:, None]
    bad = ((cand < f0_floor) | (cand > f0_ceil)
           | (cand <= bnd / 2) | (cand > bnd * 2)
           | jnp.any(tr <= 0, axis=0))
    cand = jnp.where(bad, 0.0, cand)
    rel = jnp.where(bad, _POS, rel)

    score = rel / jnp.maximum(cand, 1e-9)
    best = jnp.argmin(score, axis=0)                    # (F,)
    f0 = jnp.take_along_axis(cand, best[None, :], axis=0)[0]
    best_rel = jnp.take_along_axis(rel, best[None, :], axis=0)[0] \
        / jnp.maximum(f0, 1e-9)
    f0 = jnp.where(best_rel < allowed_range, f0, 0.0)
    return _fix_contour_scan(f0, cand, frame_period, allowed_range,
                             f0_floor)


@functools.partial(jax.jit, static_argnames=(
    "fs", "f0_floor", "f0_ceil", "frame_period"))
def jax_stonemask(x: jnp.ndarray, f0: jnp.ndarray, fs: int, n_valid=None,
                  f0_floor: float = 71.0, f0_ceil: float = 800.0,
                  frame_period: float = 5.0) -> jnp.ndarray:
    """Device StoneMask: two instantaneous-frequency refinement passes
    (stonemask.stonemask); only the octave divergence test rejects —
    range clamping is harvest's convention, not stonemask's.

    f0_floor sizes the static refinement window slot; pass 2 refines
    pass-1 values that may sit as low as f0_floor/2, so the slot is sized
    for that."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    if n_valid is None:
        n_valid = n
    x = jnp.where(jnp.arange(n) < n_valid, x, 0.0)
    F = f0.shape[0]
    frame_times = jnp.asarray(
        np.arange(F) * (frame_period / 1000.0), jnp.float32)
    f0 = jnp.asarray(f0, jnp.float32)
    r1, _ = _refine(x, fs, frame_times, f0[:, None],
                    f0_floor * 0.5, f0_ceil, n_valid, clamp_range=False)
    r2, _ = _refine(x, fs, frame_times, r1,
                    f0_floor * 0.5, f0_ceil, n_valid, clamp_range=False)
    r1, r2 = r1[:, 0], r2[:, 0]
    return jnp.where(r2 > 0, r2, r1)
