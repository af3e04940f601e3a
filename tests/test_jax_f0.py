"""Device-side F0 (jax_harvest): ground-truth tracking, unvoiced
rejection, padding support, and agreement with the host harvest
implementation (dsp/world/harvest.py).

All signals share one (length, fs, search-range) signature so the jitted
pipeline compiles once for the module.
"""

import numpy as np
import pytest

from qpnet_tpu.dsp.world.harvest import harvest
from qpnet_tpu.dsp.world.jax_f0 import jax_harvest

FS = 16000
N = int(1.0 * FS)
KW = dict(f0_floor=90.0, f0_ceil=400.0, channels_in_octave=24.0)


def _run(x, n_valid=None):
    return np.asarray(jax_harvest(np.asarray(x, np.float32), FS,
                                  n_valid=n_valid, **KW))


def _vibrato(f0_base=140.0, amp_h2=0.4, noise=0.02, seed=0, n=N):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    f0 = f0_base + 5.0 * np.sin(2 * np.pi * 5.0 * t)
    phase = 2 * np.pi * np.cumsum(f0) / FS
    x = np.sin(phase) + amp_h2 * np.sin(2 * phase + 1.0)
    return x + noise * rng.standard_normal(n), f0


def test_vibrato_tone_tracking():
    x, f0_true = _vibrato()
    f0 = _run(x)
    F = len(f0)
    ft = f0_true[np.clip((np.arange(F) * 0.005 * FS).astype(int),
                         0, len(f0_true) - 1)]
    voiced = f0 > 0
    assert voiced.mean() > 0.9
    err = (f0 - ft)[voiced]
    assert np.sqrt((err ** 2).mean()) < 2.0


def test_noise_is_unvoiced():
    rng = np.random.default_rng(1)
    f0 = _run(0.1 * rng.standard_normal(N))
    assert (f0 > 0).mean() < 0.1


def test_padding_with_n_valid():
    """Zero-padding with n_valid tracks the same pitch over the true span
    and stays unvoiced in the pad region."""
    n_true = int(0.6 * FS)
    x, f0_true = _vibrato(n=n_true)
    xp = np.zeros(N)
    xp[:n_true] = x
    f0 = _run(xp, n_valid=n_true)
    F_true = int(n_true / (FS * 0.005))
    head = f0[: F_true - 6]          # clear of the pad boundary
    assert (head > 0).mean() > 0.85
    ft = f0_true[np.clip((np.arange(len(head)) * 0.005 * FS).astype(int),
                         0, n_true - 1)]
    err = (head - ft)[head > 0]
    assert np.sqrt((err ** 2).mean()) < 2.5
    tail = f0[F_true + 6:]
    assert (tail > 0).mean() < 0.05


def test_agreement_with_host_harvest():
    """On a speech-like utterance (formant-filtered harmonics with an
    unvoiced span), device and host pipelines agree on voicing and pitch."""
    from qpnet_tpu.tools.make_synth_corpus import synth_utterance
    rng = np.random.default_rng(5)
    x = synth_utterance(rng, FS, N / FS, 150.0)[:N]
    f0_dev = _run(x)
    f0_host, _ = harvest(x, FS, f0_floor=KW["f0_floor"],
                         f0_ceil=KW["f0_ceil"],
                         channels_in_octave=KW["channels_in_octave"])
    n = min(len(f0_dev), len(f0_host))
    vd, vh = f0_dev[:n] > 0, f0_host[:n] > 0
    both = vd & vh
    # voicing agreement (the estimators differ in candidate interpolation,
    # so boundaries may shift a frame or two)
    assert (vd == vh).mean() > 0.85, (vd.mean(), vh.mean())
    assert both.sum() > 0.4 * n
    diff = np.abs(f0_dev[:n][both] - f0_host[:n][both])
    assert np.median(diff) < 2.0
    assert (diff < 10.0).mean() > 0.9


def test_unvoiced_cost_tradeoff():
    """A weak signal buried in noise stays mostly unvoiced; the same tone
    clean is voiced — the Viterbi's voicing decision responds to evidence,
    not just signal presence."""
    x, _ = _vibrato(noise=0.0, amp_h2=0.0)
    rng = np.random.default_rng(2)
    weak = 0.03 * x + rng.standard_normal(N)
    assert (_run(weak) > 0).mean() < 0.5
    assert (_run(x) > 0).mean() > 0.9


def test_world_analyzer_f0_backend_jax():
    """WorldAnalyzer(f0_backend='jax') slots the device F0 into the same
    estimate_f0 contract (shape, time axis, range clamping) and lands on
    the host track."""
    from qpnet_tpu.dsp.world import WorldAnalyzer
    x, _ = _vibrato(seed=9)
    dev = WorldAnalyzer(fs=FS, minf0=KW["f0_floor"], maxf0=KW["f0_ceil"],
                        f0_backend="jax")
    host = WorldAnalyzer(fs=FS, minf0=KW["f0_floor"], maxf0=KW["f0_ceil"])
    f0_d, t_d = dev.estimate_f0(x)
    f0_h, t_h = host.estimate_f0(x)
    assert f0_d.shape == f0_h.shape and np.allclose(t_d, t_h)
    voiced = (f0_d > 0) & (f0_h > 0)
    assert voiced.mean() > 0.85
    assert np.median(np.abs(f0_d[voiced] - f0_h[voiced])) < 1.0
    assert ((f0_d == 0) | ((f0_d >= KW["f0_floor"])
                          & (f0_d <= KW["f0_ceil"]))).all()


def test_viterbi_backtrack_oracle():
    """_viterbi against a brute-force numpy Viterbi on a track whose
    optimal path switches candidate slots mid-way — pins the backtrack
    frame alignment (a reversed-scan off-by-one shifted every state
    switch one frame early)."""
    from qpnet_tpu.dsp.world.jax_f0 import _viterbi

    F, K = 12, 2
    tc, uc = 8.0, 0.35
    rng = np.random.default_rng(3)
    refined = np.zeros((F, K), np.float32)
    score = np.zeros((F, K), np.float32)
    # slot 0 strong for the first half, slot 1 strong for the second;
    # both slots always present so the path must *switch*, not revoice
    refined[:, 0], refined[:, 1] = 100.0, 105.0
    score[:6, 0], score[:6, 1] = 0.9, 0.4
    score[6:, 0], score[6:, 1] = 0.4, 0.9
    score += rng.uniform(0, 0.01, score.shape).astype(np.float32)

    f0 = np.asarray(_viterbi(refined, score, tc, uc))

    # brute force over all (K+1)^F paths is 3^12 = 531k — small enough
    S = K + 1
    import itertools
    emits = np.full((F, S), np.inf)
    emits[:, 0] = uc
    emits[:, 1:] = 1.0 - score
    logf = np.log(refined)
    best_cost, best_path = np.inf, None
    for path in itertools.product(range(S), repeat=F):
        c = emits[0, path[0]]
        for t in range(1, F):
            s, p = path[t], path[t - 1]
            if s == 0 or p == 0:
                c += 0.0 if (s == 0 and p == 0) else uc
            else:
                c += tc * abs(logf[t, s - 1] - logf[t - 1, p - 1])
            c += emits[t, s]
        if c < best_cost:
            best_cost, best_path = c, path
    expect = np.array([0.0 if s == 0 else refined[t, s - 1]
                       for t, s in enumerate(best_path)])
    np.testing.assert_allclose(f0, expect, rtol=1e-6)


# ---------------------------------------------------------------------------
# device DIO + StoneMask
# ---------------------------------------------------------------------------

def _run_dio(x, n_valid=None, stonemask_refine=True):
    from qpnet_tpu.dsp.world.jax_f0 import jax_dio, jax_stonemask
    kw = dict(f0_floor=KW["f0_floor"], f0_ceil=KW["f0_ceil"])
    x = np.asarray(x, np.float32)
    f0 = jax_dio(x, FS, n_valid=n_valid, **kw)
    if stonemask_refine:
        f0 = jax_stonemask(x, f0, FS, n_valid=n_valid, **kw)
    return np.asarray(f0)


def test_dio_vibrato_tracking():
    x, f0_true = _vibrato()
    f0 = _run_dio(x)
    F = len(f0)
    ft = f0_true[np.clip((np.arange(F) * 0.005 * FS).astype(int),
                         0, len(f0_true) - 1)]
    voiced = f0 > 0
    assert voiced.mean() > 0.8, voiced.mean()
    err = (f0 - ft)[voiced]
    assert np.sqrt((err ** 2).mean()) < 3.0


def test_dio_noise_is_unvoiced():
    rng = np.random.default_rng(1)
    f0 = _run_dio(0.1 * rng.standard_normal(N))
    assert (f0 > 0).mean() < 0.1


def test_fix_contour_scan_matches_host_oracle():
    """The lax.scan contour fixing reproduces the host dio._fix_contour
    walk on random candidate tables (the component the device DIO adds
    over the shared front-end)."""
    from qpnet_tpu.dsp.world.dio import _fix_contour
    from qpnet_tpu.dsp.world.jax_f0 import _fix_contour_scan

    rng = np.random.default_rng(3)
    C, F = 6, 240
    for trial in range(8):
        # voiced sections with near-continuous f0 + junk
        f0 = np.zeros(F)
        cands = np.zeros((C, F))
        t0 = 0
        while t0 < F - 30:
            seg = rng.integers(12, 60)
            base = rng.uniform(100, 300)
            tr = base * (1 + 0.02 * np.cumsum(rng.normal(size=seg)) / 10)
            f0[t0: t0 + seg] = tr[: F - t0]
            for c in range(C):
                noise = 1 + 0.003 * rng.normal(size=min(seg, F - t0))
                if rng.random() < 0.7:
                    cands[c, t0: t0 + seg] = tr[: F - t0] * noise
                elif rng.random() < 0.5:
                    cands[c, t0: t0 + seg] = tr[: F - t0] * 2 * noise
            t0 += seg + rng.integers(5, 25)
        # random dropouts make discontinuities for step 1/2 to erode
        drop = rng.random(F) < 0.05
        f0[drop] = 0.0
        host = _fix_contour(f0, cands, 5.0, 0.1, f0_floor=90.0)
        dev = np.asarray(_fix_contour_scan(
            jnp_asarray(f0), jnp_asarray(cands), 5.0, 0.1, 90.0))
        # f32 vs f64 select_best reference arithmetic can flip a
        # borderline accept at most rarely; demand near-perfect agreement
        agree = np.isclose(host, dev, rtol=2e-3, atol=1e-2)
        assert agree.mean() > 0.99, (trial, np.nonzero(~agree)[0][:10])


def test_fix_contour_scan_never_voices_frame_zero():
    """The host backward extension's first-section bound is limit=1
    (dio.py step 4): frame 0 is never written. A backward chain that
    survives to the start must leave frame 0 unvoiced in the scan too."""
    from qpnet_tpu.dsp.world.dio import _fix_contour
    from qpnet_tpu.dsp.world.jax_f0 import _fix_contour_scan

    F, C = 30, 4
    f0 = np.zeros(F)
    f0[5:21] = 150.0
    cands = np.full((C, F), 150.0)
    host = _fix_contour(f0, cands, 5.0, 0.1, f0_floor=90.0)
    dev = np.asarray(_fix_contour_scan(
        jnp_asarray(f0), jnp_asarray(cands), 5.0, 0.1, 90.0))
    assert host[0] == 0.0
    assert dev[0] == 0.0
    # and the surviving chain itself still matches the host walk
    assert np.allclose(host, dev, rtol=2e-3, atol=1e-2)


def jnp_asarray(a):
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(a, np.float32))


def test_agreement_with_host_dio():
    """Device dio+stonemask vs host dio+stonemask on a speech-like
    utterance: voicing and pitch agree (same bar as the harvest test)."""
    from qpnet_tpu.dsp.world.dio import dio
    from qpnet_tpu.dsp.world.stonemask import stonemask
    from qpnet_tpu.tools.make_synth_corpus import synth_utterance
    rng = np.random.default_rng(5)
    x = synth_utterance(rng, FS, N / FS, 150.0)[:N]
    f0_dev = _run_dio(x)
    f0_raw, ta = dio(x, FS, f0_floor=KW["f0_floor"], f0_ceil=KW["f0_ceil"])
    f0_host = stonemask(x, f0_raw, ta, FS)
    n = min(len(f0_dev), len(f0_host))
    vd, vh = f0_dev[:n] > 0, f0_host[:n] > 0
    both = vd & vh
    assert (vd == vh).mean() > 0.8, (vd.mean(), vh.mean())
    assert both.sum() > 0.3 * n
    diff = np.abs(f0_dev[:n][both] - f0_host[:n][both])
    assert np.median(diff) < 2.0
    assert (diff < 10.0).mean() > 0.85


def test_world_analyzer_f0_backend_jax_dio():
    """The analyzer routes f0_analyzer='dio' + f0_backend='jax' through
    the device dio+stonemask with the analyze() frame geometry."""
    from qpnet_tpu.dsp.world import WorldAnalyzer

    x, f0_true = _vibrato(n=int(0.8 * FS))
    an = WorldAnalyzer(fs=FS, minf0=KW["f0_floor"], maxf0=KW["f0_ceil"],
                       f0_analyzer="dio", f0_backend="jax")
    f0, ta = an.estimate_f0(x)
    F = int(len(x) / (FS * 0.005)) + 1
    assert len(f0) == F and len(ta) == F
    v = f0 > 0
    assert v.mean() > 0.7
    ft = f0_true[np.clip((ta * FS).astype(int), 0, len(x) - 1)]
    assert np.sqrt(((f0 - ft)[v] ** 2).mean()) < 3.0
