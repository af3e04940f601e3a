"""MLSA filter behavioral validation: spectral shaping property and the
noise-shaping round trip the recipes rely on."""

import numpy as np

from qpnet_tpu.dsp.mcep import mc2b, mc2sp, sp2mc
from qpnet_tpu.dsp.mlsa import mlsa_filter, synthesis_diff


def _welch_db(x, fftl=512):
    """Average periodogram in dB."""
    n = (len(x) // fftl) * fftl
    frames = x[:n].reshape(-1, fftl) * np.hanning(fftl)
    ps = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    return 10 * np.log10(np.maximum(ps.mean(axis=0), 1e-30))


def test_mlsa_zero_coef_is_identity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=2000)
    b = np.zeros((5, 25))
    y = mlsa_filter(x, b, alpha=0.455, hopsize=400)
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_mlsa_gain_term():
    rng = np.random.default_rng(1)
    x = rng.normal(size=1000)
    b = np.zeros((1, 25))
    b[0, 0] = 0.7
    y = mlsa_filter(x, b, alpha=0.455, hopsize=1000)
    np.testing.assert_allclose(y, x * np.exp(0.7), rtol=1e-5)


def test_mlsa_imposes_spectral_envelope():
    """White noise through MLSA(mc) acquires the envelope mc2sp(mc)."""
    fs, alpha, order, fftl = 16000, 0.41, 20, 512
    rng = np.random.default_rng(2)
    # a smooth target envelope: a couple of formant-ish bumps
    freqs = np.linspace(0, np.pi, fftl // 2 + 1)
    log_env = (1.2 * np.exp(-0.5 * ((freqs - 0.6) / 0.25) ** 2)
               + 0.8 * np.exp(-0.5 * ((freqs - 1.8) / 0.35) ** 2) - 1.0)
    sp = np.exp(2 * log_env)
    mc = sp2mc(sp[None], order, alpha)[0]
    b = mc2b(mc[None], alpha)

    x = rng.normal(size=60000)
    y = mlsa_filter(x, b, alpha=alpha, hopsize=len(x))
    in_db = _welch_db(x, fftl)
    out_db = _welch_db(y, fftl)
    gained = out_db - in_db
    target_db = 10 * np.log10(mc2sp(mc[None], alpha, fftl)[0])
    # compare away from DC/Nyquist edges
    sl = slice(8, fftl // 2 - 8)
    err = gained[sl] - target_db[sl]
    assert np.abs(err - err.mean()).mean() < 1.0, \
        f"envelope mismatch {np.abs(err - err.mean()).mean():.2f} dB"


def test_noise_shaping_round_trip():
    """synthesis_diff with +coef then -coef restores the signal's spectrum
    (the noise_shaping.py / noise_restored.py pair)."""
    fs, alpha, shiftms = 16000, 0.41, 5.0
    rng = np.random.default_rng(3)
    x = rng.normal(size=40000)
    mc = np.zeros(25)
    mc[0] = 0.0
    mc[1:6] = [0.4, -0.25, 0.15, -0.1, 0.05]
    F = int(len(x) / (fs * shiftms / 1000)) + 1
    # forward shaping: inv=True -> c0=0, signs flipped (reference
    # noise_shaping.py:125-131)
    coef_fwd = np.tile(mc, (F, 1)).copy()
    coef_fwd[:, 1:] *= -1.0
    shaped = synthesis_diff(x, coef_fwd, alpha, shiftms, fs)
    # restore: inv=False -> original signs (reference noise_restored.py)
    coef_inv = np.tile(mc, (F, 1))
    restored = synthesis_diff(shaped, coef_inv, alpha, shiftms, fs)
    a = _welch_db(x, 256)
    c = _welch_db(restored, 256)
    sl = slice(4, 124)
    assert np.abs((c - a)[sl]).mean() < 0.5, "round trip spectrum drifted"
    shaped_db = _welch_db(shaped, 256)
    assert np.abs((shaped_db - a)[sl]).mean() > 1.0, \
        "shaping had no spectral effect"


def test_streaming_emphasizer_chunked_equals_one_shot():
    """StreamingEmphasizer carries MLSA + FIR state across chunks:
    irregular chunking equals the single-call output to f32 rounding
    (different scan lengths compile to different FMA schedules, so
    bitwise equality is not guaranteed), and tracks the whole-file
    emphasize() pipeline."""
    from qpnet_tpu.dsp.emphasis import StreamingEmphasizer, emphasize

    rng = np.random.default_rng(0)
    fs, alpha, shiftms = 16000, 0.41, 5.0
    x = rng.normal(size=4096) * 0.3
    mc = np.zeros(10)
    mc[1:4] = [0.4, -0.2, 0.1]

    one = StreamingEmphasizer(fs, mc, alpha, shiftms=shiftms)
    y_one = one.process(x)

    chunked = StreamingEmphasizer(fs, mc, alpha, shiftms=shiftms)
    outs, start = [], 0
    for L in (500, 1, 1595, 1000, 1000):
        outs.append(chunked.process(x[start:start + L]))
        start += L
    assert start == len(x)
    y_chunks = np.concatenate(outs)
    np.testing.assert_allclose(y_chunks, y_one, atol=1e-6)

    # tracks the batch pipeline (native C core vs f32 scan tolerance)
    y_batch = emphasize(x, fs, mc, alpha, shiftms)
    np.testing.assert_allclose(y_chunks, y_batch, atol=5e-4)


def test_streaming_emphasizer_no_highpass():
    from qpnet_tpu.dsp.emphasis import StreamingEmphasizer
    from qpnet_tpu.dsp.mlsa import synthesis_diff

    rng = np.random.default_rng(1)
    fs, alpha, shiftms = 16000, 0.41, 5.0
    x = rng.normal(size=2048) * 0.3
    mc = np.zeros(8)
    mc[1:3] = [0.3, -0.1]
    se = StreamingEmphasizer(fs, mc, alpha, shiftms=shiftms,
                             highpass=False)
    y = np.concatenate([se.process(x[:700]), se.process(x[700:])])
    F = int(len(x) / (fs * shiftms / 1000)) + 1
    want = synthesis_diff(x, np.tile(mc, (F, 1)), alpha, shiftms, fs)
    np.testing.assert_allclose(y, want, atol=5e-4)
