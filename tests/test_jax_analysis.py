"""Jittable WORLD analysis vs the numpy host implementations."""

import numpy as np

from qpnet_tpu.dsp.mcep import freqt, sp2mc
from qpnet_tpu.dsp.world.cheaptrick import cheaptrick
from qpnet_tpu.dsp.world.jax_analysis import (
    jax_cheaptrick, jax_freqt, jax_sp2mc,
)

FS = 16000


def test_jax_freqt_matches_numpy():
    rng = np.random.default_rng(0)
    c = rng.normal(size=(5, 30)) * np.exp(-0.2 * np.arange(30))
    np.testing.assert_allclose(np.asarray(jax_freqt(c, 24, 0.41)),
                               freqt(c, 24, 0.41), atol=1e-4)


def test_jax_sp2mc_matches_numpy():
    rng = np.random.default_rng(1)
    logsp = rng.normal(size=(4, 513)) * 0.5
    sp = np.exp(logsp)
    np.testing.assert_allclose(np.asarray(jax_sp2mc(sp, 24, 0.455)),
                               sp2mc(sp, 24, 0.455), atol=1e-4)


def test_jax_cheaptrick_matches_numpy():
    rng = np.random.default_rng(2)
    n = int(0.4 * FS)
    t = np.arange(n) / FS
    f0v = 130.0
    x = sum(0.8 ** k * np.sin(2 * np.pi * f0v * (k + 1) * t)
            for k in range(12)) * 4000
    F = int(n / (FS * 0.005)) + 1
    f0 = np.full(F, f0v)
    ta = np.arange(F) * 0.005
    ref = cheaptrick(x, f0, ta, FS, fft_size=1024)
    got = np.asarray(jax_cheaptrick(x, f0, ta, FS, fft_size=1024))
    # compare in dB away from the edges, above a -90 dB relative floor
    # (the jit path is float32; its FFT noise floor diverges from the
    # float64 host path only on perceptually irrelevant ~-100 dB bins)
    floor = ref.max() * 1e-9
    ref_db = 10 * np.log10(np.maximum(ref[4:-4], floor))
    got_db = 10 * np.log10(np.maximum(got[4:-4], floor))
    err = np.abs(ref_db - got_db)
    assert np.median(err) < 0.5, np.median(err)
    assert err.mean() < 1.5, err.mean()


def test_jax_cheaptrick_default_config_low_pitch():
    """Regression: at the framework defaults (22.05 kHz, fftl=1024) low-F0
    frames must not have their analysis window cropped by the FFT — both
    paths fall back to the WORLD f0_low_limit convention and must agree."""
    fs = 22050
    rng = np.random.default_rng(3)
    n = int(0.4 * fs)
    t = np.arange(n) / fs
    f0v = 55.0  # below 3*fs/(1024-3) ~ 64.8 Hz
    x = sum(0.85 ** k * np.sin(2 * np.pi * f0v * (k + 1) * t)
            for k in range(20)) * 4000
    F = int(n / (fs * 0.005)) + 1
    f0 = np.full(F, f0v)
    ta = np.arange(F) * 0.005
    ref = cheaptrick(x, f0, ta, fs, fft_size=1024)
    got = np.asarray(jax_cheaptrick(x, f0, ta, fs, fft_size=1024))
    floor = ref.max() * 1e-9
    ref_db = 10 * np.log10(np.maximum(ref[4:-4], floor))
    got_db = 10 * np.log10(np.maximum(got[4:-4], floor))
    err = np.abs(ref_db - got_db)
    assert err.mean() < 2.0, err.mean()
