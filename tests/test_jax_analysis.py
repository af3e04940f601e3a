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
    assert np.median(err) < 0.01, np.median(err)
    assert err.mean() < 0.05, err.mean()


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


def test_jax_d4c_matches_numpy():
    """Device D4C vs the host port: per-bin aperiodicity within 0.05 dB,
    identical voicing decisions, on a vibrato harmonic signal with noise
    and an unvoiced head."""
    from qpnet_tpu.dsp.world.d4c import d4c
    from qpnet_tpu.dsp.world.jax_analysis import jax_d4c

    fs = 22050
    rng = np.random.default_rng(0)
    n = fs
    t = np.arange(n) / fs
    f0c = 160 + 40 * np.sin(2 * np.pi * 1.1 * t)
    ph = 2 * np.pi * np.cumsum(f0c) / fs
    x = sum(a * np.sin(k * ph)
            for k, a in [(1, .5), (2, .3), (3, .15), (4, .1), (6, .05)])
    x += 0.03 * rng.normal(size=n)
    x[: n // 8] = 0.05 * rng.normal(size=n // 8)
    time_axis = np.arange(0, 0.995, 0.005)
    F = len(time_axis)
    f0 = f0c[(time_axis * fs).astype(int)].copy()
    f0[: F // 8] = 0.0

    ap_host = d4c(x, f0, time_axis, fs)
    ap_jax = np.asarray(jax_d4c(x, f0, time_axis, fs))
    assert ap_jax.shape == ap_host.shape
    db_h = 20 * np.log10(np.maximum(ap_host, 1e-12))
    db_j = 20 * np.log10(np.maximum(ap_jax, 1e-12))
    assert np.abs(db_h - db_j).max() < 0.05
    # voicing safety net agrees exactly (unvoiced rows pinned to ap~1)
    np.testing.assert_array_equal(ap_host[:, 100] > 0.99,
                                  ap_jax[:, 100] > 0.99)


def test_worldanalyzer_jax_backend_consistent(tmp_path):
    """WorldAnalyzer(backend='jax') produces the same feature geometry as
    the numpy backend and stays close where it matters: identical F0
    (host-side in both), codeap within 0.1 dB, mcep envelope close."""
    from qpnet_tpu.dsp.world import WorldAnalyzer

    fs = 16000
    rng = np.random.default_rng(5)
    n = int(0.6 * fs)
    f0c = np.linspace(120, 180, n)
    ph = np.cumsum(f0c / fs)
    x = (0.5 * (2 * (ph % 1.0) - 1.0) + 0.01 * rng.normal(size=n)) * 12000

    feats = {}
    for backend in ("numpy", "jax"):
        an = WorldAnalyzer(fs=fs, minf0=60, maxf0=400, backend=backend)
        f0, spc, ap = an.analyze(x)
        feats[backend] = (f0, an.mcep(dim=24, alpha=0.41), an.codeap())

    np.testing.assert_array_equal(feats["numpy"][0], feats["jax"][0])
    mc_n, mc_j = feats["numpy"][1], feats["jax"][1]
    assert mc_n.shape == mc_j.shape
    # envelope gain term and overall shape agree
    assert np.abs(mc_n[:, 0] - mc_j[:, 0]).mean() < 0.1
    assert np.abs(mc_n - mc_j).mean() < 0.05
    ca_n, ca_j = feats["numpy"][2], feats["jax"][2]
    assert np.abs(ca_n - ca_j).max() < 0.1  # dB


def test_jax_d4c_narrowband_no_bands():
    """fs <= ~8 kHz yields zero 3 kHz coarse bands; the device path must
    interpolate straight between the DC/Nyquist anchors like the host."""
    from qpnet_tpu.dsp.world.d4c import d4c
    from qpnet_tpu.dsp.world.jax_analysis import jax_d4c

    fs = 8000
    rng = np.random.default_rng(1)
    n = fs // 2
    t = np.arange(n) / fs
    ph = 2 * np.pi * np.cumsum(np.full(n, 150.0)) / fs
    x = 0.6 * np.sin(ph) + 0.2 * np.sin(2 * ph) + 0.02 * rng.normal(size=n)
    ta = np.arange(0, 0.49, 0.005)
    f0 = np.full(len(ta), 150.0)
    ap_h = d4c(x, f0, ta, fs, fft_size=512)
    ap_j = np.asarray(jax_d4c(x, f0, ta, fs, fft_size=512))
    db = lambda a: 20 * np.log10(np.maximum(a, 1e-12))
    assert np.abs(db(ap_h) - db(ap_j)).max() < 0.05


def test_jax_backend_padding_invariance():
    """Bucketed length padding + n_valid masking must not change results:
    analyzing a signal alone vs the same signal zero-padded a second
    longer gives identical envelopes on the true frames."""
    from qpnet_tpu.dsp.world.jax_analysis import jax_cheaptrick, jax_d4c

    fs = 16000
    rng = np.random.default_rng(4)
    n = int(0.55 * fs)
    ph = 2 * np.pi * np.cumsum(np.full(n, 140.0)) / fs
    x = (0.5 * np.sin(ph) + 0.02 * rng.normal(size=n)).astype(np.float32)
    ta = np.arange(0, 0.54, 0.005).astype(np.float32)
    f0 = np.full(len(ta), 140.0, np.float32)

    x_pad = np.concatenate([x, np.zeros(fs - n % fs, np.float32)])
    sp_a = np.asarray(jax_cheaptrick(x, f0, ta, fs, n_valid=len(x)))
    sp_b = np.asarray(jax_cheaptrick(x_pad, f0, ta, fs, n_valid=len(x)))
    np.testing.assert_array_equal(sp_a, sp_b)
    ap_a = np.asarray(jax_d4c(x, f0, ta, fs, n_valid=len(x)))
    ap_b = np.asarray(jax_d4c(x_pad, f0, ta, fs, n_valid=len(x)))
    np.testing.assert_array_equal(ap_a, ap_b)


def test_fused_extract_all_matches_staged():
    """extract_all (one-jit pipeline) must reproduce the staged device
    path bit-for-bit: same jitted stages, same bucketing, one dispatch."""
    from qpnet_tpu.dsp.world import WorldAnalyzer

    fs = 16000
    rng = np.random.default_rng(7)
    n = int(0.7 * fs)
    f0c = np.linspace(110, 170, n)
    ph = 2 * np.pi * np.cumsum(f0c) / fs
    x = (0.6 * np.sin(ph) + 0.15 * np.sin(2 * ph)
         + 0.01 * rng.normal(size=n)) * 9000

    staged = WorldAnalyzer(fs=fs, minf0=60, maxf0=400,
                           backend="jax", f0_backend="jax")
    f0_s, _, _ = staged.analyze(x)
    mcep_s = staged.mcep(dim=24, alpha=0.41)
    codeap_s = staged.codeap()
    npow_s = staged.npow()

    fused = WorldAnalyzer(fs=fs, minf0=60, maxf0=400,
                          backend="jax", f0_backend="jax")
    out = fused.extract_all(x, dim=24, alpha=0.41)

    assert out["f0"].shape == f0_s.shape
    np.testing.assert_array_equal(out["f0"], f0_s)
    np.testing.assert_allclose(out["mcep"], mcep_s, atol=1e-5)
    np.testing.assert_allclose(out["codeap"], codeap_s, atol=1e-4)
    np.testing.assert_allclose(out["npow"], npow_s, atol=1e-4)


def test_fused_extract_all_requires_device_backends():
    from qpnet_tpu.dsp.world import WorldAnalyzer

    import pytest

    an = WorldAnalyzer(fs=16000, backend="jax", f0_backend="host")
    with pytest.raises(RuntimeError):
        an.extract_all(np.zeros(16000))


def test_fused_extract_all_dio_analyzer():
    """extract_all with the dio+stonemask analyzer matches the staged
    device path routed through the same estimator."""
    from qpnet_tpu.dsp.world import WorldAnalyzer

    fs = 16000
    rng = np.random.default_rng(9)
    n = int(0.8 * fs)
    ph = 2 * np.pi * np.cumsum(np.linspace(130, 180, n)) / fs
    x = (0.6 * np.sin(ph) + 0.2 * np.sin(2 * ph)
         + 0.01 * rng.normal(size=n)) * 9000

    kw = dict(fs=fs, minf0=60, maxf0=400, f0_analyzer="dio",
              backend="jax", f0_backend="jax")
    staged = WorldAnalyzer(**kw)
    f0_s, _, _ = staged.analyze(x)
    mcep_s = staged.mcep(dim=24, alpha=0.41)

    out = WorldAnalyzer(**kw).extract_all(x, dim=24, alpha=0.41)
    np.testing.assert_array_equal(out["f0"], f0_s)
    np.testing.assert_allclose(out["mcep"], mcep_s, atol=1e-5)
    assert (out["f0"] > 0).mean() > 0.7    # the estimator actually tracked
