"""FIR filters and continuous-F0 vs reference semantics (oracles built on
scipy directly, mirroring reference feature_extract.py:116-199)."""

import numpy as np
from scipy.signal import firwin, lfilter

from qpnet_tpu.dsp import convert_continuous_f0, low_cut_filter, low_pass_filter
from qpnet_tpu.dsp.filters import jax_fir


def test_low_cut_filter_matches_scipy_reference(rng):
    x = rng.normal(size=4000)
    fs = 22050
    fil = firwin(255, 70 / (fs // 2), pass_zero=False)
    np.testing.assert_allclose(low_cut_filter(x, fs, 70),
                               lfilter(fil, 1, x), atol=1e-12)


def test_low_cut_removes_dc(rng):
    # note: at fs=22050 a 255-tap FIR with 70 Hz cutoff has a transition
    # band far wider than the cutoff, so DC rejection is weak (true of the
    # reference as well); test the property at a proportionate fs.
    fs = 2000
    x = rng.normal(size=8000) + 5.0
    y = low_cut_filter(x, fs, 70)
    assert abs(np.mean(y[2000:])) < 0.05


def test_low_pass_preserves_length_and_delay(rng):
    fs = 200
    t = np.arange(1000) / fs
    x = np.sin(2 * np.pi * 5 * t)
    y = low_pass_filter(x, fs, cutoff=20)
    assert len(y) == len(x)
    # zero-phase-ish: peak alignment within a couple samples
    assert abs(np.argmax(x[100:200]) - np.argmax(y[100:200])) <= 2


def test_low_pass_attenuates_high_freq(rng):
    fs = 200
    t = np.arange(2000) / fs
    x = np.sin(2 * np.pi * 60 * t)
    y = low_pass_filter(x, fs, cutoff=20)
    assert np.std(y[300:-300]) < 0.05 * np.std(x)


def test_jax_fir_matches_lfilter(rng):
    x = rng.normal(size=500).astype(np.float32)
    taps = firwin(31, 0.3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(jax_fir(x, taps)),
                               lfilter(taps, 1, x), atol=1e-5)


def test_cont_f0_interpolation():
    f0 = np.array([0, 0, 100, 0, 0, 0, 200, 150, 0, 0], float)
    uv, cont = convert_continuous_f0(f0)
    np.testing.assert_array_equal(uv, (f0 != 0).astype(np.float32))
    np.testing.assert_allclose(cont[:3], [100, 100, 100])
    np.testing.assert_allclose(cont[2:7], [100, 125, 150, 175, 200])
    np.testing.assert_allclose(cont[7:], [150, 150, 150])


def test_cont_f0_all_unvoiced():
    f0 = np.zeros(5)
    uv, cont = convert_continuous_f0(f0)
    np.testing.assert_array_equal(uv, np.zeros(5, np.float32))
    np.testing.assert_array_equal(cont, f0)
