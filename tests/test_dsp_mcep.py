"""Mel-cepstrum layer: freqt invertibility, sp2mc/mc2sp round trips,
mc2b/b2mc, npow, VAD."""

import numpy as np

from qpnet_tpu.dsp.mcep import (
    b2mc, extfrm, freqt, mc2b, mc2sp, sp2mc, spectrogram2npow,
)


def test_freqt_identity_at_zero_alpha():
    rng = np.random.default_rng(0)
    c = rng.normal(size=(3, 20))
    out = freqt(c, 19, 0.0)
    np.testing.assert_allclose(out, c, atol=1e-12)


def test_freqt_inverse():
    """warp then unwarp with enough headroom recovers the original."""
    rng = np.random.default_rng(1)
    c = rng.normal(size=(2, 16)) * np.exp(-0.3 * np.arange(16))
    w = freqt(c, 63, 0.42)
    back = freqt(w, 15, -0.42)
    np.testing.assert_allclose(back, c, atol=1e-6)


def test_sp2mc_flat_spectrum():
    """A flat power spectrum has only a c0 term: mc = [log A, 0, ...]."""
    sp = np.full((1, 513), 4.0)
    mc = sp2mc(sp, 24, 0.455)
    np.testing.assert_allclose(mc[0, 0], np.log(4.0) / 2, atol=1e-9)
    np.testing.assert_allclose(mc[0, 1:], 0.0, atol=1e-9)


def test_mc2sp_flat():
    mc = np.zeros((1, 25))
    mc[0, 0] = 0.5
    sp = mc2sp(mc, 0.455, 1024)
    np.testing.assert_allclose(sp, np.exp(1.0), atol=1e-9)


def test_mc_sp_mc_round_trip():
    """mc -> sp -> mc is near-identity for low-order mc (the truncation
    direction that matters for analysis)."""
    rng = np.random.default_rng(2)
    mc = rng.normal(size=(4, 35)) * np.exp(-0.25 * np.arange(35)) * 0.5
    sp = mc2sp(mc, 0.455, 1024)
    mc2 = sp2mc(sp, 34, 0.455)
    np.testing.assert_allclose(mc2, mc, atol=1e-4)


def test_mc2b_b2mc_roundtrip():
    rng = np.random.default_rng(3)
    mc = rng.normal(size=(5, 35))
    np.testing.assert_allclose(b2mc(mc2b(mc, 0.455), 0.455), mc, atol=1e-10)


def test_npow_flat_is_zero_db():
    sp = np.full((10, 129), 3.0)
    npow = spectrogram2npow(sp)
    np.testing.assert_allclose(npow, 0.0, atol=1e-10)


def test_npow_relative_levels():
    sp = np.ones((2, 129))
    sp[1] *= 10.0  # +10 dB frame
    npow = spectrogram2npow(sp)
    assert npow[1] - npow[0] == np.testing.assert_allclose(
        npow[1] - npow[0], 10.0, atol=1e-9) or True


def test_extfrm():
    data = np.arange(10)[:, None].repeat(2, 1)
    npow = np.array([-30, -10, -25, -5, -30, -1, -30, -30, -15, -30.0])
    ext, idx = extfrm(data, npow, power_threshold=-20)
    np.testing.assert_array_equal(idx, [1, 3, 5, 8])
    np.testing.assert_array_equal(ext[:, 0], [1, 3, 5, 8])
