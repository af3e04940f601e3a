"""Native C DSP core vs the JAX reference implementations."""

import numpy as np
import pytest

from qpnet_tpu.dsp import native
from qpnet_tpu.dsp.mcep import mc2b, sp2mc
from qpnet_tpu.dsp.mlsa import _mlsa_scan

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="libqpdsp.so not built")


@needs_native
def test_native_mlsa_matches_jax_scan():
    rng = np.random.default_rng(0)
    x = rng.normal(size=5000)
    F, M = 10, 24
    mc = rng.normal(size=(F, M + 1)) * 0.2
    b = mc2b(mc, 0.41)
    import jax.numpy as jnp
    ref = np.asarray(_mlsa_scan(np.asarray(x, np.float32),
                                jnp.asarray(b, jnp.float32),
                                0.41, 4, 500))
    out = native.mlsa_filter(x, b, 0.41, 500, pd=4)
    # JAX path is float32, native is float64 — tolerance reflects that
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-3)


@needs_native
def test_native_mlsa_identity_and_gain():
    rng = np.random.default_rng(1)
    x = rng.normal(size=2000)
    b = np.zeros((3, 20))
    np.testing.assert_allclose(native.mlsa_filter(x, b, 0.455, 700), x,
                               atol=1e-12)
    b[:, 0] = 0.5
    np.testing.assert_allclose(native.mlsa_filter(x, b, 0.455, 700),
                               x * np.exp(0.5), rtol=1e-12)


@needs_native
def test_native_fir_matches_scipy():
    from scipy.signal import firwin, lfilter
    rng = np.random.default_rng(2)
    x = rng.normal(size=3000)
    taps = firwin(101, 0.25)
    np.testing.assert_allclose(native.fir(x, taps), lfilter(taps, 1, x),
                               atol=1e-12)


def test_native_builds():
    """The library should build from source in this image (g++ present)."""
    assert native.available(), "libqpdsp.so failed to build/load"
