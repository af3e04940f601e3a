"""Mu-law codec vs. independent numpy oracle (reference formulas
qpnet.py:22-45)."""

import numpy as np

from qpnet_tpu.ops import decode_mu_law, encode_mu_law


def _oracle_encode(x, mu=256):
    mu = mu - 1
    fx = np.sign(x) * np.log(1 + mu * np.abs(x)) / np.log(1 + mu)
    return np.floor((fx + 1) / 2 * mu + 0.5).astype(np.int64)


def _oracle_decode(y, mu=256):
    mu = mu - 1
    fx = (y - 0.5) / mu * 2 - 1
    return np.sign(fx) / mu * ((1 + mu) ** np.abs(fx) - 1)


def test_encode_matches_reference_formula(rng):
    x = rng.uniform(-1, 1, size=10000).astype(np.float32)
    np.testing.assert_array_equal(encode_mu_law(x), _oracle_encode(x))


def test_encode_edge_values():
    x = np.array([-1.0, 0.0, 1.0], dtype=np.float32)
    np.testing.assert_array_equal(encode_mu_law(x), [0, 128, 255])


def test_decode_matches_reference_formula():
    y = np.arange(256)
    np.testing.assert_allclose(decode_mu_law(y), _oracle_decode(y),
                               rtol=1e-6, atol=1e-7)


def test_round_trip_error_bounded(rng):
    x = rng.uniform(-1, 1, size=5000).astype(np.float32)
    err = np.abs(decode_mu_law(encode_mu_law(x)) - x)
    # mu-law quantization error bound: the largest (outermost) bin of the
    # 256-level codec spans ~0.044 in signal space
    assert float(err.max()) < 0.05


def test_jax_path_matches_numpy(rng):
    # float32 log evaluation may differ by 1 ulp between XLA and numpy,
    # which can flip a bin on exact boundaries — allow off-by-one on a tiny
    # fraction of samples.
    import jax.numpy as jnp
    x = rng.uniform(-1, 1, size=10000).astype(np.float32)
    a = np.asarray(encode_mu_law(jnp.asarray(x)))
    b = encode_mu_law(x)
    diff = np.abs(a.astype(np.int64) - b.astype(np.int64))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 5e-3
