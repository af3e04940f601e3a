"""Mu-law companding, jittable and numerically identical to the reference
(reference qpnet.py:22-45).

Works on both numpy arrays and JAX tracers (uses jnp when given tracers via
duck typing of the array namespace).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def encode_mu_law(x, mu: int = 256):
    """Encode [-1, 1] float waveform into {0..mu-1} integer classes.

    Matches reference qpnet.py:22-32: floor((fx+1)/2*(mu-1) + 0.5) —
    i.e. round-half-up on the companded signal.
    """
    xp = jnp if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray) else np
    m = mu - 1
    fx = xp.sign(x) * xp.log1p(m * xp.abs(x)) / xp.log1p(m)
    return xp.floor((fx + 1) / 2 * m + 0.5).astype(xp.int32)


def decode_mu_law(y, mu: int = 256):
    """Decode {0..mu-1} classes back to [-1, 1] float waveform.

    Matches reference qpnet.py:34-45 including the 0.5-bin recentring.
    """
    xp = jnp if isinstance(y, jnp.ndarray) and not isinstance(y, np.ndarray) else np
    m = mu - 1
    fx = (xp.asarray(y, dtype=xp.float32) - 0.5) / m * 2 - 1
    return xp.sign(fx) / m * ((1 + m) ** xp.abs(fx) - 1)
