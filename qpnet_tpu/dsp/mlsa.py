"""MLSA (Mel Log Spectrum Approximation) digital filter as a `lax.scan`.

The reference applies this through pysptk's MLSADF inside sprocket
(`Synthesizer.synthesis_diff`, used by noise_shaping.py:134 and
noise_restored.py; SURVEY.md §2.2).  The filter realizes
H(z) = exp( sum_m b[m] Phi_m(z) ) with the mel basis
  Phi_0 = 1,  Phi_m(z) = (1-a^2) z^-1 / (1 - a z^-1) * Atilde(z)^(m-1),
  Atilde(z) = (z^-1 - a) / (1 - a z^-1),
and the exponential approximated by an order-L Pade rational
exp(w) ~= N(w)/N(-w), N(w) = sum_l A_l w^l — the same structure as SPTK's
mlsadf (two cascaded exp-filters: the b[1] term and the b[2:] cascade),
with gain exp(b[0]) applied at the output.

Because every Phi_m carries at least one sample of delay, the Pade feedback
is realizable sample-by-sample; the whole filter is a single scan with a
(stages x basis) state — a time-recursive IIR that cannot be expressed as a
convolution, hence scan, not conv (SURVEY.md "hard parts").

Validated behaviorally (tests/test_dsp_mlsa.py): white noise filtered by
MLSA(b(mc)) acquires the spectral envelope mc2sp(mc); the inverse filter
(negated coefficients, c0=0) undoes the shaping — the exact property the
noise-shaping recipe depends on.
"""

from __future__ import annotations

import functools

import numpy as np

# Pade approximation constants for exp(w) (order 4 and 5, SPTK values)
PADE4 = np.array([1.0, 4.999273e-1, 1.067005e-1, 1.170221e-2, 5.656279e-4])
PADE5 = np.array([1.0, 4.999391e-1, 1.107098e-1, 1.369984e-2,
                  9.564853e-4, 3.041721e-5])


def _pade(pd: int) -> np.ndarray:
    if pd == 4:
        return PADE4
    if pd == 5:
        return PADE5
    raise ValueError("pd must be 4 or 5")


@functools.partial(
    __import__("jax").jit, static_argnames=("alpha", "pd", "hopsize"))
def _mlsa_scan_stateful(x, b_frames, carry, alpha: float, pd: int,
                        hopsize: int):
    """Scan with an explicit filter carry in/out, so callers can stream
    chunk by chunk: chunked output is bitwise the one-shot output."""
    import jax
    import jax.numpy as jnp

    A = jnp.asarray(_pade(pd)[1:])  # A_1..A_L
    sign = jnp.asarray([(-1.0) ** l for l in range(1, pd + 1)])
    M = b_frames.shape[1] - 1  # filter order
    aa = 1.0 - alpha * alpha

    def phi_outputs(y_prev, u_prev):
        """y_m[n] for m=1..M from the stored state (strictly delayed)."""
        y = [aa * u_prev + alpha * y_prev[0]]
        for m in range(1, M):
            y.append(y_prev[m - 1] - alpha * y[m - 1] + alpha * y_prev[m])
        return jnp.stack(y)  # (M,)

    def exp_filter_step(state, x_in, b):
        """One sample through exp(sum_{m>=1} b_m Phi_m) via Pade.

        state: (u_prev (L,), y_prev (L, M)). b: (M+1,) frame coefficients.
        """
        u_prev, y_prev = state
        ys = jax.vmap(phi_outputs)(y_prev, u_prev)      # (L, M)
        s = ys @ b[1:]                                   # (L,) F(state_l)
        u = x_in - jnp.dot(sign * A, s)
        y_out = u + jnp.dot(A, s)
        ins = jnp.concatenate([jnp.array([u]), s[:-1]])  # stage inputs
        return (ins, ys), y_out

    def step(carry, inp):
        st1, st2, n = carry
        x_n = inp
        frame = jnp.minimum(n // hopsize, b_frames.shape[0] - 1)
        b = b_frames[frame]
        # stage 1: exp(b1 * Phi_1) — same machinery with b masked to m=1
        b1 = jnp.zeros_like(b).at[1].set(b[1])
        st1, v = exp_filter_step(st1, x_n, b1)
        # stage 2: exp(sum_{m>=2} b_m Phi_m)
        b2 = b.at[1].set(0.0)
        st2, y = exp_filter_step(st2, v, b2)
        y = y * jnp.exp(b[0])
        return (st1, st2, n + 1), y

    carry, y = jax.lax.scan(step, carry, jnp.asarray(x, jnp.float64)
                            if x.dtype == np.float64 else jnp.asarray(x))
    return y, carry


def mlsa_init_state(order: int, pd: int = 4):
    """Zero filter carry for `_mlsa_scan_stateful` (order = M, the
    mel-cepstral filter order; state layout: two exp-filter stages of
    (stage inputs (L,), basis outputs (L, M)) plus the sample counter)."""
    import jax.numpy as jnp
    L = pd
    return (
        (jnp.zeros((L,)), jnp.zeros((L, order))),
        (jnp.zeros((L,)), jnp.zeros((L, order))),
        jnp.int32(0))


def _mlsa_scan(x, b_frames, alpha: float, pd: int, hopsize: int):
    y, _ = _mlsa_scan_stateful(
        x, b_frames, mlsa_init_state(b_frames.shape[1] - 1, pd),
        alpha, pd, hopsize)
    return y


def mlsa_filter(x: np.ndarray, b_frames: np.ndarray, alpha: float,
                hopsize: int, pd: int = 4) -> np.ndarray:
    """Filter waveform `x` through the MLSA filter with per-frame
    coefficients `b_frames` ((F, M+1), from mc2b), switching coefficients
    every `hopsize` samples (pysptk.synthesis.Synthesizer convention).

    Host-side DSP: prefers the native C core (native/libqpdsp.so — no
    per-length recompiles, single tight loop); falls back to the JAX scan
    pinned to the CPU backend (feature pipelines are CPU-pool workloads and
    must not trip a TPU compile, SURVEY.md §2.3).
    """
    from qpnet_tpu.dsp import native
    if native.available():
        return native.mlsa_filter(x, b_frames, alpha, hopsize, pd=pd)
    import jax
    import jax.numpy as jnp
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        y = _mlsa_scan(np.asarray(x, np.float32),
                       jnp.asarray(np.asarray(b_frames, np.float32)),
                       float(alpha), int(pd), int(hopsize))
    return np.asarray(y, np.float64)


def synthesis_diff(x: np.ndarray, diffmcep: np.ndarray, alpha: float,
                   shiftms: float, fs: int, pd: int = 4) -> np.ndarray:
    """Filter waveform by the *differential* mel-cepstrum — the noise
    shaping / restoration primitive (sprocket Synthesizer.synthesis_diff;
    reference noise_shaping.py:125-136)."""
    from qpnet_tpu.dsp.mcep import mc2b
    hopsize = int(fs * shiftms / 1000)
    b = mc2b(diffmcep, alpha)
    return mlsa_filter(x, b, alpha, hopsize, pd=pd)
