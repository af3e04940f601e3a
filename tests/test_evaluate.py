"""Evaluation metrics: identity gives MCD==0; WORLD copy synthesis gives a
small MCD; mismatched audio gives a large one."""

import numpy as np

from qpnet_tpu.dsp.world import WorldAnalyzer, synthesize
from qpnet_tpu.tools.evaluate import wav_metrics

FS = 16000


def voiced_saw(f0, sec=0.6):
    n = int(sec * FS)
    ph = np.cumsum(np.full(n, f0) / FS)
    return 8000 * (2 * (ph % 1.0) - 1.0)


def test_identity_is_zero():
    x = voiced_saw(140.0)
    m = wav_metrics(x, x, FS, mcep_dim=24, alpha=0.41, minf0=60, maxf0=400)
    assert m["mcd_db"] < 1e-9
    assert m["f0_rmse_hz"] < 1e-9
    assert m["vuv_error_rate"] == 0.0


def test_copy_synthesis_mcd_small_and_mismatch_large():
    x = voiced_saw(150.0)
    an = WorldAnalyzer(fs=FS, minf0=60, maxf0=400, fftl=1024)
    f0, sp, ap = an.analyze(x)
    y = synthesize(f0, sp, ap, FS, frame_period=5.0)
    m_copy = wav_metrics(x, y[: len(x)], FS, mcep_dim=24, alpha=0.41,
                         minf0=60, maxf0=400)
    z = voiced_saw(250.0) * 0.3  # very different signal
    m_bad = wav_metrics(x, z, FS, mcep_dim=24, alpha=0.41,
                        minf0=60, maxf0=400)
    assert np.isfinite(m_copy["mcd_db"])
    assert m_copy["mcd_db"] < m_bad["mcd_db"]
    assert m_copy["mcd_db"] < 4.0, m_copy["mcd_db"]  # pyworld-class range
    assert m_copy["f0_rmse_hz"] < 10.0
