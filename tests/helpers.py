"""Shared synthetic-corpus fixtures for tests."""

import os

import numpy as np
from scipy.io import wavfile

from qpnet_tpu.data.h5io import write_hdf5


def make_synthetic_corpus(tmpdir, n_utts=3, fs=1000, up=10, n_aux=4,
                          seconds=1.0, f0_lo=50.0, f0_hi=120.0, seed=0):
    """Write tiny wav+h5 pairs: a pitched sawtooth with matching cont-F0 in
    aux dim 1 (the only aux dim the model's pitch logic reads)."""
    rng = np.random.default_rng(seed)
    wavs, feats = [], []
    os.makedirs(os.path.join(tmpdir, "wav"), exist_ok=True)
    os.makedirs(os.path.join(tmpdir, "h5"), exist_ok=True)
    for i in range(n_utts):
        n = int(fs * seconds) + rng.integers(0, fs // 4)
        n_frames = n // up
        n = n_frames * up
        f0 = np.linspace(rng.uniform(f0_lo, f0_hi),
                         rng.uniform(f0_lo, f0_hi), n_frames)
        f0_samp = np.repeat(f0, up)
        phase = np.cumsum(2 * np.pi * f0_samp / fs)
        x = 0.4 * np.sin(phase) + 0.05 * rng.normal(size=n)
        wav_path = os.path.join(tmpdir, "wav", f"utt{i}.wav")
        wavfile.write(wav_path, fs, (x * 32767).astype(np.int16))
        h = rng.normal(size=(n_frames, n_aux)).astype(np.float32)
        h[:, 0] = 1.0          # uv
        h[:, 1] = f0           # cont F0
        feat_path = os.path.join(tmpdir, "h5", f"utt{i}.h5")
        write_hdf5(feat_path, "/world", h)
        wavs.append(wav_path)
        feats.append(feat_path)
    return wavs, feats
