"""Smoke test for recipes/parity_eval.sh: the whole script must execute
end-to-end (features -> decode -> restore -> evaluate) on a synthetic
22.05 kHz corpus with a locally-trained tiny checkpoint, so that the real
parity run against the reference's released checkpoint is one command
once those assets are available (BASELINE.md configs 2 & 5)."""

import json
import os
import subprocess

import numpy as np
import pytest
from scipy.io import wavfile

from qpnet_tpu.data import write_txt

FS = 22050
N_AUX = 39


@pytest.mark.slow
def test_parity_eval_script_runs(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # synthetic natural corpus
    wav_dir = tmp_path / "natural"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    wavs = []
    for i in range(2):
        n = int(0.35 * FS)
        f0 = np.linspace(140 + 20 * i, 160 + 20 * i, n)
        phase = np.cumsum(f0 / FS)
        x = 0.5 * (2 * (phase % 1.0) - 1.0) + 0.01 * rng.normal(size=n)
        p = wav_dir / f"utt{i}.wav"
        wavfile.write(p, FS, (x * 12000).astype(np.int16))
        wavs.append(str(p))

    # features + stats + a tiny trained checkpoint (in-process, CPU)
    from qpnet_tpu.bin import calc_stats, feature_extract, qpnet_train
    wav_scp = str(tmp_path / "wavs.scp")
    write_txt(wav_scp, wavs)
    feat_dir = str(tmp_path / "h5")
    feature_extract.main([
        "--waveforms", wav_scp, "--feature_dir", feat_dir,
        "--fs", str(FS), "--shiftms", "5", "--fftl", "1024",
        "--minf0", "80", "--maxf0", "320", "--pow_th", "-20",
        "--inv", "true", "--n_jobs", "1", "--verbose", "0"])
    feats = [os.path.join(feat_dir, os.path.basename(w).replace(
        ".wav", ".h5")) for w in wavs]
    feat_scp = str(tmp_path / "feats.scp")
    write_txt(feat_scp, feats)
    stats = str(tmp_path / "stats.h5")
    calc_stats.main(["--features", feat_scp, "--stats", stats,
                     "--verbose", "0"])
    expdir = str(tmp_path / "exp")
    config = os.path.join(expdir, "model.conf")
    qpnet_train.main([
        "--waveforms", wav_scp, "--feats", feat_scp,
        "--stats", stats, "--expdir", expdir, "--config", config,
        "--n_quantize", "256", "--n_aux", str(N_AUX),
        "--n_resch", "16", "--n_skipch", "8",
        "--dilationF_depth", "2", "--dilationF_repeat", "1",
        "--dilationA_depth", "2", "--dilationA_repeat", "1",
        "--dense_factor", "8", "--upsampling_factor", "110",
        "--batch_length", "2200", "--batch_size", "1",
        "--max_length", "5500", "--iters", "2",
        "--checkpoint_interval", "2", "--intervals", "1",
        "--verbose", "0"])
    ckpt = os.path.join(expdir, "checkpoint-final.pkl")
    assert os.path.exists(ckpt)

    # the script itself, skip_convert mode (checkpoint already ours)
    workdir = str(tmp_path / "parity")
    env = dict(os.environ,
               QPNET_PLATFORM="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    proc = subprocess.run(
        ["bash", os.path.join(repo, "recipes", "parity_eval.sh"),
         "--si_checkpoint", ckpt, "--config", config,
         "--skip_convert", "true",
         "--eval_wavs", str(wav_dir), "--ref_gen", "",
         "--stats", stats, "--workdir", workdir,
         "--fs", str(FS), "--minf0", "80", "--maxf0", "320",
         "--n_jobs", "1"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    # restored wavs + metrics json exist and parse
    gen = [f for f in os.listdir(os.path.join(workdir, "gen"))
           if f.endswith(".wav")]
    assert len(gen) == 2, proc.stdout[-2000:]
    with open(os.path.join(workdir, "ours_vs_natural.json")) as f:
        metrics = json.load(f)
    # a 2-iteration checkpoint synthesizes noise, so no voiced overlap and
    # MCD is NaN — the smoke test checks the machinery, not the fidelity
    assert metrics["n_utterances"] == 2, metrics
    assert np.isfinite(metrics["vuv_error_rate_mean"]), metrics
