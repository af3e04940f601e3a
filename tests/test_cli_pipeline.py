"""End-to-end recipe pipeline through the CLI workers on a synthetic corpus:
feature_extract -> calc_stats -> noise_shaping -> train -> validate ->
decode -> noise_restored.  This is the run_FE.sh + run_QP.sh flow
(SURVEY.md §3) in miniature."""

import json
import os

import numpy as np
import pytest
import yaml
from scipy.io import wavfile

from qpnet_tpu.data import read_hdf5, write_txt

FS = 16000
N_AUX = 28  # fs-16000 geometry (param_feat table)
MCEP_DIM = 24


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    wav_dir = root / "wav"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    wavs = []
    for i in range(2):
        n = int(0.7 * FS)
        f0 = np.linspace(130 + 30 * i, 170 + 20 * i, n)
        phase = np.cumsum(f0 / FS)
        x = 0.5 * (2 * (phase % 1.0) - 1.0) + 0.01 * rng.normal(size=n)
        path = wav_dir / f"utt{i}.wav"
        wavfile.write(path, FS, (x * 12000).astype(np.int16))
        wavs.append(str(path))
    wav_scp = root / "wavs.scp"
    write_txt(str(wav_scp), wavs)
    feats = [w.replace("wav", "h5") for w in wavs]
    feat_scp = root / "feats.scp"
    write_txt(str(feat_scp), feats)
    return {"root": root, "wavs": wavs, "wav_scp": str(wav_scp),
            "feats": feats, "feat_scp": str(feat_scp)}


def _fe_args(corpus, inv):
    return ["--waveforms", corpus["wav_scp"],
            "--fs", str(FS), "--shiftms", "5", "--fftl", "1024",
            "--minf0", "60", "--maxf0", "400", "--pow_th", "-20",
            "--mcep_dim", str(MCEP_DIM), "--mcep_dim_start", "2",
            "--mcep_dim_end", str(2 + MCEP_DIM + 1),
            "--mcep_alpha", "0.410",
            "--highpass_cutoff", "70", "--ap_dim_idx", "-1",
            "--inv", str(inv), "--n_jobs", "1", "--verbose", "0"]


@pytest.mark.slow
def test_jax_backend_f0_pipeline_matches_sequential(corpus, tmp_path):
    """--dsp_backend jax with n_jobs>1 pipelines host F0 threads ahead of
    the device spectral stage; the output must be bitwise identical to the
    sequential (n_jobs=1) jax path."""
    from qpnet_tpu.bin import feature_extract

    def run(outdir, n_jobs):
        args = [a for a in _fe_args(corpus, True)]
        args[args.index("--n_jobs") + 1] = str(n_jobs)
        args += ["--dsp_backend", "jax", "--feature_dir", str(outdir) + "/"]
        feature_extract.main(args)

    run(tmp_path / "h5_seq", 1)
    run(tmp_path / "h5_pipe", 4)
    for w in corpus["wavs"]:
        base = os.path.basename(w).replace(".wav", ".h5")
        a = read_hdf5(str(tmp_path / "h5_seq" / base), "/world")
        b = read_hdf5(str(tmp_path / "h5_pipe" / base), "/world")
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fused_device_worker_matches_staged(corpus, tmp_path):
    """--dsp_backend jax --f0_backend jax routes through the one-jit fused
    extraction (feature_extract._use_fused_analysis); its h5 output must
    equal the staged device path's (forced by requesting /ap, which needs
    the raw aperiodicity and therefore disables fusion)."""
    from qpnet_tpu.bin import feature_extract

    def run(outdir, extra):
        args = [a for a in _fe_args(corpus, True)]
        args += ["--dsp_backend", "jax", "--f0_backend", "jax",
                 "--feature_dir", str(outdir) + "/"] + extra
        feature_extract.main(args)

    run(tmp_path / "h5_fused", [])
    run(tmp_path / "h5_staged", ["--save_ap", "true"])
    for w in corpus["wavs"]:
        base = os.path.basename(w).replace(".wav", ".h5")
        fused = read_hdf5(str(tmp_path / "h5_fused" / base), "/world")
        staged = read_hdf5(str(tmp_path / "h5_staged" / base), "/world")
        np.testing.assert_allclose(fused, staged, atol=1e-4)
        np.testing.assert_array_equal(
            read_hdf5(str(tmp_path / "h5_fused" / base), "/f0"),
            read_hdf5(str(tmp_path / "h5_staged" / base), "/f0"))
        np.testing.assert_allclose(
            read_hdf5(str(tmp_path / "h5_fused" / base), "/npow"),
            read_hdf5(str(tmp_path / "h5_staged" / base), "/npow"),
            atol=1e-4)


def test_fused_gating():
    """Fusion applies only when every stage is on device and no raw
    spectra are requested."""
    from types import SimpleNamespace

    from qpnet_tpu.bin.feature_extract import _use_fused_analysis
    from qpnet_tpu.dsp.world import WorldAnalyzer

    args = SimpleNamespace(save_ap=False, save_spc=False)
    an = WorldAnalyzer(backend="jax", f0_backend="jax")
    assert _use_fused_analysis(an, args)
    assert not _use_fused_analysis(
        an, SimpleNamespace(save_ap=True, save_spc=False))
    assert not _use_fused_analysis(
        WorldAnalyzer(backend="jax", f0_backend="host"), args)
    assert not _use_fused_analysis(
        WorldAnalyzer(backend="numpy", f0_backend="jax"), args)


@pytest.mark.slow
def test_full_pipeline(corpus, tmp_path):
    from qpnet_tpu.bin import (
        calc_stats, feature_extract, noise_restored, noise_shaping,
        qpnet_decode, qpnet_train, qpnet_validate,
    )

    # 1. feature extraction
    feature_extract.main(_fe_args(corpus, True))
    for f in corpus["feats"]:
        assert os.path.exists(f), f
        h = read_hdf5(f, "/world")
        assert h.shape[1] == N_AUX
        assert (h[:, 1] > 0).all()          # cont F0 positive
        assert set(np.unique(h[:, 0])) <= {0.0, 1.0}

    # 2. analysis-synthesis restore pass
    feature_extract.main(_fe_args(corpus, False))
    restored = corpus["wavs"][0].replace("wav", "h5_restored").replace(
        ".h5_restored", ".wav")
    assert os.path.exists(restored)
    fs_r, xr = wavfile.read(restored)
    assert fs_r == FS and len(xr) > FS // 4
    assert np.abs(xr).max() > 100           # non-silent

    # 3. stats
    stats = str(corpus["root"] / "stats.h5")
    calc_stats.main(["--features", corpus["feat_scp"], "--stats", stats,
                     "--verbose", "0"])
    mean = read_hdf5(stats, "/world/mean")
    scale = read_hdf5(stats, "/world/scale")
    assert mean.shape == (N_AUX,) and mean[0] == 0.0 and scale[0] == 1.0

    # 4. noise shaping
    noise_shaping.main(["--waveforms", corpus["wav_scp"], "--stats", stats,
                        "--fs", str(FS), "--shiftms", "5",
                        "--fftl", "1024", "--mcep_dim_start", "2",
                        "--mcep_dim_end", str(2 + MCEP_DIM + 1),
                        "--mcep_alpha", "0.410", "--mag", "0.5",
                        "--inv", "true", "--n_jobs", "1", "--verbose", "0"])
    ns_wav = corpus["wavs"][0].replace("wav", "wav_h5_ns").replace(
        ".wav_h5_ns", ".wav")
    assert os.path.exists(ns_wav)
    ns_scp = str(corpus["root"] / "ns.scp")
    write_txt(ns_scp, [w.replace("wav", "wav_h5_ns")
                        .replace(".wav_h5_ns", ".wav")
                       for w in corpus["wavs"]])

    # 5. train a tiny model for a few iters
    expdir = str(tmp_path / "exp")
    config = os.path.join(expdir, "model.conf")
    qpnet_train.main([
        "--waveforms", ns_scp, "--feats", corpus["feat_scp"],
        "--stats", stats, "--expdir", expdir, "--config", config,
        "--n_quantize", "256", "--n_aux", str(N_AUX),
        "--n_resch", "16", "--n_skipch", "8",
        "--dilationF_depth", "2", "--dilationF_repeat", "1",
        "--dilationA_depth", "2", "--dilationA_repeat", "1",
        "--dense_factor", "8", "--upsampling_factor", "80",
        "--batch_length", "1600", "--batch_size", "1",
        "--max_length", "4000", "--iters", "4",
        "--checkpoint_interval", "2", "--intervals", "2",
        "--verbose", "0"])
    assert os.path.exists(os.path.join(expdir, "checkpoint-2.pkl"))
    assert os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))
    assert os.path.exists(os.path.join(expdir, "loss-final.yml"))
    with open(config) as f:
        conf = json.load(f)
    assert conf["model"]["n_resch"] == 16

    # 5b. resume continues from the checkpoint
    qpnet_train.main([
        "--waveforms", ns_scp, "--feats", corpus["feat_scp"],
        "--stats", stats, "--expdir", expdir, "--config", config,
        "--n_quantize", "256", "--n_aux", str(N_AUX),
        "--n_resch", "16", "--n_skipch", "8",
        "--dilationF_depth", "2", "--dilationF_repeat", "1",
        "--dilationA_depth", "2", "--dilationA_repeat", "1",
        "--dense_factor", "8", "--upsampling_factor", "80",
        "--batch_length", "1600", "--batch_size", "1",
        "--max_length", "4000", "--iters", "6",
        "--checkpoint_interval", "2", "--intervals", "2",
        "--resume", os.path.join(expdir, "checkpoint-4.pkl"),
        "--verbose", "0"])
    assert os.path.exists(os.path.join(expdir, "checkpoint-6.pkl"))

    # 6. validation sweep entry
    qpnet_validate.main([
        "--waveforms", ns_scp, "--feats", corpus["feat_scp"],
        "--stats", stats, "--resultdir", expdir, "--config", config,
        "--checkpoint", os.path.join(expdir, "checkpoint-2.pkl"),
        "--batch_length", "1600", "--max_length", "4000",
        "--verbose", "0"])
    with open(os.path.join(expdir, "validation_result.yml")) as f:
        results = yaml.safe_load(f)
    assert "checkpoint-2.pkl" in results
    assert np.isfinite(results["checkpoint-2.pkl"])

    # 7. decode (with F0 scaling exercised via default 1.0)
    outdir = str(tmp_path / "out" / "feat_id.wav")
    qpnet_decode.main([
        "--feats", corpus["feat_scp"], "--stats", stats,
        "--config", config, "--outdir", outdir,
        "--checkpoint", os.path.join(expdir, "checkpoint-final.pkl"),
        "--fs", str(FS), "--batch_size", "2", "--verbose", "0"])
    wav0 = outdir.replace("feat_id", "utt0")
    assert os.path.exists(wav0)
    fs_d, xd = wavfile.read(wav0)
    h0 = read_hdf5(corpus["feats"][0], "/world")
    assert len(xd) == h0.shape[0] * 80 - 1

    # 7b. whole-set decode (--batch_size 0: one engine call, engine-side
    # slicing) produces the identical waveform for the same seed
    outdir0 = str(tmp_path / "out0" / "feat_id.wav")
    qpnet_decode.main([
        "--feats", corpus["feat_scp"], "--stats", stats,
        "--config", config, "--outdir", outdir0,
        "--checkpoint", os.path.join(expdir, "checkpoint-final.pkl"),
        "--fs", str(FS), "--batch_size", "0", "--verbose", "0"])
    _, xd0 = wavfile.read(outdir0.replace("feat_id", "utt0"))
    np.testing.assert_array_equal(xd0, xd)

    # 8. noise restoration on the decoded wavs
    writedir = str(tmp_path / "restored" / "feat_id.wav")
    noise_restored.main([
        "--feats", corpus["feat_scp"], "--stats", stats,
        "--outdir", outdir, "--writedir", writedir,
        "--fs", str(FS), "--shiftms", "5", "--fftl", "1024",
        "--mcep_dim_start", "2", "--mcep_dim_end", str(2 + MCEP_DIM + 1),
        "--mcep_alpha", "0.410", "--mag", "0.5", "--inv", "false",
        "--n_jobs", "1", "--verbose", "0"])
    assert os.path.exists(writedir.replace("feat_id", "utt0"))


@pytest.mark.slow
def test_f0_scaled_decode(corpus, tmp_path):
    """F0-scaled generation (run_QP.sh stages with -F 0.5/1.5)."""
    from qpnet_tpu.bin import calc_stats, qpnet_decode, qpnet_train
    stats = str(corpus["root"] / "stats.h5")
    if not os.path.exists(stats):
        calc_stats.main(["--features", corpus["feat_scp"], "--stats", stats,
                         "--verbose", "0"])
    expdir = str(tmp_path / "exp2")
    config = os.path.join(expdir, "model.conf")
    qpnet_train.main([
        "--waveforms", corpus["wav_scp"], "--feats", corpus["feat_scp"],
        "--stats", stats, "--expdir", expdir, "--config", config,
        "--n_quantize", "256", "--n_aux", str(N_AUX),
        "--n_resch", "16", "--n_skipch", "8",
        "--dilationF_depth", "2", "--dilationF_repeat", "1",
        "--dilationA_depth", "2", "--dilationA_repeat", "1",
        "--dense_factor", "8", "--upsampling_factor", "80",
        "--batch_length", "1600", "--batch_size", "1",
        "--max_length", "4000", "--iters", "2",
        "--checkpoint_interval", "2", "--intervals", "2",
        "--verbose", "0"])
    outdir = str(tmp_path / "f0x" / "feat_id_1.5.wav")
    qpnet_decode.main([
        "--feats", corpus["feat_scp"], "--stats", stats,
        "--config", config, "--outdir", outdir,
        "--checkpoint", os.path.join(expdir, "checkpoint-final.pkl"),
        "--fs", str(FS), "--batch_size", "2", "--f0_factor", "1.5",
        "--verbose", "0"])
    assert os.path.exists(outdir.replace("feat_id", "utt0"))
