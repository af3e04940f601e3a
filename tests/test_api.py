"""High-level Vocoder API: loading an experiment directory and
synthesizing must reproduce the qpnet_decode CLI bit-for-bit (same
conditioning contract, same engine path), and the streaming facade must
be deterministic across session reuse."""

import os

import jax
import numpy as np
import pytest
from scipy.io import wavfile

from qpnet_tpu import Vocoder
from qpnet_tpu.config import ModelConfig, RunConfig
from qpnet_tpu.data.h5io import write_hdf5
from qpnet_tpu.data.stats import Scaler
from qpnet_tpu.models import init_params
from qpnet_tpu.ops import dilated_factor


def tiny_cfg():
    return ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                       dilationF_depth=2, dilationF_repeat=2,
                       dilationA_depth=2, dilationA_repeat=1,
                       kernel_size=2, upsampling_factor=5)


FS = 1000


@pytest.fixture(scope="module")
def expdir(tmp_path_factory):
    """A complete tiny experiment: model.conf + checkpoint-final.pkl +
    checkpoint-7.pkl + stats.h5 + one raw feature h5."""
    from qpnet_tpu.train.checkpoint import save_checkpoint, save_final

    tmp = tmp_path_factory.mktemp("exp")
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    save_final(str(tmp), params)
    save_checkpoint(str(tmp), params, None, 7)
    RunConfig(model=cfg, fs=FS).save(str(tmp / "model.conf"))

    rng = np.random.default_rng(0)
    mean = rng.normal(size=cfg.n_aux)
    scale = rng.uniform(0.5, 2.0, cfg.n_aux)
    write_hdf5(str(tmp / "stats.h5"), "/world/mean", mean)
    write_hdf5(str(tmp / "stats.h5"), "/world/scale", scale)

    F = 11
    feats = np.abs(rng.normal(size=(F, cfg.n_aux))) + 0.1
    feats[:, 1] = rng.uniform(80.0, 120.0, F)        # d = fs/(f0*4) < 4
    write_hdf5(str(tmp / "utt1.h5"), "/world", feats)
    return tmp, cfg, feats


def test_synthesize_matches_decode_cli(expdir, tmp_path):
    tmp, cfg, feats = expdir
    from qpnet_tpu.bin import qpnet_decode

    lst = tmp_path / "feats.list"
    lst.write_text(str(tmp / "utt1.h5") + "\n")
    qpnet_decode.main([
        "--feats", str(lst), "--stats", str(tmp / "stats.h5"),
        "--config", str(tmp / "model.conf"),
        "--checkpoint", str(tmp / "checkpoint-final.pkl"),
        "--outdir", str(tmp_path / "out" / "feat_id.wav"),
        "--fs", str(FS), "--mode", "argmax", "--engine", "xla",
        "--verbose", "0"])
    _, want = wavfile.read(str(tmp_path / "out" / "utt1.wav"))

    voc = Vocoder.load(str(tmp), stats=str(tmp / "stats.h5"),
                       mode="argmax", engine="xla")
    assert voc.fs == FS                              # picked up model.conf
    got_path = voc.synthesize_to_wav(feats, str(tmp_path / "api.wav"))
    fs_got, got = wavfile.read(got_path)
    assert fs_got == FS
    np.testing.assert_array_equal(got, want)


def test_f0_scaled_synthesis_matches_cli(expdir, tmp_path):
    tmp, cfg, feats = expdir
    from qpnet_tpu.bin import qpnet_decode

    lst = tmp_path / "feats.list"
    lst.write_text(str(tmp / "utt1.h5") + "\n")
    qpnet_decode.main([
        "--feats", str(lst), "--stats", str(tmp / "stats.h5"),
        "--config", str(tmp / "model.conf"),
        "--checkpoint", str(tmp / "checkpoint-final.pkl"),
        "--outdir", str(tmp_path / "out" / "feat_id.wav"),
        "--fs", str(FS), "--mode", "argmax", "--engine", "xla",
        "--f0_factor", "0.5", "--verbose", "0"])
    _, want = wavfile.read(str(tmp_path / "out" / "utt1.wav"))

    voc = Vocoder.load(str(tmp), stats=str(tmp / "stats.h5"),
                       mode="argmax", engine="xla")
    wav = voc.synthesize(feats, f0_factor=0.5)
    got = np.clip(wav * 32768, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got, want)


def test_conditioning_contract(expdir):
    """conditioning() == the decode CLI's math: F0 column scaled before
    both the dilation factors and standardization."""
    tmp, cfg, feats = expdir
    from qpnet_tpu.data.stats import load_scaler

    scaler = load_scaler(str(tmp / "stats.h5"), "world")
    voc = Vocoder.load(str(tmp), stats=str(tmp / "stats.h5"))
    h, d = voc.conditioning(feats, f0_factor=1.5)
    manual = np.array(feats, np.float64)
    manual[:, 1] *= 1.5
    np.testing.assert_allclose(
        d, dilated_factor(np.ascontiguousarray(manual[:, 1]), FS,
                          cfg.dense_factor).astype(np.float32))
    np.testing.assert_allclose(h, scaler.transform(manual).astype(np.float32),
                               rtol=1e-6)


def test_batch_preserves_input_order_and_lengths(expdir):
    tmp, cfg, feats = expdir
    rng = np.random.default_rng(3)
    voc = Vocoder.load(str(tmp), stats=str(tmp / "stats.h5"),
                       mode="argmax", engine="xla")
    lengths = [5, 11, 8]
    batch = []
    for F in lengths:
        f = np.abs(rng.normal(size=(F, cfg.n_aux))) + 0.1
        f[:, 1] = rng.uniform(80.0, 120.0, F)
        batch.append(f)
    wavs = voc.synthesize_batch(batch)
    up = cfg.upsampling_factor
    assert [w.shape[0] for w in wavs] == [F * up - 1 for F in lengths]
    for w in wavs:
        assert w.dtype == np.float32 and np.abs(w).max() <= 1.0


def test_stream_deterministic_across_session_reuse(expdir):
    tmp, cfg, feats = expdir
    voc = Vocoder.load(str(tmp), stats=str(tmp / "stats.h5"),
                       mode="sampling", interpret=True)
    chunks1 = list(voc.stream(feats, chunk_samples=20))
    assert len(voc._streams) == 1                    # session cached
    chunks2 = list(voc.stream(feats, chunk_samples=20))
    assert len(voc._streams) == 1                    # ... and reused
    up = cfg.upsampling_factor
    total = sum(c.shape[0] for c in chunks1)
    assert total == feats.shape[0] * up
    assert len(chunks1) > 1                          # actually chunked
    np.testing.assert_array_equal(np.concatenate(chunks1),
                                  np.concatenate(chunks2))


def test_load_by_iteration_and_scaler_object(expdir):
    tmp, cfg, feats = expdir
    sc = Scaler.from_stats(np.zeros(cfg.n_aux), np.ones(cfg.n_aux))
    voc = Vocoder.load(str(tmp), checkpoint=7, stats=sc,
                       mode="argmax", engine="xla")
    wav = voc.synthesize(feats[:4])
    assert wav.shape == (4 * cfg.upsampling_factor - 1,)


def test_feats_shape_validated(expdir):
    tmp, cfg, feats = expdir
    voc = Vocoder.load(str(tmp), stats=str(tmp / "stats.h5"))
    with pytest.raises(ValueError, match="feats must be"):
        voc.conditioning(np.zeros((5, cfg.n_aux + 2)))
    with pytest.raises(ValueError, match="empty"):
        voc.conditioning(np.zeros((0, cfg.n_aux)))


@pytest.mark.slow
def test_analyze_matches_feature_extract(tmp_path):
    """Vocoder.analyze produces exactly the `/world` features the
    extraction CLI writes for the same wav (same fused device pipeline,
    same cont-F0 smoothing), so vocode() conditions on recipe-identical
    features."""
    from qpnet_tpu.bin import feature_extract
    from qpnet_tpu.data import read_hdf5, write_txt

    fs = 16000
    rng = np.random.default_rng(0)
    n = int(0.7 * fs)
    ph = 2 * np.pi * np.cumsum(np.linspace(130, 170, n)) / fs
    x = ((0.5 * np.sin(ph) + 0.2 * np.sin(2 * ph)
          + 0.01 * rng.normal(size=n)) * 12000).astype(np.int16)
    wav = tmp_path / "utt.wav"
    wavfile.write(str(wav), fs, x)
    write_txt(str(tmp_path / "wavs.scp"), [str(wav)])
    feature_extract.main([
        "--waveforms", str(tmp_path / "wavs.scp"), "--fs", str(fs),
        "--mcep_dim", "24", "--mcep_alpha", "0.410", "--maxf0", "400",
        "--dsp_backend", "jax", "--f0_backend", "jax",
        "--feature_dir", str(tmp_path) + "/h5/", "--n_jobs", "1",
        "--verbose", "0"])
    want = read_hdf5(str(tmp_path / "h5" / "utt.h5"), "/world")

    cfg = ModelConfig(n_quantize=32, n_aux=28, n_resch=16, n_skipch=8,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      upsampling_factor=80)
    voc = Vocoder(init_params(jax.random.PRNGKey(0), cfg), cfg, None,
                  fs=fs, mode="argmax", engine="xla")
    got = voc.analyze(x.astype(np.float64))         # int16-scale input
    np.testing.assert_allclose(got, want, atol=1e-4)
    got_unit = voc.analyze(x.astype(np.float64) / 32768.0)  # [-1,1) input
    np.testing.assert_allclose(got_unit, want, atol=1e-4)

    # wav -> wav round trip through the (untrained) model: correct length
    # and finite output at a scaled F0
    out = voc.vocode(x.astype(np.float64) / 32768.0, f0_factor=1.5)
    assert out.shape == (want.shape[0] * cfg.upsampling_factor - 1,)
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0


def test_analyze_integer_pcm_and_empty_input():
    """Integer PCM is int16-scale by dtype (never rescaled, even when
    quiet enough for the float peak heuristic to fire); empty waveforms
    are rejected with a clear error instead of a numpy reduction crash."""
    cfg = ModelConfig(n_quantize=32, n_aux=28, n_resch=16, n_skipch=8,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      upsampling_factor=80)
    fs = 16000
    voc = Vocoder(None, cfg, None, fs=fs)
    t = np.arange(fs) / fs
    q = np.round(0.3 * np.sin(2 * np.pi * 150 * t) * 32768.0
                 ).astype(np.int16)
    fi = voc.analyze(q, dsp_backend="numpy")
    fa = voc.analyze(q.astype(np.float64) / 32768.0, dsp_backend="numpy")
    np.testing.assert_allclose(fi, fa, atol=1e-6)
    # quiet int16 PCM (peak <= 1.0): dtype wins over the peak heuristic
    quiet = np.zeros(fs, np.int16)
    quiet[::80] = 1
    fq = voc.analyze(quiet, dsp_backend="numpy")
    fq_scaled = voc.analyze(quiet.astype(np.float64),  # float path rescales
                            dsp_backend="numpy")
    assert not np.allclose(fq[:, 2], fq_scaled[:, 2], atol=1e-3)
    # int32-container PCM (e.g. 24-bit audio) is rescaled from ITS
    # full-scale range to int16 scale, not passed through 65536x hot
    q32 = (q.astype(np.int64) << 16).astype(np.int32)
    f32c = voc.analyze(q32, dsp_backend="numpy")
    np.testing.assert_allclose(f32c, fi, atol=1e-4)
    # unsigned PCM is offset-binary (uint8 silence = 128): the midpoint
    # bias must come off before rescaling — analyze(uint8) must equal
    # analyze of the exact int16 equivalent (u - 128) * 256, not see a
    # huge DC offset (ADVICE r4: api.py unsigned-PCM fix)
    u8 = np.round(0.3 * np.sin(2 * np.pi * 150 * t) * 127.0 + 128.0
                  ).astype(np.uint8)
    i16_equiv = ((u8.astype(np.int32) - 128) * 256).astype(np.int16)
    fu8 = voc.analyze(u8, dsp_backend="numpy")
    fi16 = voc.analyze(i16_equiv, dsp_backend="numpy")
    np.testing.assert_allclose(fu8, fi16, atol=1e-6)
    with pytest.raises(ValueError, match="empty waveform"):
        voc.analyze(np.zeros(0, np.float32))


def test_analyze_rejects_wrong_geometry():
    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=8, n_skipch=8,
                      dilationF_depth=1, dilationF_repeat=1,
                      dilationA_depth=1, dilationA_repeat=1,
                      upsampling_factor=5)
    voc = Vocoder(None, cfg, None, fs=16000)
    t = np.arange(16000) / 16000.0
    tone = 0.5 * np.sin(2 * np.pi * 150 * t)
    with pytest.raises(ValueError, match="n_aux"):
        voc.analyze(tone, dsp_backend="numpy")
