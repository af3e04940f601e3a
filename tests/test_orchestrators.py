"""runFE/runQP orchestrators end-to-end on a miniature rootpath-convention
corpus (the run_FE.sh/run_QP.sh flow, SURVEY.md §3.1-3.4)."""

import os

import numpy as np
import pytest
import yaml
from scipy.io import wavfile

from qpnet_tpu.data import read_hdf5, write_txt

FS = 16000
SPK = "SPKA"


@pytest.fixture(scope="module")
def prj(tmp_path_factory):
    """Project dir with corpus/MINI/{wav,scp,conf} in reference layout."""
    root = tmp_path_factory.mktemp("prj")
    corpus = root / "corpus" / "MINI"
    wav_dir = corpus / "wav" / "train" / SPK
    wav_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    rel_paths = []
    for i in range(2):
        n = int(0.6 * FS)
        f0 = np.linspace(140, 180, n)
        phase = np.cumsum(f0 / FS)
        x = 0.5 * (2 * (phase % 1.0) - 1.0) + 0.01 * rng.normal(size=n)
        wavfile.write(wav_dir / f"u{i}.wav", FS,
                      (x * 12000).astype(np.int16))
        rel_paths.append(f"rootpath/wav/train/{SPK}/u{i}.wav")
    scp_dir = corpus / "scp"
    scp_dir.mkdir()
    write_txt(str(scp_dir / f"minitr_{SPK}.scp"), rel_paths)
    write_txt(str(scp_dir / "minitr.scp"), rel_paths)
    (corpus / "conf").mkdir()
    with open(corpus / "conf" / "pow_f0_dict.yml", "w") as f:
        yaml.safe_dump({SPK: {"f0_min": 60, "f0_max": 400, "pow_th": -20}},
                       f)
    return str(root)


@pytest.mark.slow
def test_runfe_stages(prj):
    from qpnet_tpu import runFE
    base = ["--prj_dir", prj, "--corpus", "MINI", "--n_jobs", "1",
            "-f", str(FS)]
    # step 2: extraction
    runFE.main(["-e", f"minitr_{SPK}.scp", "-i", "-2", SPK] + base)
    feat = os.path.join(prj, "corpus/MINI/h5/train", SPK, "u0.h5")
    assert os.path.exists(feat)
    h = read_hdf5(feat, "/world")
    assert h.shape[1] == 28  # fs 16000 -> aux 28
    # step 2 restore (no -i)
    runFE.main(["-e", f"minitr_{SPK}.scp", "-2", SPK] + base)
    assert os.path.exists(os.path.join(
        prj, "corpus/MINI/h5_restored/train", SPK, "u0.wav"))
    # step 3: stats
    runFE.main(["-e", "minitr.scp", "-3", SPK] + base)
    stats = os.path.join(prj, "corpus/MINI/stats/minitr_stats.h5")
    assert os.path.exists(stats)
    # step 4: noise shaping (global list, like run_FE.sh stage 4)
    runFE.main(["-e", "minitr.scp", "-4", SPK] + base)
    assert os.path.exists(os.path.join(
        prj, "corpus/MINI/wav_h5_ns/train", SPK, "u0.wav"))


@pytest.mark.slow
def test_runqp_stages(prj, monkeypatch):
    """SI train -> SD update -> validate -> decode -> restore via runQP
    with a tiny network injected through the registry."""
    from qpnet_tpu import config as qcfg
    from qpnet_tpu import runQP
    # register a tiny network spec so runQP trains something testable
    qcfg._NETWORKS["tiny"] = dict(
        dilationF_depth=2, dilationF_repeat=1,
        dilationA_depth=2, dilationA_repeat=1,
        kernel_size=2, max_length=4000, batch_length=1600,
        batch_size=1, f0_threshold=0, decode_batch_size=2)
    base = ["--prj_dir", prj, "--corpus", "MINI", "--n_jobs", "1",
            "-f", str(FS), "-n", "tiny"]
    common = ["-w", "minitr.scp", "-a", "minitr.scp"]

    # stage 1: SI training (4 iters; exercises the mixed-precision flag
    # pass-through — qpnet_train runs the bf16 step)
    runQP.main(common + ["-I", "4", "--dtype", "bfloat16", "-1"] + base)
    expdir = os.path.join(prj, "qpnet_models", "Aminitr_Wminitr_d8_tiny")
    assert os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))
    assert os.path.exists(os.path.join(expdir, "model.conf"))

    # stage 2: SD update (2 iters, checkpoint every 100 -> none mid, final)
    runQP.main(common + [
        "-x", f"minitr_{SPK}.scp", "-u", f"minitr_{SPK}.scp",
        "-U", "2", "-2"] + base)
    sd_expdir = os.path.join(
        prj, "qpnet_models",
        f"Aminitr_Wminitr_d8_tiny_Uminitr_{SPK}_Vminitr_{SPK}")
    assert os.path.exists(os.path.join(sd_expdir, "checkpoint-final.pkl"))

    # stage 3: decode with the SI model (multi mode)
    runQP.main(common + [
        "-m", "-e", f"minitr_{SPK}.scp", "-M", "final", "-3", SPK] + base)
    outw = os.path.join(prj, "qpnet_output", "Aminitr_Wminitr_d8_tiny",
                        "noiseshaped", SPK, "final", "u0.wav")
    assert os.path.exists(outw)

    # stage 4: noise restore on decoded wavs
    runQP.main(common + [
        "-m", "-e", f"minitr_{SPK}.scp", "-M", "final", "-4", SPK] + base)
    restw = os.path.join(prj, "qpnet_output", "Aminitr_Wminitr_d8_tiny",
                         "restored", SPK, "final", "u0.wav")
    assert os.path.exists(restw)

    # F0-scaled decode (run_QP.sh stages 5/6)
    runQP.main(common + [
        "-m", "-e", f"minitr_{SPK}.scp", "-M", "final", "-F", "1.5",
        "-3", SPK] + base)
    assert os.path.exists(os.path.join(
        prj, "qpnet_output", "Aminitr_Wminitr_d8_tiny", "noiseshaped",
        SPK, "final", "u0_1.5.wav"))


@pytest.mark.slow
def test_runqp_stage5_validation_sweep(prj, capsys):
    """Stage 5: the SD validation sweep writes {checkpoint: loss} to
    validation_result.yml in the SD expdir (reference run_QP.sh stage 2 /
    qpnet_validate.py:409-437) — the mechanism a user relies on to pick
    the best adaptation iteration."""
    from qpnet_tpu import config as qcfg
    from qpnet_tpu import runQP
    qcfg._NETWORKS.setdefault("tiny", dict(
        dilationF_depth=2, dilationF_repeat=1,
        dilationA_depth=2, dilationA_repeat=1,
        kernel_size=2, max_length=4000, batch_length=1600,
        batch_size=1, f0_threshold=0, decode_batch_size=2))
    base = ["--prj_dir", prj, "--corpus", "MINI", "--n_jobs", "1",
            "-f", str(FS), "-n", "tiny"]
    common = ["-w", "minitr.scp", "-a", "minitr.scp"]
    sd = ["-x", f"minitr_{SPK}.scp", "-u", f"minitr_{SPK}.scp"]
    # the sweep validates checkpoints at the update interval (100), so
    # the SD stage must run at least that many iterations
    runQP.main(common + sd + ["-U", "100", "-2"] + base)
    sd_expdir = os.path.join(
        prj, "qpnet_models",
        f"Aminitr_Wminitr_d8_tiny_Uminitr_{SPK}_Vminitr_{SPK}")
    assert os.path.exists(os.path.join(sd_expdir, "checkpoint-100.pkl"))

    runQP.main(common + sd + [
        "-y", f"minitr_{SPK}.scp", "-v", f"minitr_{SPK}.scp",
        "-U", "100", "-5", SPK] + base)
    result = os.path.join(sd_expdir, "validation_result.yml")
    assert os.path.exists(result)
    with open(result) as f:
        res = yaml.safe_load(f)
    assert "checkpoint-100.pkl" in res
    assert np.isfinite(res["checkpoint-100.pkl"])
    # the sweep ends by naming the best iteration (run_synth.sh stage a
    # parses the same yml to decode it automatically)
    assert "best iteration: 100" in capsys.readouterr().out


def test_runqp_resume_auto_passthrough(prj, monkeypatch):
    """-R auto reaches the trainer verbatim (trainer-side autoresume picks
    the newest checkpoint); -R <iter> still resolves to the expdir path."""
    from qpnet_tpu import runQP

    seen = {}

    def fake_train(argv):
        seen["resume"] = argv[argv.index("--resume") + 1]

    monkeypatch.setattr("qpnet_tpu.bin.qpnet_train.main", fake_train)
    # runQP's startup path_check needs the stats file to exist (this test
    # may run before the FE-stage tests that produce the real one)
    stats = os.path.join(prj, "corpus/MINI/stats/minitr_stats.h5")
    if not os.path.exists(stats):
        os.makedirs(os.path.dirname(stats), exist_ok=True)
        open(stats, "wb").close()
    base = ["--prj_dir", prj, "--corpus", "MINI", "--n_jobs", "1",
            "-f", str(FS), "-w", "minitr.scp", "-a", "minitr.scp"]
    runQP.main(base + ["-I", "4", "-R", "auto", "-1"])
    assert seen["resume"] == "auto"
