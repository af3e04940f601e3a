"""Coverage for auxiliary tools: evaluate CLI, corpus-list generation,
speaker initializer, profiler utilities."""

import json
import os

import numpy as np
import yaml
from scipy.io import wavfile

from qpnet_tpu.data import read_txt, write_txt

FS = 16000


def _make_wavs(root, n=2, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        nsamp = int(0.4 * FS)
        ph = np.cumsum(np.full(nsamp, 150.0 + 10 * i) / FS)
        x = 0.5 * (2 * (ph % 1.0) - 1.0) + 0.01 * rng.normal(size=nsamp)
        p = os.path.join(root, f"u{i}.wav")
        wavfile.write(p, FS, (x * 12000).astype(np.int16))
        paths.append(p)
    return paths


def test_evaluate_cli(tmp_path, capsys):
    from qpnet_tpu.tools import evaluate
    wavs = _make_wavs(str(tmp_path))
    ref_scp = str(tmp_path / "ref.scp")
    write_txt(ref_scp, wavs)
    evaluate.main(["--ref_wavs", ref_scp, "--gen_wavs", ref_scp,
                   "--mcep_dim", "24", "--mcep_alpha", "0.41",
                   "--minf0", "60", "--maxf0", "400"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_utterances"] == 2
    assert out["mcd_db_mean"] < 1e-9  # identity


def test_make_corpus_lists(tmp_path):
    from qpnet_tpu.bin import make_corpus_lists
    corpus = tmp_path / "corpus"
    for spk in ("SPKA", "SPKB"):
        d = corpus / "wav" / "train" / spk
        d.mkdir(parents=True)
        _make_wavs(str(d), n=2)
    make_corpus_lists.main(["--corpus_dir", str(corpus),
                            "--subset", "train", "--prefix", "minitr",
                            "--make_conf"])
    lines = read_txt(str(corpus / "scp" / "minitr.scp"))
    assert len(lines) == 4
    assert all(l.startswith("rootpath/wav/train/") for l in lines)
    assert len(read_txt(str(corpus / "scp" / "minitr_SPKA.scp"))) == 2
    with open(corpus / "conf" / "pow_f0_dict.yml") as f:
        conf = yaml.safe_load(f)
    assert conf["SPKA"]["f0_min"] == 40


def test_vcc18_asset_inventory(tmp_path):
    """--vcc18_assets regenerates the reference's static VCC2018 corpus
    assets (corpus/VCC2018/{scp,conf}): 43 lists with the documented
    ranges plus the curated per-speaker analysis conf."""
    from qpnet_tpu.bin import make_corpus_lists
    corpus = tmp_path / "VCC2018"
    make_corpus_lists.main(["--corpus_dir", str(corpus), "--vcc18_assets"])
    scp = corpus / "scp"
    names = sorted(p.name for p in scp.iterdir())
    assert len(names) == 43       # 12 tr + 8 va + 8 up + 8 eval + 4 ref
    assert len(read_txt(str(scp / "vcc18tr.scp"))) == 12 * 81
    tr1 = read_txt(str(scp / "vcc18tr_VCC2SF1.scp"))
    assert tr1[0] == "rootpath/wav/vcc2018_training/VCC2SF1/10001.wav"
    assert tr1[-1] == "rootpath/wav/vcc2018_training/VCC2SF1/10081.wav"
    tr3 = read_txt(str(scp / "vcc18tr_VCC2SF3.scp"))
    assert tr3[0] == "rootpath/wav/vcc2018_training/VCC2SF3/20001.wav"
    va = read_txt(str(scp / "vcc18va_VCC2TM1.scp"))
    up = read_txt(str(scp / "vcc18up_VCC2TM1.scp"))
    assert len(va) == 10 and va[-1].endswith("/10010.wav")
    assert len(up) == 71 and up[0].endswith("/10011.wav")
    ev = read_txt(str(scp / "vcc18eval_VCC2SM4.scp"))
    assert len(ev) == 35 and ev[0].endswith("vcc2018_evaluation/VCC2SM4/30001.wav")
    rf = read_txt(str(scp / "vcc18ref.scp"))
    assert len(rf) == 4 * 35 and rf[0].startswith("rootpath/wav/vcc2018_reference/VCC2TF1/")
    with open(corpus / "conf" / "pow_f0_dict.yml") as f:
        conf = yaml.safe_load(f)
    assert len(conf) == 12
    assert conf["VCC2TM1"] == {"f0_min": 60, "f0_max": 200, "pow_th": -23}


def test_initialize_speaker(tmp_path):
    """Direct test of the speaker initializer: PNG artifacts exist, the
    worker's f0/npow fan-in dicts hold the expected statistics for a
    known-pitch corpus, and the run stays free of fork-in-threads
    DeprecationWarnings (the fan-out uses the spawn context, like
    utils/multi_process.py, to avoid the fork-under-JAX deadlock class)."""
    import warnings

    from qpnet_tpu.bin import initialize_speaker

    wavs = _make_wavs(str(tmp_path), n=2)

    # worker contract: voiced-only F0 values near the 150/160 Hz sources,
    # finite frame powers in the histogram's dB range
    f0_dict, npow_dict = {}, {}
    initialize_speaker.world_feature_extract(wavs, 0, f0_dict, npow_dict)
    f0s, npows = f0_dict[0], npow_dict[0]
    assert f0s.size > 10 and (f0s > 0).all()
    assert 140 < np.median(f0s) < 175
    assert np.isfinite(npows).all() and -70 < np.median(npows) < 20

    scp = str(tmp_path / "wavs.scp")
    write_txt(scp, wavs)
    fig_dir = str(tmp_path / "hist")
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        initialize_speaker.main(["--speaker", "SPKX", "--waveforms", scp,
                                 "--figure_dir", fig_dir, "--n_jobs", "1",
                                 "--verbose", "0"])
    assert os.path.exists(os.path.join(fig_dir, "SPKX_f0histogram.png"))
    assert os.path.exists(os.path.join(fig_dir, "SPKX_npowhistogram.png"))


def test_initialize_speaker_spawn_fanout(tmp_path):
    """The multi-process path (n_jobs>1) uses spawn workers and merges
    the Manager dicts in worker order; output equals the inline path."""
    import warnings

    from qpnet_tpu.bin import initialize_speaker

    wavs = _make_wavs(str(tmp_path), n=2)
    scp = str(tmp_path / "wavs.scp")
    write_txt(scp, wavs)
    fig_dir = str(tmp_path / "hist2")
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        initialize_speaker.main(["--speaker", "SPKY", "--waveforms", scp,
                                 "--figure_dir", fig_dir, "--n_jobs", "2",
                                 "--verbose", "0"])
    assert os.path.exists(os.path.join(fig_dir, "SPKY_f0histogram.png"))
    assert os.path.exists(os.path.join(fig_dir, "SPKY_npowhistogram.png"))


def test_profiler_utils(tmp_path):
    import logging
    from qpnet_tpu.utils.profiler import StepTimer, device_memory_stats
    timer = StepTimer(total_steps=6, interval=3, name="t")
    for _ in range(6):
        with timer:
            pass
    assert len(timer.history) == 2
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1


def test_make_synth_corpus(tmp_path, capsys):
    """The synthetic corpus generator produces the recipe's layout (wav/
    subset/speaker, scp rootpath lists, curated conf) with signals whose
    pitch the in-tree F0 stack actually recovers inside the conf range."""
    from qpnet_tpu.dsp.world.harvest import harvest
    from qpnet_tpu.tools import make_synth_corpus

    cdir = str(tmp_path / "SYNTH")
    spk_f0 = make_synth_corpus.make_corpus(
        cdir, fs=16000, speakers=1, train_utts=2, update_utts=1,
        valid_utts=1, eval_utts=1, seconds=1.0, seed=3)
    (spk, f0_base), = spk_f0.items()

    # layout + list inventory: 4 global + 4 per-speaker lists, every line
    # rootpath-prefixed and resolvable against the corpus dir
    for name in ["synthtr", "synthup", "synthva", "syntheval"]:
        for scp in [f"{name}.scp", f"{name}_{spk}.scp"]:
            lines = read_txt(os.path.join(cdir, "scp", scp))
            assert lines, scp
            for ln in lines:
                assert ln.startswith("rootpath/wav/")
                assert os.path.exists(
                    os.path.join(cdir, ln.replace("rootpath/", "")))
    conf = yaml.safe_load(
        open(os.path.join(cdir, "conf", "pow_f0_dict.yml")))
    assert conf[spk]["f0_min"] < f0_base < conf[spk]["f0_max"]

    # reference containment convention: update + validation utterances
    # are subsets of the global training list (so run_FE stage 4's noise
    # shaping over synthtr.scp covers every wav the trainers read)
    tr_set = set(read_txt(os.path.join(cdir, "scp", "synthtr.scp")))
    for name in ["synthup", "synthva"]:
        assert set(read_txt(os.path.join(cdir, "scp",
                                         f"{name}.scp"))) <= tr_set
    assert not set(read_txt(
        os.path.join(cdir, "scp", "syntheval.scp"))) & tr_set

    # the generated voice is trackable: harvest inside the conf range
    # lands near the speaker's base pitch on a training utterance
    tr = read_txt(os.path.join(cdir, "scp", "synthtr.scp"))
    fs, x = wavfile.read(os.path.join(cdir, tr[0].replace("rootpath/", "")))
    f0, _ = harvest(x / 32768.0, fs, f0_floor=conf[spk]["f0_min"],
                    f0_ceil=conf[spk]["f0_max"])
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.4 * len(f0)
    assert abs(np.median(voiced) - f0_base) / f0_base < 0.15
