"""Multi-host (DCN) training path: two REAL processes connected through
jax.distributed over a local coordinator, each owning 2 virtual CPU
devices, training over the resulting 4-device global dp mesh via the
actual qpnet_train CLI.  This is the TPU-pod topology in miniature:
host-sharded corpus lists, per-host local batches assembled into global
arrays, GSPMD gradient all-reduce across the process boundary, and
lead-host-only checkpointing."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from tests.helpers import make_synthetic_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from qpnet_tpu.bin import qpnet_train
    qpnet_train.main([
        "--waveforms", {wav_scp!r}, "--feats", {feat_scp!r},
        "--stats", {stats!r}, "--expdir", {expdir!r},
        "--config", {config!r},
        "--n_quantize", "32", "--n_aux", "4", "--n_resch", "16",
        "--n_skipch", "8", "--dilationF_depth", "3",
        "--dilationF_repeat", "1", "--dilationA_depth", "2",
        "--dilationA_repeat", "1", "--upsampling_factor", "10",
        "--batch_length", "300", "--batch_size", "4",
        "--max_length", "700", "--iters", "3",
        "--checkpoint_interval", "2", "--intervals", "1",
        "--coordinator", {coord!r}, "--n_hosts", "2",
        "--host_id", {hid!r},
    ])
    assert jax.process_count() == 2
    assert jax.device_count() == 4
""")


@pytest.mark.slow
def test_two_process_dcn_training(tmp_path):
    wavs, feats = make_synthetic_corpus(str(tmp_path), n_utts=4, fs=1000,
                                        up=10, n_aux=4)
    wav_scp = str(tmp_path / "wav.scp")
    feat_scp = str(tmp_path / "feat.scp")
    with open(wav_scp, "w") as f:
        f.write("\n".join(wavs) + "\n")
    with open(feat_scp, "w") as f:
        f.write("\n".join(feats) + "\n")
    from qpnet_tpu.data.stats import calc_stats
    stats = str(tmp_path / "stats.h5")
    calc_stats(feats, stats)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    expdir = str(tmp_path / "exp")

    procs = []
    for hid in range(2):
        code = WORKER.format(repo=REPO, wav_scp=wav_scp, feat_scp=feat_scp,
                             stats=stats, expdir=expdir,
                             config=str(tmp_path / f"model{hid}.conf"),
                             coord=coord, hid=str(hid))
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for hid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {hid} failed:\n{out[-4000:]}"

    # lead host wrote the checkpoints; the non-lead host did not duplicate
    assert os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))
    assert os.path.exists(os.path.join(expdir, "checkpoint-2.pkl"))
    # both hosts ran the same global step: the compiled program is
    # deterministic across hosts, so per-iteration losses agree EXACTLY
    # (at the %.6f precision the trainer logs)
    import re
    losses = []
    for out in outs:
        vals = re.findall(r"average loss = ([0-9.]+)", out)
        assert len(vals) == 3, out[-2000:]
        losses.append([float(v) for v in vals])
    assert losses[0] == losses[1]


PREEMPT_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    if {preempt_after}:
        os.environ["QPNET_PREEMPT_AFTER"] = str({preempt_after})
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from qpnet_tpu.bin import qpnet_train
    qpnet_train.main([
        "--waveforms", {wav_scp!r}, "--feats", {feat_scp!r},
        "--stats", {stats!r}, "--expdir", {expdir!r},
        "--config", {config!r},
        "--n_quantize", "32", "--n_aux", "4", "--n_resch", "16",
        "--n_skipch", "8", "--dilationF_depth", "3",
        "--dilationF_repeat", "1", "--dilationA_depth", "2",
        "--dilationA_repeat", "1", "--upsampling_factor", "10",
        "--batch_length", "300", "--batch_size", "4",
        "--max_length", "700", "--iters", "50",
        "--checkpoint_interval", "100", "--intervals", "1",
        "--coordinator", {coord!r}, "--n_hosts", "2",
        "--host_id", {hid!r},
    ])
""")


@pytest.mark.slow
def test_preemption_syncs_across_hosts(tmp_path):
    """A preemption signal on ONE host must stop BOTH hosts at the same
    iteration (the per-step trip-flag allgather): a lone early exit would
    deadlock the survivor inside the collective batch assembly."""
    wavs, feats = make_synthetic_corpus(str(tmp_path), n_utts=4, fs=1000,
                                        up=10, n_aux=4)
    wav_scp = str(tmp_path / "wav.scp")
    feat_scp = str(tmp_path / "feat.scp")
    with open(wav_scp, "w") as f:
        f.write("\n".join(wavs) + "\n")
    with open(feat_scp, "w") as f:
        f.write("\n".join(feats) + "\n")
    from qpnet_tpu.data.stats import calc_stats
    stats = str(tmp_path / "stats.h5")
    calc_stats(feats, stats)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    expdir = str(tmp_path / "exp")

    procs = []
    for hid in range(2):
        code = PREEMPT_WORKER.format(
            repo=REPO, wav_scp=wav_scp, feat_scp=feat_scp, stats=stats,
            expdir=expdir, config=str(tmp_path / f"model{hid}.conf"),
            coord=coord, hid=str(hid),
            preempt_after=3 if hid == 0 else 0)   # only host 0 is "evicted"
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                            "QPNET_PREEMPT_AFTER")}
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for hid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {hid} failed:\n{out[-4000:]}"
    # both stopped at iteration 4 (host 0 trips after step 3; the flag
    # rides step 4's valid_len allgather, so every host exits together
    # after step 4), well short of 50
    assert os.path.exists(os.path.join(expdir, "checkpoint-4.pkl"))
    assert not os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))
    assert "preemption" in outs[0]


DECODE_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from qpnet_tpu.bin import qpnet_decode
    qpnet_decode.main([
        "--feats", {feat_scp!r}, "--stats", {stats!r},
        "--config", {config!r}, "--outdir", {outdir!r},
        "--checkpoint", {ckpt!r}, "--fs", "1000",
        "--batch_size", "2", "--mode", "argmax",
        "--dtype", "float32", "--engine", "xla",
        "--n_devices", "2",
        "--n_hosts", "2", "--host_id", {hid!r}, "--verbose", "0",
    ])
""")


@pytest.mark.slow
def test_two_process_decode_fanout(tmp_path):
    """Multi-host decode scale-out: one qpnet_decode process per host,
    each taking the strided slice feat_list[host_id::n_hosts] and
    sharding its batches over its own local 2-device mesh — decoding has
    no cross-utterance dependency, so there is no coordinator and no DCN
    collective (the serving analogue is one qpnet_serve per host behind
    a load balancer, docs/SERVING.md).  The two hosts must write disjoint
    output sets whose union covers the corpus, and argmax decoding must
    be bit-identical to a single-host run of the full list."""
    import jax
    import jax.numpy as jnp
    from qpnet_tpu.config import ModelConfig, RunConfig
    from qpnet_tpu.data.stats import calc_stats
    from qpnet_tpu.models import init_params
    from qpnet_tpu.train.checkpoint import save_final

    _, feats = make_synthetic_corpus(str(tmp_path), n_utts=5, fs=1000,
                                     up=10, n_aux=4)
    feat_scp = str(tmp_path / "feat.scp")
    with open(feat_scp, "w") as f:
        f.write("\n".join(feats) + "\n")
    stats = str(tmp_path / "stats.h5")
    calc_stats(feats, stats)

    cfg = ModelConfig(n_quantize=32, n_aux=4, n_resch=16, n_skipch=8,
                      dilationF_depth=2, dilationF_repeat=1,
                      dilationA_depth=2, dilationA_repeat=1,
                      upsampling_factor=10)
    run_cfg = RunConfig(model=cfg, fs=1000)
    config = str(tmp_path / "model.conf")
    run_cfg.save(config)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ckpt = save_final(str(tmp_path / "exp"), params)

    # single-host full-list run (in this process) = the reference output
    from qpnet_tpu.bin import qpnet_decode
    outdir_ref = str(tmp_path / "ref")
    qpnet_decode.main([
        "--feats", feat_scp, "--stats", stats, "--config", config,
        "--outdir", outdir_ref, "--checkpoint", ckpt, "--fs", "1000",
        "--batch_size", "2", "--mode", "argmax", "--dtype", "float32",
        "--engine", "xla", "--verbose", "0"])

    outdirs = [str(tmp_path / f"host{hid}") for hid in range(2)]
    procs = []
    for hid in range(2):
        code = DECODE_WORKER.format(repo=REPO, feat_scp=feat_scp,
                                    stats=stats, config=config,
                                    outdir=outdirs[hid], ckpt=ckpt,
                                    hid=str(hid))
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for hid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {hid} failed:\n{out[-4000:]}"

    from scipy.io import wavfile
    written = {}
    for hid, od in enumerate(outdirs):
        got = sorted(os.listdir(od))
        # strided shard: host 0 -> utt0/2/4, host 1 -> utt1/3
        want = sorted(f"utt{i}.wav" for i in range(hid, 5, 2))
        assert got == want, (hid, got)
        for name in got:
            written[name] = os.path.join(od, name)
    assert sorted(written) == [f"utt{i}.wav" for i in range(5)]
    for name, path in written.items():
        _, ref = wavfile.read(os.path.join(outdir_ref, name))
        _, x = wavfile.read(path)
        np.testing.assert_array_equal(x, ref, err_msg=name)
