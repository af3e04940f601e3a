"""Speaker-statistics initializer (reference src/bin/initialize_speaker.py):
per-speaker F0 and frame-power histograms (PNG) so a human can set
f0_min/f0_max/pow_th in conf/pow_f0_dict.yml.
"""

from __future__ import annotations

import argparse
import logging
import multiprocessing as mp
import os

import matplotlib
import numpy as np
from scipy.io import wavfile

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from qpnet_tpu.data import find_files, read_txt  # noqa: E402
from qpnet_tpu.dsp.world import WorldAnalyzer  # noqa: E402
from qpnet_tpu.utils import set_loglevel  # noqa: E402


def create_histogram(data, figure_path, range_min=-70, range_max=20,
                     step=10, xlabel="Power [dB]"):
    plt.hist(data, bins=200, range=(range_min, range_max),
             density=True, histtype="stepfilled")
    plt.xlabel(xlabel)
    plt.ylabel("Probability")
    plt.xticks(np.arange(range_min, range_max, step))
    os.makedirs(os.path.dirname(figure_path), exist_ok=True)
    plt.savefig(figure_path)
    plt.close()


def world_feature_extract(wav_list, idx, f0_dict, npow_dict):
    f0s, npows = [], []
    for f in wav_list:
        wavf = f.rstrip()
        fs, x = wavfile.read(wavf)
        x = np.array(x, dtype=np.float64)
        logging.info("Extract: %s", wavf)
        analyzer = WorldAnalyzer(fs=fs, minf0=40, maxf0=800)
        f0, _, _ = analyzer.analyze(x)
        npow = analyzer.npow()
        f0s.append(f0[f0 > 0])
        npows.append(npow)
    f0_dict[idx] = np.concatenate(f0s) if f0s else np.zeros(0)
    npow_dict[idx] = np.concatenate(npows) if npows else np.zeros(0)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--speaker", required=True, type=str)
    parser.add_argument("--waveforms", required=True, type=str)
    parser.add_argument("--figure_dir", required=True, type=str)
    parser.add_argument("--n_jobs", default=10, type=int)
    parser.add_argument("--verbose", default=1, type=int)
    args = parser.parse_args(argv)
    set_loglevel(args.verbose)

    if os.path.isdir(args.waveforms):
        file_list = sorted(find_files(args.waveforms, "*.wav"))
    else:
        file_list = read_txt(args.waveforms)
    logging.info("number of utterances = %d", len(file_list))

    # spawn, not fork: the parent may hold a live JAX/XLA runtime with
    # many threads (the same deadlock class utils/multi_process.py
    # documents), and under Python 3.12 fork-in-threads is deprecated.
    # n_jobs==1 runs inline — no Manager round trip for tests/small sets.
    n_jobs = max(1, min(args.n_jobs, len(file_list)))
    if n_jobs <= 1:
        f0_dict, npow_dict = {}, {}
        world_feature_extract(file_list, 0, f0_dict, npow_dict)
    else:
        ctx = mp.get_context("spawn")
        file_lists = [l.tolist() for l in
                      np.array_split(file_list, n_jobs)]
        manager = ctx.Manager()
        f0_dict = manager.dict()
        npow_dict = manager.dict()
        processes = []
        for idx, sub in enumerate(file_lists):
            p = ctx.Process(target=world_feature_extract,
                            args=(sub, idx, f0_dict, npow_dict))
            p.start()
            processes.append(p)
        for p in processes:
            p.join()

    f0s = np.concatenate([f0_dict[i] for i in sorted(f0_dict.keys())])
    npows = np.concatenate([npow_dict[i] for i in sorted(npow_dict.keys())])
    spk = args.speaker
    create_histogram(f0s, os.path.join(args.figure_dir,
                                       f"{spk}_f0histogram.png"),
                     range_min=40, range_max=700, step=50,
                     xlabel="Fundamental frequency [Hz]")
    create_histogram(npows, os.path.join(args.figure_dir,
                                         f"{spk}_npowhistogram.png"),
                     range_min=-70, range_max=20, step=10,
                     xlabel="Power [dB]")
    logging.info("histograms written to %s", args.figure_dir)


if __name__ == "__main__":
    main()
