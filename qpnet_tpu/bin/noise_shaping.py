"""Mu-law-domain noise shaping worker (reference src/bin/noise_shaping.py):
pre-emphasizes training targets with the differential MLSA filter built from
the corpus-mean mel-cepstrum (mag 0.5, c0=0, signs flipped for `--inv true`),
followed by a 70 Hz low-cut.  Writes `wav_<fmt>_ns/*.wav`.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np
from scipy.io import wavfile

from qpnet_tpu.data import find_files, read_hdf5, read_txt
from qpnet_tpu.dsp import low_cut_filter
from qpnet_tpu.dsp.world import WorldAnalyzer, WorldSynthesizer
from qpnet_tpu.utils import multi_processing, set_loglevel


def strtobool(v: str) -> bool:
    return str(v).lower() in ("y", "yes", "t", "true", "on", "1")


def get_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--waveforms", default=None, type=str)
    parser.add_argument("--stats", default=None, type=str)
    parser.add_argument("--feature_type", default="world", type=str)
    parser.add_argument("--feature_format", default="h5", type=str)
    parser.add_argument("--wavtype", default="ns", type=str)
    parser.add_argument("--fs", default=22050, type=int)
    parser.add_argument("--shiftms", default=5.0, type=float)
    parser.add_argument("--fftl", default=1024, type=int)
    parser.add_argument("--mcep_dim_start", default=2, type=int)
    parser.add_argument("--mcep_dim_end", default=37, type=int)
    parser.add_argument("--mcep_alpha", default=0.455, type=float)
    parser.add_argument("--mag", default=0.5, type=float)
    parser.add_argument("--verbose", default=1, type=int)
    parser.add_argument("--n_jobs", default=10, type=int)
    parser.add_argument("--inv", default=True, type=strtobool)
    return parser.parse_args(argv)


def filepath_create(wav_list, wav_set):
    for wav_name in wav_list:
        write_name = wav_name.replace("wav", wav_set).replace(
            ".%s" % wav_set, ".wav")
        dirname = os.path.dirname(write_name)
        if dirname:
            os.makedirs(dirname, exist_ok=True)


def noise_shaping(wav_list, wav_set, args):
    analyzer = WorldAnalyzer(fs=args.fs, shiftms=args.shiftms,
                             fftl=args.fftl)
    synthesizer = WorldSynthesizer(fs=args.fs, shiftms=args.shiftms,
                                   fftl=args.fftl)
    base_coef = read_hdf5(args.stats, "/%s/mean" % args.feature_type)
    for i, wav_name in enumerate(wav_list):
        logging.info("now processing %s (%d/%d)", wav_name, i + 1,
                     len(wav_list))
        fs, x = wavfile.read(wav_name)
        wav_type = x.dtype
        x = np.array(x, dtype=np.float64)
        if fs != args.fs:
            logging.error("sampling frequency is not matched.")
            sys.exit(1)
        # frame count from F0 analysis (reference noise_shaping.py:118-120)
        f0, _, _ = analyzer.analyze(x)
        num_frames = f0.shape[0]
        mlsa_coef = base_coef[args.mcep_dim_start: args.mcep_dim_end] * args.mag
        mlsa_coef[0] = 0.0
        if args.inv:
            mlsa_coef[1:] = -1.0 * mlsa_coef[1:]
        mlsa_coef = np.tile(mlsa_coef, [num_frames, 1])
        x_ns = synthesizer.synthesis_diff(x, mlsa_coef, alpha=args.mcep_alpha)
        x_ns = low_cut_filter(x_ns, args.fs, cutoff=70)
        write_name = wav_name.replace("wav", wav_set).replace(
            ".%s" % wav_set, ".wav")
        x_ns = np.clip(x_ns, -32768, 32767)
        if wav_type == np.int16:
            wavfile.write(write_name, args.fs, np.int16(x_ns))
        else:
            wavfile.write(write_name, args.fs, x_ns)


def main(argv=None):
    args = get_arguments(argv)
    set_loglevel(args.verbose)
    for key, value in vars(args).items():
        logging.info("%s = %s", key, str(value))
    if os.path.isdir(args.waveforms):
        file_list = sorted(find_files(args.waveforms, "*.wav"))
    else:
        file_list = read_txt(args.waveforms)
    logging.info("number of utterances = %d", len(file_list))
    wav_set = "wav_%s_%s" % (args.feature_format, args.wavtype)
    filepath_create(file_list, wav_set)
    multi_processing(file_list, noise_shaping, args.n_jobs, wav_set, args)


if __name__ == "__main__":
    main()
