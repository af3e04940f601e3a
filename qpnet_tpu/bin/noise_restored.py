"""Noise-shaping restoration worker (reference src/bin/noise_restored.py):
applies the inverse differential MLSA filter (`--inv false` keeps the
original coefficient signs) to *generated* wavs, mapping
`outdir/feat_id.wav` -> `writedir/feat_id.wav`.
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
    parser.add_argument("--feats", required=True, type=str)
    parser.add_argument("--stats", required=True, type=str)
    parser.add_argument("--outdir", required=True, type=str,
                        help="noise-shaped wav path template with feat_id")
    parser.add_argument("--writedir", required=True, type=str,
                        help="restored wav path template with feat_id")
    parser.add_argument("--feature_type", default="world", type=str)
    parser.add_argument("--feature_format", default="h5", type=str)
    parser.add_argument("--pow_adjust", default=1.0, type=float)
    parser.add_argument("--fs", default=16000, type=int)
    parser.add_argument("--shiftms", default=5, type=float)
    parser.add_argument("--fftl", default=1024, type=int)
    parser.add_argument("--mcep_dim_start", default=2, type=int)
    parser.add_argument("--mcep_dim_end", default=27, type=int)
    parser.add_argument("--mcep_alpha", default=0.41, type=float)
    parser.add_argument("--mag", default=0.5, type=float)
    parser.add_argument("--verbose", default=1, type=int)
    parser.add_argument("--n_jobs", default=40, type=int)
    parser.add_argument("--inv", default=False, type=strtobool)
    return parser.parse_args(argv)


def noise_restore(feat_ids, args):
    analyzer = WorldAnalyzer(fs=args.fs, shiftms=args.shiftms,
                             fftl=args.fftl)
    synthesizer = WorldSynthesizer(fs=args.fs, shiftms=args.shiftms,
                                   fftl=args.fftl)
    base_coef = read_hdf5(args.stats, "/%s/mean" % args.feature_type)
    for i, feat_id in enumerate(feat_ids):
        logging.info("now processing %s (%d/%d)", feat_id, i + 1,
                     len(feat_ids))
        wav_filename = args.outdir.replace("feat_id", feat_id)
        fs, x = wavfile.read(wav_filename)
        wav_type = x.dtype
        x = np.array(x, dtype=np.float64)
        if fs != args.fs:
            logging.error("sampling frequency is not matched.")
            sys.exit(1)
        f0, _, _ = analyzer.analyze(x)
        num_frames = f0.shape[0]
        mlsa_coef = base_coef[args.mcep_dim_start: args.mcep_dim_end] * args.mag
        mlsa_coef[0] = 0.0
        if args.inv:
            mlsa_coef[1:] = -1.0 * mlsa_coef[1:]
        mlsa_coef = np.tile(mlsa_coef, [num_frames, 1])
        x_ns = synthesizer.synthesis_diff(x, mlsa_coef, alpha=args.mcep_alpha)
        x_ns = low_cut_filter(x_ns, args.fs, cutoff=70)
        write_name = args.writedir.replace("feat_id", feat_id)
        os.makedirs(os.path.dirname(write_name), exist_ok=True)
        wav = np.clip(x_ns, -32768, 32767)
        if wav_type == np.int16:
            wavfile.write(write_name, args.fs, np.int16(wav))
        else:
            wavfile.write(write_name, args.fs, wav)


def main(argv=None):
    args = get_arguments(argv)
    set_loglevel(args.verbose)
    for key, value in vars(args).items():
        logging.info("%s = %s", key, str(value))
    os.makedirs(os.path.dirname(args.writedir), exist_ok=True)
    if os.path.isdir(args.feats):
        feat_list = sorted(find_files(args.feats,
                                      "*.%s" % args.feature_format))
    elif os.path.isfile(args.feats):
        feat_list = read_txt(args.feats)
    else:
        logging.error("--feats should be directory or list.")
        sys.exit(1)
    feat_ids = [os.path.basename(f).replace(".%s" % args.feature_format, "")
                for f in feat_list]
    logging.info("number of utterances = %d", len(feat_ids))
    multi_processing(feat_ids, noise_restore, args.n_jobs, args)


if __name__ == "__main__":
    main()
