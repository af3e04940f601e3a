"""Objective evaluation: MCD, F0-RMSE, V/UV error between wav sets.

The reference publishes no evaluation code (its MCD/MOS tables live in the
papers, SURVEY.md §6); this tool provides the BASELINE.md metrics:
mel-cepstral distortion (dB) over frames voiced in both signals, F0 RMSE
(Hz) and voiced/unvoiced disagreement rate.

MCD convention: (10*sqrt(2)/ln10) * mean ||mc_a[1:] - mc_b[1:]||_2 over
aligned frames (c0 excluded).  For equal-length pairs (copy synthesis)
frames align 1:1; otherwise the shorter length is used.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Sequence

import numpy as np
from scipy.io import wavfile

from qpnet_tpu.dsp.world import WorldAnalyzer

MCD_K = 10.0 * np.sqrt(2.0) / np.log(10.0)


def wav_metrics(x_ref: np.ndarray, x_gen: np.ndarray, fs: int,
                mcep_dim: int = 34, alpha: float = 0.455,
                minf0: float = 40.0, maxf0: float = 800.0) -> Dict:
    an = WorldAnalyzer(fs=fs, minf0=minf0, maxf0=maxf0)
    f0_a, _, _ = an.analyze(np.asarray(x_ref, np.float64))
    mc_a = an.mcep(dim=mcep_dim, alpha=alpha)
    f0_b, _, _ = an.analyze(np.asarray(x_gen, np.float64))
    mc_b = an.mcep(dim=mcep_dim, alpha=alpha)
    F = min(len(f0_a), len(f0_b))
    f0_a, f0_b = f0_a[:F], f0_b[:F]
    mc_a, mc_b = mc_a[:F], mc_b[:F]
    both_voiced = (f0_a > 0) & (f0_b > 0)
    out: Dict = {"frames": int(F),
                 "voiced_both": int(both_voiced.sum())}
    if both_voiced.any():
        diff = mc_a[both_voiced, 1:] - mc_b[both_voiced, 1:]
        out["mcd_db"] = float(MCD_K * np.mean(
            np.sqrt(np.sum(diff ** 2, axis=1))))
        out["f0_rmse_hz"] = float(np.sqrt(np.mean(
            (f0_a[both_voiced] - f0_b[both_voiced]) ** 2)))
    else:
        out["mcd_db"] = float("nan")
        out["f0_rmse_hz"] = float("nan")
    out["vuv_error_rate"] = float(np.mean((f0_a > 0) != (f0_b > 0)))
    return out


def evaluate_pairs(ref_paths: Sequence[str], gen_paths: Sequence[str],
                   **kw) -> Dict:
    per_utt = []
    for rp, gp in zip(ref_paths, gen_paths):
        fs_a, xa = wavfile.read(rp)
        fs_b, xb = wavfile.read(gp)
        assert fs_a == fs_b, (rp, gp)
        m = wav_metrics(xa.astype(np.float64), xb.astype(np.float64),
                        fs_a, **kw)
        m["ref"] = os.path.basename(rp)
        per_utt.append(m)
    mcds = [m["mcd_db"] for m in per_utt if np.isfinite(m["mcd_db"])]
    f0s = [m["f0_rmse_hz"] for m in per_utt if np.isfinite(m["f0_rmse_hz"])]
    return {
        "n_utterances": len(per_utt),
        "mcd_db_mean": float(np.mean(mcds)) if mcds else float("nan"),
        "f0_rmse_hz_mean": float(np.mean(f0s)) if f0s else float("nan"),
        "vuv_error_rate_mean": float(np.mean(
            [m["vuv_error_rate"] for m in per_utt])),
        "per_utterance": per_utt,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="MCD / F0-RMSE evaluation")
    p.add_argument("--ref_wavs", required=True,
                   help="list file or directory of reference wavs")
    p.add_argument("--gen_wavs", required=True,
                   help="list file or directory of generated wavs "
                        "(matched by basename)")
    p.add_argument("--mcep_dim", type=int, default=34)
    p.add_argument("--mcep_alpha", type=float, default=0.455)
    p.add_argument("--minf0", type=float, default=40.0)
    p.add_argument("--maxf0", type=float, default=800.0)
    args = p.parse_args(argv)

    from qpnet_tpu.data import find_files, read_txt

    def resolve(path):
        if os.path.isdir(path):
            return sorted(find_files(path, "*.wav"))
        return read_txt(path)

    refs = resolve(args.ref_wavs)
    gens = {os.path.basename(g): g for g in resolve(args.gen_wavs)}
    pairs = [(r, gens[os.path.basename(r)]) for r in refs
             if os.path.basename(r) in gens]
    result = evaluate_pairs(
        [p_[0] for p_ in pairs], [p_[1] for p_ in pairs],
        mcep_dim=args.mcep_dim, alpha=args.mcep_alpha,
        minf0=args.minf0, maxf0=args.maxf0)
    result.pop("per_utterance")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
