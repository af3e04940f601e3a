"""Generate scp file lists + a pow_f0_dict.yml template for a corpus laid
out as `<corpus_dir>/wav/<subset>/<speaker>/<utt>.wav` (the VCC2018
convention the reference ships as static assets; corpus/VCC2018/scp/).

Lists use the `rootpath/wav/...` convention so the orchestrators' temp-list
rewriting works identically.  Per-speaker lists are emitted as
`<prefix>_<SPK>.scp`; f0_min/f0_max/pow_th in the conf template must be
curated by a human after running runFE step 1 (histograms), exactly as in
the reference workflow (README.md:77-83).
"""

from __future__ import annotations

import argparse
import os

import yaml

from qpnet_tpu.data.lists import find_files, write_txt

# The reference ships hand-curated per-speaker F0 search ranges and power
# thresholds for the VCC2018 roster (corpus/VCC2018/conf/pow_f0_dict.yml —
# the values a human reads off the runFE step-1 histograms).  Reproduced
# here as data so a VCC2018 user gets the exact reference analysis
# settings without re-curating; unknown speakers still get the wide-open
# defaults below.
VCC2018_POW_F0 = {
    "VCC2SF1": {"f0_min": 100, "f0_max": 450, "pow_th": -31},
    "VCC2SF2": {"f0_min": 110, "f0_max": 350, "pow_th": -31},
    "VCC2SF3": {"f0_min": 110, "f0_max": 340, "pow_th": -38},
    "VCC2SF4": {"f0_min": 120, "f0_max": 330, "pow_th": -34},
    "VCC2SM1": {"f0_min": 50, "f0_max": 200, "pow_th": -31},
    "VCC2SM2": {"f0_min": 70, "f0_max": 300, "pow_th": -40},
    "VCC2SM3": {"f0_min": 45, "f0_max": 220, "pow_th": -35},
    "VCC2SM4": {"f0_min": 45, "f0_max": 260, "pow_th": -32},
    "VCC2TF1": {"f0_min": 140, "f0_max": 350, "pow_th": -45},
    "VCC2TF2": {"f0_min": 100, "f0_max": 400, "pow_th": -30},
    "VCC2TM1": {"f0_min": 60, "f0_max": 200, "pow_th": -23},
    "VCC2TM2": {"f0_min": 50, "f0_max": 280, "pow_th": -31},
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--corpus_dir", required=True,
                   help="directory containing wav/<subset>/<spk>/*.wav")
    p.add_argument("--subset", required=True,
                   help="wav subdirectory, e.g. vcc2018_training")
    p.add_argument("--prefix", required=True,
                   help="scp name prefix, e.g. vcc18tr")
    p.add_argument("--make_conf", action="store_true",
                   help="seed conf/pow_f0_dict.yml defaults for new speakers")
    args = p.parse_args(argv)

    wav_root = os.path.join(args.corpus_dir, "wav", args.subset)
    scp_dir = os.path.join(args.corpus_dir, "scp")
    os.makedirs(scp_dir, exist_ok=True)
    speakers = sorted(d for d in os.listdir(wav_root)
                      if os.path.isdir(os.path.join(wav_root, d)))
    all_lines = []
    for spk in speakers:
        files = sorted(find_files(os.path.join(wav_root, spk), "*.wav"))
        lines = [f.replace(args.corpus_dir.rstrip("/") + "/wav",
                           "rootpath/wav") for f in files]
        write_txt(os.path.join(scp_dir, f"{args.prefix}_{spk}.scp"), lines)
        all_lines += lines
    write_txt(os.path.join(scp_dir, f"{args.prefix}.scp"), all_lines)
    print(f"wrote {len(speakers)} speaker lists + global list to {scp_dir}")

    if args.make_conf:
        conf_path = os.path.join(args.corpus_dir, "conf", "pow_f0_dict.yml")
        os.makedirs(os.path.dirname(conf_path), exist_ok=True)
        conf = {}
        if os.path.exists(conf_path):
            with open(conf_path) as f:
                conf = yaml.safe_load(f) or {}
        for spk in speakers:
            conf.setdefault(spk, VCC2018_POW_F0.get(
                spk, {"f0_min": 40, "f0_max": 800, "pow_th": -30}))
        with open(conf_path, "w") as f:
            yaml.safe_dump(conf, f)
        print(f"seeded {conf_path}")


if __name__ == "__main__":
    main()
