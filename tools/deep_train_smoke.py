"""Hardware training smoke of the deep network at its registry shape.

The reference registers Rd10Rr3Ed4Er1 as a first-class TRAINING entry
(param_model.py:65-73: max_length 22500, batch_length 20000, batch 1);
this tool runs a few-hundred-iteration bf16 training run of that exact
geometry at FULL width (R=512, S=256, Q=256, A=39, up=110) on the real
chip — the measurement VERDICT r4 asked for: ms/step, remat behavior,
and a loss-decrease gate.  Results go to BENCH_NOTES.md ("Deep-net
training" table).

usage: python tools/deep_train_smoke.py [--iters 300] [--dtype bfloat16]
         [--remat auto|on|off] [--json out.json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qpnet_tpu.utils.jax_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from qpnet_tpu.config import ModelConfig  # noqa: E402
from qpnet_tpu.data.batcher import train_window_generator  # noqa: E402
from qpnet_tpu.models.qpnet import init_params  # noqa: E402
from qpnet_tpu.train.step import TrainState, make_train_step  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from helpers import make_synthetic_corpus  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--remat", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = ModelConfig.from_network_name("Rd10Rr3Ed4Er1")  # full width
    tmp = tempfile.mkdtemp(prefix="deepsmoke_")
    # 22.05 kHz-geometry synthetic corpus; F0 range puts
    # d = fs/(f0*dense) in the real 20-55 band -> maxd bucket like
    # production, receptive field ~3.9k samples
    wavs, feats = make_synthetic_corpus(tmp, n_utts=6, fs=22050, up=110,
                                        n_aux=cfg.n_aux, seconds=1.5,
                                        f0_lo=50.0, f0_hi=120.0, seed=7)
    gen = train_window_generator(wavs, feats, cfg, batch_length=20000,
                                 batch_size=1, max_length=22500, seed=1)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    remat = {"auto": True, "on": True, "off": False}[args.remat]
    tx = optax.adam(args.lr)
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M  dtype={args.dtype} remat={remat}",
          flush=True)
    step = make_train_step(cfg, tx, compute_dtype=dtype, remat=remat)
    state = TrainState(params=params, opt_state=tx.init(params),
                       iterations=0)

    losses, times = [], []
    t_compile = None
    for i, batch in zip(range(args.iters), gen):
        batch = {k: v for k, v in batch.items() if k != "window_lens"}
        t0 = time.time()
        state, loss = step(state, batch)
        if i == 0:
            loss.block_until_ready()
            t_compile = time.time() - t0
            print(f"first step (compile): {t_compile:.1f}s", flush=True)
        if i >= args.iters - 50 or i % 50 == 0:
            losses.append((i, float(loss)))
        if i >= 10:                      # steady state
            loss.block_until_ready()
            times.append(time.time() - t0)
        if i % 50 == 0:
            print(f"iter {i}: loss {float(loss):.4f}", flush=True)

    ms = 1e3 * float(np.median(times))
    first = np.mean([l for i, l in losses if i < 50])
    last = np.mean([l for i, l in losses if i >= args.iters - 50])
    ok = bool(last < first)
    out = {"network": "Rd10Rr3Ed4Er1", "params_m": n_params / 1e6,
           "dtype": args.dtype, "remat": remat, "iters": args.iters,
           "ms_per_step_median": round(ms, 1),
           "compile_s": round(t_compile, 1),
           "loss_first50_mean": round(float(first), 4),
           "loss_last50_mean": round(float(last), 4),
           "loss_decreased": ok}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
