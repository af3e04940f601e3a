"""On-chip validation gates — run on the REAL TPU (no CPU override).

Closes the last gap in the Pallas parity chain: every prior pin of the
mega-kernel against the reference's executed PyTorch code ran the kernel
in INTERPRET mode (tests/test_gen_kernel.py), which validates the
kernel's math but not its Mosaic lowering.  Gate A here runs the
COMPILED kernel (real `pallas_call` on the chip) against the torch
oracle (reference qpnet.py:314-559, argmax mode):

  A1. compiled free-running argmax trajectory == the INTERPRET kernel's
      (same bf16 math; lowering must not change a single decision);
  A2. compiled forced-mode per-step logits along the reference's own
      executed trajectory vs the reference's hooked conv_post_2 outputs:
      the max deviation is recorded, and at every step where the torch
      top-2 margin dwarfs it (>10x), the compiled argmax must equal the
      reference's — a margin-guarded per-step pin against executed
      reference code (teacher forcing keeps the context identical, so
      the per-step claim is valid even where near-ties exist elsewhere);
  A3. compiled vs interpret forced-mode logits must be BIT-EQUAL — the
      Mosaic-lowering pin itself.

The kernel's resident weights are bf16 by design (pack_weights), so an
f32 compiled variant does not exist to lower, and free-running argmax
equality against the f32 torch oracle is unattainable whenever a random
tiny net produces per-step top-2 margins below bf16 resolution (measured
2.07e-4 vs a 7.3e-3 bf16 logit deviation).  VERDICT r4 #2 sanctions
exactly this fallback: compiled-vs-interpret bit-equivalence on chip
(A3, measured 0.0) + the interpret kernel's existing oracle pins
(tests/test_torch_oracle.py, test_forced_mode.py) close the chain, and
A2 adds the direct margin-guarded per-step pin vs the executed torch
code.  Results are recorded in BENCH_NOTES.md and ONCHIP_r05.json.

Gate B (decode VMEM admission): the boundary configs of the deep-net
cost model — the admitted bf16 B=8 config must actually run on the
chip, and the configurations recorded as crashing the TPU worker
(BENCH_NOTES round 4: bf16 B=16) must be rejected by
`pallas_engine_available` so no CLI invocation reaches them.

usage: python tools/onchip_gates.py [--json ONCHIP_r05.json]
"""

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qpnet_tpu.config import ModelConfig  # noqa: E402
from qpnet_tpu.models import batch_fast_generate  # noqa: E402
from qpnet_tpu.models.generate import (  # noqa: E402
    pallas_engine_available, teacher_forced_logits)
from qpnet_tpu.tools.convert_checkpoint import convert_state_dict  # noqa: E402

REFERENCE_QPNET = os.environ.get(
    "QPNET_REFERENCE_QPNET", "/root/reference/src/nets/qpnet.py")


def load_reference():
    spec = importlib.util.spec_from_file_location("ref_qpnet",
                                                  REFERENCE_QPNET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def tiny_cfg():
    # same dims as tests/test_torch_oracle.py::tiny_cfg
    return ModelConfig(n_quantize=16, n_aux=3, n_resch=8, n_skipch=4,
                       dilationF_depth=2, dilationF_repeat=1,
                       dilationA_depth=2, dilationA_repeat=1,
                       kernel_size=2, upsampling_factor=4)


def build_ref_net(ref, cfg, seed=0):
    import torch
    torch.manual_seed(seed)
    net = ref.QPNet(
        n_quantize=cfg.n_quantize, n_aux=cfg.n_aux, n_resch=cfg.n_resch,
        n_skipch=cfg.n_skipch,
        dilationF_depth=cfg.dilationF_depth,
        dilationF_repeat=cfg.dilationF_repeat,
        dilationA_depth=cfg.dilationA_depth,
        dilationA_repeat=cfg.dilationA_repeat,
        kernel_size=cfg.kernel_size,
        upsampling_factor=cfg.upsampling_factor)
    net.apply(ref.initialize)
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in net.parameters():
            p.add_(torch.empty_like(p).uniform_(-0.05, 0.05, generator=g))
    net.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    return net, convert_state_dict(sd, cfg)


def gate_a(results):
    import torch
    ref = load_reference()
    cfg = tiny_cfg()
    net, params = build_ref_net(ref, cfg, seed=0)
    rng = np.random.default_rng(0)
    B, F, up = 4, 30, cfg.upsampling_factor
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d_frames = rng.uniform(0.9, 3.3, size=(B, F)).astype(np.float32)
    d = np.repeat(d_frames, up, axis=1)[:, :n]

    # reference argmax trajectory + per-step logits (executed torch code)
    x0t = torch.from_numpy(
        ref.encode_mu_law(np.zeros((B, 1)), cfg.n_quantize)).long()
    logits_steps = []
    hook = net.conv_post_2.register_forward_hook(
        lambda m, i, o: logits_steps.append(o.detach().numpy()[:, :, -1]))
    with torch.no_grad():
        ref_out = net.batch_fast_generate(
            x0t, torch.from_numpy(h.transpose(0, 2, 1)).float(),
            [n] * B, d.astype(np.float64), mode="argmax")
    hook.remove()
    ref_traj = np.stack([np.asarray(s) for s in ref_out])      # (B, n)
    ref_logits = np.stack(logits_steps, axis=1)                # (B, n, Q)
    top2 = np.sort(ref_logits, axis=-1)
    margin = float(np.min(top2[..., -1] - top2[..., -2]))

    x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
    # A1: compiled free-running argmax trajectory == interpret's (the
    # lowering must not change a single free-running decision)
    t0 = time.time()
    ours = np.stack(batch_fast_generate(params, cfg, x0, h, [n] * B, d,
                                        mode="argmax", engine="pallas",
                                        interpret=False))
    ours_i = np.stack(batch_fast_generate(params, cfg, x0, h, [n] * B, d,
                                          mode="argmax", engine="pallas",
                                          interpret=True))
    a1 = bool((ours == ours_i).all())
    results["A1_compiled_eq_interpret_trajectory"] = a1
    results["A1_steps"] = int(B * n)
    results["A1_torch_agreement_frac"] = float((ours == ref_traj).mean())
    print(f"A1 compiled free-run trajectory == interpret: {a1} "
          f"({B}x{n} steps, {time.time()-t0:.1f}s incl. compile; "
          f"agreement with the f32 torch free-run "
          f"{results['A1_torch_agreement_frac']:.3f} — informational: "
          f"free-running bf16 vs f32 diverges chaotically at near-ties)")

    # A2: compiled forced-mode logits along the reference trajectory;
    # margin-guarded per-step argmax pin vs the executed torch code
    got = teacher_forced_logits(params, cfg, x0, h,
                                ref_traj.astype(np.int32), d,
                                engine="pallas", interpret=False)
    dev = float(np.max(np.abs(got - ref_logits)))
    results["A2_compiled_forced_logit_dev"] = dev
    results["A2_torch_min_top2_margin"] = margin
    margins = top2[..., -1] - top2[..., -2]              # (B, n)
    sure = margins > 10 * dev
    agree = np.argmax(got, -1) == np.argmax(ref_logits, -1)
    a2 = bool(agree[sure].all()) and int(sure.sum()) > 0
    results["A2_guarded_steps"] = int(sure.sum())
    results["A2_guarded_step_frac"] = float(sure.mean())
    results["A2_guarded_argmax_match"] = a2
    print(f"A2 compiled forced-logit max dev vs torch: {dev:.3e}; "
          f"per-step argmax == torch at all {int(sure.sum())}/{sure.size} "
          f"steps with top-2 margin >10x dev: {a2}")

    # A3: compiled vs interpret forced logits must be BIT-EQUAL (the
    # Mosaic lowering pin; VERDICT r4 #2's sanctioned fallback)
    got_i = teacher_forced_logits(params, cfg, x0, h,
                                  ref_traj.astype(np.int32), d,
                                  engine="pallas", interpret=True)
    dev_ci = float(np.max(np.abs(got - got_i)))
    a3 = dev_ci == 0.0
    results["A3_compiled_vs_interpret_dev"] = dev_ci
    results["A3_bit_equal"] = a3
    print(f"A3 compiled vs interpret forced-logit max dev: {dev_ci:.3e} "
          f"(bit-equal: {a3})")
    ok = a1 and a2 and a3
    results["gate_a_ok"] = ok
    return ok


def gate_b(results):
    cfg = ModelConfig.from_network_name("Rd10Rr3Ed4Er1")
    # the configuration BENCH_NOTES round 4 records as crashing the TPU
    # worker must not be admitted
    crash_admitted = pallas_engine_available(cfg, 16, 32, "none")
    results["B_crash_config_admitted"] = bool(crash_admitted)
    # the boundary config that must stay admitted AND run
    ok_admitted = pallas_engine_available(cfg, 8, 32, "none")
    results["B_boundary_admitted"] = bool(ok_admitted)
    ran = False
    if ok_admitted:
        from qpnet_tpu.models.qpnet import init_params
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        B, F, up = 8, 6, cfg.upsampling_factor
        n = F * up - 1
        h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32) * 0.1
        d = np.full((B, n), 2.0, np.float32)
        x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
        t0 = time.time()
        out = batch_fast_generate(params, cfg, x0, h, [n] * B, d,
                                  mode="argmax", engine="pallas",
                                  interpret=False)
        ran = len(out) == B and all(o.shape == (n,) for o in out)
        print(f"B boundary bf16 B=8 deep-net compiled run: {ran} "
              f"({time.time()-t0:.1f}s incl. compile)")
    results["B_boundary_ran"] = bool(ran)
    # the previously-crashing CLI config itself (bf16 deep net, batch 16)
    # must now COMPLETE through the auto engine: admission rejects the
    # fused B=16 program and batch_fast_generate splits into the
    # measured-safe B=8 slices instead
    ran16 = False
    if ran:
        from qpnet_tpu.models.qpnet import init_params
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(1)
        B, F, up = 16, 6, cfg.upsampling_factor
        n = F * up - 1
        h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32) * 0.1
        d = np.full((B, n), 2.0, np.float32)
        x0 = np.full((B, 1), cfg.n_quantize // 2, np.int32)
        t0 = time.time()
        out = batch_fast_generate(params, cfg, x0, h, [n] * B, d,
                                  mode="argmax", interpret=False)
        ran16 = len(out) == B and all(o.shape == (n,) for o in out)
        print(f"B crash-config bf16 B=16 now completes via B=8 slices: "
              f"{ran16} ({time.time()-t0:.1f}s)")
    results["B_crash_config_completes_via_slices"] = bool(ran16)
    ok = (not crash_admitted) and ok_admitted and ran and ran16
    results["gate_b_ok"] = ok
    print(f"B crash-config (bf16 B=16) admitted: {crash_admitted} "
          f"(must be False); boundary admitted+ran: {ok_admitted}/{ran}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--gates", default="ab", help="subset: a, b, ab")
    args = ap.parse_args()
    platform = jax.devices()[0].platform
    print("platform:", platform)
    if platform not in ("tpu", "axon"):
        print("SKIP: needs the real TPU")
        return 2
    results = {"platform": platform}
    ok = True
    if "a" in args.gates:
        ok &= gate_a(results)
    if "b" in args.gates:
        ok &= gate_b(results)
    results["ok"] = bool(ok)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print("ONCHIP GATES:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
