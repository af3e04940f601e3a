"""Parity against the ACTUAL PyTorch reference implementation.

These tests import and execute `/root/reference/src/nets/qpnet.py` (torch-cpu)
as the oracle — not a re-derivation of its math.  A random reference-layout
`state_dict` flows through `tools/convert_checkpoint.py` and the two
frameworks must agree on:

  (a) teacher-forced `forward` logits (reference qpnet.py:239-312) at tiny,
      released (R=512/S=256/Q=256/A=39/up=110), and deep-network dims;
  (b) argmax AR trajectories of `batch_fast_generate`
      (reference qpnet.py:314-559), including extra_memory on/off, the
      F0-scaled-d path, and the batch-shrink (unequal lengths) path;
  (c) per-step logits along a real AR trajectory (reference hooked at
      conv_post_2 vs our teacher_forced_logits);
  (d) an end-to-end waveform: generated mu-law samples decoded by each
      framework's own codec must be the identical int16 waveform.

This demotes the pure-numpy oracle in tests/test_convert.py to a fast check:
every parity claim here traces to the reference's executed code.
"""

import importlib.util
import os

import numpy as np
import pytest

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import batch_fast_generate, forward, teacher_forced_logits
from qpnet_tpu.ops.mulaw import decode_mu_law as our_decode_mu_law
from qpnet_tpu.tools.convert_checkpoint import convert_state_dict

REFERENCE_QPNET = os.environ.get(
    "QPNET_REFERENCE_QPNET", "/root/reference/src/nets/qpnet.py")


def _load_reference():
    if not os.path.exists(REFERENCE_QPNET):
        pytest.skip(f"reference implementation not found at {REFERENCE_QPNET}")
    torch = pytest.importorskip("torch")  # noqa: F841
    spec = importlib.util.spec_from_file_location("ref_qpnet", REFERENCE_QPNET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_reference()


def tiny_cfg():
    return ModelConfig(n_quantize=16, n_aux=3, n_resch=8, n_skipch=4,
                       dilationF_depth=2, dilationF_repeat=1,
                       dilationA_depth=2, dilationA_repeat=1,
                       kernel_size=2, upsampling_factor=4)


def build_ref_net(ref, cfg, seed=0):
    """Reference QPNet with its own Xavier initialization, deterministic."""
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
    # Xavier leaves biases 0 and the upsampler constant; perturb every leaf
    # so the parity test cannot pass by a zero/constant accident.
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in net.parameters():
            p.add_(torch.empty_like(p).uniform_(-0.05, 0.05, generator=g))
    net.eval()
    return net


def converted_params(net, cfg):
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    return convert_state_dict(sd, cfg)


def frame_d(rng, F, up, lo=0.9, hi=3.3):
    """Frame-constant sample-rate dilation track, the decode pipeline's
    layout (reference qpnet_decode.py:172-175 + extend_time)."""
    d_frames = rng.uniform(lo, hi, size=F).astype(np.float32)
    return np.repeat(d_frames, up)


def ref_forward(ref, net, x, h, d):
    """Reference teacher-forced forward; returns (bl, Q) f32 logits."""
    import torch
    maxd = int(np.ceil(d.max()))
    rf = (sum(net.dilationsF) + sum(net.dilationsA) * maxd
          + net.receptiveCausal_field)
    bl = x.shape[0] - rf
    with torch.no_grad():
        out = net.forward(
            torch.from_numpy(x[None]).long(),
            torch.from_numpy(h[None].transpose(0, 2, 1)).float(),
            torch.from_numpy(d[None]).float(),
            torch.tensor([bl]))
    return out[0].numpy(), bl


def ref_generate(ref, net, h, n_samples_list, d, extra_memory=False,
                 capture_logits=False):
    """Reference batch_fast_generate in argmax mode, seed x=zeros(1) encoded
    (reference qpnet_decode.py:170 + wav_transform mu-law)."""
    import torch
    B = h.shape[0]
    x = ref.encode_mu_law(np.zeros((B, 1)), net.n_quantize)
    xt = torch.from_numpy(x).long()
    ht = torch.from_numpy(h.transpose(0, 2, 1)).float()
    if extra_memory:
        dt = torch.from_numpy(d).float()
    else:
        dt = d.astype(np.float64)
    logits = []
    hook = None
    if capture_logits:
        hook = net.conv_post_2.register_forward_hook(
            lambda m, i, o: logits.append(o.detach().numpy()[:, :, -1]))
    with torch.no_grad():
        out = net.batch_fast_generate(
            xt, ht, list(n_samples_list), dt, mode="argmax",
            extra_memory=extra_memory)
    if hook is not None:
        hook.remove()
    return out, logits


def our_generate(params, cfg, h, n_samples_list, d, mode="argmax"):
    import jax.numpy as jnp
    from qpnet_tpu.ops.mulaw import encode_mu_law
    B = h.shape[0]
    x = encode_mu_law(np.zeros((B, 1)), cfg.n_quantize).astype(np.int32)
    return batch_fast_generate(
        params, cfg, x, h.astype(np.float32), list(n_samples_list),
        d.astype(np.float32), mode=mode, compute_dtype=jnp.float32,
        engine="xla")


def assert_margin(step_logits, min_margin=2e-5):
    """Guard against flaky argmax comparisons: the top-2 logit gap at every
    step must dwarf f32 cross-framework noise (measured 6e-7 max per-step
    logit deviation on the tiny net; 2e-5 leaves a 30x cushion)."""
    a = np.sort(step_logits, axis=-1)
    margin = float(np.min(a[..., -1] - a[..., -2]))
    assert margin > min_margin, (
        f"near-tied logits (margin {margin:.2e}) make trajectory equality "
        "meaningless; change the test seed")


# ---------------------------------------------------------------------------
# (a) teacher-forced forward logits
# ---------------------------------------------------------------------------

def test_forward_logits_vs_reference_tiny(ref):
    cfg = tiny_cfg()
    net = build_ref_net(ref, cfg, seed=0)
    params = converted_params(net, cfg)
    rng = np.random.default_rng(0)
    up = cfg.upsampling_factor
    F = 40
    T = F * up
    d = frame_d(rng, F, up)
    x = rng.integers(0, cfg.n_quantize, size=T).astype(np.int64)
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    want, bl = ref_forward(ref, net, x, h, d)
    import jax.numpy as jnp
    got = np.asarray(forward(params, cfg, jnp.asarray(x[None], jnp.int32),
                             jnp.asarray(h[None]), jnp.asarray(d[None])))
    np.testing.assert_allclose(got[0, -bl:], want, rtol=2e-4, atol=2e-4)


def test_forward_logits_vs_reference_released_dims(ref):
    """EXACT released-model dims (reference param_model.py:56-64 'default':
    R=512, S=256, Q=256, A=39, up=110) — the shape the pretrained
    checkpoints (reference README.md:143-151) would convert at."""
    cfg = ModelConfig.from_network_name("default", n_aux=39,
                                        upsampling_factor=110)
    net = build_ref_net(ref, cfg, seed=1)
    params = converted_params(net, cfg)
    rng = np.random.default_rng(1)
    up = cfg.upsampling_factor
    F = 3
    T = F * up
    d = frame_d(rng, F, up, lo=1.0, hi=2.9)
    x = rng.integers(0, cfg.n_quantize, size=T).astype(np.int64)
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    want, bl = ref_forward(ref, net, x, h, d)
    import jax.numpy as jnp
    got = np.asarray(forward(params, cfg, jnp.asarray(x[None], jnp.int32),
                             jnp.asarray(h[None]), jnp.asarray(d[None])))
    np.testing.assert_allclose(got[0, -bl:], want, rtol=5e-4, atol=5e-4)


def test_forward_logits_vs_reference_deep_network(ref):
    """Rd10Rr3Ed4Er1 layer structure (reference param_model.py:65-73) at
    reduced width: 30 fixed blocks with dilations to 512 + 4 adaptive."""
    from qpnet_tpu.config import _NETWORKS
    spec = _NETWORKS["Rd10Rr3Ed4Er1"]
    cfg = ModelConfig(n_quantize=16, n_aux=3, n_resch=8, n_skipch=4,
                      dilationF_depth=spec["dilationF_depth"],
                      dilationF_repeat=spec["dilationF_repeat"],
                      dilationA_depth=spec["dilationA_depth"],
                      dilationA_repeat=spec["dilationA_repeat"],
                      kernel_size=2, upsampling_factor=4)
    net = build_ref_net(ref, cfg, seed=2)
    params = converted_params(net, cfg)
    rng = np.random.default_rng(2)
    up = cfg.upsampling_factor
    maxd = 2
    rf = sum(cfg.dilationsF) + sum(cfg.dilationsA) * maxd + 1
    T = -(-(rf + 50) // up) * up
    F = T // up
    d = frame_d(rng, F, up, lo=1.1, hi=1.9)
    x = rng.integers(0, cfg.n_quantize, size=T).astype(np.int64)
    h = rng.normal(size=(F, cfg.n_aux)).astype(np.float32)
    want, bl = ref_forward(ref, net, x, h, d)
    import jax.numpy as jnp
    got = np.asarray(forward(params, cfg, jnp.asarray(x[None], jnp.int32),
                             jnp.asarray(h[None]), jnp.asarray(d[None])))
    np.testing.assert_allclose(got[0, -bl:], want, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# (b) argmax AR trajectories
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("extra_memory", [False, True])
def test_argmax_trajectory_vs_reference(ref, extra_memory):
    """Both engines walk the same 16-way argmax AR trajectory sample for
    sample (reference qpnet.py:446-516; extra_memory covers both of the
    reference's dilated-index dtypes, qpnet.py:325-330)."""
    cfg = tiny_cfg()
    net = build_ref_net(ref, cfg, seed=3)
    params = converted_params(net, cfg)
    rng = np.random.default_rng(3)
    up = cfg.upsampling_factor
    B, F = 2, 30
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.stack([frame_d(rng, F, up) for _ in range(B)])
    want, logits = ref_generate(ref, net, h, [n] * B, d,
                                extra_memory=extra_memory,
                                capture_logits=True)
    assert_margin(np.stack(logits))
    got = our_generate(params, cfg, h, [n] * B, d)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(got[b], np.int64),
                                      want[b].astype(np.int64))


def test_argmax_trajectory_batch_shrink(ref):
    """Unequal lengths: the reference shrinks the live batch mid-loop
    (qpnet.py:527-557); our static-shape masking must return the identical
    per-utterance sample streams."""
    cfg = tiny_cfg()
    net = build_ref_net(ref, cfg, seed=4)
    params = converted_params(net, cfg)
    rng = np.random.default_rng(4)
    up = cfg.upsampling_factor
    B, F = 3, 24
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.stack([frame_d(rng, F, up) for _ in range(B)])
    n_list = [F * up - 1, (F - 6) * up - 1, (F - 11) * up - 1]
    want, logits = ref_generate(ref, net, h, list(n_list), d,
                                capture_logits=True)
    assert_margin(np.concatenate([l.ravel() for l in logits])
                  .reshape(-1, cfg.n_quantize))
    got = our_generate(params, cfg, h, n_list, d)
    # the reference emits utterances in finish order; re-key by length
    want_by_len = {len(w): w for w in want}
    assert len(want_by_len) == B
    for b, n in enumerate(n_list):
        np.testing.assert_array_equal(np.asarray(got[b], np.int64),
                                      want_by_len[n].astype(np.int64))


@pytest.mark.parametrize("f0_factor", [0.5, 1.5])
def test_argmax_trajectory_f0_scaled(ref, f0_factor):
    """The F0-scaled decode path (reference qpnet_decode.py:172-175): the
    dilation track is recomputed from scaled F0, i.e. d/f0_factor — f0=0.5
    doubles d and crosses into a larger maxd bucket."""
    cfg = tiny_cfg()
    net = build_ref_net(ref, cfg, seed=5)
    params = converted_params(net, cfg)
    rng = np.random.default_rng(5)
    up = cfg.upsampling_factor
    B, F = 2, 24
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.stack([frame_d(rng, F, up, lo=1.0, hi=2.7) for _ in range(B)])
    d_scaled = np.maximum(d / np.float32(f0_factor), 1.0)
    want, logits = ref_generate(ref, net, h, [n] * B, d_scaled,
                                capture_logits=True)
    assert_margin(np.stack(logits))
    got = our_generate(params, cfg, h, [n] * B, d_scaled)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(got[b], np.int64),
                                      want[b].astype(np.int64))


@pytest.mark.slow
def test_argmax_trajectory_vs_reference_released_dims(ref):
    """AR trajectory parity at the EXACT released-model dims (R=512, S=256,
    Q=256, A=39, up=110): 219 generated samples, 256-way argmax each."""
    cfg = ModelConfig.from_network_name("default", n_aux=39,
                                        upsampling_factor=110)
    net = build_ref_net(ref, cfg, seed=9)
    params = converted_params(net, cfg)
    rng = np.random.default_rng(9)
    up = cfg.upsampling_factor
    B, F = 1, 2
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.stack([frame_d(rng, F, up, lo=1.0, hi=2.6) for _ in range(B)])
    want, logits = ref_generate(ref, net, h, [n] * B, d,
                                capture_logits=True)
    assert_margin(np.stack(logits))
    got = our_generate(params, cfg, h, [n] * B, d)
    np.testing.assert_array_equal(np.asarray(got[0], np.int64),
                                  want[0].astype(np.int64))


# ---------------------------------------------------------------------------
# (c) per-step logits along a real AR trajectory
# ---------------------------------------------------------------------------

def test_per_step_logits_vs_reference_hook(ref):
    """Distribution-level pin: along the reference's own argmax trajectory,
    our teacher-forced engine must reproduce every step's 16-way logits to
    f32 tolerance (reference conv_post_2 output, qpnet.py:505-506)."""
    cfg = tiny_cfg()
    net = build_ref_net(ref, cfg, seed=6)
    params = converted_params(net, cfg)
    rng = np.random.default_rng(6)
    up = cfg.upsampling_factor
    B, F = 2, 20
    n = F * up - 1
    h = rng.normal(size=(B, F, cfg.n_aux)).astype(np.float32)
    d = np.stack([frame_d(rng, F, up) for _ in range(B)])
    want, logits = ref_generate(ref, net, h, [n] * B, d,
                                capture_logits=True)
    ref_logits = np.stack(logits, axis=1)  # (B, n, Q)
    forced = np.stack([w.astype(np.int32) for w in want])
    import jax.numpy as jnp
    got = teacher_forced_logits(params, cfg,
                                np.full((B, 1), cfg.n_quantize // 2,
                                        np.int32),
                                h, forced, d.astype(np.float32),
                                engine="xla", compute_dtype=jnp.float32)
    np.testing.assert_allclose(got, ref_logits, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# (d) end-to-end synthetic-utterance waveform
# ---------------------------------------------------------------------------

def test_end_to_end_waveform_vs_reference(ref):
    """A synthetic 'utterance' decoded end to end: identical argmax sample
    stream AND identical int16 waveform after each framework's own mu-law
    decode + clip (reference qpnet_decode.py:315-319)."""
    cfg = tiny_cfg()
    net = build_ref_net(ref, cfg, seed=7)
    params = converted_params(net, cfg)
    rng = np.random.default_rng(7)
    up = cfg.upsampling_factor
    F = 32
    n = F * up - 1
    # a feature track with structure: slow sinusoid aux + a pitch sweep
    t = np.arange(F)
    h = np.stack([np.sin(2 * np.pi * t / 16),
                  np.cos(2 * np.pi * t / 9),
                  np.linspace(-1, 1, F)], axis=1).astype(np.float32)
    h = h[None] + 0.1 * rng.normal(size=(1, F, cfg.n_aux)).astype(np.float32)
    d = np.repeat(np.linspace(1.2, 3.1, F).astype(np.float32), up)[None]
    want, logits = ref_generate(ref, net, h, [n], d, capture_logits=True)
    assert_margin(np.stack(logits))
    got = our_generate(params, cfg, h, [n], d)
    np.testing.assert_array_equal(np.asarray(got[0], np.int64),
                                  want[0].astype(np.int64))
    ref_wav = np.clip(ref.decode_mu_law(want[0], cfg.n_quantize) * 32768,
                      -32768, 32767).astype(np.int16)
    our_wav = np.clip(
        np.asarray(our_decode_mu_law(np.asarray(got[0]), cfg.n_quantize))
        * 32768, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(our_wav, ref_wav)


# ---------------------------------------------------------------------------
# mu-law codec parity with the reference's executed code
# ---------------------------------------------------------------------------

def test_mu_law_codec_vs_reference(ref):
    from qpnet_tpu.ops.mulaw import encode_mu_law
    rng = np.random.default_rng(8)
    x = np.clip(rng.normal(size=4096) * 0.4, -1, 1)
    np.testing.assert_array_equal(
        np.asarray(encode_mu_law(x, 256)), ref.encode_mu_law(x, 256))
    y = rng.integers(0, 256, size=4096)
    np.testing.assert_allclose(
        np.asarray(our_decode_mu_law(y, 256)),
        ref.decode_mu_law(y, 256), rtol=1e-6, atol=1e-7)
