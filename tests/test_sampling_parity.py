"""Statistical parity of sampling mode vs the reference's EXECUTED sampler.

The recipe's production decode mode is sampling (reference
qpnet_decode.py:52-61 defaults to it), where the reference draws from
`torch.distributions.Categorical(softmax(logits))` (qpnet.py:507-510).
Our XLA engine uses `jax.random.categorical` and the Pallas kernel a
counter-based Gumbel-max (ops/gen_kernel.py:561-586) — distributionally
equivalent by construction, pinned here by a goodness-of-fit test against
draws produced by the reference's OWN generate loop.

Construction: zero every parameter except conv_post_2's bias.  The AR
feedback then contributes nothing, so each generated sample is an
independent draw from softmax(bias) and running each framework's real
decode path yields tens of thousands of i.i.d. draws from the same known
categorical.  Gates: Pearson chi-square against the analytic pmf (all
three samplers), plus a two-sample chi-square of each of our engines
against the reference's empirical draws.  All samplers are deterministic
under fixed seeds, so the gates are exact regression pins, not flaky
statistical events.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qpnet_tpu.config import ModelConfig
from qpnet_tpu.models import batch_fast_generate
from qpnet_tpu.tools.convert_checkpoint import convert_state_dict

from test_torch_oracle import _load_reference, tiny_cfg


@pytest.fixture(scope="module")
def ref():
    return _load_reference()


def _const_logit_nets(ref, cfg, logits):
    """Reference net + converted params with ALL weights zero and
    conv_post_2 bias = `logits` — every step's posterior is
    softmax(logits) regardless of the fed-back samples."""
    import torch
    net = ref.QPNet(
        n_quantize=cfg.n_quantize, n_aux=cfg.n_aux, n_resch=cfg.n_resch,
        n_skipch=cfg.n_skipch,
        dilationF_depth=cfg.dilationF_depth,
        dilationF_repeat=cfg.dilationF_repeat,
        dilationA_depth=cfg.dilationA_depth,
        dilationA_repeat=cfg.dilationA_repeat,
        kernel_size=cfg.kernel_size,
        upsampling_factor=cfg.upsampling_factor)
    with torch.no_grad():
        for p in net.parameters():
            p.zero_()
        net.conv_post_2.bias.copy_(torch.from_numpy(logits))
    net.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    return net, convert_state_dict(sd, cfg)


def _chi2(counts, probs):
    """Pearson chi-square statistic of observed counts vs pmf."""
    n = counts.sum()
    expected = probs * n
    return float(((counts - expected) ** 2 / expected).sum())


def _two_sample_chi2(c1, c2):
    """Two-sample chi-square (contingency) statistic, df = Q-1."""
    n1, n2 = c1.sum(), c2.sum()
    pooled = (c1 + c2) / (n1 + n2)
    e1, e2 = pooled * n1, pooled * n2
    return float((((c1 - e1) ** 2) / e1).sum()
                 + (((c2 - e2) ** 2) / e2).sum())


def _counts(samples, Q):
    return np.bincount(np.asarray(samples, np.int64).ravel(),
                       minlength=Q).astype(np.float64)


# chi-square 1-1e-4 quantiles (df=15: Q=16 classes) — generous so the
# deterministic draws pin regressions without borderline sensitivity
CHI2_DF15_P9999 = 51.5
N_DRAWS = 100_000


@pytest.mark.slow
def test_sampling_distribution_matches_executed_reference(ref):
    cfg = tiny_cfg()
    Q = cfg.n_quantize
    up = cfg.upsampling_factor
    rng = np.random.default_rng(2024)
    logits = rng.normal(0.0, 1.2, size=Q).astype(np.float32)
    probs = np.exp(logits - logits.max())
    probs = (probs / probs.sum()).astype(np.float64)
    assert probs.min() * N_DRAWS > 20, "pick logits with heavier tails"

    net, params = _const_logit_nets(ref, cfg, logits)

    B = 25
    F = -(-N_DRAWS // (B * up))          # frames per utterance
    n = F * up - 1                       # samples drawn per utterance
    h = np.zeros((B, F, cfg.n_aux), np.float32)
    d = np.full((B, F * up), 2.0, np.float32)

    # (1) the reference's own generate loop, sampling mode (executes
    # torch.distributions.Categorical at qpnet.py:507-510)
    import torch
    torch.manual_seed(7)
    x0t = torch.full((B, 1), Q // 2, dtype=torch.long)
    with torch.no_grad():
        ref_out = net.batch_fast_generate(
            x0t, torch.from_numpy(h.transpose(0, 2, 1)),
            [n] * B, d.astype(np.float64), mode="sampling")
    ref_counts = _counts(np.concatenate([np.asarray(s) for s in ref_out]),
                         Q)

    x0 = np.full((B, 1), Q // 2, np.int32)
    # (2) the XLA scan engine (jax.random.categorical)
    xla = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=11,
                              mode="sampling", engine="xla",
                              compute_dtype=jnp.float32)
    xla_counts = _counts(np.concatenate(xla), Q)

    # (3) the Pallas kernel's counter-based Gumbel-max.  The PRNG is a
    # pure function of logical position (identical in interpret and TPU
    # modes — ops/gen_kernel.py:561-571), so interpret mode tests the
    # exact stream the chip draws.
    pal = batch_fast_generate(params, cfg, x0, h, [n] * B, d, seed=11,
                              mode="sampling", engine="pallas",
                              interpret=True)
    pal_counts = _counts(np.concatenate(pal), Q)

    n_total = B * n
    for name, counts in [("reference", ref_counts), ("xla", xla_counts),
                         ("pallas", pal_counts)]:
        assert counts.sum() == n_total
        stat = _chi2(counts, probs)
        assert stat < CHI2_DF15_P9999, (
            f"{name} sampler fails goodness-of-fit vs softmax(logits): "
            f"chi2={stat:.1f} (df=15, 1e-4 quantile {CHI2_DF15_P9999})")
        tv = 0.5 * np.abs(counts / n_total - probs).sum()
        assert tv < 0.01, f"{name} TV distance {tv:.4f}"

    # each engine's draws vs the reference's draws (two-sample)
    for name, counts in [("xla", xla_counts), ("pallas", pal_counts)]:
        stat = _two_sample_chi2(counts, ref_counts)
        assert stat < CHI2_DF15_P9999, (
            f"{name} vs executed-reference two-sample chi2={stat:.1f}")


def test_gumbel_max_matches_categorical_fast():
    """Fast CPU tier: the kernel's exact 24-bit counter PRNG + Gumbel-max
    formula (replicated from ops/gen_kernel.py:572-586) against
    jax.random.categorical on the same logits — no torch needed."""
    Q = 16
    rng = np.random.default_rng(5)
    logits = rng.normal(0.0, 1.2, size=Q).astype(np.float32)
    probs = np.exp(logits - logits.max())
    probs = (probs / probs.sum()).astype(np.float64)

    n = 200_000
    t = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):     # uint32 wraparound is the hash
        base = ((np.uint32(3) * np.uint32(0x85EBCA6B))
                ^ (t.astype(np.uint32) * np.uint32(2654435761)))
        idx = np.arange(Q, dtype=np.uint32)
        v = base[:, None] + idx[None, :] * np.uint32(0x9E3779B9)
        v = v ^ (v >> np.uint32(16)); v = v * np.uint32(0x7FEB352D)
        v = v ^ (v >> np.uint32(15)); v = v * np.uint32(0x846CA68B)
        v = v ^ (v >> np.uint32(16))
    unif = (v >> np.uint32(8)).astype(np.float32) / (1 << 24) + 1e-12
    gumbel = -np.log(-np.log(unif))
    draws_kernel = np.argmax(logits[None, :] + gumbel, axis=-1)

    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    draws_jax = np.asarray(jax.vmap(
        lambda k: jax.random.categorical(
            k, jnp.asarray(logits)[None, :].repeat(n // 64, 0)))(keys))

    c_k = _counts(draws_kernel, Q)
    c_j = _counts(draws_jax, Q)
    for name, counts in [("kernel-hash", c_k), ("jax", c_j)]:
        stat = _chi2(counts, probs)
        assert stat < CHI2_DF15_P9999, f"{name} chi2={stat:.1f}"
    assert _two_sample_chi2(c_k, c_j) < CHI2_DF15_P9999
