"""qpnet_tpu — TPU-native Quasi-Periodic WaveNet vocoder framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of bigpon/QPNet
(reference: /root/reference): WORLD acoustic feature extraction, mu-law
noise shaping, and the pitch-adaptive QPNet vocoder with SI training,
SD adaptation, validation sweeps, and batch autoregressive synthesis.

Layer map (TPU-first, not a port):
  ops/      low-level jittable primitives (mu-law, shifts, sampling)
  dsp/      WORLD-style DSP (dio/stonemask/cheaptrick/d4c/synthesis),
            mcep/MLSA, FIR filters, continuous-F0 — host numpy + JAX
  models/   Flax QPNet (teacher-forced forward) + lax.scan AR generation
  data/     h5 feature I/O, scp lists, stats, streaming window batcher
  train/    loss/step (pjit data-parallel), checkpointing, trainer loop
  parallel/ device mesh & sharding helpers (ICI/DCN axes)
  bin/      CLI workloads mirroring the reference recipe surface
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: `from qpnet_tpu import Vocoder` without paying the jax/model
    # import cost for CLI workers that never synthesize
    if name == "Vocoder":
        from qpnet_tpu.api import Vocoder
        return Vocoder
    raise AttributeError(name)


import os as _os

if _os.environ.get("QPNET_PLATFORM"):
    # Some TPU environments pin jax_platforms via plugin config at
    # interpreter start, so the JAX_PLATFORMS env var alone is ignored.
    # QPNET_PLATFORM re-overrides through jax.config — used by recipe
    # scripts and subprocess tests that need the (virtual multi-device)
    # CPU backend.  No effect when unset.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["QPNET_PLATFORM"])
    if _os.environ.get("QPNET_NUM_CPU_DEVICES"):
        _jax.config.update("jax_num_cpu_devices",
                           int(_os.environ["QPNET_NUM_CPU_DEVICES"]))
