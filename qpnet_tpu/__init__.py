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
