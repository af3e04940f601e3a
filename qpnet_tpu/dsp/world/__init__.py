"""WORLD-style vocoder analysis/synthesis, reimplemented from the published
algorithms (Morise's DIO / StoneMask / CheapTrick / D4C / synthesis).

The reference consumes these through pyworld+sprocket (SURVEY.md §2.2);
neither is available here, so this package is a from-the-algorithm rebuild:
numpy host path (feature extraction is a CPU-pool workload in the recipes)
with jittable JAX variants where batch extraction on device pays off.

Public surface mirrors what the reference actually uses:
  dio()          F0 track + temporal positions
  stonemask()    F0 refinement
  cheaptrick()   spectral envelope (power spectrogram)
  d4c()          band aperiodicity
  code_aperiodicity() / decode_aperiodicity()
  synthesize()   f0 + envelope + aperiodicity -> waveform
"""

from qpnet_tpu.dsp.world.dio import dio  # noqa: F401
from qpnet_tpu.dsp.world.harvest import harvest  # noqa: F401
from qpnet_tpu.dsp.world.stonemask import stonemask  # noqa: F401
from qpnet_tpu.dsp.world.cheaptrick import cheaptrick  # noqa: F401
from qpnet_tpu.dsp.world.d4c import d4c  # noqa: F401
from qpnet_tpu.dsp.world.codec import (  # noqa: F401
    code_aperiodicity, decode_aperiodicity,
)
from qpnet_tpu.dsp.world.synthesis import synthesize  # noqa: F401
from qpnet_tpu.dsp.world.api import WorldAnalyzer, WorldSynthesizer  # noqa: F401
from qpnet_tpu.dsp.world.jax_analysis import (  # noqa: F401
    jax_cheaptrick, jax_d4c, jax_sp2mc,
)
from qpnet_tpu.dsp.world.jax_synthesis import jax_synthesize  # noqa: F401
