"""Configuration objects for features, model and training.

Mirrors the *values* of the reference's param modules
(/root/reference/src/utils/param_feat.py:10-65, param_model.py:8-91) while
replacing pickled-argparse config files with plain dataclasses serialized to
JSON/YAML (`model.conf`).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class AcousticConfig:
    """Feature geometry keyed by sampling rate.

    Reference: param_feat.py:30-52 (alpha / aux_dim / mcep_dim tables),
    param_feat.py:64-65 (upsampling factor = floor(shiftms*fs/1000)).
    """

    fs: int = 22050
    feature_type: str = "world"
    shiftms: float = 5.0
    fftl: int = 1024
    mag: float = 0.5
    mcep_dim_start: int = 2
    f0_dim_idx: int = 1
    highpass_cutoff: int = 70
    minf0: float = 40.0
    maxf0: float = 800.0
    # fs-derived (filled in __post_init__)
    mcep_alpha: float = 0.0
    aux_dim: int = 0
    mcep_dim: int = 0
    mcep_dim_end: int = 0
    ap_dim_idx: int = 0

    _FS_TABLE = {
        16000: dict(mcep_alpha=0.410, aux_dim=28, mcep_dim=24,
                    mcep_dim_end=27, ap_dim_idx=-1),
        22050: dict(mcep_alpha=0.455, aux_dim=39, mcep_dim=34,
                    mcep_dim_end=37, ap_dim_idx=-2),
        24000: dict(mcep_alpha=0.466, aux_dim=45, mcep_dim=39,
                    mcep_dim_end=42, ap_dim_idx=-3),
    }

    def __post_init__(self):
        if self.aux_dim == 0:
            if int(self.fs) not in self._FS_TABLE:
                raise ValueError(f"fs={self.fs} is not supported")
            for k, v in self._FS_TABLE[int(self.fs)].items():
                setattr(self, k, v)

    @property
    def upsampling_factor(self) -> int:
        return math.floor(self.shiftms * float(self.fs) / 1000)


# Named network registry — reference param_model.py:56-73.
_NETWORKS = {
    "default": dict(dilationF_depth=4, dilationF_repeat=3,
                    dilationA_depth=4, dilationA_repeat=1,
                    kernel_size=2, max_length=30000,
                    batch_length=20000, batch_size=1,
                    f0_threshold=0, decode_batch_size=20),
    "Rd10Rr3Ed4Er1": dict(dilationF_depth=10, dilationF_repeat=3,
                          dilationA_depth=4, dilationA_repeat=1,
                          kernel_size=2, max_length=22500,
                          batch_length=20000, batch_size=1,
                          f0_threshold=0, decode_batch_size=7),
}


@dataclass(frozen=True)
class ModelConfig:
    """QPNet architecture hyper-parameters (frozen & hashable so it can be a
    static jit argument).

    Reference: qpnet.py:174-237 (module shapes), param_model.py:39-91
    (training defaults and the named-network registry).
    """

    n_quantize: int = 256
    n_aux: int = 39
    n_resch: int = 512
    n_skipch: int = 256
    dilationF_depth: int = 4
    dilationF_repeat: int = 3
    dilationA_depth: int = 4
    dilationA_repeat: int = 1
    kernel_size: int = 2
    dense_factor: int = 8
    upsampling_factor: int = 110

    @classmethod
    def from_network_name(cls, name: str, **overrides) -> "ModelConfig":
        if name not in _NETWORKS:
            raise ValueError(f"unknown network {name!r}")
        spec = _NETWORKS[name]
        kw = {k: v for k, v in spec.items()
              if k in {f.name for f in dataclasses.fields(cls)}}
        kw.update(overrides)
        return cls(**kw)

    @property
    def dilationsF(self) -> List[int]:
        return [2 ** i for i in range(self.dilationF_depth)] * self.dilationF_repeat

    @property
    def dilationsA(self) -> List[int]:
        return [2 ** i for i in range(self.dilationA_depth)] * self.dilationA_repeat

    @property
    def receptive_causal(self) -> int:
        return self.kernel_size - 1

    @property
    def receptiveF(self) -> int:
        return (self.kernel_size - 1) * sum(self.dilationsF)

    @property
    def receptiveA(self) -> int:
        """Per-unit adaptive receptive field; multiply by ceil(max dilated
        factor) for the actual span (reference qpnet.py:255-258)."""
        return (self.kernel_size - 1) * sum(self.dilationsA)

    def receptive_field(self, max_dilated_factor: float) -> int:
        """Total receptive field for a given maximum pitch-dilation factor.

        Reference qpnet_train.py:181-198.
        """
        import numpy as np
        return int(self.receptiveF
                   + self.receptiveA * int(np.ceil(max_dilated_factor))
                   + self.receptive_causal)


@dataclass
class TrainConfig:
    """Training hyper-parameters. Reference param_model.py:39-54, runQP.py:120-124."""

    lr: float = 1e-4
    weight_decay: float = 0.0
    iters: int = 200000
    checkpoint_interval: int = 10000
    update_iters: int = 3000
    update_interval: int = 100
    batch_length: int = 20000
    batch_size: int = 1
    max_length: int = 30000
    f0_threshold: float = 0.0
    seed: int = 1
    intervals: int = 100  # log interval
    # "float32" = bit-parity with the reference recipe; "bfloat16" = mixed
    # precision (f32 master weights/optimizer, bf16 matmuls + activations,
    # f32 skip/logit accumulation) — ~1.6x faster per step on v5e
    dtype: str = "float32"
    # fixed-stack engine for the training step: "auto" = the XLA block
    # loop (A/B-measured at or above the fused kernel on v5e at the
    # reference shape, BENCH_NOTES.md round 3); "pallas" opts into the
    # fused fwd+bwd kernel (ops/train_kernel.py, gradient-parity tested)
    fixed_engine: str = "auto"


@dataclass
class RunConfig:
    """Aggregate persisted to `model.conf` (JSON) — the de-facto API the
    reference implements as a pickled argparse Namespace (qpnet_train.py:389)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    feature_type: str = "world"
    feature_format: str = "h5"
    fs: int = 22050

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "RunConfig":
        with open(path) as f:
            d = json.load(f)
        return cls(model=ModelConfig(**d["model"]), train=TrainConfig(**d["train"]),
                   **{k: d[k] for k in ("feature_type", "feature_format", "fs") if k in d})
