"""Device mesh & sharding helpers.

The reference's entire distributed story is single-process
`torch.nn.DataParallel` replicate-scatter-gather (qpnet_train.py:416-423) and
per-GPU `torch.multiprocessing` decode fan-out (qpnet_decode.py:322-331).
The TPU-native equivalent is a `jax.sharding.Mesh` with a data-parallel axis:
batch tensors are sharded over `dp`, parameters are replicated, and XLA
inserts the gradient all-reduce over ICI — no NCCL/MPI translation.

Axes:
  dp — data parallel (batch windows in training, utterances in decode)
  tp — tensor parallel (model channel dims; train/step.py::
       param_sharding_tree) — make_mesh(tp=N)
  sp — sequence parallel (the training window's time axis; batch_sharding
       adds it automatically) — make_mesh(sp=N)
  pp — pipeline parallel (the 16-block residual stack in GPipe
       microbatch stages; train/pipeline.py) — make_mesh(pp=N)

The model is ~24M params, so dp alone is the production layout
(SURVEY.md §2.3); tp/sp/pp are the validated scale-out paths for wider,
longer, or deeper variants.  An expert axis stays out of scope by
design: there are no experts in this model family.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None,
              tp: int = 1, sp: int = 1, pp: int = 1) -> Mesh:
    """Build a mesh over the first `n_devices` (default: all).

    `tp > 1` adds a "tp" axis: batches shard over dp, model channel dims
    over tp (train/step.py::param_sharding_tree).  `sp > 1` adds an "sp"
    axis: the training window's time dimension shards over sp
    (shard_batch), with GSPMD inserting the halo exchanges for the
    shifted convolutions and the pitch gather.  `pp > 1` adds a "pp"
    axis: the residual stack splits into GPipe stages with the
    activation carry ppermuted stage-to-stage (train/pipeline.py).
    tp/sp/pp devices should be ICI-adjacent — their collectives are
    per-layer/per-tick, dp's gradient all-reduce is per-step.
    """
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"make_mesh: {n_devices} devices requested but only "
                f"{len(devs)} available ({devs[0].platform}); a silently "
                f"truncated mesh would hide wrong sharding")
        devs = devs[:n_devices]
    if tp > 1 or sp > 1 or pp > 1:
        if len(devs) % (tp * sp * pp):
            raise ValueError(f"make_mesh: tp={tp} x sp={sp} x pp={pp} must "
                             f"divide the {len(devs)}-device mesh")
        extra = [(name, size)
                 for name, size in (("tp", tp), ("sp", sp), ("pp", pp))
                 if size > 1]
        axes = ("dp",) + tuple(name for name, _ in extra)
        shape = (len(devs) // (tp * sp * pp),) + tuple(s for _, s in extra)
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension over `axis`; when the mesh has
    an "sp" axis, additionally shard the second (time/frame) dimension
    over it (sequence parallelism — activations split along time, GSPMD
    exchanges the convolution/gather halos).  Remaining dims replicate."""
    if "sp" in mesh.axis_names and ndim >= 2:
        return NamedSharding(mesh, P(axis, "sp", *([None] * (ndim - 2))))
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """device_put a pytree of host arrays with leading-axis sharding."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, batch_sharding(mesh, np.ndim(a), axis)),
        tree)
