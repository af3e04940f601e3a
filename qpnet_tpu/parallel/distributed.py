"""Multi-host (DCN) runtime wiring.

The reference's distributed story stops at single-node DataParallel
(SURVEY §2.3; reference qpnet_train.py:416-423).  The TPU-native scale-out
path: every host runs the same program, `jax.distributed.initialize`
connects the processes over DCN, `jax.devices()` becomes the *global*
device list, and the dp mesh spans hosts — gradient all-reduces ride ICI
within a slice and DCN across slices, inserted by GSPMD from the same
sharding annotations as the single-host path.  Data is host-sharded: each
host reads its slice of the scp list and contributes its local shard of
the global batch via `jax.make_array_from_process_local_data`.

Activation: either pass --coordinator/--n_hosts/--host_id to the train
CLI, or set QPNET_COORDINATOR / QPNET_NUM_HOSTS / QPNET_HOST_ID (standard
TPU pod environments that set JAX's own cluster-detection env vars work
too — `jax.distributed.initialize()` falls back to auto-detection).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np

from qpnet_tpu.parallel.mesh import batch_sharding, shard_batch


def initialize_multihost(coordinator: Optional[str] = None,
                         num_hosts: Optional[int] = None,
                         host_id: Optional[int] = None) -> bool:
    """Connect this process to the multi-host cluster.  Returns True when
    a multi-host runtime was initialized, False for the single-host case.

    Must be called before the first JAX backend use.  Flag values override
    QPNET_* env vars; with neither present this is a no-op.
    """
    coordinator = coordinator or os.environ.get("QPNET_COORDINATOR")
    if num_hosts is None:
        num_hosts = int(os.environ.get("QPNET_NUM_HOSTS", "0")) or None
    if host_id is None and "QPNET_HOST_ID" in os.environ:
        host_id = int(os.environ["QPNET_HOST_ID"])
    if not coordinator or not num_hosts or num_hosts <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_hosts,
                               process_id=host_id)
    logging.info("multi-host runtime up: process %d/%d, %d global devices",
                 jax.process_index(), jax.process_count(),
                 len(jax.devices()))
    return True


def host_shard_list(items: Sequence) -> list:
    """This host's slice of a work list (strided so sorted-by-length lists
    stay balanced across hosts)."""
    return list(items)[jax.process_index()::jax.process_count()]


def make_global_batch(mesh, tree: dict):
    """Assemble a global, dp-sharded batch from host-local arrays.

    Single-process: a plain device_put with batch sharding.  Multi-host:
    each process contributes its local shard; the returned jax.Arrays span
    the global mesh (addressable shards only on this host).
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, tree)
    return {
        k: jax.make_array_from_process_local_data(
            batch_sharding(mesh, np.ndim(v)), np.asarray(v))
        for k, v in tree.items()
    }


def global_min_and_any(value, flag) -> tuple:
    """(cross-host min of a scalar, cross-host OR of a flag) in ONE
    allgather (no-op single-host).

    The trainer's per-step valid_len sync carries the preemption trip
    flag for free this way — one DCN host-sync per iteration instead of
    two (the flag is evaluated after the previous step, so a trip stops
    every host together one step after the signal lands)."""
    val = np.asarray(value)
    if jax.process_count() == 1:
        return val, bool(flag)
    from jax.experimental import multihost_utils
    packed = np.asarray([np.int64(value), np.int64(bool(flag))])
    gathered = multihost_utils.process_allgather(packed)
    return (np.asarray(gathered[..., 0].min(), val.dtype),
            bool(gathered[..., 1].max()))


def global_min_scalar(value) -> np.ndarray:
    """Minimum of a host-local scalar across all hosts (no-op single-host).

    Used for the batch's valid_len: every process must feed the same
    loss-mask length into the jitted step or the compiled programs diverge.
    """
    if jax.process_count() == 1:
        return np.asarray(value)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(value))
    return np.min(gathered)
