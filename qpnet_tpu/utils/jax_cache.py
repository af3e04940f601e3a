"""Persistent XLA compilation cache for the CLI workers.

Every reference-recipe worker is its own process (runQP/runFE spawn one per
stage, reference runQP.py:212 etc.), so without a persistent cache each
decode/train invocation pays the full XLA compile of the generation kernel
or training step (20-40 s on TPU) again.  Enabling JAX's on-disk cache
makes every invocation after the first start in ~1 s for an already-seen
(model, batch, bucket) shape — this is where most of the wall clock of a
small recipe decode went.

Controlled by QPNET_COMPILE_CACHE:
  unset          -> ~/.cache/qpnet_tpu/xla/<fingerprint> (default on)
  a path         -> that directory, verbatim
  "" / "0"/"off" -> disabled

The default directory is keyed by a (jax version, JAX_PLATFORMS,
XLA_FLAGS, host CPU flags) fingerprint: XLA:CPU AOT entries embed the
target machine features of the COMPILING process, and loading them under
a different host-feature detection warns (and can in principle SIGILL).
Keying the dir means processes only ever share entries compiled under
their own configuration; an explicit QPNET_COMPILE_CACHE path opts out
of the keying for deliberate cross-run sharing."""

from __future__ import annotations

import logging
import os

_ENABLED = False


def _config_fingerprint() -> str:
    """Hash of everything that changes the validity of on-disk XLA
    executables for this process."""
    import hashlib

    import jax

    parts = [jax.__version__,
             os.environ.get("JAX_PLATFORMS", ""),
             os.environ.get("XLA_FLAGS", "")]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha1("\0".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at the
    framework cache dir.  Call before the first compilation; safe to call
    from every CLI main."""
    global _ENABLED
    if _ENABLED:
        return
    raw = os.environ.get("QPNET_COMPILE_CACHE")
    if raw is not None and raw.strip().lower() in ("", "0", "off", "none"):
        return
    cache_dir = raw or os.path.join(
        os.path.expanduser("~"), ".cache", "qpnet_tpu", "xla",
        _config_fingerprint())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # the expensive artifacts are the multi-second generation/training
        # compiles; tiny helper jits are cheaper to recompile than to disk
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
    except Exception as e:  # pragma: no cover - cache is best-effort
        logging.warning("compile cache unavailable (%s); compiles will not "
                        "persist across processes", e)
