"""CPU worker-pool fan-out (reference src/utils/multi_process.py:13-26).

Uses the *spawn* start method: the parent process typically holds a live
JAX/XLA runtime with many threads, and fork()ing that leads to deadlocks in
the children.  n_jobs==1 runs inline (no process at all) — same semantics,
and what tests and small recipes want.
"""

from __future__ import annotations

import multiprocessing as mp

import numpy as np


def multi_processing(file_list, target_fn, n_jobs: int, *args) -> None:
    """Split file_list over n_jobs processes running
    target_fn(sub_list, *args); join all.

    A spawned worker pays several seconds of interpreter+import startup
    (TPU plugin registration happens in sitecustomize even for CPU-only
    DSP work), so the pool never spawns more workers than there are
    items.  The explicitly requested n_jobs is otherwise respected —
    per-item work can dwarf the spawn cost (a long utterance's WORLD
    analysis), so no amortization heuristic second-guesses the caller.
    """
    n_jobs = max(1, min(int(n_jobs), len(file_list)))
    if n_jobs <= 1:
        target_fn(list(file_list), *args)
        return
    ctx = mp.get_context("spawn")
    lists = [l.tolist() for l in np.array_split(file_list, n_jobs)]
    processes = []
    for sub in lists:
        p = ctx.Process(target=target_fn, args=(sub,) + args)
        p.start()
        processes.append(p)
    for p in processes:
        p.join()
