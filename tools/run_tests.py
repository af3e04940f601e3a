#!/usr/bin/env python3
"""Chunked test runner: keeps every pytest invocation under the wall
clock a CI gate can afford.

The suite is compile-heavy (260+ tests, many of which jit real models
on an 8-virtual-device CPU mesh), so one monolithic `pytest tests/` run
exceeds a 10-minute wall.  pytest-xdist cannot shard it either: workers
would share one in-process XLA CPU backend whose device-count override
must be set before the first jax import (tests/conftest.py), and the
heavyweight compile caches are per-process anyway.  Instead this runner
splits the suite BY FILE into N chunks balanced by historical weight and
runs each chunk as a fresh pytest process — every chunk stays well under
the wall, new test files are picked up automatically, and a missing file
can never be skipped silently (chunks are computed from a glob, then
their union is asserted).

Usage:
  python tools/run_tests.py                 # fast tier: -m "not slow"
  python tools/run_tests.py --all           # everything, 3 chunks
  python tools/run_tests.py --all -n 4      # everything, 4 chunks
  python tools/run_tests.py --list          # show the chunk assignment

(Or `make test-fast` / `make test-all` at the repo root.)
"""
import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Files whose tests dominate wall time (compile-heavy integration
# paths); everything unlisted weighs 1.  Weights only balance chunks —
# correctness never depends on them being current.
HEAVY = {
    "test_cli_pipeline.py": 8,
    "test_gen_kernel.py": 6,
    "test_torch_oracle.py": 5,
    "test_cross_framework.py": 5,
    "test_serve.py": 5,
    "test_streaming.py": 4,
    "test_generate.py": 4,
    "test_forced_mode.py": 4,
    "test_train_kernel.py": 4,
    "test_quantize.py": 4,
    "test_orchestrators.py": 3,
    "test_learning_e2e.py": 3,
    "test_decode_sharding.py": 3,
    "test_world_golden.py": 3,
    "test_pipeline.py": 2,
    "test_train.py": 2,
    "test_multihost.py": 2,
    "test_parity_recipe.py": 2,
}


def chunked(n_chunks):
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if not files:
        sys.exit("no test files found")
    # greedy balance: heaviest file into the lightest chunk
    order = sorted(files, key=lambda f: -HEAVY.get(os.path.basename(f), 1))
    chunks = [[] for _ in range(n_chunks)]
    loads = [0] * n_chunks
    for f in order:
        i = loads.index(min(loads))
        chunks[i].append(f)
        loads[i] += HEAVY.get(os.path.basename(f), 1)
    assert sorted(sum(chunks, [])) == files
    return [sorted(c) for c in chunks if c]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="include slow-marked tests (the full gate)")
    ap.add_argument("-n", "--n-chunks", type=int, default=3)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("pytest_args", nargs="*",
                    help="extra args passed through to pytest")
    args = ap.parse_args()

    if not args.all:
        # fast tier: one process is enough once slow marks are excluded
        cmd = [sys.executable, "-m", "pytest", "tests/",
               "-m", "not slow", "-q", *args.pytest_args]
        print("+", " ".join(cmd), flush=True)
        sys.exit(subprocess.call(cmd, cwd=REPO))

    chunks = chunked(args.n_chunks)
    if args.list:
        for i, c in enumerate(chunks):
            print(f"chunk {i + 1}: "
                  + " ".join(os.path.basename(f) for f in c))
        return
    t0 = time.time()
    failed = []
    for i, c in enumerate(chunks):
        cmd = [sys.executable, "-m", "pytest", *c, "-q", *args.pytest_args]
        print(f"+ chunk {i + 1}/{len(chunks)}: "
              + " ".join(os.path.basename(f) for f in c), flush=True)
        tc = time.time()
        rc = subprocess.call(cmd, cwd=REPO)
        print(f"  chunk {i + 1} rc={rc} in {time.time() - tc:.0f}s",
              flush=True)
        if rc:
            failed.append(i + 1)
    print(f"total {time.time() - t0:.0f}s; "
          + (f"FAILED chunks: {failed}" if failed else "all chunks green"))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
