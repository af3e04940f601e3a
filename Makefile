# Two-tier test gate (VERDICT r3 #5: keep every invocation under a
# 10-minute wall).  The suite is compile-heavy, so `test-all` runs as
# chunked fresh pytest processes via tools/run_tests.py (pytest-xdist
# can't shard it: the 8-virtual-device XLA CPU backend is per-process
# and must be configured before the first jax import).

.PHONY: test-fast test-all test-chunks bench

# fast tier: everything not marked slow, one process (< 8 min)
test-fast:
	python tools/run_tests.py

# full gate: all 260+ tests in 3 balanced chunks, each under the wall
test-all:
	python tools/run_tests.py --all

# show the chunk assignment without running
test-chunks:
	python tools/run_tests.py --all --list

bench:
	python bench.py --quick
