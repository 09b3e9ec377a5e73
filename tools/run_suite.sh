#!/bin/bash
# Full-suite runner, SHARDED by test file groups: one long pytest process
# accumulates every compiled XLA:CPU executable in jit caches and the
# compiler itself eventually segfaults under the memory pressure
# (observed 2026-08-20 at ~55% of the ~330-test suite, twice, while every
# implicated test passes in isolation).  Three processes keep each well
# inside the cliff; exit code is the OR of the shards.
set -u
cd "$(dirname "$0")/.."
rc=0
run() { echo "=== shard: $* ==="; python -m pytest "$@" -q || rc=1; }
run tests/test_[a-f]*.py
run tests/test_[g-o]*.py
run tests/test_[p-z]*.py
exit $rc
