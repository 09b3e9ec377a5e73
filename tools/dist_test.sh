#!/usr/bin/env bash
# Multi-host evaluation launcher (reference tools/dist_test.sh equivalent).
# See tools/dist_train.sh for the JAX/TPU launch model (one process per
# host, peers discovered by jax.distributed); per-host metric counters are
# all-reduced bit-exactly (parallel/mesh.py host_allreduce_sum).
#
# Usage (per host):  tools/dist_test.sh CONFIG CHECKPOINT [test.py args...]
set -euo pipefail
CONFIG=$1
CKPT=$2
shift 2
PYTHONPATH="$(dirname "$0")/..":${PYTHONPATH:-} \
exec python "$(dirname "$0")/test.py" "$CONFIG" --checkpoint "$CKPT" "$@"
