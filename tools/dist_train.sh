#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh equivalent).
#
# JAX/TPU semantics differ from torch.distributed.launch: there is no
# per-GPU process fan-out — EVERY HOST runs ONE copy of this script and
# jax.distributed discovers peers (occformer_tpu/parallel/mesh.py
# maybe_init_distributed):
#   * Cloud TPU pods: run the same command on every worker
#     (e.g. `gcloud ... tpu-vm ssh --worker=all --command="..."`); peer
#     discovery comes from the TPU metadata, no env needed.
#   * Generic clusters: export JAX_COORDINATOR_ADDRESS=<host0>:<port>,
#     JAX_NUM_PROCESSES and JAX_PROCESS_ID per host.
#
# Usage (per host):  tools/dist_train.sh CONFIG [train.py args...]
set -euo pipefail
CONFIG=$1
shift
PYTHONPATH="$(dirname "$0")/..":${PYTHONPATH:-} \
exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
