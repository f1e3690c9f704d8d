#!/usr/bin/env bash
# Multi-host training launcher (parity surface: reference tools/dist_train.sh).
#
# Single-controller JAX needs no per-device process spawning: ONE process per
# host, all devices on the host driven by that process; cross-host collectives
# ride ICI/DCN after jax.distributed.initialize().
#
# Single host (all local devices):
#   ./tools/dist_train.sh CONFIG [extra args...]
#
# Multi host: set the standard JAX cluster env vars on every host
# (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID — or rely on the TPU
# metadata autodetection) and run the same command with --distributed.
set -euo pipefail

CONFIG=$1
shift || true

if [[ -n "${JAX_COORDINATOR_ADDRESS:-}" || -n "${MEGASCALE_COORDINATOR_ADDRESS:-}" ]]; then
  exec python -m kgdet_tpu.tools.train "$CONFIG" --distributed "$@"
else
  exec python -m kgdet_tpu.tools.train "$CONFIG" "$@"
fi
