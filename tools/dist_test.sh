#!/usr/bin/env bash
# Multi-host evaluation launcher (parity surface: reference tools/dist_test.sh).
# See tools/dist_train.sh for the cluster env contract.
set -euo pipefail

CONFIG=$1
shift || true

if [[ -n "${JAX_COORDINATOR_ADDRESS:-}" || -n "${MEGASCALE_COORDINATOR_ADDRESS:-}" ]]; then
  exec python -m kgdet_tpu.tools.test "$CONFIG" --distributed "$@"
else
  exec python -m kgdet_tpu.tools.test "$CONFIG" "$@"
fi
