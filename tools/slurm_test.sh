#!/usr/bin/env bash
# SLURM evaluation launcher (parity surface: reference tools/slurm_test.sh).
# Usage: sbatch -N <hosts> --ntasks-per-node=1 tools/slurm_test.sh CONFIG ...
set -euo pipefail

CONFIG=$1
shift || true

MASTER=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export JAX_COORDINATOR_ADDRESS="${MASTER}:12355"
export JAX_NUM_PROCESSES="${SLURM_NTASKS}"
export JAX_PROCESS_ID="${SLURM_PROCID}"

exec python -m kgdet_tpu.tools.test "$CONFIG" --distributed "$@"
