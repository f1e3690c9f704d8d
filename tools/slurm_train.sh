#!/usr/bin/env bash
# SLURM launcher (parity surface: reference tools/slurm_train.sh).
# One task per host; jax.distributed derives the coordinator from the first
# node in the allocation.
#
# Usage: sbatch -N <hosts> --ntasks-per-node=1 tools/slurm_train.sh CONFIG ...
set -euo pipefail

CONFIG=$1
shift || true

MASTER=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export JAX_COORDINATOR_ADDRESS="${MASTER}:12355"
export JAX_NUM_PROCESSES="${SLURM_NTASKS}"
export JAX_PROCESS_ID="${SLURM_PROCID}"

exec python -m kgdet_tpu.tools.train "$CONFIG" --distributed "$@"
