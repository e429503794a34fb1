#!/bin/bash
# 70B INT4 launch config (BASELINE ladder rows 4-5) — see docs/SCALING.md.
#
# One v5e host (8 chips, TP=8):
#   TARGET_MODEL=/path/to/Llama-3-70B source configs/launch_70b.sh && ./run_benchmark.sh
#
# Two hosts (v5e-16, DP=2 x TP=8): run the same command on BOTH hosts with
# the jax.distributed env set (parallel/distributed.init_distributed):
#   COORDINATOR_ADDRESS=<host0>:8476 NUM_PROCESSES=2 PROCESS_ID=<0|1> \
#   TARGET_MODEL=/path/to/Llama-3-70B source configs/launch_70b.sh && ./run_benchmark.sh
# The mesh lays 'data' across hosts and 'model' on ICI (build_multihost_mesh);
# DP adds no per-token cross-host traffic (predicted efficiency 0.96-0.98).
#
# Dry-run the exact sharded program shape without hardware:
#   python tools/dryrun_70b.py

export TARGET_MODEL=${TARGET_MODEL:?set TARGET_MODEL to a local Llama-3-70B checkpoint dir}
# self-speculative drafter: the target's first 8 layers (no second 70B-scale
# checkpoint, guaranteed shared vocab; bench-calibrated depth)
export DRAFTER_MODEL=${DRAFTER_MODEL:-"layerskip:8"}

export MODEL_DTYPE="bfloat16"
export QUANTIZATION="int4"        # 70B INT4 = 4.9 GB weights/chip at TP=8
export KV_QUANT="int8"            # doubles pooled KV capacity (~390k tokens)

export TP_SIZE=${TP_SIZE:-8}      # 'model' axis = one host's ICI
export DP_SIZE=${DP_SIZE:-1}      # set by the multihost launch when 2 hosts

export GAMMA_VALUE=${GAMMA_VALUE:-8}
export GENERATION_LENGTH=${GENERATION_LENGTH:-512}
export ENABLE_BATCH="true"
export BATCH_SIZE=${BATCH_SIZE:-8}
export INFERENCE_METHOD=${INFERENCE_METHOD:-"speculative"}
