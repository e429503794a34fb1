#!/bin/bash
# =============================================================================
# Performance-tuned launcher — TPU equivalent of the reference's
# performance_config.sh. The CUDA allocator/OpenMP tweaks have no TPU analog
# (XLA owns HBM); the performance-relevant knobs here are gamma, generation
# length, and batch size.
# =============================================================================
PROJECT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$PROJECT_DIR"

export TOKENIZERS_PARALLELISM=false

# gamma 4-8 depending on acceptance rate (see specdec_tpu/engine/gamma_tuner.py
# for the analytic optimum from measured acceptance + drafter cost ratio)
export GAMMA_VALUE=${GAMMA_VALUE:-5}
export GENERATION_LENGTH=${GENERATION_LENGTH:-100}
export ENABLE_BATCH=${ENABLE_BATCH:-"true"}
export BATCH_SIZE=${BATCH_SIZE:-8}

export PYTHONPATH="$PROJECT_DIR:$PYTHONPATH"
exec ./run_benchmark.sh "$@"
