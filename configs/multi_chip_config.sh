#!/bin/bash
# =============================================================================
# Multi-chip configuration launcher — TPU equivalent of the reference's
# multi_gpu_config.sh (big model on most accelerators, small drafter
# replicated). On TPU the placement is mesh sharding, not device pinning:
# the target is tensor-parallel over the 'model' axis, the drafter replicated.
# =============================================================================
PROJECT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$PROJECT_DIR"

echo "Multi-chip configuration"
python - <<'PY'
import jax
print("devices:", jax.devices())
PY

# all visible chips on the tensor axis (the drafter replicates automatically)
export TP_SIZE=${TP_SIZE:-0}     # 0 = all chips
export DP_SIZE=${DP_SIZE:-0}

echo "Recommended runtime configuration:"
echo "  /gamma 4"
echo "  /length 50"
echo "  /processor nucleus 0.8 0.9"
echo "  /speculative"

export PYTHONPATH="$PROJECT_DIR:$PYTHONPATH"
python -m specdec_tpu.cli.repl "$@"
