#!/bin/bash
# =============================================================================
# Benchmark launch script — TPU-native equivalent of the reference's
# run_benchmark.sh (same env-var surface; ref: run_benchmark.sh:40-313).
# GPU placement strategies become mesh configuration: the target is
# tensor-sharded over the 'model' mesh axis, the drafter replicated
# (SURVEY.md §2.7). On a single chip the mesh settings are no-ops.
# =============================================================================
set -e
PROJECT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
cd "$PROJECT_DIR"

echo "Starting Speculative Decoding Benchmark (TPU)"
echo "Project directory: $PROJECT_DIR"

# ----------------------------------------------------------------------------
# Accelerator configuration
# ----------------------------------------------------------------------------
# Mesh shape: TP_SIZE x DP_SIZE must equal the number of visible TPU chips.
# 0 means "auto" (all chips on the tensor axis).
#
# MESH_STRATEGY maps the reference's GPU placement strategies
# (ref: run_benchmark.sh:71-140 — multi_gpu_ratio / separate / same /
# shared_all / auto) onto the TPU device mesh. On TPU the equivalents are
# mesh shapes, not device lists: the target is tensor-sharded over the
# 'model' axis and the small drafter is REPLICATED on every chip
# (parallel/mesh.py) — replication is the TPU answer to the reference's
# 7:1 GPU ratio split, because a replicated drafter needs no collectives
# and drafts in lock-step with its shard of the batch.
#
#   shared_all  all chips on the tensor axis (TP=n, DP=1). Both models see
#               every chip — the analog of the reference's default 8:8.
#   ratio       target TP over TP_SIZE chips, batch DP over the rest
#               (TP_SIZE x DP_SIZE = n). The analog of multi_gpu_ratio —
#               set TP_SIZE to the "target share" (e.g. TP_SIZE=4 DP_SIZE=2
#               on 8 chips).
#   same        single chip (TP=1, DP=1): target and drafter co-resident,
#               the reference's "same"/"separate" collapse to this on TPU
#               (there is no cross-chip model handoff worth paying for).
#   auto        TP_SIZE=0 -> all visible chips on the tensor axis.
export MESH_STRATEGY=${MESH_STRATEGY:-"auto"}
export TP_SIZE=${TP_SIZE:-0}
export DP_SIZE=${DP_SIZE:-0}

case $MESH_STRATEGY in
    "shared_all")
        export TP_SIZE=0  DP_SIZE=1
        echo "Mesh strategy: shared_all (all chips on the tensor axis)" ;;
    "ratio")
        if [ "$TP_SIZE" = "0" ]; then
            echo "ERROR: MESH_STRATEGY=ratio needs explicit TP_SIZE (and DP_SIZE)"; exit 1
        fi
        echo "Mesh strategy: ratio (TP=$TP_SIZE x DP=$DP_SIZE)" ;;
    "same")
        export TP_SIZE=1  DP_SIZE=1
        echo "Mesh strategy: same (single chip)" ;;
    "auto")
        echo "Mesh strategy: auto (TP_SIZE=$TP_SIZE DP_SIZE=$DP_SIZE)" ;;
    *)
        echo "ERROR: unknown MESH_STRATEGY: $MESH_STRATEGY"; exit 1 ;;
esac

# ----------------------------------------------------------------------------
# Models
# ----------------------------------------------------------------------------
# Local HF checkpoint dirs, or synthetic:<preset> (no-network benchmarking):
# presets: llama-1b llama-8b llama-160m llama-70m pythia-70m pythia-410m tiny
# (append -ls<k> for a LayerSkip-damped variant, e.g. llama-1b-ls4).
# DRAFTER_MODEL also accepts layerskip:<k> — self-speculation from the
# target's own first k layers (no second checkpoint) — and
# eagle:<depth>[@steps] — an EAGLE feature-predictor head over the target's
# residual stream, optionally on-policy-trained for <steps> at load.
export TARGET_MODEL=${TARGET_MODEL:-"synthetic:llama-1b"}
export DRAFTER_MODEL=${DRAFTER_MODEL:-"synthetic:llama-70m"}
export MODEL_DTYPE=${MODEL_DTYPE:-"bfloat16"}      # bfloat16 | float32
export QUANTIZATION=${QUANTIZATION:-"none"}        # none | int8 | int4 | nf4 | fp4
export KV_QUANT=${KV_QUANT:-"none"}                # none | int8 (KV-cache quant)

# ----------------------------------------------------------------------------
# Dataset (ShareGPT jsonl files; same filtering as the reference)
# ----------------------------------------------------------------------------
export SHAREGPT_DIR=${SHAREGPT_DIR:-"$PROJECT_DIR/sharegpt_gpt4"}
export PROMPT_MIN_LENGTH=${PROMPT_MIN_LENGTH:-10}
export PROMPT_MAX_LENGTH=${PROMPT_MAX_LENGTH:-500}
export MAX_LOAD_LINES=${MAX_LOAD_LINES:-10000}

# ----------------------------------------------------------------------------
# Benchmark mode: NUM_PROMPTS>0 = closed loop; otherwise AUTO_RATE x AUTO_DURATION
# ----------------------------------------------------------------------------
export NUM_PROMPTS=${NUM_PROMPTS:-0}
export AUTO_RATE=${AUTO_RATE:-1.0}                 # prompts/s
export AUTO_DURATION=${AUTO_DURATION:-300}         # seconds

# Batch mode
export ENABLE_BATCH=${ENABLE_BATCH:-"true"}
export BATCH_SIZE=${BATCH_SIZE:-5}
export MAX_BATCH_LENGTH=${MAX_BATCH_LENGTH:-512}

# Generation
export GAMMA_VALUE=${GAMMA_VALUE:-5}
export GENERATION_LENGTH=${GENERATION_LENGTH:-100}

# Method: speculative | target_ar | ngram
export INFERENCE_METHOD=${INFERENCE_METHOD:-"speculative"}
export ENABLE_DEBUG=${ENABLE_DEBUG:-"false"}

# Engine tier (config-compat with the reference; both run the native engine,
# the vllm tier maps VLLM_* vars onto the mesh)
export INFERENCE_ENGINE=${INFERENCE_ENGINE:-"transformers"}
export VLLM_TENSOR_PARALLEL_SIZE=${VLLM_TENSOR_PARALLEL_SIZE:-0}
export VLLM_MAX_MODEL_LEN=${VLLM_MAX_MODEL_LEN:-4096}
export VLLM_NUM_SPECULATIVE_TOKENS=${VLLM_NUM_SPECULATIVE_TOKENS:-$GAMMA_VALUE}

# Telemetry (power/energy integration; nominal-TDP estimate on TPU)
export ENABLE_GPU_MONITOR=${ENABLE_GPU_MONITOR:-"true"}
export GPU_MONITOR_INTERVAL=${GPU_MONITOR_INTERVAL:-0.5}

export OUTPUT_FILE=${OUTPUT_FILE:-"benchmark_results.json"}

export PYTHONPATH="$PROJECT_DIR:$PYTHONPATH"
export TOKENIZERS_PARALLELISM=false

python -m specdec_tpu.cli.benchmark "$@"
