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
export TP_SIZE=${TP_SIZE:-0}
export DP_SIZE=${DP_SIZE:-0}

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
