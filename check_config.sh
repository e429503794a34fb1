#!/bin/bash
# Echo the benchmark configuration (ref: check_config.sh:1-32).
echo "=== specdec_tpu benchmark configuration ==="
for var in TARGET_MODEL DRAFTER_MODEL MODEL_DTYPE QUANTIZATION TP_SIZE DP_SIZE \
           INFERENCE_METHOD INFERENCE_ENGINE GAMMA_VALUE GENERATION_LENGTH \
           NUM_PROMPTS AUTO_RATE AUTO_DURATION ENABLE_BATCH BATCH_SIZE \
           MAX_BATCH_LENGTH SHAREGPT_DIR PROMPT_MIN_LENGTH PROMPT_MAX_LENGTH \
           ENABLE_GPU_MONITOR GPU_MONITOR_INTERVAL OUTPUT_FILE; do
    echo "$var=${!var:-<unset>}"
done
echo "==========================================="
