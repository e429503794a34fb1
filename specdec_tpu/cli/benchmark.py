"""Benchmark entry point (ref: benchmark.py:24-79).

Dispatches on INFERENCE_ENGINE for config parity with the reference's two-tier
UX (ref :61-75): both "transformers" and "vllm" run the native TPU engine —
there is no separate wrapper engine because the native engine IS the
high-performance engine (SURVEY.md §7.4); the vLLM tier's env vars
(VLLM_TENSOR_PARALLEL_SIZE etc.) map onto mesh axes in the runner.
"""
from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser(
        description="Speculative decoding benchmark (TPU-native)")
    ap.add_argument("--target-model", default=None,
                    help="target model path or synthetic:<preset> "
                         "(overrides TARGET_MODEL)")
    ap.add_argument("--drafter-model", default=None,
                    help="drafter model path or synthetic:<preset> "
                         "(overrides DRAFTER_MODEL)")
    args = ap.parse_args()

    engine = os.getenv("INFERENCE_ENGINE", "transformers").lower()
    if engine not in ("transformers", "vllm", "native", "tpu"):
        print(f"warning: unknown INFERENCE_ENGINE {engine!r}; using native")
    if engine == "vllm":
        print("INFERENCE_ENGINE=vllm: VLLM_* parallelism vars are honored by "
              "the native TPU engine (no separate vLLM process)")

    from specdec_tpu.engine.benchmark_runner import BenchmarkRunner
    BenchmarkRunner(target_model=args.target_model,
                    drafter_model=args.drafter_model)


if __name__ == "__main__":
    main()
