"""Flash-attention winning-regime probe (VERDICT r2 next #6): B=8 slotted
serving with an INT8 KV cache, XLA attention vs the int8-streaming Pallas
kernel (ops/decode_attention.py::flash_decode_attention_quant).

Why THIS regime: single-sequence decode lost to XLA at every measured 1.1B
point (custom-call overhead dominates a ~2 MB KV stream). At B=8 slots the
decode-window KV stream is 8x larger and the weights are amortized over 8
sequences — the step goes KV-bound, exactly where streaming int8 tiles
directly (half the bytes of dequantize-then-attend, no [B,S,H,D] bf16
materialization) should pay.

A/B is pure config: cfg.attention_impl = "xla" | "flash" with
cfg.kv_quant="int8" in both arms; the serving stack is otherwise identical.
Also reports the bf16-KV arms for the crossover map.

Usage (detached): PYTHONPATH=/root/repo setsid nohup python \
    tools/bench_flash_serving.py > /tmp/flash_serve.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def serve_tps(attn: str, kv_quant: str, slots=8, gen=128, gamma=8,
              n_requests=16):
    from bench import build_pair
    from specdec_tpu.serve.scheduler import ContinuousBatcher

    os.environ["BENCH_ATTN"] = attn
    os.environ["BENCH_KV_QUANT"] = kv_quant
    t_cfg, d_cfg, target, drafter = build_pair(quant="none")
    rng = np.random.default_rng(1)
    prompts = [[int(t) for t in rng.integers(1, t_cfg.vocab_size,
                                             size=int(n))]
               for n in rng.integers(30, 200, size=n_requests)]
    b = ContinuousBatcher(d_cfg, drafter, t_cfg, target, gamma=gamma,
                          num_slots=slots, windows_per_sync=8,
                          max_new_tokens=gen, eos_tokens_id=())
    out = {}
    for rnd in ("cold", "warm"):
        for p in prompts:
            b.submit(p, max_new_tokens=gen)
        t0 = time.time()
        done = b.run()
        dt = time.time() - t0
        toks = sum(len(r.output_ids) for r in done.values())
        log(f"  attn={attn} kv={kv_quant} ({rnd}): {toks} tokens in "
            f"{dt:.2f}s = {toks / dt:.0f} tok/s aggregate")
        out[rnd] = toks / dt
        b.completed.clear()
    return out["warm"]


def main():
    log(f"backend={jax.default_backend()}")
    results = {}
    for attn, kvq in (("xla", "int8"), ("flash", "int8"),
                      ("xla", "none"), ("flash", "none")):
        results[f"{attn}_{kvq}"] = round(serve_tps(attn, kvq), 1)
    results["flash_vs_xla_int8"] = round(
        results["flash_int8"] / results["xla_int8"], 3)
    results["flash_vs_xla_bf16"] = round(
        results["flash_none"] / results["xla_none"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
