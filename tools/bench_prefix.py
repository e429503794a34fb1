"""Chip benchmark: automatic prefix caching under a shared-system-prompt
workload (the scenario vLLM's enable_prefix_caching targets — ref:
engine/vllm_engine.py:52).

Every request = one 192-token shared prefix + a distinct random tail, the
chat-service shape where prefix caching pays: after the first admission the
other requests' prefills shrink from 256-token to 64-token bucketed slices
and reuse 3 pages per pool.

Compares, at one open-loop rate: slotted batcher, paged batcher, and
paged + prefix_caching. Reports aggregate tok/s + TTFT p50/p99.

Run detached:
  PYTHONPATH=/root/repo setsid nohup python tools/bench_prefix.py \
      > /tmp/prefix_chip.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from bench import build_pair, log


def main():
    from specdec_tpu.engine.server_benchmark import run_server_benchmark
    from specdec_tpu.serve import ContinuousBatcher
    from specdec_tpu.serve.paged_scheduler import PagedContinuousBatcher

    RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    N, GEN, SLOTS, GAMMA = 24, 128, 8, 8
    log(f"backend={jax.default_backend()} rate={RATE}")

    t_cfg, d_cfg, target, drafter = build_pair(quant="int8")
    rng = np.random.default_rng(4)
    prefix = [int(t) for t in rng.integers(1, t_cfg.vocab_size, size=192)]
    prompts = [prefix + [int(t) for t in rng.integers(
        1, t_cfg.vocab_size, size=int(n))]
        for n in rng.integers(16, 48, size=N)]

    common = dict(num_slots=SLOTS, gamma=GAMMA, max_prompt_len=256,
                  max_new_tokens=GEN, windows_per_sync=8, eos_tokens_id=())

    def make(kind):
        if kind == "slotted":
            return ContinuousBatcher(d_cfg, drafter, t_cfg, target, **common)
        return PagedContinuousBatcher(d_cfg, drafter, t_cfg, target,
                                      page_size=64,
                                      prefix_caching=(kind == "prefix"),
                                      **common)

    rows = []
    for kind in ("slotted", "paged", "prefix"):
        # warm pass (compiles: window program + admission shape(s))
        t0 = time.time()
        b = make(kind)
        for p in prompts[:SLOTS + 1]:
            b.submit(p)
        b.run()
        log(f"{kind}: warm in {time.time() - t0:.0f}s")

        b = make(kind)
        res = run_server_benchmark(b, prompts, rate=RATE,
                                   method_name=f"{kind}@{RATE}")
        reqs = [bm.requests[0] for bm in res.batches]
        ttfts = sorted(r.ttft for r in reqs)
        toks = sum(r.generated_tokens for r in reqs)
        dur = res.end_time - res.start_time
        row = dict(kind=kind, aggregate_tps=round(toks / dur, 1),
                   ttft_p50_ms=int(ttfts[len(ttfts) // 2] * 1000),
                   ttft_p99_ms=int(ttfts[min(len(ttfts) - 1,
                                             int(len(ttfts) * 0.99))] * 1000),
                   requests=len(reqs))
        if kind == "prefix":
            pc = b.prefix_cache
            row["hit_tokens"] = pc.hit_tokens
            row["lookup_tokens"] = pc.lookup_tokens
        log(row)
        rows.append(row)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
