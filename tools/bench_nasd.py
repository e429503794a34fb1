"""Batched NASD scaling benchmark (VERDICT #7 done criterion: the ngram
method's aggregate throughput must scale with batch size).

NASD is the one decode mode whose loop inherently syncs with the host every
window (the n-gram store lives host-side — SURVEY.md §3.5), so each window
pays one RPC round-trip (~35 ms on this tunneled backend) plus the drafting
dict lookups. Batching amortizes both across B sequences: one shared store,
one jitted verify for the whole batch (ngram/assisted.py:82).

Usage: python tools/bench_nasd.py [--gen 128] [--gamma 5]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from bench import build_pair, log


def main():
    from specdec_tpu.ngram import NGramStorage
    from specdec_tpu.ngram.assisted import (
        batch_ngram_assisted_generate, ngram_assisted_speculative_generate)
    from specdec_tpu.sampling.processors import GreedyProcessor

    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--gamma", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    log(f"backend={jax.default_backend()}")

    t_cfg, _, target, _ = build_pair(quant="none")
    proc = GreedyProcessor()
    rng = np.random.default_rng(3)
    V = t_cfg.vocab_size

    # device-table NASD: the fully-jitted variant (zero host syncs/window)
    from specdec_tpu.ngram import device_ngram_assisted_generate
    prompt0 = [int(t) for t in rng.integers(1, V, size=60)]
    out, rate, table = device_ngram_assisted_generate(   # warm/compile
        prompt0, t_cfg, target, n=3, gamma=args.gamma, max_gen_len=args.gen,
        eos_tokens_id=(), logits_processor=proc, key=jax.random.key(5))
    best_dev = 0.0
    for i in range(args.reps):
        t0 = time.time()
        out, rate, table = device_ngram_assisted_generate(
            prompt0, t_cfg, target, n=3, table=table, gamma=args.gamma,
            max_gen_len=args.gen, eos_tokens_id=(), logits_processor=proc,
            key=jax.random.key(6 + i))
        best_dev = max(best_dev, len(out) / (time.time() - t0))
    log(f"device-table NASD (B=1): {best_dev:.1f} tok/s "
        f"(acceptance {rate:.3f} on carried-over table)")

    from specdec_tpu.ngram import device_ngram_assisted_generate_batch
    for B in (4, 8):
        prompts_b = [[int(t) for t in rng.integers(1, V, size=60)]
                     for _ in range(B)]
        outs, rates_b, tbl = device_ngram_assisted_generate_batch(
            prompts_b, t_cfg, target, n=3, gamma=args.gamma,
            gen_len=args.gen, eos_tokens_id=(), logits_processor=proc,
            key=jax.random.key(7))       # warm/compile
        best_b = 0.0
        for i in range(args.reps):
            t0 = time.time()
            outs, rates_b, tbl = device_ngram_assisted_generate_batch(
                prompts_b, t_cfg, target, n=3, table=tbl, gamma=args.gamma,
                gen_len=args.gen, eos_tokens_id=(), logits_processor=proc,
                key=jax.random.key(8 + i))
            best_b = max(best_b,
                         sum(len(o) for o in outs) / (time.time() - t0))
        log(f"device-table NASD (B={B}): {best_b:.1f} tok/s aggregate "
            f"(mean acceptance {float(np.mean(rates_b)):.3f} carried-over)")

    rows = []
    for B in (1, 4, 8):
        prompts = [[int(t) for t in rng.integers(1, V, size=60)]
                   for _ in range(B)]
        store = NGramStorage(n=3, vocab_size=V)

        def run():
            store.reset()
            if B == 1:
                out, rate = ngram_assisted_speculative_generate(
                    prompts[0], store, t_cfg, target, gamma=args.gamma,
                    max_gen_len=args.gen, eos_tokens_id=(),
                    logits_processor=proc, key=jax.random.key(0))
                return [out], [rate]
            return batch_ngram_assisted_generate(
                prompts, store, t_cfg, target, gamma=args.gamma,
                gen_len=args.gen, eos_tokens_id=(), logits_processor=proc,
                key=jax.random.key(0))

        run()  # warm (compile)
        best, rates = None, None
        for _ in range(args.reps):
            t0 = time.time()
            outs, rates = run()
            dt = time.time() - t0
            toks = sum(len(o) for o in outs)
            tps = toks / dt
            best = max(best or 0.0, tps)
        rows.append((B, best, float(np.mean(rates))))
        log(f"B={B}: {best:.1f} tok/s aggregate (acceptance "
            f"{np.mean(rates):.3f})")

    log("=== NASD batch scaling (gamma=%d, gen=%d) ===" % (args.gamma,
                                                           args.gen))
    base = rows[0][1]
    for B, tps, acc in rows:
        log(f"B={B}: {tps:8.1f} tok/s  ({tps / base:.2f}x vs B=1, "
            f"acc {acc:.3f})")
    print(json.dumps([{"batch": B, "aggregate_tps": round(t, 1),
                       "acceptance": round(a, 3),
                       "scaling_vs_b1": round(t / base, 2)}
                      for B, t, a in rows]))


if __name__ == "__main__":
    main()
