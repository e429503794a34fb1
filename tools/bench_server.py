"""Open-loop serving benchmark on chip: rate-paced arrivals into the
continuous batcher (the native equivalent of the reference's vLLM benchmark
mode, ref: engine/vllm_benchmark.py open-loop AUTO_RATE path).

Reports per-rate: aggregate throughput, p50/p99 TTFT, mean latency.

Usage: python tools/bench_server.py [--rates 2,4,8] [--n 24] [--gen 128]
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
    from specdec_tpu.engine.server_benchmark import run_server_benchmark
    from specdec_tpu.serve.scheduler import ContinuousBatcher

    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="2,4,8")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--gamma", type=int, default=8)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--model", default="1b", choices=("1b", "8b"))
    ap.add_argument("--drafter", default="model",
                    help="model (LayerSkip pair, default) | nasd "
                         "(device n-gram table) | eagle[:depth@steps] "
                         "(feature head, on-policy trained at startup)")
    ap.add_argument("--engine", default="slotted",
                    choices=("slotted", "paged"),
                    help="model-drafter engine: slotted (reserved KV) or "
                         "paged (hybrid pool, the serve/ default; +prefix "
                         "caching)")
    ap.add_argument("--prefix-caching", action="store_true")
    ap.add_argument("--workload", default="random",
                    choices=("random", "markov"),
                    help="prompt distribution: random tokens (the n-gram "
                         "drafter's worst case — zero repeats) or a small "
                         "Markov stream (structured text stand-in where "
                         "NASD/EAGLE acceptance is meaningful)")
    args = ap.parse_args()
    rates = [float(r) for r in args.rates.split(",")]
    log(f"backend={jax.default_backend()} rates={rates} model={args.model}")

    if args.model == "8b":
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "bench_8b", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "bench_8b.py"))
        b8 = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(b8)
        t_cfg, d_cfg, target, drafter = b8.build_8b(args.quant,
                                                    draft_layers=6)
    else:
        t_cfg, d_cfg, target, drafter = build_pair(quant=args.quant)
    rng = np.random.default_rng(1)
    if args.workload == "markov":
        # low-entropy structured stream: sequences revisit a small state
        # space, so prompts and generations carry repeated n-grams — the
        # regime the device n-gram table (and trained drafters) target
        from specdec_tpu.engine.pretrain import MarkovSpec, markov_sampler
        spec = MarkovSpec(vocab_size=min(4096, t_cfg.vocab_size),
                          num_states=512, branching=4, zipf_s=1.3,
                          order=1, seed=3)
        sampler = markov_sampler(spec, args.n, 200)
        mat = np.asarray(sampler(jax.random.key(5)))
        lens = rng.integers(30, 200, size=args.n)
        prompts = [[int(t) for t in mat[i, :int(lens[i])]]
                   for i in range(args.n)]
    else:
        prompts = [[int(t) for t in rng.integers(1, t_cfg.vocab_size,
                                                 size=int(n))]
                   for n in rng.integers(30, 200, size=args.n)]

    if args.drafter == "nasd":
        from specdec_tpu.serve import NasdContinuousBatcher

        def fresh_batcher():
            return NasdContinuousBatcher(
                t_cfg, target, num_slots=args.slots, gamma=args.gamma,
                max_new_tokens=args.gen, windows_per_sync=8,
                eos_tokens_id=())
    elif args.drafter.startswith("eagle"):
        from specdec_tpu.core.eagle import init_eagle_params
        from specdec_tpu.engine.eagle_train import train_eagle
        from specdec_tpu.serve import EagleContinuousBatcher

        spec = args.drafter.split(":", 1)[1] if ":" in args.drafter else "1@300"
        depth, _, steps = spec.partition("@")
        e_cfg = t_cfg.replace(num_layers=int(depth))
        ep = init_eagle_params(e_cfg, jax.random.key(7))
        if int(steps or 0) > 0:
            t0 = time.time()
            ep, acc = train_eagle(t_cfg, target, e_cfg, ep,
                                  steps=int(steps), key=jax.random.key(8))
            log(f"eagle head trained {steps} steps in {time.time() - t0:.0f}s"
                f" (proxy acceptance {acc:.3f})")

        def fresh_batcher():
            return EagleContinuousBatcher(
                e_cfg, ep, t_cfg, target, num_slots=args.slots,
                gamma=args.gamma, max_new_tokens=args.gen,
                windows_per_sync=8, eos_tokens_id=())
    elif args.engine == "paged":
        from specdec_tpu.serve.paged_scheduler import PagedContinuousBatcher

        def fresh_batcher():
            # pool backs every slot at full length (throughput measurement,
            # not preemption thrash — same setup as tools/bench_paged.py)
            S = 256 + args.gen + args.gamma + 2
            return PagedContinuousBatcher(
                d_cfg, drafter, t_cfg, target, num_slots=args.slots,
                gamma=args.gamma, max_new_tokens=args.gen,
                windows_per_sync=8, eos_tokens_id=(), page_size=64,
                pool_tokens=(args.slots + 1) * S,
                prefix_caching=args.prefix_caching)
    else:
        def fresh_batcher():
            return ContinuousBatcher(d_cfg, drafter, t_cfg, target,
                                     num_slots=args.slots, gamma=args.gamma,
                                     max_new_tokens=args.gen,
                                     windows_per_sync=8, eos_tokens_id=())

    # warm pass (compiles)
    log("warming (compiles)...")
    b = fresh_batcher()
    for p in prompts[:args.slots + 1]:
        b.submit(p)
    b.run()

    rows = []
    for rate in rates:
        res = run_server_benchmark(fresh_batcher(), prompts, rate=rate,
                                   method_name=f"server@{rate}")
        reqs = [bm.requests[0] for bm in res.batches]
        ttfts = sorted(r.ttft for r in reqs)
        toks = sum(r.generated_tokens for r in reqs)
        dur = res.end_time - res.start_time
        p50 = ttfts[len(ttfts) // 2] * 1000
        p99 = ttfts[min(len(ttfts) - 1, int(len(ttfts) * 0.99))] * 1000
        lat = float(np.mean([r.total_latency for r in reqs])) * 1000
        # TTFT decomposition: queue wait (slot unavailable — a throughput/
        # saturation effect) vs admission service (the engine's own cost)
        qwaits = sorted(r.queue_seconds for r in reqs)
        q50 = qwaits[len(qwaits) // 2] * 1000
        svc = sorted(max(0.0, r.ttft - r.queue_seconds) for r in reqs)
        s50 = svc[len(svc) // 2] * 1000
        rows.append((rate, toks / dur, p50, p99, lat, len(reqs), q50, s50))
        log(f"rate {rate:4.1f} req/s: {toks / dur:7.1f} tok/s aggregate, "
            f"TTFT p50 {p50:6.0f} ms p99 {p99:6.0f} ms "
            f"(queue p50 {q50:5.0f} + admit p50 {s50:4.0f}), "
            f"mean latency {lat:6.0f} ms ({len(reqs)} reqs)")

    print(json.dumps([
        {"rate": r, "aggregate_tps": round(t, 1), "ttft_p50_ms": round(a),
         "ttft_p99_ms": round(b_), "mean_latency_ms": round(c),
         "requests": n, "queue_p50_ms": round(q), "admit_p50_ms": round(s)}
        for r, t, a, b_, c, n, q, s in rows]))


if __name__ == "__main__":
    main()
