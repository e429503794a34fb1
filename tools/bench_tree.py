"""Tree vs chain speculation on chip (greedy), at two drafter-quality
operating points: the LayerSkip pair's usual damp 0.08 (high acceptance —
chains shine) and damp 0.35 (weak drafter — trees recover acceptance by
hedging across top-k children).

Usage: python tools/bench_tree.py [--gen 256]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from bench import build_pair, log


def measure(fn, label, reps=4):
    out = fn(jax.random.key(100))
    times = []
    for i in range(reps):
        t0 = time.time()
        out = fn(jax.random.key(101 + i))
        times.append(time.time() - t0)
    toks, rate = out
    tps = toks / min(times)
    log(f"  {label}: {tps:.1f} tok/s (rate {rate:.3f})")
    return tps, rate


def main():
    from specdec_tpu.sampling.base_decoding import autoregressive_generate
    from specdec_tpu.sampling.speculative import speculative_generate
    from specdec_tpu.sampling.tree_speculative import tree_speculative_generate

    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--model", default="1b", choices=("1b", "8b"),
                    help="8b: one honest greedy-tree shot at 8B/long-context"
                         " (VERDICT r3 #8) — INT4 6L-drafter, long prompt")
    ap.add_argument("--prompt-len", type=int, default=0,
                    help="0 = 60 (1b) / 1020 (8b long-context regime)")
    args = ap.parse_args()
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    plen = args.prompt_len or (1020 if args.model == "8b" else 60)
    prompt = [int(t) for t in rng.integers(1, 32000, size=plen)]
    rows = []

    damps = (0.08, 0.35) if args.model == "1b" else (0.08,)
    for damp in damps:
        if args.model == "8b":
            import importlib.util
            import os
            spec = importlib.util.spec_from_file_location(
                "bench_8b", os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "bench_8b.py"))
            b8 = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(b8)
            t_cfg, d_cfg, target, drafter = b8.build_8b("int4",
                                                        draft_layers=6)
        else:
            t_cfg, d_cfg, target, drafter = build_pair(quant="int8",
                                                       tail_damp=damp)

        def ar_fn(key):
            out = autoregressive_generate(
                prompt, t_cfg, target, max_gen_len=args.gen, eos_tokens_id=())
            return len(out), 1.0
        ar_tps, _ = measure(ar_fn, f"damp {damp} AR")

        def chain_fn(gamma):
            def fn(key):
                out, rate = speculative_generate(
                    prompt, d_cfg, drafter, t_cfg, target, gamma=gamma,
                    max_gen_len=args.gen, eos_tokens_id=(), key=key)
                return len(out), rate
            return fn

        def tree_fn(branching):
            def fn(key):
                out, rate = tree_speculative_generate(
                    prompt, d_cfg, drafter, t_cfg, target,
                    branching=branching, max_gen_len=args.gen,
                    eos_tokens_id=(), key=key)
                return len(out), rate
            return fn

        for gamma in (6, 10):
            tps, rate = measure(chain_fn(gamma), f"damp {damp} chain g{gamma}")
            rows.append((damp, f"chain-g{gamma}", tps, rate, tps / ar_tps))
        for br in ((1,) * 6, (2, 2, 2, 1, 1, 1), (3, 2, 2, 2, 1, 1)):
            tps, rate = measure(tree_fn(br), f"damp {damp} tree {br}")
            rows.append((damp, f"tree-{br}", tps, rate, tps / ar_tps))
        rows.append((damp, "AR", ar_tps, 1.0, 1.0))
        del target, drafter

    log("\n=== tree vs chain (greedy, gen %d) ===" % args.gen)
    log("NOTE: 'rate' is NOT cross-comparable between methods — chain rows "
        "report accepted-draft-tokens/drafted-tokens, tree rows report "
        "accepted-depth/max-depth per window")
    for damp, name, tps, rate, ratio in rows:
        log(f"damp {damp}: {name:24} {tps:8.1f} tok/s  rate {rate:.3f}  "
            f"{ratio:.2f}x")
    print(json.dumps([
        {"damp": d, "method": m, "tps": round(t, 1),
         ("chain_token_rate" if m.startswith("chain")
          else "tree_depth_rate" if m.startswith("tree")
          else "rate"): round(r, 3),
         "vs_ar": round(x, 3)} for d, m, t, r, x in rows]))


if __name__ == "__main__":
    main()
