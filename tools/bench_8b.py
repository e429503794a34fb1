"""Llama-3-8B-shaped single-chip benchmark (VERDICT #3, BASELINE.md ladder
config 3: 8B INT8/INT4 on one v5e chip).

Builds `synthetic:llama-8b` DIRECTLY into quantized containers via
init_quantized_params (a bf16 8B stack is ~16 GB and would fill HBM before
quantizing — the per-layer build keeps peak memory at quantized + one dense
layer). The drafter is the LayerSkip prefix: the target's first
DRAFT_LAYERS quantized layers (tail layers damped before quantization so
drafts are a real approximation, not exact — acceptance is measured, not 1.0).

HBM budget (16 GB v5e): INT8 8B ≈ 7.3 GB layers + 1.05 GB bf16 embed +
~0.5 GB head + 1.8 GB drafter slice + KV ≈ 11 GB. INT4 halves the weights.
bf16 is NOT benchable at 8B on one chip (≈16 GB alone) — quantization is the
operating point, exactly as the north-star ladder prescribes.

Usage: python tools/bench_8b.py [int8,int4] [--gamma 8] [--gen 256]
Prints per-mode: AR tok/s, spec tok/s, acceptance, TTFT (gen-1 latency).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import log, measure_ar, measure_spec  # noqa: E402

DRAFT_LAYERS = 6   # round-5 sweep optimum: 6L g6 = 2.32x at 0.785 acc
                   # (4L loses acceptance faster than it saves draft time,
                   # 8L pays +33% draft for +0.03 acc — docs/BENCHMARKS.md)
TAIL_DAMP = 0.08   # step at 8B (head included) and caps spec/AR at ~1.9x


def build_8b(quant: str, draft_layers: int = None):
    from specdec_tpu.core.config import ModelConfig
    from specdec_tpu.engine.model_loader import SYNTHETIC_PRESETS
    from specdec_tpu.quant import init_quantized_params

    draft_layers = draft_layers or DRAFT_LAYERS
    cfg = ModelConfig(dtype=jnp.bfloat16, **SYNTHETIC_PRESETS["llama-8b"])
    d_cfg = cfg.replace(num_layers=draft_layers)
    scales = [1.0 if i < draft_layers else TAIL_DAMP
              for i in range(cfg.num_layers)]
    t0 = time.time()
    target = init_quantized_params(cfg, jax.random.key(11), kind=quant,
                                   scale=0.02, layer_out_scales=scales)
    drafter = dict(target)
    drafter["layers"] = jax.tree.map(lambda x: x[:draft_layers],
                                     target["layers"])
    _ = np.asarray(target["embed"][0, :1])
    log(f"8B {quant} pair built in {time.time() - t0:.1f}s "
        f"({cfg.num_layers}L/{cfg.hidden_size}d, drafter {draft_layers}L, "
        f"tail damp {TAIL_DAMP})")
    return cfg, d_cfg, target, drafter


def measure_ttft(cfg, target, prompt, proc, reps=3):
    """Latency of a 1-token generate = dispatch + prefill + first decode —
    the single-sequence TTFT (serving TTFT is measured by the scheduler)."""
    from specdec_tpu.sampling.base_decoding import autoregressive_generate
    autoregressive_generate(prompt, cfg, target, max_gen_len=1,
                            logits_processor=proc, eos_tokens_id=(),
                            key=jax.random.key(1))
    times = []
    for i in range(reps):
        t0 = time.time()
        autoregressive_generate(prompt, cfg, target, max_gen_len=1,
                                logits_processor=proc, eos_tokens_id=(),
                                key=jax.random.key(2 + i))
        times.append(time.time() - t0)
    ttft = min(times) * 1000
    log(f"TTFT (prompt {len(prompt)}, gen 1): {ttft:.0f} ms")
    return ttft


def main():
    global DRAFT_LAYERS
    from specdec_tpu.sampling.processors import MultinomialProcessor

    ap = argparse.ArgumentParser()
    ap.add_argument("modes", nargs="?", default="int8,int4")
    ap.add_argument("--gamma", default="8",
                    help="comma list; pair built once, swept across gammas")
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--draft-layers", type=int, default=DRAFT_LAYERS)
    ap.add_argument("--attn", default="xla",
                    help="comma list of attention impls (xla,flash) for the "
                         "8B flash-crossover A/B: at 8B+long S the KV stream "
                         "per weight byte is 4x the 1.1B ratio, the regime "
                         "where the length-aware flash kernel was predicted "
                         "to cross over; the pair is built once and swept")
    ap.add_argument("--prompt-len", type=int, default=60)
    args = ap.parse_args()
    DRAFT_LAYERS = args.draft_layers
    modes = args.modes.split(",")
    log(f"backend={jax.default_backend()} modes={modes} gamma={args.gamma} "
        f"attn={args.attn} prompt_len={args.prompt_len}")

    proc = MultinomialProcessor(temperature=1.0)
    rows = []
    for mode in modes:
        log(f"=== 8B mode {mode} ===")
        cfg0, d_cfg0, target, drafter = build_8b(mode)
        rng = np.random.default_rng(0)
        prompt = [int(t) for t in
                  rng.integers(1, cfg0.vocab_size, size=args.prompt_len)]
        for attn in args.attn.split(","):
            cfg = cfg0.replace(attention_impl=attn)
            d_cfg = d_cfg0.replace(attention_impl=attn)
            ttft = measure_ttft(cfg, target, prompt, proc)
            ar_tps = measure_ar(cfg, target, prompt, args.gen, proc,
                                reps=args.reps)
            for gamma in (int(g) for g in str(args.gamma).split(",")):
                spec_tps, acc = measure_spec(d_cfg, drafter, cfg, target,
                                             prompt, args.gen, gamma, proc,
                                             reps=args.reps)
                ratio = spec_tps / ar_tps if ar_tps else 0.0
                rows.append((f"{mode}/{attn}/g{gamma}", ar_tps, spec_tps, acc,
                             ratio, ttft))
                log(f"8B {mode} attn={attn} gamma={gamma}: AR {ar_tps:.1f} "
                    f"spec {spec_tps:.1f} ({ratio:.2f}x, acc {acc:.3f}), "
                    f"TTFT {ttft:.0f} ms")
        del target, drafter

    log("\n=== 8B summary (gen=%d, drafter %dL) ===" % (args.gen, DRAFT_LAYERS))
    log(f"{'mode':16} {'AR tok/s':>9} {'spec tok/s':>11} {'accept':>7} "
        f"{'spec/AR':>8} {'TTFT ms':>8}")
    for m, a, s, c, r, t in rows:
        log(f"{m:16} {a:9.1f} {s:11.1f} {c:7.3f} {r:8.2f} {t:8.0f}")
    print(json.dumps([
        {"model": "llama-8b-synthetic", "attn": args.attn,
         "prompt_len": args.prompt_len, "mode": m, "ar_tps": round(a, 1),
         "spec_tps": round(s, 1), "acceptance": round(c, 3),
         "spec_over_ar": round(r, 3), "ttft_ms": round(t)}
        for m, a, s, c, r, t in rows]))


if __name__ == "__main__":
    main()
