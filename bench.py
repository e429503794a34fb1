"""Headline benchmark: speculative-decode throughput vs AR baseline on TPU.

Runs on the real chip (default backend). The environment has no network access
for checkpoints, so the model pair is synthetic but structurally honest: a
TinyLlama-1.1B-shaped bfloat16 target whose deep layers (5..22) contribute a
damped residual refinement, with the drafter = the target's first 4 layers +
shared final-norm/head — the LayerSkip/early-exit self-speculation setup
(draft with a truncated model, verify with the full one). Acceptance is a real
measured quantity (~0.75 at gamma=8 under multinomial sampling: deep layers
still flip ~24% of draft positions), matching the >70% operating point real
drafter/target pairs are tuned to (BASELINE.md).

Measured on the v5e chip (see CLAUDE.md): AR 294-301 tok/s (3.3 ms/token
against a ~2.9 ms forward floor), speculative 553-593 tok/s at gamma=8.

Measurement notes for this environment (.claude/skills/verify/SKILL.md): only
numpy materialization is a reliable timing barrier (the generate wrappers
materialize); first-compile of a program shape is slow on the remote-compile
service but cached across processes; the persistent jax compile cache must
stay OFF.

Prints exactly ONE JSON line to stdout:
  {"metric": "spec_decode_tokens_per_sec", "value": N, "unit": "tokens/s",
   "vs_baseline": speedup_over_AR}
Everything else goes to stderr.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np

    from specdec_tpu.core.config import ModelConfig
    from specdec_tpu.core.model import init_params
    from specdec_tpu.sampling.base_decoding import autoregressive_generate
    from specdec_tpu.sampling.processors import MultinomialProcessor
    from specdec_tpu.sampling.speculative import speculative_generate

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    V = 32000
    t_cfg = ModelConfig(
        vocab_size=V, hidden_size=2048, intermediate_size=5632,
        num_layers=22, num_heads=32, num_kv_heads=4, head_dim=64,
        max_position_embeddings=2048, rope_theta=10000.0,
        dtype=jnp.bfloat16,
    )
    DRAFT_LAYERS = 4
    TAIL_DAMP = float(os.getenv("BENCH_TAIL_DAMP", "0.08"))
    d_cfg = t_cfg.replace(num_layers=DRAFT_LAYERS)

    t0 = time.time()
    base = init_params(t_cfg, jax.random.key(0), scale=0.02)
    # LayerSkip-style structure: full-strength layers 0..3, damped residual
    # refinement from layers 4..21 (sweep: damp 0.3 -> acc 0.49, 0.15 -> 0.73,
    # 0.08 -> 0.76-0.83 measured at gamma 5-8)
    mask = (jnp.arange(t_cfg.num_layers) >= DRAFT_LAYERS).astype(jnp.float32)
    sv = (1.0 - mask) + mask * TAIL_DAMP
    layers = dict(base["layers"])
    layers["wo"] = (base["layers"]["wo"].astype(jnp.float32)
                    * sv[:, None, None]).astype(jnp.bfloat16)
    layers["w_down"] = (base["layers"]["w_down"].astype(jnp.float32)
                        * sv[:, None, None]).astype(jnp.bfloat16)
    target = dict(base)
    target["layers"] = layers
    drafter = dict(target)
    drafter["layers"] = jax.tree.map(lambda x: x[:DRAFT_LAYERS], layers)
    _ = np.asarray(target["embed"][0, :1])  # real barrier
    log(f"params built in {time.time() - t0:.1f}s (target 22L/2048d ~1.1B "
        f"bf16, layer-skip drafter {DRAFT_LAYERS}L, tail damp {TAIL_DAMP})")

    proc = MultinomialProcessor(temperature=1.0)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(1, V, size=60)]  # bucket 64
    GEN = 256        # amortizes the ~40 ms fixed dispatch+prefill cost
    GAMMA = int(os.getenv("BENCH_GAMMA", "8"))
    REPS = 4

    # --- AR baseline -------------------------------------------------------
    t0 = time.time()
    ar = autoregressive_generate(prompt, t_cfg, target, max_gen_len=GEN,
                                 logits_processor=proc,
                                 eos_tokens_id=(), key=jax.random.key(1))
    log(f"AR compile+run: {time.time() - t0:.1f}s")
    ar_times = []
    for i in range(REPS):
        t0 = time.time()
        ar = autoregressive_generate(prompt, t_cfg, target, max_gen_len=GEN,
                                     logits_processor=proc,
                                     eos_tokens_id=(), key=jax.random.key(2 + i))
        ar_times.append(time.time() - t0)
    ar_time = min(ar_times)
    ar_tps = len(ar) / ar_time
    log(f"AR: {len(ar)} tokens, best of {REPS}: {ar_time:.2f}s = "
        f"{ar_tps:.1f} tok/s ({ar_time / len(ar) * 1000:.1f} ms/tok)")

    # --- speculative -------------------------------------------------------
    t0 = time.time()
    spec, rate = speculative_generate(
        prompt, d_cfg, drafter, t_cfg, target, gamma=GAMMA, max_gen_len=GEN,
        logits_processor=proc, eos_tokens_id=(), key=jax.random.key(100))
    log(f"SPEC compile+run: {time.time() - t0:.1f}s")
    spec_times, rates = [], []
    for i in range(REPS):
        t0 = time.time()
        spec, rate = speculative_generate(
            prompt, d_cfg, drafter, t_cfg, target, gamma=GAMMA,
            max_gen_len=GEN, logits_processor=proc, eos_tokens_id=(),
            key=jax.random.key(101 + i))
        spec_times.append(time.time() - t0)
        rates.append(rate)
    spec_time = min(spec_times)
    spec_tps = len(spec) / spec_time
    acc = sum(rates) / len(rates)
    log(f"SPEC(gamma={GAMMA}): {len(spec)} tokens, best of {REPS}: "
        f"{spec_time:.2f}s = {spec_tps:.1f} tok/s, acceptance={acc:.3f}, "
        f"tokens/window={acc * GAMMA + 1:.2f}")

    speedup = spec_tps / ar_tps if ar_tps > 0 else 0.0
    log(f"speedup vs AR: {speedup:.2f}x")

    from specdec_tpu.engine.gamma_tuner import best_gamma
    cost_ratio = DRAFT_LAYERS / t_cfg.num_layers  # bandwidth-bound approx
    g_opt, s_pred = best_gamma(acc, cost_ratio)
    log(f"gamma model: measured (reference-metric) acceptance {acc:.3f}, cost "
        f"ratio {cost_ratio:.2f} -> predicted best gamma {g_opt} "
        f"(predicted speedup {s_pred:.2f}x)")

    print(json.dumps({
        "metric": "spec_decode_tokens_per_sec",
        "value": round(spec_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
