"""Headline benchmark: speculative-decode throughput vs AR baseline on TPU.

Runs on the real chip (default backend). Since the environment has no network
access for checkpoints, the target is a synthetic TinyLlama-1.1B-shaped
bfloat16 model and the drafter is DISTILLED from it (KL, engine/distill.py):
a 4-layer student initialized from the target's first layers and trained for a
few hundred steps against the target's token distribution — the same
relationship real drafter/target pairs have. Acceptance under multinomial
sampling equals 1 - TV(p, q), so the measured rate and speedup reflect real
speculative-decoding dynamics, not a rigged 100%-acceptance ceiling (random
un-distilled weights give ~0 acceptance; see PROGRESS notes).

Measurement notes for this environment (see .claude/skills/verify/SKILL.md):
only numpy materialization is a reliable timing barrier (the generate wrappers
materialize), first-compile of a program shape is slow on the remote-compile
service but cached across processes, and the persistent jax compilation cache
must stay OFF.

Prints exactly ONE JSON line to stdout:
  {"metric": "spec_decode_tokens_per_sec", "value": N, "unit": "tokens/s",
   "vs_baseline": speedup_over_AR}
Everything else goes to stderr.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from specdec_tpu.core.config import ModelConfig
    from specdec_tpu.core.model import init_params
    from specdec_tpu.sampling.base_decoding import autoregressive_generate
    from specdec_tpu.sampling.speculative import speculative_generate

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    import os

    V = 32000
    t_cfg = ModelConfig(
        vocab_size=V, hidden_size=2048, intermediate_size=5632,
        num_layers=22, num_heads=32, num_kv_heads=4, head_dim=64,
        max_position_embeddings=2048, rope_theta=10000.0,
        dtype=jnp.bfloat16,
    )
    DRAFT_LAYERS = 4
    d_cfg = t_cfg.replace(num_layers=DRAFT_LAYERS)

    t0 = time.time()
    target = init_params(t_cfg, jax.random.key(0), scale=0.02)
    # damp residual-writing projections: a smoother target function that a
    # shallow student can actually approximate (trained LMs are smooth in
    # this sense; raw random deep nets are not)
    layers = dict(target["layers"])
    layers["wo"] = layers["wo"] * 0.3
    layers["w_down"] = layers["w_down"] * 0.3
    target = dict(target)
    target["layers"] = layers
    drafter = dict(target)
    drafter["layers"] = jax.tree.map(lambda x: x[:DRAFT_LAYERS], layers)
    import numpy as np
    _ = np.asarray(target["embed"][0, :1])  # real barrier
    log(f"params built in {time.time() - t0:.1f}s "
        f"(target 22L/2048d ~1.1B bf16, drafter {DRAFT_LAYERS}L)")

    # --- distill the drafter (the honest synthetic drafter/target pair) ----
    from specdec_tpu.engine.distill import distill_drafter
    steps = int(os.getenv("BENCH_DISTILL_STEPS", "400"))
    t0 = time.time()
    drafter, acc_proxy = distill_drafter(
        t_cfg, target, d_cfg, drafter, steps=steps, batch_size=8, seq_len=128,
        learning_rate=3e-4, key=jax.random.key(7), log_every=50, log_fn=log)
    log(f"distilled {steps} steps in {time.time() - t0:.1f}s; "
        f"expected acceptance (1-TV) = {acc_proxy:.3f}")

    from specdec_tpu.sampling.processors import MultinomialProcessor
    proc = MultinomialProcessor(temperature=1.0)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(1, V, size=60)]  # bucket 64
    # GEN large enough to amortize the fixed per-call cost (dispatch + prefill
    # ~40ms); gamma=3 is the measured optimum at the distilled acceptance
    # (sweep: g2 378, g3 382, g5 366 tok/s vs AR 301 on the v5e chip)
    GEN = 256
    GAMMA = 3
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
        f"{spec_time:.2f}s = {spec_tps:.1f} tok/s, acceptance={acc:.3f}")

    speedup = spec_tps / ar_tps if ar_tps > 0 else 0.0
    log(f"speedup vs AR: {speedup:.2f}x")

    from specdec_tpu.engine.gamma_tuner import best_gamma
    cost_ratio = DRAFT_LAYERS / t_cfg.num_layers  # bandwidth-bound approx
    g_opt, s_pred = best_gamma(acc, cost_ratio)
    log(f"gamma model: measured acceptance {acc:.3f}, cost ratio "
        f"{cost_ratio:.2f} -> predicted best gamma {g_opt} "
        f"(predicted speedup {s_pred:.2f}x)")

    print(json.dumps({
        "metric": "spec_decode_tokens_per_sec",
        "value": round(spec_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
