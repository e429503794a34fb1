"""EAGLE head-depth sweep on the pretrained arena target (VERDICT r3 #4).

Round 3 only ever measured depth-1 EAGLE heads (deployed acceptance
0.097-0.21, 1.17-1.20x AR on the arena), while published EAGLE results come
from deeper heads. This sweeps depth 1..4 — each head trained identically
(on-policy + HASS rollout, the round-3 recipe) — and measures chain
gamma ∈ {4, 8} plus one tree topology per depth, against the same AR
baseline. Output: the depth × gamma table for docs/BENCHMARKS.md; the sweep
either finds an operating point ≥1.5x AR or records that depth saturates at
arena scale.

Reuses bench_eagle_fair's cached pretrained target when present.

Run detached on chip (~1 h: 4 trainings + measurements):
  PYTHONPATH=/root/repo setsid nohup python tools/bench_eagle_depth.py \
      > /tmp/r4logs/eagle_depth.log 2>&1 &
Env: DEPTHS=1,2,3,4  FAIR_GEN, FAIR_REPS, FAIR_LM_STEPS, FAIR_EAGLE_STEPS,
FAIR_ROLLOUT as in bench_eagle_fair.
"""
import json
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import measure_ar
    from specdec_tpu.core.config import ModelConfig
    from specdec_tpu.core.eagle import init_eagle_params
    from specdec_tpu.engine.distill import on_policy_sampler
    from specdec_tpu.engine.eagle_train import train_eagle
    from specdec_tpu.engine.pretrain import (
        MarkovSpec, build_trained_target, markov_sampler,
    )
    from specdec_tpu.sampling.eagle_speculative import eagle_generate
    from specdec_tpu.sampling.eagle_tree import eagle_tree_generate
    from specdec_tpu.sampling.processors import MultinomialProcessor

    log(f"backend={jax.default_backend()}")
    GEN = int(os.getenv("FAIR_GEN", "512"))
    REPS = int(os.getenv("FAIR_REPS", "3"))
    LM_STEPS = int(os.getenv("FAIR_LM_STEPS", "4000"))
    E_STEPS = int(os.getenv("FAIR_EAGLE_STEPS", "6000"))
    ROLLOUT = int(os.getenv("FAIR_ROLLOUT", "3"))
    DEPTHS = [int(d) for d in os.getenv("DEPTHS", "1,2,3,4").split(",")]

    V = 8192
    cfg = ModelConfig(
        vocab_size=V, hidden_size=1024, intermediate_size=2816,
        num_layers=16, num_heads=16, num_kv_heads=4, head_dim=64,
        max_position_embeddings=2048, dtype=jnp.bfloat16)
    spec = MarkovSpec(vocab_size=V, num_states=V, branching=8, zipf_s=1.2,
                      order=1, seed=11)

    cache = f"/tmp/fair_target_order1_{LM_STEPS}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            blob = pickle.load(f)
        target = jax.tree.map(jnp.asarray, blob["params"])
        nll = blob["nll"]
        log(f"target loaded from {cache} (nll {nll:.3f})")
    else:
        t0 = time.time()
        target, nll = build_trained_target(
            cfg, spec, steps=LM_STEPS, batch_size=32, seq_len=128,
            learning_rate=1e-3, seed=0, log_every=500, log_fn=log)
        with open(cache, "wb") as f:
            pickle.dump({"params": jax.tree.map(np.asarray, target),
                         "nll": nll}, f)
        log(f"target pretrained: nll={nll:.3f} in {time.time() - t0:.0f}s")

    sampler = markov_sampler(spec, 32, 128)
    prompt = [int(t) for t in np.asarray(sampler(jax.random.key(42)))[0, :32]]
    proc = MultinomialProcessor(temperature=1.0)
    ar_tps = measure_ar(cfg, target, prompt, GEN, proc, reps=REPS)
    log(f"AR baseline: {ar_tps:.1f} tok/s")
    results = {"target_nll": round(nll, 4), "ar_tps": round(ar_tps, 1),
               "train_steps": E_STEPS, "rollout": ROLLOUT}

    def time_gen(fn, label):
        t0 = time.time()
        out, rate = fn(jax.random.key(100))
        log(f"{label} compile+run: {time.time() - t0:.1f}s "
            f"(acceptance {rate:.3f})")
        times, rates = [], []
        for i in range(REPS):
            t0 = time.time()
            out, rate = fn(jax.random.key(200 + i))
            times.append(time.time() - t0)
            rates.append(rate)
        tps = len(out) / min(times)
        log(f"{label}: {tps:.0f} tok/s, acceptance "
            f"{float(np.mean(rates)):.3f}  ({tps / ar_tps:.2f}x AR)")
        return {"tps": round(tps, 1),
                "acceptance": round(float(np.mean(rates)), 3),
                "x_ar": round(tps / ar_tps, 2)}

    e_sampler = on_policy_sampler(cfg, target, batch_size=32, seq_len=128)
    for depth in DEPTHS:
        e_cfg = cfg.replace(num_layers=depth)
        t0 = time.time()
        ep = init_eagle_params(e_cfg, jax.random.key(7))
        ep, e_acc = train_eagle(cfg, target, e_cfg, ep, steps=E_STEPS,
                                batch_sampler=e_sampler, learning_rate=1e-3,
                                rollout_steps=ROLLOUT, key=jax.random.key(8),
                                log_every=500, log_fn=log)
        log(f"depth {depth}: trained in {time.time() - t0:.0f}s, "
            f"proxy acceptance {e_acc:.3f}")
        row = {"proxy_acceptance": round(e_acc, 3)}
        for gamma in (4, 8):
            row[f"chain_g{gamma}"] = time_gen(
                lambda k, g=gamma: eagle_generate(
                    prompt, e_cfg, ep, cfg, target, gamma=g, max_gen_len=GEN,
                    logits_processor=proc, eos_tokens_id=(), key=k),
                f"depth{depth} chain g={gamma}")
        row["tree_4x2x2x1"] = time_gen(
            lambda k: eagle_tree_generate(
                prompt, e_cfg, ep, cfg, target, branching=(4, 2, 2, 1),
                max_gen_len=GEN, logits_processor=proc, eos_tokens_id=(),
                key=k),
            f"depth{depth} tree 4x2x2x1")
        results[f"depth{depth}"] = row
        print(json.dumps({f"depth{depth}": row}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
