"""Probe: EAGLE trained on-policy vs on-stream, e2e on the cached arena
target (expects /tmp/fair_target_order1_4000.pkl from bench_eagle_fair).

Chip observation to explain: teacher-forced proxy 0.745 on STREAM batches,
but deployed chain acceptance 0.10. Tiny-scale CPU shows e2e(gamma=1) ==
proxy even in bf16, so the loop is fine; the remaining delta is the
conditioning distribution — deployment drafts over TARGET-GENERATED text
(512 tokens sampled at T=1 drift off-stream), while the tool trained the
head on stream batches. train_eagle's DEFAULT is on_policy_sampler for
exactly this reason; bench_eagle_fair overrode it.

  PYTHONPATH=/root/repo setsid nohup python tools/probe_eagle_onpolicy.py \
      > /tmp/probe_onpolicy.log 2>&1 &
"""
import json
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from specdec_tpu.core.config import ModelConfig
    from specdec_tpu.core.eagle import init_eagle_params
    from specdec_tpu.engine.distill import on_policy_sampler
    from specdec_tpu.engine.eagle_train import (
        eagle_acceptance_proxy, train_eagle,
    )
    from specdec_tpu.engine.pretrain import MarkovSpec, markov_sampler
    from specdec_tpu.sampling.eagle_speculative import eagle_generate
    from specdec_tpu.sampling.processors import MultinomialProcessor

    V = 8192
    cfg = ModelConfig(
        vocab_size=V, hidden_size=1024, intermediate_size=2816,
        num_layers=16, num_heads=16, num_kv_heads=4, head_dim=64,
        max_position_embeddings=2048, dtype=jnp.bfloat16)
    spec = MarkovSpec(vocab_size=V, num_states=V, branching=8, zipf_s=1.2,
                      order=1, seed=11)
    cache = "/tmp/fair_target_order1_4000.pkl"
    with open(cache, "rb") as f:
        blob = pickle.load(f)
    target = jax.tree.map(jnp.asarray, blob["params"])
    log(f"target loaded (nll {blob['nll']:.3f}), backend="
        f"{jax.default_backend()}")

    stream = markov_sampler(spec, 32, 128)
    onpol = on_policy_sampler(cfg, target, batch_size=32, seq_len=128)
    e_cfg = cfg.replace(num_layers=1)
    prompt = [int(t) for t in np.asarray(stream(jax.random.key(42)))[0, :32]]
    proc = MultinomialProcessor(temperature=1.0)
    E_STEPS = int(os.getenv("PROBE_STEPS", "6000"))

    results = {}
    for name, sampler in (("onpolicy", onpol), ("stream", stream)):
        ep = init_eagle_params(e_cfg, jax.random.key(7))
        t0 = time.time()
        ep, acc = train_eagle(cfg, target, e_cfg, ep, steps=E_STEPS,
                              batch_sampler=sampler, learning_rate=1e-3,
                              rollout_steps=3, key=jax.random.key(8))
        # proxy on BOTH distributions
        acc_s, _ = eagle_acceptance_proxy(cfg, e_cfg, ep, target,
                                          stream(jax.random.key(10_007)))
        acc_o, _ = eagle_acceptance_proxy(cfg, e_cfg, ep, target,
                                          onpol(jax.random.key(10_007)))
        row = {"proxy_stream": round(float(acc_s), 3),
               "proxy_onpolicy": round(float(acc_o), 3),
               "train_s": round(time.time() - t0)}
        for gamma in (1, 4):
            rates = []
            for s in range(3):
                _, r = eagle_generate(prompt, e_cfg, ep, cfg, target,
                                      gamma=gamma, max_gen_len=256,
                                      logits_processor=proc,
                                      eos_tokens_id=(),
                                      key=jax.random.key(50 + s))
                rates.append(r)
            row[f"e2e_g{gamma}"] = round(float(np.mean(rates)), 3)
        log(f"{name}: {row}")
        results[name] = row
    print(json.dumps(results))


if __name__ == "__main__":
    main()
