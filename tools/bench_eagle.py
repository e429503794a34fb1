"""Chip benchmark: EAGLE feature-drafted decoding on the bench 1.1B model.

Trains a depth-EAGLE_DEPTH head on-policy against the LayerSkip bench target
(bench.py's pair construction), then measures on the real chip:
  - AR baseline
  - chain EAGLE at a few gammas (sampled, distribution-exact)
  - greedy EAGLE tree at a few topologies (greedy-exact)
  - the LayerSkip 4-layer chain drafter for comparison

The drafter cost model differs sharply from LayerSkip: an EAGLE draft step is
fc + EAGLE_DEPTH blocks + the 2048x32000 head (~65% of a draft step at depth
1), where the LayerSkip drafter pays 4/22 of the target per step. Acceptance
is whatever training achieves against the synthetic target — report it
honestly alongside throughput.

Run detached (first compiles are slow on the remote-compile service):
  PYTHONPATH=/root/repo setsid nohup python tools/bench_eagle.py \
      > /tmp/eagle_chip.log 2>&1 &
"""
import os
import sys
import time

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_pair, measure_ar, measure_spec
    from specdec_tpu.core.eagle import init_eagle_params
    from specdec_tpu.engine.eagle_train import train_eagle
    from specdec_tpu.sampling.eagle_speculative import eagle_generate
    from specdec_tpu.sampling.eagle_tree import eagle_tree_generate
    from specdec_tpu.sampling.processors import MultinomialProcessor

    log(f"backend={jax.default_backend()}")
    DEPTHS = [int(d) for d in os.getenv("EAGLE_DEPTH", "1").split(",")]
    STEPS = int(os.getenv("EAGLE_STEPS", "300"))
    ROLLOUT = int(os.getenv("EAGLE_ROLLOUT", "1"))
    GEN = int(os.getenv("EAGLE_GEN", "512"))
    REPS = int(os.getenv("EAGLE_REPS", "3"))

    t_cfg, d_cfg, target, drafter = build_pair(quant="none")

    proc = MultinomialProcessor(temperature=1.0)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(1, t_cfg.vocab_size, size=60)]

    ar_tps = measure_ar(t_cfg, target, prompt, GEN, proc, reps=REPS)

    for depth in DEPTHS:
        # VERDICT r4 #5: take the arena-validated depth recipe (on-policy +
        # HASS rollout) to the BASELINE-ladder 1.1B bench target.
        e_cfg = t_cfg.replace(num_layers=depth)
        t0 = time.time()
        ep = init_eagle_params(e_cfg, jax.random.key(7))
        ep, acc_proxy = train_eagle(
            t_cfg, target, e_cfg, ep, steps=STEPS, batch_size=8,
            seq_len=128, learning_rate=1e-3, rollout_steps=ROLLOUT,
            log_every=max(1, STEPS // 6), log_fn=log)
        log(f"depth {depth}: {STEPS} steps (rollout {ROLLOUT}) in "
            f"{time.time() - t0:.1f}s, teacher-forced acceptance proxy "
            f"{acc_proxy:.3f}")

        for gamma in (3, 5, 8):
            t0 = time.time()
            out, rate = eagle_generate(prompt, e_cfg, ep, t_cfg, target,
                                       gamma=gamma, max_gen_len=GEN,
                                       logits_processor=proc,
                                       eos_tokens_id=(),
                                       key=jax.random.key(100))
            log(f"EAGLE d={depth} chain(g={gamma}) compile+run "
                f"{time.time() - t0:.1f}s")
            times, rates = [], []
            for i in range(REPS):
                t0 = time.time()
                out, rate = eagle_generate(prompt, e_cfg, ep, t_cfg, target,
                                           gamma=gamma, max_gen_len=GEN,
                                           logits_processor=proc,
                                           eos_tokens_id=(),
                                           key=jax.random.key(101 + i))
                times.append(time.time() - t0)
                rates.append(rate)
            best = min(times)
            log(f"EAGLE d={depth} chain gamma={gamma}: {len(out)} tok, best "
                f"{best:.2f}s = {len(out) / best:.1f} tok/s, acceptance "
                f"{sum(rates) / len(rates):.3f}, vs AR "
                f"{len(out) / best / ar_tps:.2f}x")

        for branching in ((3, 2, 1), (2, 2, 2), (4, 2)):
            t0 = time.time()
            out, rate = eagle_tree_generate(prompt, e_cfg, ep, t_cfg,
                                            target, branching=branching,
                                            max_gen_len=GEN,
                                            logits_processor=proc,
                                            eos_tokens_id=(),
                                            key=jax.random.key(100))
            log(f"EAGLE d={depth} tree{branching} compile+run "
                f"{time.time() - t0:.1f}s")
            times, rates = [], []
            for i in range(REPS):
                t0 = time.time()
                out, rate = eagle_tree_generate(
                    prompt, e_cfg, ep, t_cfg, target, branching=branching,
                    max_gen_len=GEN, logits_processor=proc,
                    eos_tokens_id=(), key=jax.random.key(101 + i))
                times.append(time.time() - t0)
                rates.append(rate)
            best = min(times)
            log(f"EAGLE d={depth} tree {branching}: {len(out)} tok "
                f"(sampled), best {best:.2f}s = {len(out) / best:.1f} "
                f"tok/s, acceptance {sum(rates) / len(rates):.3f}, vs AR "
                f"{len(out) / best / ar_tps:.2f}x")

    spec_tps, acc = measure_spec(d_cfg, drafter, t_cfg, target, prompt, GEN,
                                 8, proc, reps=REPS)
    log(f"layerskip chain gamma=8: {spec_tps:.1f} tok/s acc {acc:.3f} "
        f"({spec_tps / ar_tps:.2f}x)")


if __name__ == "__main__":
    main()
