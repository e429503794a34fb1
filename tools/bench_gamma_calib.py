"""Gamma sweep + advisory recalibration on the headline 1.1B pair
(VERDICT r4 #2: the advisory's window-overhead/cost-ratio constants were
calibrated on the round-2 kernel; the round-4 kernel moved the draft:verify
cost ratio ~50% and the advisory now predicts gamma 14 where gamma 10
measures best).

Method: sweep gamma over the bench pair, convert each point to
window_time = tokens_per_window / tok_s, then least-squares fit

    window_time(g) = A + B*g          (A = verify + fixed, B = draft step)

and express the advisory's inputs in verify-step units using the measured
AR step: cost_ratio = B / t_ar, window_overhead = A / t_ar - 1. Prints the
fitted constants, the advisory's prediction with them, and the measured
argmax — the VERDICT done-bar is |predicted - measured| <= 1 gamma step.

Run detached on chip:
  BENCH_QUANT=int4 PYTHONPATH=/root/repo setsid nohup \
      python tools/bench_gamma_calib.py > /tmp/r5logs/gamma_calib.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from bench import V, build_pair, log, measure_ar, measure_spec


def main():
    from specdec_tpu.engine.gamma_tuner import (
        best_gamma, conditional_from_reference_rate,
    )
    from specdec_tpu.sampling.processors import MultinomialProcessor

    quant = os.getenv("BENCH_QUANT", "int4")
    gammas = [int(g) for g in os.getenv("GAMMAS", "4,6,8,10,12,14").split(",")]
    gen = int(os.getenv("BENCH_GEN", "512"))
    log(f"backend={jax.default_backend()} quant={quant} gammas={gammas}")

    t_cfg, d_cfg, target, drafter = build_pair(quant=quant)
    proc = MultinomialProcessor(temperature=1.0)
    prompt = [int(t) for t in np.random.default_rng(0).integers(1, V, size=60)]

    ar_tps = measure_ar(t_cfg, target, prompt, gen, proc)
    t_ar = 1.0 / ar_tps

    rows = []
    for g in gammas:
        tps, acc = measure_spec(d_cfg, drafter, t_cfg, target, prompt, gen,
                                g, proc)
        tokens_per_window = acc * g + 1.0
        w = tokens_per_window / tps
        rows.append({"gamma": g, "tok_s": round(tps, 1),
                     "acceptance": round(acc, 4),
                     "tokens_per_window": round(tokens_per_window, 3),
                     "window_ms": round(w * 1e3, 3),
                     "speedup": round(tps * t_ar, 3)})
        log(f"gamma {g}: {tps:.1f} tok/s, acc {acc:.3f}, window "
            f"{w * 1e3:.2f} ms, speedup {tps * t_ar:.2f}x")

    gs = np.array([r["gamma"] for r in rows], np.float64)
    ws = np.array([r["window_ms"] for r in rows], np.float64) / 1e3
    B, A = np.polyfit(gs, ws, 1)
    cost_ratio = B / t_ar
    window_overhead = A / t_ar - 1.0
    log(f"fit: window = {A * 1e3:.3f} ms + gamma * {B * 1e3:.3f} ms "
        f"(t_ar {t_ar * 1e3:.3f} ms)")
    log(f"advisory constants: cost_ratio {cost_ratio:.3f} (layer-ratio "
        f"prior {d_cfg.num_layers / t_cfg.num_layers:.3f}), "
        f"window_overhead {window_overhead:.3f} (round-2 constant 0.57)")

    measured_best = max(rows, key=lambda r: r["speedup"])
    # advisory prediction using the fitted constants and the conditional
    # acceptance inverted at the measured best point
    a_cond = conditional_from_reference_rate(measured_best["acceptance"],
                                             measured_best["gamma"])
    g_opt, s_pred = best_gamma(a_cond, cost_ratio,
                               window_overhead=window_overhead)
    log(f"measured best gamma {measured_best['gamma']} "
        f"({measured_best['speedup']:.2f}x); recalibrated advisory predicts "
        f"{g_opt} ({s_pred:.2f}x) from conditional {a_cond:.3f}")

    print(json.dumps({
        "quant": quant, "ar_tps": round(ar_tps, 1), "rows": rows,
        "fit": {"A_ms": round(A * 1e3, 3), "B_ms": round(B * 1e3, 3),
                "cost_ratio": round(cost_ratio, 4),
                "window_overhead": round(window_overhead, 4)},
        "measured_best_gamma": measured_best["gamma"],
        "advisory_best_gamma": g_opt}))


if __name__ == "__main__":
    main()
