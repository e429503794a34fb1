"""End-to-end AR + speculative throughput across quantization modes, on chip.

Usage: python tools/bench_e2e_quant.py [mode,mode,...] [--gamma G] [--gen N]
Modes: none (bf16), int8, int4, nf4, fp4. Both target and drafter are
quantized (the quantized operating point — BASELINE.md north star measures
spec speedup against the *quantized* AR baseline).

Reuses bench.py's LayerSkip pair builder so numbers are directly comparable
with the headline benchmark. Prints a summary table at the end; per-mode
results also stream as they finish (the run takes minutes per mode on the
remote-compile service the first time a program shape is seen).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

import bench  # noqa: E402  (repo-root bench.py)
from bench import build_pair, log, measure_ar, measure_spec  # noqa: E402


def main():
    import numpy as np

    from specdec_tpu.sampling.processors import MultinomialProcessor

    ap = argparse.ArgumentParser()
    ap.add_argument("modes", nargs="?", default="none,int8,int4")
    ap.add_argument("--gamma", default="8",
                    help="comma list; the pair is built once per mode and "
                         "reused across gammas")
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    modes = args.modes.split(",")
    gammas = [int(g) for g in str(args.gamma).split(",")]

    log(f"backend={jax.default_backend()} modes={modes} gammas={gammas}")
    proc = MultinomialProcessor(temperature=1.0)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(1, bench.V, size=60)]

    rows = []
    for mode in modes:
        log(f"=== mode {mode} ===")
        t0 = time.time()
        t_cfg, d_cfg, target, drafter = build_pair(quant=mode)
        ar_tps = measure_ar(t_cfg, target, prompt, args.gen, proc,
                            reps=args.reps)
        for gamma in gammas:
            spec_tps, acc = measure_spec(d_cfg, drafter, t_cfg, target,
                                         prompt, args.gen, gamma, proc,
                                         reps=args.reps)
            ratio = spec_tps / ar_tps if ar_tps else 0.0
            # ms per speculative window (acc*gamma+1 committed tokens each)
            win_ms = (acc * gamma + 1) / spec_tps * 1000.0
            rows.append((mode, gamma, ar_tps, spec_tps, acc, ratio, win_ms))
            log(f"mode {mode} gamma {gamma}: AR {ar_tps:.1f} "
                f"spec {spec_tps:.1f} ({ratio:.2f}x, acc {acc:.3f}, "
                f"window {win_ms:.2f} ms)")
        log(f"mode {mode} done in {time.time() - t0:.0f}s")
        # free device buffers before the next mode's build
        del target, drafter

    log("\n=== e2e summary (gen=%d) ===" % args.gen)
    log(f"{'mode':8} {'gamma':>5} {'AR tok/s':>10} {'spec tok/s':>11} "
        f"{'accept':>7} {'spec/AR':>8} {'win ms':>7}")
    for mode, gamma, ar, sp, acc, ratio, win in rows:
        log(f"{mode:8} {gamma:5d} {ar:10.1f} {sp:11.1f} {acc:7.3f} "
            f"{ratio:8.2f} {win:7.2f}")
    print(json.dumps([
        {"mode": m, "gamma": g, "ar_tps": round(a, 1),
         "spec_tps": round(s, 1), "acceptance": round(c, 3),
         "spec_over_ar": round(r, 3), "window_ms": round(w, 2)}
        for m, g, a, s, c, r, w in rows]))


if __name__ == "__main__":
    main()
