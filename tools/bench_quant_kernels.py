"""Micro-benchmark: fused dequant-matmul kernel variants on the real TPU chip.

Races the quantized matmul paths (ops/quant_matmul.py) against each other at
the 1.1B bench model's decode shapes, per 4-bit decode variant. This is the
measurement tool behind the round-2 "fix the 4-bit VPU decode pipeline" work:
round 1 measured NF4/FP4 AR at 108-122 tok/s (VPU-bound in the ~20-op/weight
nibble decode) vs INT8's 488, and the candidate fixes differ only in the
in-kernel decode:

- ``nf4``      — packed bf16-word bit assembly, 7 selects (round-2 default)
- ``nf4_sel``  — 15-select codebook tree (round-1 default)
- ``fp4_sel``  — e2m1 arithmetic decode via float select chain (round 1)
- ``fp4``      — e2m1 decode via f32 *bit assembly* (integer ops + bitcast)
- ``int4``     — symmetric ±7 grid: (c − 8) * absmax, ~3 ops/weight

Method: each timing runs the matmul in a jitted ``fori_loop`` whose input
carries a data dependency on the previous output (x + s*1e-30) so XLA cannot
hoist the loop-invariant matmul; cost per call is differential between two rep
counts to cancel fixed dispatch. Only numpy materialization is a reliable
barrier on this backend (.claude/skills/verify/SKILL.md).

Run detached (first compiles are slow on the remote-compile service):
  setsid nohup python tools/bench_quant_kernels.py > /tmp/qk.log 2>&1 &
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from specdec_tpu.quant.core import (
    dequantize, quantize_fp4, quantize_int4, quantize_int8, quantize_nf4,
)
from specdec_tpu.ops.quant_matmul import _int8_matmul_2d, _nf4_matmul_2d


def log(*a):
    print(*a, flush=True)


# (name, K, N) — TinyLlama-1.1B decode shapes with fused qkv/gateup weights
SHAPES = [
    ("qkv", 2048, 2560),
    ("gateup", 2048, 11264),
    ("down", 5632, 2048),
    ("head", 2048, 32000),
]
# per-token occurrence count in one 22-layer forward (wo ~ qkv-shaped: count
# it inside the qkv bucket by K*N ratio when building the implied forward)
PER_FWD = {"qkv": 22, "gateup": 22, "down": 22, "head": 1}
WO_FLOPS_RATIO = (2048 * 2048) / (2048 * 2560)  # wo folded into qkv row


def make_runner(mm):
    """mm: (x, w) -> out.  Returns jitted (x, w, reps) -> scalar."""

    @partial(jax.jit, static_argnames=())
    def run(x, w, reps):
        def body(i, s):
            out = mm(x + s * 1e-30, w)
            return out[0, 0].astype(jnp.float32) * 1e-30

        return lax.fori_loop(0, reps, body, jnp.float32(0.0))

    return run


VARIANTS = {
    "dense_bf16": (lambda w: w.astype(jnp.bfloat16),
                   lambda x, w: jnp.matmul(x, w)),
    "int8_xla": (quantize_int8,
                 lambda x, w: jnp.matmul(x, dequantize(w, jnp.bfloat16))),
    "int8_pallas": (quantize_int8, lambda x, w: _int8_matmul_2d(x, w.q, w.scale)),
    "nf4": (quantize_nf4,
            lambda x, w: _nf4_matmul_2d(x, w.packed, w.absmax, codec="nf4")),
    "nf4_sel": (quantize_nf4,
                lambda x, w: _nf4_matmul_2d(x, w.packed, w.absmax,
                                            codec="nf4_sel")),
    "fp4_sel": (quantize_fp4,
                lambda x, w: _nf4_matmul_2d(x, w.packed, w.absmax,
                                            codec="fp4_sel")),
    "fp4_bits": (quantize_fp4,
                 lambda x, w: _nf4_matmul_2d(x, w.packed, w.absmax,
                                             codec="fp4")),
    "int4": (quantize_int4,
             lambda x, w: _nf4_matmul_2d(x, w.packed, w.absmax, codec="int4")),
    "int4_xla": (quantize_int4,
                 lambda x, w: jnp.matmul(x, dequantize(w, jnp.bfloat16))),
}


def main():
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    T = int(next((a.split("=")[1] for a in sys.argv if a.startswith("T=")), 1))
    log(f"backend={jax.default_backend()} T={T}")
    rng = np.random.default_rng(0)
    results = {}
    for vname, (quant, mm) in VARIANTS.items():
        if only and vname not in only:
            continue
        runner = make_runner(mm)
        per_shape = {}
        for sname, K, N in SHAPES:
            w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02)
            qw = quant(w)
            x = jnp.asarray(rng.normal(size=(T, K)).astype(np.float32)
                            ).astype(jnp.bfloat16)
            t0 = time.time()
            float(runner(x, qw, 1))  # compile + barrier
            log(f"  {vname}/{sname}: compile {time.time() - t0:.1f}s")
            # tunnel dispatch noise is tens of ms: use a 2000-call
            # differential and best-of-3 on each leg so kernel time dominates
            r1, r2 = 200, 2200
            t1 = t2 = float("inf")
            for _ in range(3):
                t0 = time.time()
                float(runner(x, qw, r1))
                t1 = min(t1, time.time() - t0)
                t0 = time.time()
                float(runner(x, qw, r2))
                t2 = min(t2, time.time() - t0)
            per_call_ms = (t2 - t1) / (r2 - r1) * 1000
            per_shape[sname] = per_call_ms
            log(f"  {vname}/{sname} [{K}x{N}]: {per_call_ms:.4f} ms/call")
        fwd_ms = sum(PER_FWD[s] * per_shape[s] for s in per_shape)
        fwd_ms += PER_FWD["qkv"] * per_shape.get("qkv", 0) * WO_FLOPS_RATIO
        results[vname] = (per_shape, fwd_ms)
        log(f"{vname}: implied 1.1B matmul-only forward {fwd_ms:.2f} ms "
            f"-> {1000 / fwd_ms:.0f} tok/s ceiling")
    log("\n=== summary (ms/call) ===")
    hdr = "variant".ljust(12) + "".join(s.ljust(10) for s, _, _ in SHAPES) \
        + "fwd_ms".ljust(9) + "ceil_tok/s"
    log(hdr)
    for vname, (per_shape, fwd_ms) in results.items():
        row = vname.ljust(12) + "".join(
            f"{per_shape.get(s, float('nan')):.4f}".ljust(10)
            for s, _, _ in SHAPES) + f"{fwd_ms:.2f}".ljust(9) \
            + f"{1000 / fwd_ms:.0f}"
        log(row)


if __name__ == "__main__":
    main()
