"""Split the hybrid window's +3.7 ms paged-target cost (VERDICT r4 #4)
into its two candidates: the per-layer K/V WRITE (scatter into the page
pool vs the slotted dynamic-update-slice) and the attention READ path
(page-table-indirected kernel vs the slotted XLA attention).

Method: fori_loop differential timing of the bare target forward at T=1
(write-dominated: attention reads the same S either way, the T=9-vs-T=1
read difference is absent) and T=9 (the verify shape). Page table and
tokens ride the carry (LICM-proof). The window probe
(exp_paged_residual.py) measured the whole window; each window contains
exactly ONE target forward, so if the T=9 step delta reproduces the
~3.7 ms window delta, the attribution is complete, and the T=1 row says
how much of it is the write.

Run detached on chip:
  PYTHONPATH=/root/repo setsid nohup python tools/exp_paged_step.py \
      > /tmp/r5logs/paged_step.log 2>&1 &
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from exp_paged_residual import GAMMA, build_batcher, build_models, log


def dev_time(fwd_fn, tokens, cache, reps_target_s=0.4):
    @jax.jit
    def run(reps, toks, c):
        def body(i, s):
            ds = jnp.int32(s * 1e-30)
            cc = c
            if hasattr(c, "page_table"):
                cc = dataclasses.replace(c, page_table=c.page_table + ds)
            logits, _ = fwd_fn(toks + ds, cc)
            return logits.astype(jnp.float32).reshape(-1)[0] * 1e-30
        return lax.fori_loop(0, reps, body, jnp.float32(0.0))

    t0 = time.time()
    float(run(2, tokens, cache))
    log(f"    compile+run {time.time() - t0:.1f}s")
    t0 = time.time()
    float(run(8, tokens, cache))
    pilot = (time.time() - t0) / 8
    r1 = max(8, int(0.1 / max(pilot, 1e-7)))
    r2 = r1 + max(24, int(reps_target_s / max(pilot, 1e-7)))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run(r1, tokens, cache)); t1 = time.time() - t0
        t0 = time.time(); float(run(r2, tokens, cache)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (r2 - r1))
    return best * 1000


def main():
    from specdec_tpu.core.model import forward_step, forward_step_paged

    if os.getenv("RESIDUAL_CPU"):
        jax.config.update("jax_platforms", "cpu")
    log(f"backend={jax.default_backend()}")
    V, t_cfg, d_cfg, target, drafter = build_models()

    bslot = build_batcher(V, t_cfg, d_cfg, target, drafter, "slotted")
    s_cache = bslot.state.t_cache
    s_buf = bslot.state.buf
    del bslot
    bhyb = build_batcher(V, t_cfg, d_cfg, target, drafter, "hybrid")
    p_cache = bhyb.state.t_cache
    del bhyb

    rows = {}
    for T in (1, GAMMA + 1):
        toks = s_buf[:, :T]
        log(f"  slotted T={T}:")
        a = dev_time(lambda tk, c: forward_step(t_cfg, target, tk, c),
                     toks, s_cache)
        log(f"  slotted T={T}: {a:.3f} ms")
        log(f"  paged(kernel) T={T}:")
        uk = True if jax.default_backend() == "tpu" else None
        b = dev_time(lambda tk, c: forward_step_paged(t_cfg, target, tk, c,
                                                      use_kernel=uk),
                     toks, p_cache)
        log(f"  paged(kernel) T={T}: {b:.3f} ms  (delta {b - a:+.3f})")
        rows[f"T{T}"] = {"slotted_ms": round(a, 3), "paged_ms": round(b, 3),
                         "delta_ms": round(b - a, 3)}

    d1 = rows["T1"]["delta_ms"]
    d9 = rows[f"T{GAMMA + 1}"]["delta_ms"]
    log(f"write-side (T=1) delta: {d1:+.3f} ms; verify-shape (T={GAMMA + 1}) "
        f"delta: {d9:+.3f} ms; read-side increment: {d9 - d1:+.3f} ms")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
