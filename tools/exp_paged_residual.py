"""Attribute the hybrid-paged 0.92x closed-loop residual (VERDICT r4 #4).

Round 4 excluded page size (0.92x at ps32, 0.83x at ps128); the standing
hypothesis was "decode-window gather cost". This measures it directly with
device-side differential timing (the exp_int4_kernel.py fori_loop method —
host-side rep loops are ~35 ms dispatch-jitter-bound on this tunnel):

  A. one slotted decode window    (batch_engine._spec_window_body)
  B. one hybrid decode window     (same program, paged target cache)
  C. the T=gamma+1 target VERIFY forward alone, slotted vs paged
     (kernel path and gather path)
  D. the paged K/V WRITE (write_block_paged scatter) vs the slotted
     dynamic-update-slice write, isolated

If (B - A) is explained by C's delta, the residual is the verify step and
the kernel-vs-gather split inside C names the component; D catches the
other candidate (the per-window page scatter). A jax.profiler trace of 8
hybrid windows is captured for op-name corroboration (r4 method).

Run detached on chip:
  PYTHONPATH=/root/repo setsid nohup python tools/exp_paged_residual.py \
      > /tmp/r5logs/paged_residual.log 2>&1 &
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, flush=True)


def dev_time_window(window_fn, state, n_pilot=8):
    """Differential device-side timing of a decode-window program.

    Each rep re-runs the window from the SAME initial state (so page
    occupancy and cache positions never drift past their backing), keyed by
    the induction variable so WhileLoopInvariantCodeMotion can't hoist the
    body."""
    key0 = jax.random.key(0)

    @jax.jit
    def run(reps, st0):
        def body(i, s):
            key = jax.random.fold_in(key0, i + jnp.int32(s))
            new = window_fn(st0, key)
            return new.pos.astype(jnp.float32).sum() * 1e-30
        return lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(run(2, state))
    t0 = time.time()
    float(run(n_pilot, state))
    pilot = (time.time() - t0) / n_pilot
    r1 = max(8, int(0.1 / max(pilot, 1e-7)))
    r2 = r1 + max(24, int(0.5 / max(pilot, 1e-7)))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run(r1, state)); t1 = time.time() - t0
        t0 = time.time(); float(run(r2, state)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (r2 - r1))
    return best * 1000


def dev_time_forward(fwd_fn, tokens, cache):
    """Same harness for a bare forward step: tokens AND the paged cache's
    page table ride the carry — with a constant table the XLA gather path's
    page gather is loop-invariant and gets hoisted out of the fori_loop
    (measured: 'gather' times that were just the attention math)."""
    import dataclasses

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

    float(run(2, tokens, cache))
    t0 = time.time()
    float(run(8, tokens, cache))
    pilot = (time.time() - t0) / 8
    r1 = max(8, int(0.1 / max(pilot, 1e-7)))
    r2 = r1 + max(24, int(0.5 / max(pilot, 1e-7)))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run(r1, tokens, cache)); t1 = time.time() - t0
        t0 = time.time(); float(run(r2, tokens, cache)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (r2 - r1))
    return best * 1000


def build_batcher(paged, gamma, slots, gen):
    from specdec_tpu.core.config import ModelConfig
    from specdec_tpu.core.model import init_params
    from specdec_tpu.serve.scheduler import ContinuousBatcher
    from specdec_tpu.serve.paged_scheduler import PagedContinuousBatcher

    V = 32000
    if os.getenv("RESIDUAL_SMALL"):   # CPU smoke of the harness logic
        t_cfg = ModelConfig(vocab_size=256, hidden_size=64,
                            intermediate_size=128, num_layers=4,
                            num_heads=4, num_kv_heads=2, head_dim=16,
                            max_position_embeddings=2048,
                            rope_theta=10000.0, dtype=jnp.float32)
        V = 256
    else:
        t_cfg = ModelConfig(vocab_size=V, hidden_size=2048,
                            intermediate_size=5632, num_layers=22,
                            num_heads=32, num_kv_heads=4, head_dim=64,
                            max_position_embeddings=2048, rope_theta=10000.0,
                            dtype=jnp.bfloat16)
    d_cfg = t_cfg.replace(num_layers=4)
    base = init_params(t_cfg, jax.random.key(0), scale=0.02)
    mask = (jnp.arange(t_cfg.num_layers) >= 4).astype(jnp.float32)
    sv = (1.0 - mask) + mask * 0.08
    layers = dict(base["layers"])
    for nm in ("wo", "w_down"):
        layers[nm] = (base["layers"][nm].astype(jnp.float32)
                      * sv[:, None, None]).astype(jnp.bfloat16)
    target = dict(base, layers=layers)
    drafter = dict(target)
    drafter["layers"] = jax.tree.map(lambda x: x[:4], target["layers"])
    _ = np.asarray(target["embed"][0, :1])

    kw = dict(gamma=gamma, num_slots=slots, windows_per_sync=1,
              max_new_tokens=gen)
    if paged:
        S = 256 + gen + gamma + 2
        b = PagedContinuousBatcher(d_cfg, drafter, t_cfg, target,
                                   page_size=64,
                                   pool_tokens=(slots + 1) * S, **kw)
    else:
        b = ContinuousBatcher(d_cfg, drafter, t_cfg, target, **kw)
    return t_cfg, d_cfg, target, drafter, b


def steady_state(b, slots, gen, vocab):
    rng = np.random.default_rng(1)
    for n in rng.integers(30, 200, size=slots):
        b.submit([int(t) for t in rng.integers(1, vocab, size=int(n))],
                 max_new_tokens=gen)
    for _ in range(3):   # admit + a few windows; leaves pages topped up
        b.step()
    return b.state


def main():
    from functools import partial
    from specdec_tpu.engine.batch_engine import _spec_window_body
    from specdec_tpu.core.model import forward_step, forward_step_paged
    from specdec_tpu.sampling.processors import GreedyProcessor

    log(f"backend={jax.default_backend()}")
    GAMMA, SLOTS = 8, 8
    proc = GreedyProcessor()

    t_cfg, d_cfg, target, drafter, bslot = build_batcher(
        False, GAMMA, SLOTS, 512)
    V = t_cfg.vocab_size
    sstate = steady_state(bslot, SLOTS, 512, V)
    _, _, _, _, bpage = build_batcher(True, GAMMA, SLOTS, 512)
    pstate = steady_state(bpage, SLOTS, 512, V)

    def win(st, key):
        return _spec_window_body(d_cfg, drafter, t_cfg, target, st,
                                 GAMMA, proc, (), False, key)

    a = dev_time_window(win, sstate)
    log(f"A slotted window:        {a:.3f} ms")
    b = dev_time_window(win, pstate)
    log(f"B hybrid window:         {b:.3f} ms   (delta {b - a:+.3f} ms, "
        f"ratio {a / b:.3f})")

    # C: verify forward alone, T=gamma+1, same committed state
    toks = sstate.buf[:, :GAMMA + 1]
    c_slot = dev_time_forward(
        lambda tk, c: forward_step(t_cfg, target, tk, c), toks,
        sstate.t_cache)
    log(f"C slotted verify T={GAMMA + 1}:  {c_slot:.3f} ms")
    c_pk = dev_time_forward(
        lambda tk, c: forward_step_paged(t_cfg, target, tk, c,
                                         use_kernel=True),
        toks, pstate.t_cache)
    log(f"C paged verify (kernel): {c_pk:.3f} ms   (delta vs slotted "
        f"{c_pk - c_slot:+.3f} ms)")
    c_pg = dev_time_forward(
        lambda tk, c: forward_step_paged(t_cfg, target, tk, c,
                                         use_kernel=False),
        toks, pstate.t_cache)
    log(f"C paged verify (gather): {c_pg:.3f} ms   (delta vs slotted "
        f"{c_pg - c_slot:+.3f} ms)")

    # D: K/V write isolated — run the verify with a ZERO-layer... not
    # separable that way; instead compare T=1 (write-dominated at tiny
    # attention) deltas:
    t1 = sstate.buf[:, :1]
    d_slot = dev_time_forward(
        lambda tk, c: forward_step(t_cfg, target, tk, c), t1, sstate.t_cache)
    d_page = dev_time_forward(
        lambda tk, c: forward_step_paged(t_cfg, target, tk, c,
                                         use_kernel=True),
        t1, pstate.t_cache)
    log(f"D T=1 target step slotted {d_slot:.3f} / paged {d_page:.3f} ms "
        f"(delta {d_page - d_slot:+.3f})")

    # profiler corroboration: 8 hybrid windows
    trace_dir = "/tmp/specdec_trace_r5_paged"
    os.system(f"rm -rf {trace_dir}")
    try:
        key = jax.random.key(9)
        jax.profiler.start_trace(trace_dir)
        st = pstate
        for i in range(8):
            st = _spec_window_body(d_cfg, drafter, t_cfg, target, st,
                                   GAMMA, proc, (), False,
                                   jax.random.fold_in(key, i))
        _ = np.asarray(st.pos)
        jax.profiler.stop_trace()
        xs = [f for f in glob.glob(f"{trace_dir}/**/*", recursive=True)
              if f.endswith(".xplane.pb")]
        if xs:
            blob = open(xs[0], "rb").read()
            log(f"xplane size {len(blob)}")
            for needle in (b"gather", b"scatter", b"dynamic-update",
                           b"dynamic_update", b"copy", b"transpose",
                           b"paged", b"custom-call", b"fusion"):
                log(f"  {needle.decode()}: {blob.count(needle)} hits")
    except Exception as e:
        log(f"profiler failed: {type(e).__name__}: {e}")

    import json
    print(json.dumps({
        "slotted_window_ms": round(a, 3), "hybrid_window_ms": round(b, 3),
        "window_delta_ms": round(b - a, 3),
        "verify_slotted_ms": round(c_slot, 3),
        "verify_paged_kernel_ms": round(c_pk, 3),
        "verify_paged_gather_ms": round(c_pg, 3),
        "t1_slotted_ms": round(d_slot, 3),
        "t1_paged_ms": round(d_page, 3)}))


if __name__ == "__main__":
    main()
