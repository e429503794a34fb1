"""On-chip validation + benchmark of the paged-attention path (VERDICT #4).

Part 1 — kernel validation on real TPU: `paged_decode_attention` vs the
gather_pages + XLA attention oracle, on decode shapes the serving path
actually uses (T=1 decode and T=gamma+1 verify, scrambled page tables,
mixed live lengths so the length-aware page clamp is exercised).

Part 2 — kernel microbench: paged kernel vs gather-oracle per call.

Part 3 — serving: PagedContinuousBatcher vs slotted ContinuousBatcher,
B=8 slots, 16 requests with mixed prompt lengths.

Usage: python tools/bench_paged.py [--skip-serve]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def xla_oracle(q, k_pool, v_pool, table, offsets, Hk):
    """Gather pages then dense masked attention — the reference semantics."""
    from specdec_tpu.core.paged_cache import gather_pages
    k = gather_pages(k_pool, table)            # [B, S, Hk, Dh]
    v = gather_pages(v_pool, table)
    return dense_masked_attn(q, k, v, offsets, Hk)


def dense_masked_attn(q, k, v, offsets, Hk):
    B, T, Hq, Dh = q.shape
    G = Hq // Hk
    S = k.shape[1]
    qg = q.reshape(B, T, Hk, G, Dh)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k) / (Dh ** 0.5)
    q_pos = offsets[:, None] + jnp.arange(T)[None, :]          # [B, T]
    mask = jnp.arange(S)[None, None, :] <= q_pos[:, :, None]   # [B, T, S]
    scores = jnp.where(mask[:, None, None], scores, -1e30)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", w, v)
    return out.reshape(B, T, Hq, Dh)


def validate(B, T, Hq, Hk, Dh, page, MP, offsets, dtype=jnp.bfloat16, seed=0):
    from specdec_tpu.ops.paged_attention import paged_decode_attention
    rng = np.random.default_rng(seed)
    NP = B * MP + 3
    q = jnp.asarray(rng.normal(size=(B, T, Hq, Dh)), dtype)
    kp = jnp.asarray(rng.normal(size=(NP, Hk, page, Dh)), dtype)
    vp = jnp.asarray(rng.normal(size=(NP, Hk, page, Dh)), dtype)
    perm = rng.permutation(NP - 3) + 3
    table = jnp.asarray(perm[:B * MP].reshape(B, MP).astype(np.int32))
    off = jnp.asarray(offsets, jnp.int32)

    got = np.asarray(paged_decode_attention(q, kp, vp, table, off, Hk),
                     np.float32)
    ref = np.asarray(xla_oracle(q, kp, vp, table, off, Hk), np.float32)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    log(f"  validate B={B} T={T} Hq={Hq}/{Hk} Dh={Dh} page={page} MP={MP} "
        f"off={list(np.asarray(off))}: rel-err {err:.2e}")
    assert err < 3e-2, f"paged kernel mismatch: {err}"
    return q, kp, vp, table, off


def microbench(q, kp, vp, table, off, Hk, iters=50):
    from specdec_tpu.ops.paged_attention import paged_decode_attention

    def timed(fn, label):
        _ = np.asarray(fn(q, kp, vp, table, off, Hk))  # compile + barrier
        t0 = time.time()
        for _ in range(iters):
            r = fn(q, kp, vp, table, off, Hk)
        _ = np.asarray(r)
        dt = (time.time() - t0) / iters * 1000
        log(f"  {label}: {dt:.4f} ms/call")
        return dt

    oracle = jax.jit(xla_oracle, static_argnames=("Hk",))
    kern = timed(paged_decode_attention, "paged kernel")
    orac = timed(lambda q_, k_, v_, t_, o_, Hk_: oracle(q_, k_, v_, t_, o_,
                                                        Hk=Hk_),
                 "gather+XLA oracle")
    return kern, orac


def sweep_quant_kernel(Hq=32, Hk=4, Dh=64, page=64, B=4, T=9):
    """VERDICT r3 #7: the QUANTIZED paged kernel lost at short S (5.23 vs
    2.31 ms at S=512). Sweep S (= MP*page) for kernel vs gather-oracle on
    the int8 pool and print the measured crossover — the number serving's
    length-aware selection keys on."""
    from specdec_tpu.core.cache import quantize_kv_block
    from specdec_tpu.core.paged_cache import gather_page_scales, gather_pages
    from specdec_tpu.ops.paged_attention import paged_decode_attention_quant

    def oracle(q, kq, ks, vq, vs, table, off, Hk):
        # gather int8 pages + scales FIRST, dequantize only the gathered
        # block (what serving's XLA fallback does — dequantizing the whole
        # pool before the gather would also be loop-invariant-hoistable
        # under the differential timing harness and read as free)
        kd = (gather_pages(kq, table).astype(jnp.float32)
              * gather_page_scales(ks, table)[..., None]).astype(q.dtype)
        vd = (gather_pages(vq, table).astype(jnp.float32)
              * gather_page_scales(vs, table)[..., None]).astype(q.dtype)
        return dense_masked_attn(q, kd, vd, off, Hk)

    oracle_j = jax.jit(oracle, static_argnames=("Hk",))
    rng = np.random.default_rng(0)
    rows = []
    for MP in (4, 8, 16, 32):
        S = MP * page
        NP = B * MP + 3
        q = jnp.asarray(rng.normal(size=(B, T, Hq, Dh)), jnp.bfloat16)
        kf = jnp.asarray(rng.normal(size=(NP, Hk, page, Dh)), jnp.float32)
        vf = jnp.asarray(rng.normal(size=(NP, Hk, page, Dh)), jnp.float32)
        def qpool(pool_f):
            # [NP, Hk, page, Dh] f32 -> int8 pool + [NP, Hk, page] scales,
            # through quantize_kv_block's [B, T, Hk, Dh] interface
            blk = pool_f.transpose(0, 2, 1, 3).reshape(1, NP * page, Hk, Dh)
            qv, sc = quantize_kv_block(blk)
            qv = qv[0].reshape(NP, page, Hk, Dh).transpose(0, 2, 1, 3)
            sc = sc[0].reshape(NP, page, Hk).transpose(0, 2, 1)
            return qv, sc

        kq, ks = qpool(kf)
        vq, vs = qpool(vf)
        perm = rng.permutation(NP - 3) + 3
        table = jnp.asarray(perm[:B * MP].reshape(B, MP).astype(np.int32))
        off = jnp.asarray([min(S - T, 7 + i * (S // B)) for i in range(B)],
                          jnp.int32)

        def timed(fn):
            # Adaptive-rep DIFFERENTIAL timing inside one jitted fori_loop
            # (the exp_int4_kernel.py method): the round-4 sweep timed 50
            # chained dispatches host-side and the ~35 ms tunnel
            # dispatch/pull jitter (0.7 ms/iter amortized — the size of the
            # signal) made the table non-monotonic (VERDICT r4 #3).
            # the PAGE TABLE rides the carry (not q): with only q perturbed,
            # the oracle's gather/dequant chain is loop-invariant and XLA
            # hoists it out of the fori_loop — measured 0.004 ms "oracle"
            # times that were just the attention math
            from jax import lax

            @jax.jit
            def run(reps, tb):
                def body(i, s):
                    out = fn(tb + jnp.int32(s * 1e-30))
                    return out.reshape(-1)[0].astype(jnp.float32) * 1e-30
                return lax.fori_loop(0, reps, body, jnp.float32(0.0))

            float(run(2, table))
            t0 = time.time()
            float(run(50, table))
            pilot = (time.time() - t0) / 50
            r1 = max(50, int(0.08 / max(pilot, 1e-7)))
            r2 = r1 + max(200, int(0.4 / max(pilot, 1e-7)))
            best = float("inf")
            for _ in range(3):
                t0 = time.time(); float(run(r1, table)); t1 = time.time() - t0
                t0 = time.time(); float(run(r2, table)); t2 = time.time() - t0
                best = min(best, (t2 - t1) / (r2 - r1))
            return best * 1000

        kern = timed(lambda tb: paged_decode_attention_quant(
            q, kq, ks, vq, vs, tb, off, Hk))
        orac = timed(lambda tb: oracle_j(q, kq, ks, vq, vs, tb, off,
                                         Hk=Hk))
        rows.append((S, kern, orac))
        log(f"  S={S:5d}: quant kernel {kern:.3f} ms vs gather oracle "
            f"{orac:.3f} ms ({'kernel' if kern < orac else 'oracle'} wins)")
    return rows


def bench_serving(paged: bool, n_requests=16, slots=8, gen=128, gamma=8,
                  page_size=64,
                  kv_quant="none"):
    from specdec_tpu.core.config import ModelConfig
    from specdec_tpu.core.model import init_params
    from specdec_tpu.serve.scheduler import ContinuousBatcher
    from specdec_tpu.serve.paged_scheduler import PagedContinuousBatcher

    V = 32000
    t_cfg = ModelConfig(vocab_size=V, hidden_size=2048, intermediate_size=5632,
                        num_layers=22, num_heads=32, num_kv_heads=4,
                        head_dim=64, max_position_embeddings=2048,
                        rope_theta=10000.0, dtype=jnp.bfloat16,
                        kv_quant=kv_quant)
    d_cfg = t_cfg.replace(num_layers=4)
    base = init_params(t_cfg, jax.random.key(0), scale=0.02)
    mask = (jnp.arange(t_cfg.num_layers) >= 4).astype(jnp.float32)
    sv = (1.0 - mask) + mask * 0.08
    layers = dict(base["layers"])
    layers["wo"] = (base["layers"]["wo"].astype(jnp.float32)
                    * sv[:, None, None]).astype(jnp.bfloat16)
    layers["w_down"] = (base["layers"]["w_down"].astype(jnp.float32)
                        * sv[:, None, None]).astype(jnp.bfloat16)
    target = dict(base, layers=layers)
    drafter = dict(target)
    drafter["layers"] = jax.tree.map(lambda x: x[:4], target["layers"])
    _ = np.asarray(target["embed"][0, :1])

    rng = np.random.default_rng(1)
    prompts = [[int(t) for t in rng.integers(1, V, size=int(n))]
               for n in rng.integers(30, 200, size=n_requests)]

    kw = dict(gamma=gamma, num_slots=slots, windows_per_sync=8,
              max_new_tokens=gen)
    if paged:
        # pool backs every slot at full length: measure the paged path's
        # throughput, not preemption thrash (pool-pressure behavior is
        # covered by tests/test_paged_scheduler.py)
        S = 256 + gen + gamma + 2
        b = PagedContinuousBatcher(d_cfg, drafter, t_cfg, target,
                                   page_size=page_size,
                                   pool_tokens=(slots + 1) * S, **kw)
    else:
        b = ContinuousBatcher(d_cfg, drafter, t_cfg, target, **kw)
    label = ("paged" if paged else "slotted") + (f"+kv-{kv_quant}" if kv_quant != "none" else "")
    for rnd in ("cold", "warm"):   # first pass pays window-program compiles
        for p in prompts:
            b.submit(p, max_new_tokens=gen)
        t0 = time.time()
        done = b.run()
        dt = time.time() - t0
        toks = sum(len(r.output_ids) for r in done.values())
        ttfts = sorted(r.metrics.ttft for r in done.values() if r.metrics)
        p50 = ttfts[len(ttfts) // 2] * 1000 if ttfts else float("nan")
        log(f"  {label} ({rnd}): {toks} tokens in {dt:.2f}s = "
            f"{toks / dt:.0f} tok/s aggregate, p50 TTFT {p50:.0f} ms")
        b.completed.clear()
    if paged:
        log(f"  paged preemptions: {b.preemptions}")
    return toks / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-serve", action="store_true")
    ap.add_argument("--skip-kernel", action="store_true")
    ap.add_argument("--kv-quant", default="none", choices=("none", "int8"))
    ap.add_argument("--page-size", type=int, default=64,
                    help="paged-pool page size for part 3 (bigger pages = "
                         "coarser pool but fewer/bigger gathers and DMAs — "
                         "the hybrid 0.92x residual is gather granularity)")
    ap.add_argument("--quant-sweep", action="store_true",
                    help="S-sweep the int8-pool kernel vs gather oracle "
                         "(VERDICT r3 #7 crossover measurement) and exit")
    args = ap.parse_args()
    log(f"backend={jax.default_backend()}")
    if args.quant_sweep:
        log("=== quant paged kernel S-sweep (B=4 T=9) ===")
        sweep_quant_kernel()
        print('{"ok": true}')
        return

    if not args.skip_kernel:
        log("=== part 1: on-chip kernel validation ===")
        # serving decode shape: 1.1B-like heads, page 64
        validate(B=8, T=1, Hq=32, Hk=4, Dh=64, page=64, MP=8,
                 offsets=[40, 100, 511, 7, 250, 64, 63, 300])
        # gamma-window verify shape (T=9)
        a = validate(B=4, T=9, Hq=32, Hk=4, Dh=64, page=64, MP=8,
                     offsets=[40, 100, 350, 7])
        # MHA, small Dh
        validate(B=2, T=1, Hq=8, Hk=8, Dh=128, page=32, MP=4,
                 offsets=[10, 100])
        log("kernel validation PASS")

        log("=== part 2: kernel vs oracle microbench (B=4 T=9 S=512) ===")
        microbench(*a, Hk=4)

    if not args.skip_serve:
        log("=== part 3: serving bench (B=8 slots, 16 reqs, gen 128) ===")
        slotted = bench_serving(paged=False, kv_quant=args.kv_quant)
        paged = bench_serving(paged=True, kv_quant=args.kv_quant,
                              page_size=args.page_size)
        log(f"paged/slotted aggregate ratio: {paged / slotted:.2f}")

    print('{"ok": true}')


if __name__ == "__main__":
    main()
