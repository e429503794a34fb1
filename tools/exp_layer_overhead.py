"""Where do the 8B INT4 e2e milliseconds go? (round 4)

The pair4 kernel's matmul-only 8B forward is ~7.3 ms + ~0.6 ms head, int8's
non-matmul overhead is ~2.2 ms, yet int4 AR measures ~15 ms/token — ~4 ms
unaccounted. Hypotheses:
  H1 in-model pallas calls cost more than the microbench's tight fori_loop
     (scheduling bubbles around custom-call boundaries)
  H2 lax.scan feeds the kernel DYNAMIC-SLICES of the stacked weights, which
     XLA materializes into fresh buffers per layer (extra weight traffic)
  H3 neither — the gap is attention/sampling/loop machinery

Measures one synthetic "block chain" (the 4 real 8B matmul shapes with
rms-norm-ish glue, data-dependent) three ways:
  isolated   sum of the 4 matmuls timed alone x L        (the known floor)
  scan       lax.scan over L stacked quantized layers    (the real model's
             structure — H2's suspect)
  unrolled   python loop over per-layer container lists  (static operands)

Run:  setsid nohup python tools/exp_layer_overhead.py > /tmp/r4logs/exp_layer.log 2>&1 &
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from specdec_tpu.quant.core import Int4Weight, quantize_int4
from specdec_tpu.ops.quant_matmul import _nf4_matmul_2d


def log(*a):
    print(*a, flush=True)


L = 8
M = 8
D, QKV, I = 4096, 6144, 28672


def build_layer(key):
    ks = jax.random.split(key, 4)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def mk(k, K, N):
        return quantize_int4(jax.random.normal(k, (K, N), jnp.float32) * 0.02)

    return dict(qkv=mk(ks[0], D, QKV), wo=mk(ks[1], D, D),
                gateup=mk(ks[2], D, I), down=mk(ks[3], I, D))


def mm(x, w: Int4Weight):
    return _nf4_matmul_2d(x, w.packed, w.absmax, codec="int4")


def block(x, lp):
    h = x * lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-5)
    t = mm(h, lp["qkv"])
    x = x + mm(t[:, :D], lp["wo"])
    h = x * lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-5)
    u = mm(h, lp["gateup"])
    g = jax.nn.silu(u[:, :I // 2 * 2][:, ::2]) * u[:, 1::2]  # cheap mix
    # keep shapes honest for the down matmul
    x = x + mm(jnp.concatenate([g, g], axis=1)[:, :I], lp["down"])
    return x


def timed(fn, x, reps=(50, 300)):
    @jax.jit
    def run(r, x):
        def body(i, s):
            return fn(x + s * 1e-30)[0, 0].astype(jnp.float32) * 1e-30
        return lax.fori_loop(0, r, body, jnp.float32(0.0))

    t0 = time.time(); float(run(2, x)); log(f"  compile {time.time()-t0:.0f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run(reps[0], x)); t1 = time.time() - t0
        t0 = time.time(); float(run(reps[1], x)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (reps[1] - reps[0]))
    return best * 1000


def main():
    log(f"backend={jax.default_backend()}")
    layers = [build_layer(jax.random.key(i)) for i in range(L)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, D)) * 0.1
                    ).astype(jnp.bfloat16)

    # isolated matmuls (per-call costs at these shapes; no glue)
    one = layers[0]
    iso = 0.0
    for name, xin in (("qkv", x), ("wo", x),
                      ("gateup", x), ("down", None)):
        xi = (jnp.asarray(np.random.default_rng(1).normal(size=(M, I)) * 0.1
                          ).astype(jnp.bfloat16) if xin is None else xin)
        ms = timed(lambda v, w=one[name]: mm(v, w), xi)
        log(f"isolated {name}: {ms:.4f} ms")
        iso += ms
    log(f"isolated block total: {iso:.4f} ms")

    def chain_unrolled(x):
        for lp in layers:
            x = block(x, lp)
        return x

    def chain_scan(x):
        def body(h, lp):
            return block(h, lp), ()
        h, _ = lax.scan(body, x, stacked)
        return h

    ms_s = timed(chain_scan, x)
    log(f"scan chain:     {ms_s:.3f} ms = {ms_s / L:.4f} ms/block "
        f"(+{(ms_s / L - iso) * 1000:.1f} us/block over isolated)")
    if "--unrolled" in sys.argv:
        # NOTE: a 32-custom-call unrolled program broke the remote compile
        # service (transport broken pipe) — opt-in only
        ms_u = timed(chain_unrolled, x)
        log(f"unrolled chain: {ms_u:.3f} ms = {ms_u / L:.4f} ms/block "
            f"(+{(ms_u / L - iso) * 1000:.1f} us/block over isolated)")


if __name__ == "__main__":
    main()
