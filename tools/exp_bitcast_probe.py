"""Probe Mosaic lowering facts needed by the INT4 kernel rework (round 4).

Questions this answers on the real chip:
 1. Does ``pltpu.bitcast(int32[R, N], bfloat16)`` lower, and what row order
    does it produce ([2R, N]: does word bits [0,16) land at row 2r or 2r+1)?
 2. Does ``int32.astype(bfloat16)`` lower inside a kernel (and is it one
    convert or an f32 round-trip — timed separately in exp_int4_kernel)?
 3. Do static 64-row slices of a decoded VMEM value feed jnp.dot cleanly?

Run:  PYTHONPATH=/root/repo python tools/exp_int4_kernel_probe.py
"""
import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, N = 8, 128


def probe_bitcast():
    def kern(p_ref, o_ref):
        o_ref[:] = pltpu.bitcast(p_ref[:], jnp.bfloat16)

    # word[r, c] = low16 = 4r, high16 = 4r+2  (distinct, identifiable)
    lo = (4 * np.arange(R, dtype=np.uint32))[:, None] * np.ones((1, N), np.uint32)
    hi = lo + 2
    words = (lo | (hi << 16)).astype(np.uint32).view(np.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2 * R, N), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(words))
    o16 = np.asarray(out).view(np.uint16)  # bf16 bit patterns
    col0 = o16[:, 0]
    print("bitcast i32->bf16 OK; rows (col 0 bit patterns):", col0.tolist())
    # classify
    expect_lo_even = all(col0[2 * r] == 4 * r and col0[2 * r + 1] == 4 * r + 2
                         for r in range(R))
    expect_hi_even = all(col0[2 * r] == 4 * r + 2 and col0[2 * r + 1] == 4 * r
                         for r in range(R))
    # block order: first R rows = all low halves, next R = all high halves
    expect_block = all(col0[r] == 4 * r for r in range(R)) and \
        all(col0[R + r] == 4 * r + 2 for r in range(R))
    print(f"  interleaved(lo at even row): {expect_lo_even}")
    print(f"  interleaved(hi at even row): {expect_hi_even}")
    print(f"  block (lo rows then hi rows): {expect_block}")


def probe_astype():
    def kern(p_ref, o_ref):
        o_ref[:] = p_ref[:].astype(jnp.bfloat16)

    vals = np.arange(R * N, dtype=np.int32).reshape(R, N) % 16
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(vals))
    ok = np.allclose(np.asarray(out, np.float32), vals.astype(np.float32))
    print(f"astype i32->bf16 OK, values exact: {ok}")


def probe_block_dot():
    M, K, TN = 8, 128, 256

    def kern(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, TN), jnp.float32)
        for b in range(K // 64):
            xb = x_ref[:, 64 * b:64 * (b + 1)]
            wb = w_ref[64 * b:64 * (b + 1), :]
            acc += jnp.dot(xb, wb, preferred_element_type=jnp.float32)
        o_ref[:] = acc

    rng = np.random.default_rng(0)
    x = rng.normal(size=(M, K)).astype(ml_dtypes.bfloat16)
    w = rng.normal(size=(K, TN)).astype(ml_dtypes.bfloat16)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x), jnp.asarray(w))
    ref = x.astype(np.float32) @ w.astype(np.float32)
    err = np.max(np.abs(np.asarray(out) - ref))
    print(f"64-row block dots OK, max err {err:.4f}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for name, fn in [("block_dot", probe_block_dot),
                     ("astype", probe_astype),
                     ("bitcast", probe_bitcast)]:
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}")
