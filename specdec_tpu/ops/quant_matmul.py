"""Fused dequant + matmul Pallas TPU kernels for weight-only INT8 / NF4.

This is the TPU-native replacement for the bitsandbytes CUDA kernels the
reference declares but never enables (SURVEY.md §2, §7.4). The point of fusing:
weight-only quantization is a *bandwidth* optimization — the win only exists if
the int8/nf4 bytes are what crosses HBM, with dequantization happening in VMEM
on the way into the MXU. XLA cannot be relied on to fuse dequant into a dot
operand (it may materialize the dequantized matrix), so the hot path is a
hand-written kernel:

- grid (N-tiles, K-tiles), K innermost; f32 accumulator in VMEM scratch
- INT8: int8 tile → bf16 in VMEM → MXU dot → scale applied once at the last
  K step (per-output-channel scale factors out of the reduction)
- 4-bit (NF4/FP4/INT4): int32 words of 8 nibbles along K (quant/core.py
  ``_pack_nibbles``) → 8 native 32-bit shift+mask extractions per word →
  codec decode (select tree / bit assembly / subtract) → blockwise absmax
  scaling (inside the reduction — absmax varies along K) → 8 MXU dots
  against the activation pre-split 8 ways (x[:, j::8]) outside the kernel.
  Round 1 stored nibbles in uint8 pairs; Mosaic emulates sub-word int
  vectors, which made the u8→i32 unpack the measured bottleneck
  (108-122 tok/s). The int32-word pipeline keeps every decode op in native
  32-bit lanes.

Non-TPU backends (tests, CPU mesh) fall back to XLA dequant-then-matmul, which
doubles as the correctness oracle.
"""
from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from specdec_tpu.quant.core import (
    NF4_BLOCK, FP4Weight, Int4Weight, Int8Weight, NF4Weight, _fp4_decode,
    _fp4_decode_bits, _int4_decode, _nf4_decode, _nf4_decode_bits, dequantize,
)

# 4-bit codec name -> in-kernel nibble decode fn. "fp4" uses the f32
# bit-assembly decode (_fp4_decode_bits) — chip-raced against the select
# chain; "fp4_sel" keeps the select-chain variant for A/B measurement.
# "nf4" likewise defaults to the packed bf16-word assembly
# (_nf4_decode_bits, 7 selects); "nf4_sel" keeps the full 15-select
# codebook tree (exact f32 constants) for A/B and for callers that need
# bit-identical agreement with the XLA dequantize() oracle.
_DECODERS = {
    "nf4": _nf4_decode_bits,
    "nf4_sel": _nf4_decode,
    "fp4": _fp4_decode_bits,
    "fp4_sel": _fp4_decode,
    "int4": _int4_decode,
}


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# INT8
# ---------------------------------------------------------------------------

def _int8_kernel(x_ref, q_ref, scale_ref, out_ref, acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16),
                          q_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k"))
def _int8_matmul_2d(x: jax.Array, q: jax.Array, scale: jax.Array,
                    tile_n: int = 512, tile_k: int = 512) -> jax.Array:
    M, K = x.shape
    Kq, N = q.shape
    Mp = max(8, ((M + 7) // 8) * 8)
    x = _pad_to(_pad_to(x, 0, Mp), 1, tile_k)
    q = _pad_to(_pad_to(q, 0, tile_k), 1, tile_n)
    scale = _pad_to(scale, 1, tile_n)
    Kp, Np = q.shape

    grid = (Np // tile_n, Kp // tile_k)
    out = pl.pallas_call(
        _int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, tile_k), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tile_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Mp, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np,
            bytes_accessed=Mp * Kp * 2 + Kp * Np + Mp * Np * 2,
            transcendentals=0),
    )(x[:Mp], q, scale)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# NF4
# ---------------------------------------------------------------------------

def _nf4_kernel(xs_ref, p_ref, am_ref, out_ref, acc_ref,
                *, decode=_nf4_decode):
    """int32-word 4-bit dequant+matmul tile.

    p_ref holds native 32-bit words of 8 nibbles each (quant/core.py
    ``_pack_nibbles``); the whole decode pipeline is 32-bit vector shifts,
    masks and converts — no uint8 loads anywhere, which round 1 measured as
    the 4-bit bottleneck (Mosaic emulates sub-word int vectors). The
    activation arrives pre-split 8 ways (xs_ref[j] = x[:, j::8]) so nibble j
    of word r multiplies x column 8r+j with no in-kernel interleave."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = p_ref[:]                                           # [TK8, TN] i32
    # absmax rows cover 64 real k's = 8 packed words → element-repeat rows via
    # broadcast+reshape (pltpu.repeat is tile-semantics, NOT element-repeat)
    rep = p_ref.shape[0] // am_ref.shape[0]
    am = am_ref[:]
    am = jnp.broadcast_to(am[:, None, :], (am.shape[0], rep, am.shape[1]))
    am = am.reshape(p_ref.shape[0], am_ref.shape[1])            # [TK8, TN]
    for j in range(8):
        nib = (packed >> (4 * j)) & 0xF
        w = (decode(nib) * am).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(xs_ref[j].astype(jnp.bfloat16), w,
                              preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "codec"))
def _nf4_matmul_2d(x: jax.Array, packed: jax.Array, absmax: jax.Array,
                   tile_n: int = 512, tile_k: int = 1024,
                   codec: str = "nf4") -> jax.Array:
    """x: [M, K]; packed: [K/8, N] int32 nibble words; absmax: [K/64, N] f32.

    tile_k must be >= 8*NF4_BLOCK: the absmax tile's sublane dimension is
    tile_k/64 and Mosaic requires sublane counts divisible by 8 (caught by
    real-TPU lowering; interpret mode does not enforce it)."""
    M, K = x.shape
    K8, N = packed.shape
    assert K == K8 * 8 and K % NF4_BLOCK == 0
    assert tile_k % NF4_BLOCK == 0
    assert tile_k >= 8 * NF4_BLOCK, (
        f"tile_k={tile_k} gives absmax sublane {tile_k // NF4_BLOCK} < 8")
    tk8 = tile_k // 8

    Mp = max(8, ((M + 7) // 8) * 8)
    packed = _pad_to(_pad_to(packed, 0, tk8), 1, tile_n)
    absmax = _pad_to(_pad_to(absmax, 0, tile_k // NF4_BLOCK), 1, tile_n)
    K8p, Np = packed.shape
    # activation split: xs[j] = x[:, j::8], zero-padded to the padded K grid
    x = _pad_to(_pad_to(x, 0, Mp), 1, K8p * 8)[:Mp]
    xs = x.reshape(Mp, K8p, 8).transpose(2, 0, 1)               # [8, Mp, K8p]

    grid = (Np // tile_n, K8p // tk8)
    out = pl.pallas_call(
        functools.partial(_nf4_kernel, decode=_DECODERS[codec]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, Mp, tk8), lambda n, k: (0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk8, tile_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // NF4_BLOCK, tile_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tile_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Mp, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * (K8p * 8) * Np,
            bytes_accessed=Mp * K8p * 8 * 2 + K8p * Np * 4 + Mp * Np * 2,
            transcendentals=0),
    )(xs, packed, absmax)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def _use_pallas(w) -> bool:
    """Measured policy (docs/BENCHMARKS.md): XLA fuses the int8->bf16 convert
    into the dot and avoids per-custom-call overhead (488 vs 327 tok/s on the
    1.1B model), so INT8 defaults to the XLA path; XLA MATERIALIZES 4-bit
    dequant (32 vs 122 tok/s), so NF4/FP4 default to the Pallas kernel.
    SPECDEC_QUANT_KERNEL=pallas|xla forces one path for everything."""
    import os
    mode = os.getenv("SPECDEC_QUANT_KERNEL", "auto").lower()
    if mode == "xla":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        return False
    if mode == "pallas":
        return on_tpu
    return on_tpu and not isinstance(w, Int8Weight)


def quant_matmul(x: jax.Array,
                 w: Union[Int8Weight, NF4Weight, FP4Weight, Int4Weight],
                 ) -> jax.Array:
    """x @ w for a quantized weight; x: [..., K] any float dtype.

    Fused Pallas kernel on TPU, XLA dequant fallback elsewhere. Output dtype
    follows x.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if _use_pallas(w):
        if isinstance(w, Int8Weight):
            out = _int8_matmul_2d(x2, w.q, w.scale)
        else:
            codec = ("fp4" if isinstance(w, FP4Weight)
                     else "int4" if isinstance(w, Int4Weight) else "nf4")
            out = _nf4_matmul_2d(x2, w.packed, w.absmax, codec=codec)
        out = out.astype(x.dtype)
    else:
        # XLA path: dequantize in the weight's natural compute dtype and let
        # XLA fuse the convert into the dot where it can (also the oracle)
        wd = dequantize(w, jnp.bfloat16 if x.dtype == jnp.bfloat16
                        else jnp.float32)
        out = (x2 @ wd).astype(x.dtype)
    return out.reshape(*lead, out.shape[-1])
