"""Fused dequant + matmul Pallas TPU kernels for weight-only INT8 / 4-bit.

This is the TPU-native replacement for the bitsandbytes CUDA kernels the
reference declares but never enables (SURVEY.md §2, §7.4; ref:
engine/model_loader.py:83,106). The point of fusing: weight-only quantization
is a *bandwidth* optimization — the win only exists if the int8/int4 bytes are
what crosses HBM, with dequantization happening in VMEM on the way into the
MXU. XLA materializes 4-bit dequant (measured 32 vs 122 tok/s in round 1), so
the 4-bit hot path is a hand-written kernel.

4-bit kernel design (round 4 — took the INT4 path from ~380 to ~550+ GB/s
effective; VERDICT r3 #1):

- storage is the PAIR4 int32-word layout (quant/core.py ``_pack_nibbles``):
  word r bits [4p+16h, +4) hold the code for k = p*(K/4) + 2r + h
- INT4 decode costs ~1.5 VPU ops per weight: one shift+mask grabs TWO
  nibbles ((word >> 4p) & 0x000F000F), OR 0x4300_4300 assembles two bf16
  "128 + nib" values in one 32-bit lane, and ``pltpu.bitcast`` splits them
  into k-contiguous bf16 rows (chip-probed: low half lands at even rows —
  tools/exp_bitcast_probe.py); one bf16 subtract of 136 yields (nib - 8)
- the blockwise absmax is factored OUT of the per-weight path: dots run per
  64-row block ([Mp, 64] x [64, TN] on the MXU) and the scale multiplies the
  [Mp, TN] f32 partial — Mp/64 of the per-weight cost
- tiles default to tile_n=1024, tile_k=2048 where shapes allow (measured:
  the 8B matmul-only forward went 10.45 ms → 6.6 ms over the round-3 kernel
  at tile 512/1024; tools/exp_int4_kernel.py holds the full variant race)
- NF4/FP4 keep their codebook/bit-assembly decodes (inherently per-nibble —
  a select tree can't process two independent halves of a lane at once), run
  per half-plane (p, h) against stride-2 activation splits prepared outside

INT8: int8 tile → bf16 in VMEM → MXU dot → per-output-channel scale applied
once at the last K step. (On TPU the INT8 *default* path is XLA — it fuses
the convert into the dot and wins on launch overhead; see ``_use_pallas``.)

Non-TPU backends (tests, CPU mesh) fall back to XLA dequant-then-matmul,
which doubles as the correctness oracle; interpret-mode tests run these
kernels on CPU (tests/test_quant.py).
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

# 4-bit codec name -> per-nibble decode fn for the half-plane kernel.
# "nf4" uses the packed bf16-word assembly (7 selects, round-3 A/B winner);
# "*_sel" keep the full select-chain variants for A/B and bit-exact-oracle
# callers. "int4" decodes via the pair kernel instead (see _pair_kernel) —
# its entry here serves the halfplane path only when forced.
_DECODERS = {
    "nf4": _nf4_decode_bits,
    "nf4_sel": _nf4_decode,
    "fp4": _fp4_decode_bits,
    "fp4_sel": _fp4_decode,
    "int4": _int4_decode,
}


# Grid semantics for every (n, k) matmul grid here: output stripes along n
# are independent ("parallel"), k carries the accumulator ("arbitrary").
# Declaring this lets Mosaic pipeline stripes more aggressively — measured
# round 5 (tools/exp_int4_kernel.py race, M=8 decode shapes): wo 468 -> 646
# GB/s, gateup 544 -> 588, qkv 486 -> 504; neutral at M=12.
_NK_PARALLEL = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"))


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
    # Same scoped-VMEM discipline as the 4-bit kernels (VERDICT r4 #1):
    # x/out/scratch blocks scale with Mp, so chunk very long prefills.
    i8_bytes = (2 * (Mp * tile_k * 2 + tile_k * tile_n + tile_n * 4
                     + Mp * tile_n * 2) + Mp * tile_n * 4)
    if i8_bytes > _VMEM_BUDGET:
        fixed = 2 * (tile_k * tile_n + tile_n * 4)
        rows = max(8, int((_VMEM_BUDGET - fixed)
                          // (4 * tile_k + 8 * tile_n)) // 8 * 8)
        if Mp > rows:
            outs = [_int8_matmul_2d(x[i:i + rows], q, scale,
                                    tile_n=tile_n, tile_k=tile_k)
                    for i in range(0, M, rows)]
            return jnp.concatenate(outs, axis=0)
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
        compiler_params=_NK_PARALLEL,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np,
            bytes_accessed=Mp * Kp * 2 + Kp * Np + Mp * Np * 2,
            transcendentals=0),
    )(x[:Mp], q, scale)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# 4-bit (pair4 layout)
# ---------------------------------------------------------------------------

def _pair_tile(packed, get_x, get_am, acc_ref):
    """Shared INT4 pair-decode tile body: packed [tk8, TN] pair4 words,
    get_x(p) -> [Mp, 2*tk8] activation quarter, get_am(b, p) -> [TN]."""
    tk8, TN = packed.shape
    nb2 = 2 * (tk8 // NF4_BLOCK)
    for p in range(4):
        t = ((packed >> (4 * p)) & 0x000F000F) | 0x43004300
        w = pltpu.bitcast(t, jnp.bfloat16) - jnp.bfloat16(136.0)  # nib - 8
        xp = get_x(p)
        for b in range(nb2):
            pb = jnp.dot(xp[:, NF4_BLOCK * b:NF4_BLOCK * (b + 1)],
                         w[NF4_BLOCK * b:NF4_BLOCK * (b + 1), :],
                         preferred_element_type=jnp.float32)
            acc_ref[:] += pb * get_am(b, p)[None, :]


def _halfplane_tile(packed, get_x, am_quarter, acc_ref, decode):
    """Shared NF4/FP4 tile body: per half-plane (p, h) codebook decode with
    per-weight scale; get_x(j) -> [Mp, tk8] stride-2 split, am_quarter(p) ->
    [2*nb, TN] block scales of quarter p."""
    tk8, TN = packed.shape
    nb2 = 2 * (tk8 // NF4_BLOCK)
    for p in range(4):
        # within half-plane (p, h), word row w sits in absmax block w // 32
        # (64 consecutive k = 32 words of both halves)
        amq = am_quarter(p)                                # [2*nb, TN]
        am = jnp.broadcast_to(amq[:, None, :], (nb2, NF4_BLOCK // 2, TN))
        am = am.reshape(tk8, TN)
        for h in range(2):
            nib = (packed >> (4 * p + 16 * h)) & 0xF
            w = (decode(nib) * am).astype(jnp.bfloat16)
            acc_ref[:] += jnp.dot(get_x(2 * p + h), w,
                                  preferred_element_type=jnp.float32)


def _pair_kernel(xq_ref, p_ref, am_ref, out_ref, acc_ref):
    """INT4 pairwise bf16-assembly tile (see module docstring).

    xq_ref: [4, Mp, 2*tk8] bf16 — activation quarter-planes (xq[p] covers
            k in [p*K/4, (p+1)*K/4), already k-ordered);
    p_ref:  [tk8, TN] int32 pair4 words;
    am_ref: [2*nb, 4, TN] f32 — blockwise absmax, BLOCK-MAJOR with the full
            quarter-plane count in the sublane dim (Mosaic's block tiling
            constraint rejects a small-sublane [4, nb, TN] layout)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _pair_tile(p_ref[:], lambda p: xq_ref[p],
               lambda b, p: am_ref[b, p, :], acc_ref)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pair_kernel_stacked(idx_ref, xq_ref, p_ref, am_ref, out_ref, acc_ref):
    """_pair_kernel over the FULL layer stack: p_ref/am_ref blocks carry a
    leading (1,) layer dim selected by the scalar-prefetched index maps —
    the kernel reads the layer\'s tiles straight out of the stacked HBM
    arrays. This kills the lax.scan dynamic-slice materialization
    (profiled: copying each layer\'s packed weights into the custom call
    cost ~0.85 ms/token at 1.1B, ~4.7 ms at 8B — comparable to the matmul
    time itself; tools/exp_profile_ar.py)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _pair_tile(p_ref[0], lambda p: xq_ref[p],
               lambda b, p: am_ref[0, b, p, :], acc_ref)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _halfplane_kernel(xh_ref, p_ref, am_ref, out_ref, acc_ref,
                      *, decode=_nf4_decode_bits):
    """Codebook-decode tile for NF4/FP4 on the pair4 layout.

    Half-plane (p, h) of a word tile holds k = p*K/4 + 2r + h: decode its
    nibbles ((word >> (4p+16h)) & 0xF), scale per weight (the select-tree
    decodes return f32 values that still need the blockwise absmax), and dot
    against the matching stride-2 activation split xh_ref[2p+h]."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _halfplane_tile(p_ref[:], lambda j: xh_ref[j],
                    lambda p: am_ref[:, p, :], acc_ref, decode)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _halfplane_kernel_stacked(idx_ref, xh_ref, p_ref, am_ref, out_ref,
                              acc_ref, *, decode=_nf4_decode_bits):
    """_halfplane_kernel over the full layer stack (see
    _pair_kernel_stacked)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _halfplane_tile(p_ref[0], lambda j: xh_ref[j],
                    lambda p: am_ref[0, :, p, :], acc_ref, decode)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# Scoped-VMEM budget for tile/chunk planning. The v5e scoped-vmem limit is
# 16 MiB — measured the hard way: the round-4 stacked kernel compiled its
# Mp=1024 8B prefill instance to "18.12M and limit 16.00M" and died
# (VERDICT r4 #1, /tmp/r4logs/tree_8b.log). Mosaic double-buffers every
# grid-varying in/out block, so the model below charges those twice and the
# scratch accumulator once; on the failing shape it predicts 18.1M — within
# 0.1% of the compiler's number. 14 MiB of the 16 leaves headroom for
# Mosaic's own stack temporaries and keeps the plan robust to small
# layout-padding effects.
_VMEM_BUDGET = 14 * 1024 * 1024


def _q4_vmem_bytes(Mp: int, tile_n: int, tile_k: int,
                   am_bytes: int = 2) -> int:
    """Scoped-VMEM bytes for one pair4/halfplane kernel instance.

    Blocks: activations [4, Mp, tile_k/4] (or the stride-2 [8, Mp, tile_k/8]
    — same byte count) bf16; packed words [tile_k/8, tile_n] int32; absmax
    [nb2, 4, tile_n] bf16; out [Mp, tile_n] bf16; f32 accumulator scratch.
    Everything but the scratch is double-buffered by Mosaic."""
    tk8 = tile_k // 8
    nb2 = 2 * (tk8 // NF4_BLOCK)
    xs = Mp * tile_k * 2
    packed = tk8 * tile_n * 4
    am = nb2 * 4 * tile_n * am_bytes
    out = Mp * tile_n * 2
    scratch = Mp * tile_n * 4
    return 2 * (xs + packed + am + out) + scratch


def _q4_chunk_rows(Mp: int, tile_n: int, tile_k: int,
                   am_bytes: int = 2) -> int:
    """Largest row count (multiple of 8) whose blocks fit the VMEM budget at
    the given tiles; == Mp when no chunking is needed."""
    if _q4_vmem_bytes(Mp, tile_n, tile_k, am_bytes) <= _VMEM_BUDGET:
        return Mp
    tk8 = tile_k // 8
    nb2 = 2 * (tk8 // NF4_BLOCK)
    fixed = 2 * (tk8 * tile_n * 4 + nb2 * 4 * tile_n * am_bytes)
    per_row = 4 * tile_k + 8 * tile_n   # 2*(2B x) + 2*(2B out) + 4B scratch
    rows = (_VMEM_BUDGET - fixed) // per_row
    return max(8, int(rows) // 8 * 8)


def _fit_tiles(Mp: int, K: int, N: int, exact_n: bool) -> tuple:
    """Measured tile policy, now VMEM-budget-aware (VERDICT r4 #1).

    Wider tiles lengthen the per-row HBM runs and amortize per-instance
    overhead — tile_n 512→1024 and tile_k 1024→2048 each bought 10-25% at 8B
    shapes (tools/exp_int4_kernel.py run 3-5) — so prefer the widest pair
    whose blocks FIT the scoped-VMEM budget at this Mp. Decode shapes
    (Mp ≤ ~64) always take the round-4 winners (2048, 1024); long-prompt
    prefill (the shape that OOM'd) walks down to tiles that fit, and
    ``_q4_chunk_rows`` splits M as the last resort. Prefill is one-shot, so
    narrower tiles / an extra weight stream there cost nothing off the
    steady-state decode path.

    K must tile EXACTLY: the pair4 quarter-plane boundaries sit at K/4 of
    the ORIGINAL K, so zero-padding the word rows would shear the kernel's
    (xq quarter, absmax quarter) split off the packing's. N-padding only
    appends columns and stays exact — allowed up to ~6% waste on the 2D
    path (padding is real HBM traffic: zero words still stream); the
    stacked path (exact_n=True) never pads (it would copy the whole layer
    stack).

    Returns (tile_n, tile_k, rows); (None, None, None) if N is untileable
    under exact_n (caller falls back to the 2D / XLA path)."""
    ks = [t for t in (2048, 1024, 512) if K % t == 0]
    if not ks:
        return None, None, None
    if N < 256 and not exact_n:
        ns = [128]
    else:
        ns = [t for t in (1024, 512, 256, 128)
              if N % t == 0 or (not exact_n and t >= 256
                                and ((-N) % t) / N <= 0.06)]
    if not ns:
        return None, None, None
    for tk in ks:
        for tn in ns:
            if _q4_vmem_bytes(Mp, tn, tk) <= _VMEM_BUDGET:
                return tn, tk, Mp
    tn, tk = ns[-1], ks[-1]
    return tn, tk, _q4_chunk_rows(Mp, tn, tk)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "codec"))
def _nf4_matmul_2d(x: jax.Array, packed: jax.Array, absmax: jax.Array,
                   tile_n: int = 0, tile_k: int = 0,
                   codec: str = "nf4") -> jax.Array:
    """x: [M, K]; packed: [K/8, N] int32 pair4 words; absmax: [K/64, N] f32.

    tile_n/tile_k = 0 means the measured ``_fit_tiles`` policy. Requires
    K % 512 == 0 (the quarter-planes must align to absmax blocks AND tile
    exactly — see _fit_tiles) — ``quant_matmul`` falls back to the XLA path
    for other shapes. Large M (long-prompt prefill / wide tree verify) is
    split into row chunks that fit the scoped-VMEM budget (VERDICT r4 #1);
    the reference handles arbitrary prompt lengths up to
    max_position_embeddings (ref: sampling/speculative_decoding.py:77), so
    this path must too."""
    M, K = x.shape
    K8, N = packed.shape
    assert K == K8 * 8 and K % (8 * NF4_BLOCK) == 0, (
        f"pair4 kernel needs K % 512 == 0, got K={K}")
    Mp = max(8, ((M + 7) // 8) * 8)
    if not tile_n or not tile_k:
        tile_n, tile_k, _ = _fit_tiles(Mp, K, N, exact_n=False)
    assert tile_k % (8 * NF4_BLOCK) == 0 and K % tile_k == 0, (
        f"tile_k={tile_k} must divide K={K} and be a multiple of 512")
    rows = _q4_chunk_rows(Mp, tile_n, tile_k)
    if Mp > rows:
        outs = [_nf4_matmul_2d(x[i:i + rows], packed, absmax,
                               tile_n=tile_n, tile_k=tile_k, codec=codec)
                for i in range(0, M, rows)]
        return jnp.concatenate(outs, axis=0)
    tk8 = tile_k // 8
    nb2 = 2 * (tk8 // NF4_BLOCK)

    packed = _pad_to(packed, 1, tile_n)
    absmax = _pad_to(absmax, 1, tile_n)
    K8p, Np = packed.shape
    xp = _pad_to(x, 0, Mp)[:Mp].astype(jnp.bfloat16)

    # absmax is STORED block-major, quarter-minor (quant/core._am_pack), so
    # the kernel view is a free leading-dim reshape — a per-call transpose
    # of the full f32 absmax cost ~470 MB/forward of copy traffic at 8B
    am = absmax.reshape(K // (4 * NF4_BLOCK), 4, Np)

    if codec == "int4":
        kfn = _pair_kernel
        xs = xp.reshape(Mp, 4, 2 * K8).transpose(1, 0, 2)   # [4, Mp, K/4]
        xs_spec = pl.BlockSpec((4, Mp, 2 * tk8), lambda n, k: (0, 0, k),
                               memory_space=pltpu.VMEM)
    else:
        kfn = functools.partial(_halfplane_kernel, decode=_DECODERS[codec])
        # stride-2 splits: xs[2p+h] = x[:, p*K/4 + h :: 2]
        xs = xp.reshape(Mp, 4, K8, 2).transpose(1, 3, 0, 2)
        xs = xs.reshape(8, Mp, K8)
        xs_spec = pl.BlockSpec((8, Mp, tk8), lambda n, k: (0, 0, k),
                               memory_space=pltpu.VMEM)

    grid = (Np // tile_n, K8 // tk8)
    out = pl.pallas_call(
        kfn,
        grid=grid,
        in_specs=[
            xs_spec,
            pl.BlockSpec((tk8, tile_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb2, 4, tile_n), lambda n, k: (k, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tile_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Mp, tile_n), jnp.float32)],
        compiler_params=_NK_PARALLEL,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * Np,
            bytes_accessed=Mp * K * 2 + K8 * Np * 4 + Mp * Np * 2,
            transcendentals=0),
    )(xs, packed, am)
    return out[:M, :N]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "codec"))
def _q4_matmul_stacked(x: jax.Array, packed: jax.Array, absmax: jax.Array,
                       idx: jax.Array, tile_n: int, tile_k: int,
                       codec: str = "int4") -> jax.Array:
    """One layer\'s x @ w4 read DIRECTLY from the stacked containers.

    packed: [L, K/8, N] pair4 words; absmax: [L, K/64, N] stored block-major;
    idx: int32 layer index. The layer never exists as its own buffer: the
    scalar-prefetched index maps point every weight/scale tile at layer
    ``idx`` of the stacked HBM arrays (the same mechanism the paged-
    attention kernel uses for page tables). Requires exact tiling (no
    padding — padding would copy the whole stack); quant_matmul_stacked
    gates shapes. Large M is split into scoped-VMEM-sized row chunks —
    round 4 shipped this kernel without the guard and an Mp=1024 8B
    prefill died at compile (18.12M vs the 16M scoped-vmem limit,
    VERDICT r4 #1)."""
    M, K = x.shape
    L, K8, N = packed.shape
    assert K == K8 * 8 and K % tile_k == 0 and N % tile_n == 0
    Mp = max(8, ((M + 7) // 8) * 8)
    rows = _q4_chunk_rows(Mp, tile_n, tile_k)
    if Mp > rows:
        outs = [_q4_matmul_stacked(x[i:i + rows], packed, absmax, idx,
                                   tile_n=tile_n, tile_k=tile_k, codec=codec)
                for i in range(0, M, rows)]
        return jnp.concatenate(outs, axis=0)
    tk8 = tile_k // 8
    nb2 = 2 * (tk8 // NF4_BLOCK)
    B4 = K // (4 * NF4_BLOCK)

    xp = _pad_to(x, 0, Mp)[:Mp].astype(jnp.bfloat16)
    am = absmax.reshape(L, B4, 4, N)

    if codec == "int4":
        kfn = _pair_kernel_stacked
        xs = xp.reshape(Mp, 4, 2 * K8).transpose(1, 0, 2)   # [4, Mp, K/4]
        xs_spec = pl.BlockSpec((4, Mp, 2 * tk8), lambda n, k, s: (0, 0, k),
                               memory_space=pltpu.VMEM)
    else:
        kfn = functools.partial(_halfplane_kernel_stacked,
                                decode=_DECODERS[codec])
        xs = xp.reshape(Mp, 4, K8, 2).transpose(1, 3, 0, 2).reshape(8, Mp, K8)
        xs_spec = pl.BlockSpec((8, Mp, tk8), lambda n, k, s: (0, 0, k),
                               memory_space=pltpu.VMEM)

    # index maps receive (grid indices..., scalar-prefetch refs) — grid
    # FIRST, scalars LAST (same convention as ops/paged_attention.py)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // tile_n, K8 // tk8),
        in_specs=[
            xs_spec,
            pl.BlockSpec((1, tk8, tile_n), lambda n, k, s: (s[0], k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb2, 4, tile_n), lambda n, k, s: (s[0], k, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tile_n), lambda n, k, s: (0, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Mp, tile_n), jnp.float32)],
    )
    out = pl.pallas_call(
        kfn,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        compiler_params=_NK_PARALLEL,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K8 * N * 4 + Mp * N * 2,
            transcendentals=0),
    )(jnp.asarray(idx, jnp.int32).reshape(1), xs, packed, am)
    return out[:M]


def quant_matmul_stacked(x: jax.Array, w, idx: jax.Array) -> jax.Array:
    """x @ w[idx] for a STACKED 4-bit container (leaves [L, ...]) without
    materializing the layer (see _q4_matmul_stacked). Falls back to a
    dynamic-slice + the 2D path off-TPU or for shapes the stacked kernel
    can\'t tile exactly. Tile selection is VMEM-budget-aware (large M
    shrinks tiles before the kernel chunks rows — VERDICT r4 #1)."""
    from specdec_tpu.quant.core import FP4Weight, Int4Weight

    lead = x.shape[:-1]
    K = x.shape[-1]
    L, K8, N = w.packed.shape
    M = 1
    for d in lead:
        M *= d
    Mp = max(8, ((M + 7) // 8) * 8)
    tile_n, tile_k, _ = _fit_tiles(Mp, K, N, exact_n=True)
    if (_use_pallas(w) and K % (8 * NF4_BLOCK) == 0
            and tile_n is not None and tile_k is not None):
        codec = ("fp4" if isinstance(w, FP4Weight)
                 else "int4" if isinstance(w, Int4Weight) else "nf4")
        out = _q4_matmul_stacked(x.reshape(-1, K), w.packed, w.absmax,
                                 idx, tile_n, tile_k, codec=codec)
        return out.astype(x.dtype).reshape(*lead, N)
    wl = type(w)(packed=w.packed[idx], absmax=w.absmax[idx])
    return quant_matmul(x, wl)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def _use_pallas(w) -> bool:
    """Measured policy (docs/BENCHMARKS.md): XLA fuses the int8->bf16 convert
    into the dot and avoids per-custom-call overhead (488 vs 327 tok/s on the
    1.1B model), so INT8 defaults to the XLA path; XLA MATERIALIZES 4-bit
    dequant (32 vs 122 tok/s), so NF4/FP4/INT4 default to the Pallas kernel.
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

    Fused Pallas kernel on TPU, XLA dequant fallback elsewhere (and for
    4-bit shapes with K % 256 != 0, which the pair4 kernel can't tile).
    Output dtype follows x.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    use_pallas = _use_pallas(w)
    # the pair4 kernel needs K % 512 == 0 (quarter-planes must align to
    # absmax blocks); the old % 256 gate let K=768-style shapes through to
    # the kernel's assert instead of the XLA fallback
    if use_pallas and not isinstance(w, Int8Weight) and K % 512 != 0:
        use_pallas = False
    if use_pallas:
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
