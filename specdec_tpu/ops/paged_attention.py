"""Paged attention Pallas kernel: flash-decode over page-table-indirected KV.

The TPU-native equivalent of vLLM's PagedAttention CUDA kernel (SURVEY.md
§7.4). Identical math to ops/decode_attention.py (online softmax, GQA folded
into the MXU row axis, key-position <= query-position masking), but K/V tiles
are fetched straight from the page *pool*: the per-sequence page table is a
scalar-prefetch operand, so each grid step's BlockSpec index map picks the
physical page to DMA — no gather materialization of the sequence's KV in HBM.

Tile size = page size (pages are the natural DMA unit). Logical pages past a
sequence's length fetch pool page table[b, p] (whatever it is) and are fully
masked out by position arithmetic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(tbl_ref, off_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
            acc_ref, *, G: int, page: int, T: int, scale: float):
    b = pl.program_id(0)
    p = pl.program_id(2)
    np_ = pl.num_programs(2)
    # last logical page holding any live key: the max query position is
    # offsets[b] + T - 1. Pages past it are skipped (the index_map clamps to
    # this page so their DMAs re-fetch the same block, which the pipeline
    # elides) — per-step cost tracks live length, not max_pages_per_seq.
    last = (off_ref[b] + (T - 1)) // page

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(p <= last)
    def _():
        q = q_ref[0, 0]                      # [TGp, Dh]
        k = k_ref[0, 0]                      # [page, Dh]
        v = v_ref[0, 0]

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [TGp, page]

        TGp = q.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (TGp, page), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TGp, page), 1)
        q_pos = off_ref[b] + row // G
        k_pos = p * page + col
        scores = jnp.where(k_pos <= q_pos, scores, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        pr = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(pr, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pr.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(p == np_ - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-38)
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_kv_heads",))
def paged_decode_attention(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                           page_table: jax.Array, offsets: jax.Array,
                           num_kv_heads: int) -> jax.Array:
    """q: [B, T, Hq, Dh]; pools: [num_pages, Hk, page, Dh] (head-major so
    each (page, head) block is contiguous in its trailing (page, Dh) dims —
    the layout Mosaic can tile; see PagedKVCache docstring);
    page_table: [B, MP] int32; offsets: [B]. Returns [B, T, Hq, Dh]."""
    B, T, Hq, Dh = q.shape
    page = k_pool.shape[2]
    Hk = num_kv_heads
    G = Hq // Hk
    TG = T * G
    TGp = max(8, ((TG + 7) // 8) * 8)
    MP = page_table.shape[1]
    scale = 1.0 / (Dh ** 0.5)

    qr = q.reshape(B, T, Hk, G, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, Hk, TG, Dh)
    if TGp != TG:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, TGp - TG), (0, 0)))

    # logical pages past the last live one clamp to it: same physical block,
    # so the pipeline elides the DMA and the kernel's pl.when skips compute
    def _kv_index(b, h, p, tbl, off):
        last = (off[b] + (T - 1)) // page
        return (tbl[b, jnp.minimum(p, last)], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hk, MP),
        in_specs=[
            pl.BlockSpec((1, 1, TGp, Dh),
                         lambda b, h, p, tbl, off: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page, Dh), _kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page, Dh), _kv_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TGp, Dh),
                               lambda b, h, p, tbl, off: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TGp, 1), jnp.float32),
            pltpu.VMEM((TGp, 1), jnp.float32),
            pltpu.VMEM((TGp, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, G=G, page=page, T=T, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, TGp, Dh), q.dtype),
    )(page_table.astype(jnp.int32), offsets.astype(jnp.int32),
      qr, k_pool, v_pool)

    out = out[:, :, :TG].reshape(B, Hk, T, G, Dh).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, Hq, Dh)


def _kernel_quant(tbl_ref, off_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                  o_ref, m_ref, l_ref, acc_ref, *, G: int, page: int, T: int,
                  scale: float):
    """INT8-pool variant: K/V tiles arrive int8 with per-(position, head) f32
    scales; k-scales multiply the scores after the q·k dot and v-scales fold
    into the probabilities — the same scale-after-dot order as the XLA path
    (core/model.py::_attention), so no dequantized tile is materialized."""
    b = pl.program_id(0)
    p = pl.program_id(2)
    np_ = pl.num_programs(2)
    last = (off_ref[b] + (T - 1)) // page

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(p <= last)
    def _():
        q = q_ref[0, 0]                          # [TGp, Dh]
        k = k_ref[0, 0].astype(q.dtype)          # [page, Dh] int8 -> compute
        v = v_ref[0, 0].astype(q.dtype)
        ks = ks_ref[0, 0, 0]                     # [page] f32
        vs = vs_ref[0, 0, 0]

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [TGp, page]
        scores = scores * ks[None, :]

        TGp = q.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (TGp, page), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TGp, page), 1)
        q_pos = off_ref[b] + row // G
        k_pos = p * page + col
        scores = jnp.where(k_pos <= q_pos, scores, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        pr = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(pr, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            (pr * vs[None, :]).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(p == np_ - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-38)
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_kv_heads",))
def paged_decode_attention_quant(q: jax.Array,
                                 k_pool: jax.Array, k_scale: jax.Array,
                                 v_pool: jax.Array, v_scale: jax.Array,
                                 page_table: jax.Array, offsets: jax.Array,
                                 num_kv_heads: int) -> jax.Array:
    """paged_decode_attention over INT8 pools (QuantPagedKVCache): pools are
    int8 [num_pages, Hk, page, Dh] with f32 scales [num_pages, Hk, page].
    Scale blocks ride the same page-table indirection as their values —
    reshaped to [NP, Hk, 1, page] so each (1, 1, 1, page) block's trailing
    dims EQUAL the array dims (the Mosaic tiling rule a (1, page) tail of a
    3D layout would violate; same constraint as the head-major pools)."""
    B, T, Hq, Dh = q.shape
    page = k_pool.shape[2]
    Hk = num_kv_heads
    G = Hq // Hk
    TG = T * G
    TGp = max(8, ((TG + 7) // 8) * 8)
    MP = page_table.shape[1]
    scale = 1.0 / (Dh ** 0.5)

    qr = q.reshape(B, T, Hk, G, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, Hk, TG, Dh)
    if TGp != TG:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, TGp - TG), (0, 0)))
    ks = k_scale[:, :, None, :]                  # [NP, Hk, 1, page]
    vs = v_scale[:, :, None, :]

    def _kv_index(b, h, p, tbl, off):
        last = (off[b] + (T - 1)) // page
        return (tbl[b, jnp.minimum(p, last)], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hk, MP),
        in_specs=[
            pl.BlockSpec((1, 1, TGp, Dh),
                         lambda b, h, p, tbl, off: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page, Dh), _kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, page), _kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page, Dh), _kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, page), _kv_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TGp, Dh),
                               lambda b, h, p, tbl, off: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TGp, 1), jnp.float32),
            pltpu.VMEM((TGp, 1), jnp.float32),
            pltpu.VMEM((TGp, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_quant, G=G, page=page, T=T, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, TGp, Dh), q.dtype),
    )(page_table.astype(jnp.int32), offsets.astype(jnp.int32),
      qr, k_pool, ks, v_pool, vs)

    out = out[:, :, :TG].reshape(B, Hk, T, G, Dh).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, Hq, Dh)


def _kernel_stacked(lid_ref, tbl_ref, off_ref, q_ref, k_ref, v_ref, o_ref,
                    m_ref, l_ref, acc_ref, *, G: int, page: int, T: int,
                    scale: float):
    """_kernel over FULL [L, NP, Hk, page, Dh] pool stacks: K/V blocks
    carry a leading (1,) layer dim selected by the scalar-prefetched layer
    index (the _q4_matmul_stacked mechanism) — the layer's pool never
    exists as its own buffer, killing the per-layer dynamic-slice
    materialization the scan otherwise pays feeding this custom call
    (~0.4 ms/window at the 1.1B serving shape, round-5 xplane trace).

    MEASURED NEGATIVE RESULT (round 5, kept for the record): on chip this
    variant ran ~40 ms/window SLOWER than slicing the layer and calling
    the per-layer kernel — the extra leading (1,) block dim apparently
    defeats Mosaic's elision of the clamped-page re-DMAs, so every dead
    grid step streams its page again. Production (core/model.py) slices
    the layer from the scan carry and uses the 4D kernels; these stacked
    variants stay interpret-tested for future Mosaic versions."""
    b = pl.program_id(0)
    p = pl.program_id(2)
    np_ = pl.num_programs(2)
    last = (off_ref[b] + (T - 1)) // page

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(p <= last)
    def _():
        q = q_ref[0, 0]                      # [TGp, Dh]
        k = k_ref[0, 0, 0]                   # [page, Dh]
        v = v_ref[0, 0, 0]

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [TGp, page]

        TGp = q.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (TGp, page), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TGp, page), 1)
        q_pos = off_ref[b] + row // G
        k_pos = p * page + col
        scores = jnp.where(k_pos <= q_pos, scores, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        pr = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(pr, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pr.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(p == np_ - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-38)
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_kv_heads",))
def paged_decode_attention_stacked(q: jax.Array, k_stack: jax.Array,
                                   v_stack: jax.Array, layer: jax.Array,
                                   page_table: jax.Array, offsets: jax.Array,
                                   num_kv_heads: int) -> jax.Array:
    """paged_decode_attention reading layer ``layer`` DIRECTLY from stacked
    [L, num_pages, Hk, page, Dh] pools (see _kernel_stacked)."""
    B, T, Hq, Dh = q.shape
    page = k_stack.shape[3]
    Hk = num_kv_heads
    G = Hq // Hk
    TG = T * G
    TGp = max(8, ((TG + 7) // 8) * 8)
    MP = page_table.shape[1]
    scale = 1.0 / (Dh ** 0.5)

    qr = q.reshape(B, T, Hk, G, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, Hk, TG, Dh)
    if TGp != TG:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, TGp - TG), (0, 0)))

    def _kv_index(b, h, p, lid, tbl, off):
        last = (off[b] + (T - 1)) // page
        return (lid[0], tbl[b, jnp.minimum(p, last)], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hk, MP),
        in_specs=[
            pl.BlockSpec((1, 1, TGp, Dh),
                         lambda b, h, p, lid, tbl, off: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, page, Dh), _kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, page, Dh), _kv_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TGp, Dh),
                               lambda b, h, p, lid, tbl, off: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TGp, 1), jnp.float32),
            pltpu.VMEM((TGp, 1), jnp.float32),
            pltpu.VMEM((TGp, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, G=G, page=page, T=T, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, TGp, Dh), q.dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      page_table.astype(jnp.int32), offsets.astype(jnp.int32),
      qr, k_stack, v_stack)

    out = out[:, :, :TG].reshape(B, Hk, T, G, Dh).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, Hq, Dh)


def _kernel_quant_stacked(lid_ref, tbl_ref, off_ref, q_ref, k_ref, ks_ref,
                          v_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref, *,
                          G: int, page: int, T: int, scale: float):
    """_kernel_quant over stacked INT8 pools (see _kernel_stacked)."""
    b = pl.program_id(0)
    p = pl.program_id(2)
    np_ = pl.num_programs(2)
    last = (off_ref[b] + (T - 1)) // page

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(p <= last)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0, 0].astype(q.dtype)
        v = v_ref[0, 0, 0].astype(q.dtype)
        ks = ks_ref[0, 0, 0, 0]
        vs = vs_ref[0, 0, 0, 0]

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = scores * ks[None, :]

        TGp = q.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (TGp, page), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TGp, page), 1)
        q_pos = off_ref[b] + row // G
        k_pos = p * page + col
        scores = jnp.where(k_pos <= q_pos, scores, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        pr = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(pr, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            (pr * vs[None, :]).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(p == np_ - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-38)
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_kv_heads",))
def paged_decode_attention_quant_stacked(
        q: jax.Array, k_stack: jax.Array, k_scale: jax.Array,
        v_stack: jax.Array, v_scale: jax.Array, layer: jax.Array,
        page_table: jax.Array, offsets: jax.Array,
        num_kv_heads: int) -> jax.Array:
    """paged_decode_attention_quant over stacked [L, ...] INT8 pools +
    [L, NP, Hk, page] scales."""
    B, T, Hq, Dh = q.shape
    page = k_stack.shape[3]
    Hk = num_kv_heads
    G = Hq // Hk
    TG = T * G
    TGp = max(8, ((TG + 7) // 8) * 8)
    MP = page_table.shape[1]
    scale = 1.0 / (Dh ** 0.5)

    qr = q.reshape(B, T, Hk, G, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, Hk, TG, Dh)
    if TGp != TG:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, TGp - TG), (0, 0)))
    ks = k_scale[:, :, :, None, :]               # [L, NP, Hk, 1, page]
    vs = v_scale[:, :, :, None, :]

    def _kv_index(b, h, p, lid, tbl, off):
        last = (off[b] + (T - 1)) // page
        return (lid[0], tbl[b, jnp.minimum(p, last)], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hk, MP),
        in_specs=[
            pl.BlockSpec((1, 1, TGp, Dh),
                         lambda b, h, p, lid, tbl, off: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, page, Dh), _kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, page), _kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, page, Dh), _kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, page), _kv_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TGp, Dh),
                               lambda b, h, p, lid, tbl, off: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TGp, 1), jnp.float32),
            pltpu.VMEM((TGp, 1), jnp.float32),
            pltpu.VMEM((TGp, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_quant_stacked, G=G, page=page, T=T,
                          scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, TGp, Dh), q.dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      page_table.astype(jnp.int32), offsets.astype(jnp.int32),
      qr, k_stack, ks, v_stack, vs)

    out = out[:, :, :TG].reshape(B, Hk, T, G, Dh).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, Hq, Dh)
