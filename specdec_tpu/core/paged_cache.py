"""Paged KV cache: fixed page pool + per-sequence page tables.

The slotted cache (core/cache.py) reserves max_seq_len per slot; for serving
many sequences of varying length that wastes HBM. This is the TPU-native
equivalent of vLLM's paged KV (SURVEY.md §7.4 names it as the native
replacement for vLLM's C++/CUDA PagedAttention): K/V live in a global pool of
fixed-size pages, each sequence owns an ordered page list, and growing a
sequence allocates pages from a host-side free list. All device shapes stay
static (pool size, table width); "allocation" only edits the int32 page table.

Writes scatter the (gamma+1)-token block through the page table; attention
either gathers the sequence's pages into a contiguous view (XLA path, used as
the reference/oracle) or runs the Pallas paged-attention kernel
(ops/paged_attention.py) which DMA-s pages directly via scalar-prefetched
tables. Rollback stays length arithmetic — pages are never freed mid-request,
so rejected-draft rollback needs no table surgery.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """k/v pools: [L, num_pages, Hk, page_size, Dh];
    page_table: [B, max_pages] int32 (pool page id per logical page; unused
    entries point at page 0 — harmless, masked by length);
    length: [B] int32 valid tokens per sequence.

    Layout note: Hk sits BEFORE page_size so a Pallas block over one
    (page, head) is contiguous in the trailing (page_size, Dh) dims —
    Mosaic requires the last two block dims to tile (8, 128) or equal the
    array dims, which a [.., page, Hk, Dh] layout's (1, Dh) blocks violate
    (measured failure on chip; same constraint the flash kernel hit)."""

    k: jax.Array
    v: jax.Array
    page_table: jax.Array
    length: jax.Array

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def max_pages(self) -> int:
        return self.page_table.shape[1]

    def with_length(self, length: jax.Array) -> "PagedKVCache":
        return dataclasses.replace(self, length=length)

    def rolled_back(self, n: jax.Array) -> "PagedKVCache":
        return self.with_length(jnp.maximum(self.length - n, 0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantPagedKVCache:
    """INT8 paged pool (``cfg.kv_quant = "int8"``): values int8
    [L, num_pages, Hk, page_size, Dh] with per-(position, head) f32 scales
    [L, num_pages, Hk, page_size] living in the SAME pages as their values
    (one page table addresses both, so allocation/prefix-sharing logic is
    format-blind). Same semantics as core/cache.py::QuantKVCache: dequantized
    value = q * scale, applied after the dots in _attention — half the pool
    HBM, so a given pool backs twice the tokens."""

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    page_table: jax.Array
    length: jax.Array

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def max_pages(self) -> int:
        return self.page_table.shape[1]

    def with_length(self, length: jax.Array) -> "QuantPagedKVCache":
        return dataclasses.replace(self, length=length)

    def rolled_back(self, n: jax.Array) -> "QuantPagedKVCache":
        return self.with_length(jnp.maximum(self.length - n, 0))


def paged_view(cache, row: jax.Array, length: jax.Array):
    """Batch-of-one view over the shared pools: same storage, a single-row
    page table and length (format-agnostic — scheduler admission uses this)."""
    return dataclasses.replace(cache, page_table=row[None, :],
                               length=length[None])


def merge_view_storage(cache, view):
    """Adopt a view's (updated) storage arrays back into the full cache —
    every field except page_table/length, so it covers both formats."""
    skip = ("page_table", "length")
    upd = {f.name: getattr(view, f.name)
           for f in dataclasses.fields(cache) if f.name not in skip}
    return dataclasses.replace(cache, **upd)


class PageAllocator:
    """Host-side free list over the pool. The device never sees it — only the
    int32 tables it produces."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self.free: List[int] = list(range(num_pages - 1, -1, -1))
        self.owned: dict = {}

    def alloc(self, owner, n: int) -> List[int]:
        if n > len(self.free):
            raise MemoryError(
                f"page pool exhausted: need {n}, free {len(self.free)}")
        pages = [self.free.pop() for _ in range(n)]
        self.owned.setdefault(owner, []).extend(pages)
        return pages

    def free_owner(self, owner):
        for p in self.owned.pop(owner, []):
            self.free.append(p)

    def disown(self, owner, page: int):
        """Transfer one page out of ``owner``'s list without freeing it —
        used when a prompt block's page is handed to the prefix cache, which
        then owns its lifetime (serve/prefix_cache.py)."""
        self.owned[owner].remove(page)


def init_paged_cache(cfg, batch_size: int, num_pages: int, page_size: int,
                     max_pages_per_seq: int, dtype=None):
    shape = (cfg.num_layers, num_pages, cfg.num_kv_heads, page_size,
             cfg.head_dim)
    table = jnp.zeros((batch_size, max_pages_per_seq), jnp.int32)
    length = jnp.zeros((batch_size,), jnp.int32)
    if getattr(cfg, "kv_quant", "none") == "int8":
        return QuantPagedKVCache(
            k=jnp.zeros(shape, dtype=jnp.int8),
            v=jnp.zeros(shape, dtype=jnp.int8),
            k_scale=jnp.zeros(shape[:-1], dtype=jnp.float32),
            v_scale=jnp.zeros(shape[:-1], dtype=jnp.float32),
            page_table=table, length=length,
        )
    dtype = dtype or cfg.dtype
    return PagedKVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        page_table=table, length=length,
    )


def write_block_paged(layer_k: jax.Array, layer_v: jax.Array,
                      new_k: jax.Array, new_v: jax.Array,
                      page_table: jax.Array, offsets: jax.Array,
                      page_size: int) -> Tuple[jax.Array, jax.Array]:
    """Scatter a [B, T, Hk, Dh] block into one layer's [NP, Hk, page, Dh]
    pool at per-sequence offsets, as ONE scatter over all (b, t) positions.
    The separated advanced indices (page, :, slot), both [B, T], move the
    batch dims to the front: target slice [B, T, Hk, Dh] == new_k. (A
    per-position Python loop here emitted T sequential scatters per layer —
    a T=256 paged prefill carried 256x22 scatter ops and ran 3x slower than
    the slotted admission; measured on chip.)

    ``unique_indices``: live slots' (page, slot) pairs are distinct — pages
    are disjoint across sequences and positions are distinct within one.
    The only duplicates come from FINISHED/inactive slots, whose table rows
    all alias garbage page 0; which duplicate wins there is undefined and
    irrelevant (the garbage page is never attended)."""
    T = new_k.shape[1]
    pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # [B,T]
    page = jnp.take_along_axis(page_table, pos // page_size, axis=1)  # [B,T]
    slot = pos % page_size
    layer_k = layer_k.at[page, :, slot].set(new_k, unique_indices=True)
    layer_v = layer_v.at[page, :, slot].set(new_v, unique_indices=True)
    return layer_k, layer_v


def write_block_paged_quant(layer_kq, layer_ks, layer_vq, layer_vs,
                            new_k, new_v, page_table: jax.Array,
                            offsets: jax.Array, page_size: int):
    """Quantized write_block_paged: quantize the [B, T, Hk, Dh] blocks
    per-(position, head) (same math as the slotted cache — bit-identical
    stored values across layouts) and scatter values + scales through the
    page table."""
    from specdec_tpu.core.cache import quantize_kv_block

    kq, ks = quantize_kv_block(new_k)
    vq, vs = quantize_kv_block(new_v)
    T = new_k.shape[1]
    pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # [B,T]
    page = jnp.take_along_axis(page_table, pos // page_size, axis=1)  # [B,T]
    slot = pos % page_size
    layer_kq = layer_kq.at[page, :, slot].set(kq, unique_indices=True)
    layer_ks = layer_ks.at[page, :, slot].set(ks, unique_indices=True)
    layer_vq = layer_vq.at[page, :, slot].set(vq, unique_indices=True)
    layer_vs = layer_vs.at[page, :, slot].set(vs, unique_indices=True)
    return layer_kq, layer_ks, layer_vq, layer_vs


def write_block_paged_stacked(stack_k: jax.Array, stack_v: jax.Array,
                              layer: jax.Array, new_k: jax.Array,
                              new_v: jax.Array, page_table: jax.Array,
                              offsets: jax.Array, page_size: int):
    """write_block_paged against the FULL [L, NP, Hk, page, Dh] pool stacks
    at scan layer index ``layer`` — one scatter with the layer id prepended
    to every (page, slot) index.

    Why: threading per-layer pools through lax.scan as xs/ys forces XLA to
    materialize each layer's 6.6 MB pool slice on the way into the write
    and DUS the result back into a fresh stacked output — traced at
    ~1.8 ms per decode window at 1.1B serving shape (round-5 xplane
    attribution, tools/exp_trace_diff.py), the same scan-materialization
    class round 4 fixed for stacked quantized weights. Scattering into the
    stack carried as scan CARRY lets XLA update the pool in place."""
    T = new_k.shape[1]
    pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # [B,T]
    page = jnp.take_along_axis(page_table, pos // page_size, axis=1)  # [B,T]
    slot = pos % page_size
    li = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), page.shape)
    stack_k = stack_k.at[li, page, :, slot].set(new_k, unique_indices=True)
    stack_v = stack_v.at[li, page, :, slot].set(new_v, unique_indices=True)
    return stack_k, stack_v


def write_block_paged_quant_stacked(pk, pv, layer: jax.Array,
                                    new_k: jax.Array, new_v: jax.Array,
                                    page_table: jax.Array,
                                    offsets: jax.Array, page_size: int):
    """Quantized write_block_paged_stacked: pk/pv are (values, scales)
    stack pairs ([L, NP, Hk, page, Dh] int8 + [L, NP, Hk, page] f32)."""
    from specdec_tpu.core.cache import quantize_kv_block

    kq, ks = quantize_kv_block(new_k)
    vq, vs = quantize_kv_block(new_v)
    T = new_k.shape[1]
    pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    page = jnp.take_along_axis(page_table, pos // page_size, axis=1)
    slot = pos % page_size
    li = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), page.shape)
    pk = (pk[0].at[li, page, :, slot].set(kq, unique_indices=True),
          pk[1].at[li, page, :, slot].set(ks, unique_indices=True))
    pv = (pv[0].at[li, page, :, slot].set(vq, unique_indices=True),
          pv[1].at[li, page, :, slot].set(vs, unique_indices=True))
    return pk, pv


def install_sequence_pages(cache, row: jax.Array, scratch):
    """Scatter a batch-of-one SLOTTED scratch cache's K/V into the pool pages
    named by ``row`` — the dense-prefill → paged-install admission fast path
    (serve/paged_scheduler.py). Admissions prefill on a dense scratch cache
    (exactly the slotted scheduler's program — no per-layer page gather in
    the prompt forward) and this one scatter per array moves the finished
    rows into the pool; the paged machinery then only ever serves decode.

    scratch: KVCache/QuantKVCache with B=1 and seq width S (format must match
    the pool's — both derive from cfg.kv_quant). Position p lands at
    (row[p // page_size], p % page_size); positions past the allocated pages
    alias garbage page 0 — never attended, same contract as
    ``write_block_paged`` (duplicates only on the garbage page)."""
    ps = cache.page_size
    S = scratch.k.shape[2]
    pos = jnp.arange(S, dtype=jnp.int32)
    page = row[pos // ps]                                   # [S]
    slot = pos % ps                                         # [S]

    def scat(pool, rows):
        # rows [L, S, ...] -> [S, L, ...]: the separated advanced indices
        # (page at axis 1, slot at axis 3) put the broadcast dim first
        return pool.at[:, page, :, slot].set(
            jnp.moveaxis(rows, 1, 0), unique_indices=True)

    upd = dict(k=scat(cache.k, scratch.k[:, 0]),
               v=scat(cache.v, scratch.v[:, 0]))
    if hasattr(cache, "k_scale"):
        upd["k_scale"] = scat(cache.k_scale, scratch.k_scale[:, 0])
        upd["v_scale"] = scat(cache.v_scale, scratch.v_scale[:, 0])
    return dataclasses.replace(cache, **upd)


def gather_pages(layer_kv: jax.Array, page_table: jax.Array) -> jax.Array:
    """[num_pages, Hk, page, Dh] + [B, max_pages] → contiguous
    [B, max_pages*page, Hk, Dh] view (XLA reference path / kernel oracle)."""
    B, MP = page_table.shape
    NP, Hk, ps, Dh = layer_kv.shape
    gathered = layer_kv[page_table]            # [B, MP, Hk, page, Dh]
    return gathered.transpose(0, 1, 3, 2, 4).reshape(B, MP * ps, Hk, Dh)


def gather_page_scales(layer_s: jax.Array, page_table: jax.Array) -> jax.Array:
    """[num_pages, Hk, page] scales + [B, max_pages] → [B, max_pages*page, Hk]
    (the layout _attention expects its per-(position, head) scales in)."""
    B, MP = page_table.shape
    NP, Hk, ps = layer_s.shape
    gathered = layer_s[page_table]             # [B, MP, Hk, page]
    return gathered.transpose(0, 1, 3, 2).reshape(B, MP * ps, Hk)


def required_pages(length: int, page_size: int) -> int:
    return (length + page_size - 1) // page_size
