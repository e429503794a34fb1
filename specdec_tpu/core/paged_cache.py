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


def _window_pages(page_table: jax.Array, offsets: jax.Array,
                  page_size: int, T: int) -> Tuple[jax.Array, jax.Array]:
    """Pool page ids of the W consecutive logical pages that can contain
    positions [offset, offset+T) per sequence ([B, W], W static), plus the
    in-window start slot [B]. Logical pages beyond the table width are
    redirected to garbage page 0 (the same always-safe-to-clobber contract
    the table already uses for unused entries) — positions actually written
    always sit on valid pages (table width covers S + the dispatch
    horizon), only the untouched window tail can be redirected."""
    W = (T + page_size - 1) // page_size + 1
    first = offsets // page_size
    widx = first[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = widx < page_table.shape[1]
    pages = jnp.where(
        valid, jnp.take_along_axis(page_table,
                                   jnp.where(valid, widx, 0), axis=1), 0)
    return pages, offsets % page_size


def _rmw_window(pool: jax.Array, pages: jax.Array, blk: jax.Array,
                slot0: jax.Array, page_size: int) -> jax.Array:
    """Read-modify-write one [B, T, Hk, ...]-block into pool pages via full
    page-window gather + in-window dynamic_update_slice + full-page
    scatter-back. blk: [B, T, Hk] or [B, T, Hk, Dh]."""
    W = pages.shape[1]

    def one(win, nb, s0):
        # win: [W, Hk, page(, Dh)] -> [Hk, W*page(, Dh)]
        perm = (1, 0, 2) + (() if win.ndim == 3 else (3,))
        w = win.transpose(*perm)
        w = w.reshape((w.shape[0], W * page_size) + w.shape[3:])
        nbt = nb.transpose(*((1, 0) + (() if nb.ndim == 2 else (2,))))
        w = jax.lax.dynamic_update_slice(w, nbt.astype(w.dtype),
                                         (0, s0) + (0,) * (w.ndim - 2))
        w = w.reshape((w.shape[0], W, page_size) + w.shape[2:])
        return w.transpose(*perm)

    upd = jax.vmap(one)(pool[pages], blk, slot0)
    return pool.at[pages].set(upd, unique_indices=True)


def write_block_paged(layer_k: jax.Array, layer_v: jax.Array,
                      new_k: jax.Array, new_v: jax.Array,
                      page_table: jax.Array, offsets: jax.Array,
                      page_size: int) -> Tuple[jax.Array, jax.Array]:
    """Write a [B, T, Hk, Dh] block into one layer's [NP, Hk, page, Dh]
    pool at per-sequence offsets, as a PAGE-WINDOW read-modify-write:
    gather the W = ceil(T/page)+1 pages each sequence's block can touch,
    dynamic_update_slice the block inside the gathered window, scatter the
    full pages back (one scatter of B*W contiguous page rows).

    Why not a row scatter: the round-4 implementation scattered the B*T
    individual (page, slot) rows in one XLA scatter — on TPU that lowers
    to a serialized per-row update loop, measured at ~3 ms of the hybrid
    decode window's +3.69 ms paged-target cost (round-5 attribution,
    tools/exp_paged_residual.py: swapping the entire attention READ path
    moved the window only 0.69 ms, so the cost was in this shared write).
    B*W full-page rows (16 at the serving shape) replace B*T tiny rows
    (72), each now page-contiguous. (The round-3 per-position Python loop
    was worse still: T sequential scatters per layer.)

    ``unique_indices``: live slots' windows hold distinct pages (pages are
    disjoint across sequences, consecutive within one); duplicates only
    alias garbage page 0 (inactive slots' rows, redirected tails), where
    the winning update is undefined and irrelevant. Window slots outside
    [slot0, slot0+T) are rewritten with their just-gathered values —
    nothing else writes the pool within a layer step, so that is a no-op."""
    pages, slot0 = _window_pages(page_table, offsets, page_size,
                                 new_k.shape[1])
    layer_k = _rmw_window(layer_k, pages, new_k, slot0, page_size)
    layer_v = _rmw_window(layer_v, pages, new_v, slot0, page_size)
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
    pages, slot0 = _window_pages(page_table, offsets, page_size,
                                 new_k.shape[1])
    layer_kq = _rmw_window(layer_kq, pages, kq, slot0, page_size)
    layer_ks = _rmw_window(layer_ks, pages, ks, slot0, page_size)
    layer_vq = _rmw_window(layer_vq, pages, vq, slot0, page_size)
    layer_vs = _rmw_window(layer_vs, pages, vs, slot0, page_size)
    return layer_kq, layer_ks, layer_vq, layer_vs


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
