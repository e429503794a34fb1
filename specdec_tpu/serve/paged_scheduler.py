"""Continuous batching over the paged KV cache.

Extends serve.scheduler.ContinuousBatcher with vLLM-style memory management
(SURVEY.md §7.4): instead of reserving max_seq_len per slot, K/V pages come
from a shared pool sized in tokens, sequences allocate pages incrementally as
they grow (host free-list; the device only ever sees int32 page tables), and a
finished request's pages return to the pool at harvest. The speculative
window step itself is unchanged — engine.batch_engine dispatches on the cache
type — and attention runs the Pallas paged kernel on TPU.

Admission is refused (queued) when the pool can't cover the request's prompt
plus one gamma window; each drive step tops up active slots so the next
window's gamma+1 tokens always have backing pages.
"""
from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_step, forward_step_paged
from specdec_tpu.core.paged_cache import (
    PageAllocator, install_sequence_pages, merge_view_storage, paged_view,
    required_pages,
)
from specdec_tpu.engine.batch_engine import BatchState
from specdec_tpu.sampling.processors import LogitsProcessor
from specdec_tpu.serve.scheduler import ContinuousBatcher, Request


@partial(jax.jit, static_argnames=(
    "drafter_cfg", "target_cfg", "processor", "eos_ids"),
         donate_argnames=("state",))
def _admit_slot_paged(drafter_cfg: ModelConfig, drafter_params,
                      target_cfg: ModelConfig, target_params,
                      state: BatchState, slot: jax.Array,
                      prompt: jax.Array, suffix: jax.Array,
                      cached_len: jax.Array, prompt_len: jax.Array,
                      max_new: jax.Array,
                      t_row: jax.Array, d_row: jax.Array,
                      processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                      key: jax.Array) -> BatchState:
    """Install a request in ``slot``: write its page-table rows, prefill both
    models through the shared pools (pages are disjoint, so other slots'
    data is untouched), commit the first target token.

    Prefix caching enters here as partial prefill: ``suffix`` holds
    prompt[cached_len:] (zero-padded to its own static bucket length) and the
    forward runs with view length = cached_len, so RoPE positions and the
    causal mask (k_pos <= q_pos in both attention paths) come out exactly as
    a full prefill would — the first cached_len positions are READ from the
    shared pages named by the table row instead of recomputed. Padding
    positions past prompt_len write into this slot's own future pages (or the
    clamped garbage page): never attended before being overwritten, because
    every later query at position p only admits keys <= p, all rewritten by
    then. Without prefix caching, suffix IS prompt and cached_len == 0."""
    S = state.buf.shape[1]

    def put_row(arr, val):
        return lax.dynamic_update_index_in_dim(arr, val, slot, axis=0)

    t_cache = dataclasses.replace(
        state.t_cache, page_table=put_row(state.t_cache.page_table, t_row))
    d_cache = dataclasses.replace(
        state.d_cache, page_table=put_row(state.d_cache.page_table, d_row))

    # batch-of-one views sharing the pools (format-agnostic: quantized pools
    # carry their scale arrays through the same view/merge helpers)
    t_view = paged_view(t_cache, t_row, cached_len)
    t_logits, t_view = forward_step_paged(target_cfg, target_params,
                                          suffix[None, :], t_view)
    d_view = paged_view(d_cache, d_row, cached_len)
    _, d_view = forward_step_paged(drafter_cfg, drafter_params,
                                   suffix[None, :], d_view)

    last = jnp.take_along_axis(
        t_logits, (prompt_len - cached_len - 1)[None, None, None],
        axis=1)[0, 0]
    p0 = processor(last)
    tok0 = processor.sample(p0, key).astype(jnp.int32)

    row = jnp.zeros((S,), jnp.int32)
    row = lax.dynamic_update_slice(row, prompt, (0,))
    row = lax.dynamic_update_index_in_dim(row, tok0, prompt_len, axis=0)

    max_pos = min(target_cfg.max_position_embeddings,
                  drafter_cfg.max_position_embeddings)
    total = jnp.minimum(max_pos, prompt_len + max_new)
    pos = prompt_len + 1
    eos0 = jnp.zeros((), bool)
    if eos_ids:
        eos0 = jnp.any(tok0 == jnp.asarray(eos_ids, jnp.int32))
    finished = eos0 | (pos >= total)

    return dataclasses.replace(
        state,
        buf=put_row(state.buf, row),
        pos=put_row(state.pos, pos),
        prompt_len=put_row(state.prompt_len, prompt_len),
        total_len=put_row(state.total_len, total),
        finished=put_row(state.finished, finished),
        t_cache=merge_view_storage(t_cache, t_view).with_length(
            put_row(t_cache.length, pos - 1)),
        # drafter invariant: covers pos-2 (two-token first draft step)
        d_cache=merge_view_storage(d_cache, d_view).with_length(
            put_row(d_cache.length, pos - 2)),
        accepted=put_row(state.accepted, jnp.int32(0)),
        speculated=put_row(state.speculated, jnp.int32(0)),
    )


@partial(jax.jit, static_argnames=(
    "drafter_cfg", "target_cfg", "processor", "eos_ids"),
         donate_argnames=("state",))
def _admit_slot_hybrid(drafter_cfg: ModelConfig, drafter_params,
                       target_cfg: ModelConfig, target_params,
                       state: BatchState, slot: jax.Array,
                       prompt: jax.Array, suffix: jax.Array,
                       cached_len: jax.Array, prompt_len: jax.Array,
                       max_new: jax.Array, t_row: jax.Array,
                       processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                       key: jax.Array) -> BatchState:
    """Hybrid admission: target prefills through the paged pool (partial,
    prefix-cache aware — same semantics as _admit_slot_paged), drafter
    prefills the FULL prompt into its SLOTTED cache (batch-of-one scratch +
    install_slot, as in scheduler._admit_slot).

    Why hybrid is the default: the decode window runs gamma sequential T=1
    drafter steps per verify step, and the paged write/gather indirection is
    proportionally most expensive exactly there — keeping the (shallow)
    drafter slotted removes gamma paged scatters + paged attentions per
    window while the target pool keeps the memory elasticity (the target's
    KV dominates: L_target >> L_drafter)."""
    from specdec_tpu.core.cache import init_cache, install_slot

    S = state.buf.shape[1]

    def put_row(arr, val):
        return lax.dynamic_update_index_in_dim(arr, val, slot, axis=0)

    t_cache = dataclasses.replace(
        state.t_cache, page_table=put_row(state.t_cache.page_table, t_row))
    t_view = paged_view(t_cache, t_row, cached_len)
    t_logits, t_view = forward_step_paged(target_cfg, target_params,
                                          suffix[None, :], t_view)

    d_cache1 = init_cache(drafter_cfg, 1, S)
    _, d_cache1 = forward_step(drafter_cfg, drafter_params, prompt[None, :],
                               d_cache1)

    last = jnp.take_along_axis(
        t_logits, (prompt_len - cached_len - 1)[None, None, None],
        axis=1)[0, 0]
    p0 = processor(last)
    tok0 = processor.sample(p0, key).astype(jnp.int32)

    row = jnp.zeros((S,), jnp.int32)
    row = lax.dynamic_update_slice(row, prompt, (0,))
    row = lax.dynamic_update_index_in_dim(row, tok0, prompt_len, axis=0)

    max_pos = min(target_cfg.max_position_embeddings,
                  drafter_cfg.max_position_embeddings)
    total = jnp.minimum(max_pos, prompt_len + max_new)
    pos = prompt_len + 1
    eos0 = jnp.zeros((), bool)
    if eos_ids:
        eos0 = jnp.any(tok0 == jnp.asarray(eos_ids, jnp.int32))
    finished = eos0 | (pos >= total)

    return dataclasses.replace(
        state,
        buf=put_row(state.buf, row),
        pos=put_row(state.pos, pos),
        prompt_len=put_row(state.prompt_len, prompt_len),
        total_len=put_row(state.total_len, total),
        finished=put_row(state.finished, finished),
        t_cache=merge_view_storage(t_cache, t_view).with_length(
            put_row(t_cache.length, pos - 1)),
        # drafter invariant: covers pos-2 (two-token first draft step)
        d_cache=install_slot(state.d_cache, d_cache1, slot, pos - 2),
        accepted=put_row(state.accepted, jnp.int32(0)),
        speculated=put_row(state.speculated, jnp.int32(0)),
    )


@partial(jax.jit, static_argnames=(
    "drafter_cfg", "target_cfg", "processor", "eos_ids", "drafter_paged"),
         donate_argnames=("state",))
def _admit_slot_dense(drafter_cfg: ModelConfig, drafter_params,
                      target_cfg: ModelConfig, target_params,
                      state: BatchState, slot: jax.Array,
                      prompt: jax.Array, prompt_len: jax.Array,
                      max_new: jax.Array, t_row: jax.Array, d_row: jax.Array,
                      processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                      key: jax.Array,
                      drafter_paged: bool = False) -> BatchState:
    """Dense-prefill admission (the no-prefix-hit, single-slice fast path —
    the default configuration's EVERY admission): prefill the prompt on
    batch-of-one SLOTTED scratch caches with the plain ``forward_step`` —
    the identical program the slotted scheduler's admission runs, no paged
    gather in any attention — then scatter the finished K/V rows into the
    pool pages with ONE scatter per array (install_sequence_pages).

    Why: the paged admission prefilled through gather-paged attention, which
    re-gathers the sequence's full page span per layer; measured on chip it
    made plain-paged admission several times the slotted one (round-3 prefix
    bench: TTFT p99 4005 ms vs 40 ms slotted — VERDICT r3 weak #3). Stored
    KV bits are identical either way; only the prompt-forward's access
    pattern changes."""
    from specdec_tpu.core.cache import init_cache, install_slot

    S = state.buf.shape[1]

    def put_row(arr, val):
        return lax.dynamic_update_index_in_dim(arr, val, slot, axis=0)

    t1 = init_cache(target_cfg, 1, S)
    t_logits, t1 = forward_step(target_cfg, target_params, prompt[None, :], t1)
    d1 = init_cache(drafter_cfg, 1, S)
    _, d1 = forward_step(drafter_cfg, drafter_params, prompt[None, :], d1)

    last = jnp.take_along_axis(t_logits, (prompt_len - 1)[None, None, None],
                               axis=1)[0, 0]
    p0 = processor(last)
    tok0 = processor.sample(p0, key).astype(jnp.int32)

    row = jnp.zeros((S,), jnp.int32)
    row = lax.dynamic_update_slice(row, prompt, (0,))
    row = lax.dynamic_update_index_in_dim(row, tok0, prompt_len, axis=0)

    max_pos = min(target_cfg.max_position_embeddings,
                  drafter_cfg.max_position_embeddings)
    total = jnp.minimum(max_pos, prompt_len + max_new)
    pos = prompt_len + 1
    eos0 = jnp.zeros((), bool)
    if eos_ids:
        eos0 = jnp.any(tok0 == jnp.asarray(eos_ids, jnp.int32))
    finished = eos0 | (pos >= total)

    t_cache = dataclasses.replace(
        state.t_cache, page_table=put_row(state.t_cache.page_table, t_row))
    t_cache = install_sequence_pages(t_cache, t_row, t1).with_length(
        put_row(t_cache.length, pos - 1))
    if drafter_paged:
        d_cache = dataclasses.replace(
            state.d_cache, page_table=put_row(state.d_cache.page_table, d_row))
        # drafter invariant: covers pos-2 (two-token first draft step)
        d_cache = install_sequence_pages(d_cache, d_row, d1).with_length(
            put_row(d_cache.length, pos - 2))
    else:
        d_cache = install_slot(state.d_cache, d1, slot, pos - 2)

    return dataclasses.replace(
        state,
        buf=put_row(state.buf, row),
        pos=put_row(state.pos, pos),
        prompt_len=put_row(state.prompt_len, prompt_len),
        total_len=put_row(state.total_len, total),
        finished=put_row(state.finished, finished),
        t_cache=t_cache,
        d_cache=d_cache,
        accepted=put_row(state.accepted, jnp.int32(0)),
        speculated=put_row(state.speculated, jnp.int32(0)),
    )


@partial(jax.jit, static_argnames=("drafter_cfg", "target_cfg",
                                   "drafter_paged"),
         donate_argnames=("state",))
def _prefill_chunk(drafter_cfg: ModelConfig, drafter_params,
                   target_cfg: ModelConfig, target_params,
                   state: BatchState, chunk: jax.Array, offset: jax.Array,
                   t_row: jax.Array, d_row: jax.Array,
                   drafter_paged: bool = True) -> BatchState:
    """One chunked-prefill step: write a [C]-token slice of a pending
    request's prompt into the pool(s) at ``offset`` (same partial-prefill
    semantics as _admit_slot_paged — positions come from the view length).
    Only the pools change; the slot's counters/buffer stay untouched until
    the FINAL chunk commits tok0 via the admission program. In hybrid mode
    (drafter_paged=False) chunks touch only the target pool; the (shallow)
    drafter prefills its whole prompt in the final admission."""
    t_view = paged_view(state.t_cache, t_row, offset)
    _, t_view = forward_step_paged(target_cfg, target_params,
                                   chunk[None, :], t_view)
    out = dataclasses.replace(
        state, t_cache=merge_view_storage(state.t_cache, t_view))
    if drafter_paged:
        d_view = paged_view(state.d_cache, d_row, offset)
        _, d_view = forward_step_paged(drafter_cfg, drafter_params,
                                       chunk[None, :], d_view)
        out = dataclasses.replace(
            out, d_cache=merge_view_storage(state.d_cache, d_view))
    return out


class PagedContinuousBatcher(ContinuousBatcher):
    def __init__(self, drafter_cfg: ModelConfig, drafter_params,
                 target_cfg: ModelConfig, target_params,
                 num_slots: int = 4, gamma: int = 4,
                 max_prompt_len: int = 256, max_new_tokens: int = 128,
                 page_size: int = 64, pool_tokens: Optional[int] = None,
                 prefix_caching: bool = False,
                 prefill_buckets: Optional[Tuple[int, ...]] = None,
                 prefill_chunk: Optional[int] = None,
                 drafter_paged: bool = False,
                 **kw):
        super().__init__(drafter_cfg, drafter_params, target_cfg,
                         target_params, num_slots=num_slots, gamma=gamma,
                         max_prompt_len=max_prompt_len,
                         max_new_tokens=max_new_tokens, **kw)
        self.page_size = page_size
        # hybrid mode (default): target KV paged, drafter KV slotted — the
        # decode window's gamma sequential drafter steps skip the paged
        # write/gather indirection entirely; the drafter's reserved slots
        # cost L_drafter/L_target of the KV (small by construction).
        # drafter_paged=True pools both (maximum elasticity).
        self.drafter_paged = drafter_paged
        # default pool: half of what per-slot reservation would need — the
        # memory win comes from sequences not all being max-length at once
        pool_tokens = pool_tokens or (num_slots * self.S + self.S) // 2
        # table width must cover _needed_now at max length: S tokens PLUS
        # one full dispatch horizon (windows_per_sync windows can each
        # commit gamma+1 tokens before the next top-up) — sizing it from S
        # alone made _table_row overflow near the end of generation
        # width sized for the LARGEST gamma auto-retuning may reach
        horizon = self.windows_per_sync * (self.auto_gamma_max + 1) + 1
        self.max_pages_per_seq = required_pages(self.S + horizon,
                                                page_size) + 1
        self.num_pages = max(required_pages(pool_tokens, page_size),
                             2 * self.max_pages_per_seq)

        from specdec_tpu.core.paged_cache import init_paged_cache
        caches = dict(
            t_cache=init_paged_cache(target_cfg, num_slots, self.num_pages,
                                     page_size, self.max_pages_per_seq))
        if drafter_paged:
            caches["d_cache"] = init_paged_cache(
                drafter_cfg, num_slots, self.num_pages, page_size,
                self.max_pages_per_seq)
        # hybrid: d_cache stays the slotted [L, B, S] cache from super()
        self.state = dataclasses.replace(self.state, **caches)
        # separate pools per model (page ids are per-pool)
        self._alloc_t = PageAllocator(self.num_pages)
        self._alloc_d = PageAllocator(self.num_pages if drafter_paged else 1)
        # page 0 is the garbage page: inactive/finished slots' page tables
        # point at it (their masked writes must not corrupt real pages)
        self._alloc_t.alloc("_garbage", 1)
        if drafter_paged:
            self._alloc_d.alloc("_garbage", 1)
        self._slot_pages_t: List[List[int]] = [[] for _ in range(num_slots)]
        self._slot_pages_d: List[List[int]] = [[] for _ in range(num_slots)]
        self._tables_dirty = False
        self.preemptions = 0

        # vLLM-style automatic prefix caching (serve/prefix_cache.py):
        # content-addressed prompt pages shared across requests. Off by
        # default — it changes admission from one static prefill shape to a
        # small bucket set (each bucket is one extra TPU compile).
        self.prefix_caching = prefix_caching
        from specdec_tpu.serve.prefix_cache import PrefixBlockCache
        self.prefix_cache = PrefixBlockCache()
        # vLLM-style chunked prefill (the native meaning of the reference's
        # VLLM_MAX_NUM_BATCHED_TOKENS passthrough, ref vllm_engine.py:48):
        # long prompts prefill in <=prefill_chunk-token slices, ONE slice per
        # step, so other slots' decode windows interleave with a long
        # admission instead of stalling behind it.
        self.prefill_chunk = prefill_chunk
        if prefill_buckets is None:
            P = max_prompt_len
            if prefix_caching or prefill_chunk:
                cap = min(prefill_chunk or P, P)
                buckets = sorted({max(page_size, cap // 4), cap // 2, cap})
                prefill_buckets = tuple(b for b in buckets
                                        if page_size <= b <= cap) or (cap,)
            else:
                # without reuse the suffix is always the whole prompt — one
                # shape, one compile (each bucket costs a TPU compile)
                prefill_buckets = (P,)
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        self._slot_shared: List[List[int]] = [[] for _ in range(num_slots)]
        # slot -> [req, block_keys, matched_blocks, prompt_len, offset]
        self._prefilling: dict = {}

    # ------------------------------------------------------------ page mgmt
    def _needed_now(self, length: int) -> int:
        """Pages needed to cover `length` tokens plus one full device
        dispatch: windows_per_sync windows can each commit up to gamma+1
        tokens before the next host sync (and page top-up). Provisioning
        only one window ahead let multi-window dispatches write past the
        provisioned pages into the shared garbage page — measured output
        corruption with windows_per_sync=4 (regression test covers it)."""
        horizon = self.windows_per_sync * (self.gamma + 1) + 1
        return required_pages(length + horizon, self.page_size)

    def _table_row(self, pages: List[int]) -> jax.Array:
        row = np.zeros((self.max_pages_per_seq,), np.int32)
        row[:len(pages)] = pages
        return jnp.asarray(row)

    def _alloc(self, alloc: PageAllocator, owner, n: int) -> List[int]:
        """Allocator front door: when prefix caching holds refcnt-0 blocks,
        an empty free list is pressure, not exhaustion — evict LRU blocks
        (freeing one page in EACH pool, entries are pairs) before letting
        MemoryError propagate to the preemption path."""
        deficit = n - len(alloc.free)
        if deficit > 0 and self.prefix_caching:
            t_pages, d_pages = self.prefix_cache.reclaim(deficit)
            self._alloc_t.free.extend(t_pages)
            # hybrid entries carry d_page=-1 (no drafter pool)
            self._alloc_d.free.extend(p for p in d_pages if p >= 0)
        return alloc.alloc(owner, n)

    def _release_slot_pages(self, slot: int, req: Request):
        """Return a slot's pages: owned ones to the free lists, shared
        prefix blocks via refcount release (they stay cached for reuse)."""
        self._alloc_t.free_owner(("t", slot, req.request_id))
        self._alloc_d.free_owner(("d", slot, req.request_id))
        for key in self._slot_shared[slot]:
            self.prefix_cache.release(key)
        self._slot_shared[slot] = []
        self._slot_pages_t[slot] = []
        self._slot_pages_d[slot] = []

    def _preempt(self, slot: int):
        """Pool pressure: evict this slot's request back to the queue FRONT
        and recycle its pages (vLLM's recompute-mode preemption — the request
        restarts from its prompt on re-admission; committed tokens are
        regenerated, correctness is per-admission-keyed sampling as usual).
        The reference relies on vLLM for this behavior (SURVEY.md §2.7
        continuous-batching row); natively it is what makes an optimistic
        page pool safe."""
        req = self.slot_req[slot]
        self._release_slot_pages(slot, req)
        self.slot_req[slot] = None
        self._slot_first_token[slot] = None
        self.queue.insert(0, req)
        self.preemptions += 1
        self.state = dataclasses.replace(
            self.state, finished=self.state.finished.at[slot].set(True))
        self._tables_dirty = True

    def _top_up(self):
        """Ensure every active slot has pages for the next window; push the
        updated tables to the device state. Slots that cannot grow are
        PREEMPTED (freed + requeued), newest-admitted first, so the pool can
        never deadlock the whole batch — unless a single request alone
        exceeds the pool, which is a sizing error and raises."""
        changed = self._tables_dirty
        self._tables_dirty = False
        # host-mirrored positions (scheduler._host_pos): exact here because
        # every path that advances pos before this point also syncs — windows
        # refresh it at harvest, admissions at the TTFT stamp. Pulling
        # state.pos from the device instead cost one extra ~35-81 ms RPC
        # round-trip per step on the tunneled backend (measured: the paged
        # batcher trailed the slotted one partly on this).
        pos = self._host_pos
        if __debug__ and os.getenv("SPECDEC_CHECK_HOST_POS"):
            # staleness tripwire (CPU/CI only — a device pull per step costs
            # ~35-81 ms on the tunneled TPU): a pos-advancing path that skips
            # the mirror refresh would silently under-provision pages and
            # corrupt outputs through the garbage page
            dev = np.asarray(self.state.pos)
            assert (dev == np.asarray(pos)).all(), (
                f"_host_pos stale at _top_up: host={pos} device={dev.tolist()}")
        for slot in range(self.B):
            req = self.slot_req[slot]
            if req is None:
                continue
            need = self._needed_now(int(pos[slot]))
            pools = [(self._alloc_t, self._slot_pages_t[slot], "t")]
            if self.drafter_paged:
                pools.append((self._alloc_d, self._slot_pages_d[slot], "d"))
            try:
                for alloc, pages, tag in pools:
                    if len(pages) < need:
                        pages.extend(self._alloc(
                            alloc, (tag, slot, req.request_id),
                            need - len(pages)))
                        changed = True
            except MemoryError:
                if sum(r is not None for r in self.slot_req) == 1:
                    raise MemoryError(
                        f"page pool ({self.num_pages} pages) cannot back even "
                        f"one request of length {int(pos[slot])}+gamma — "
                        f"increase pool_tokens") from None
                self._preempt(slot)
                changed = True
        if changed:
            # PREFILLING slots keep an all-garbage device row until their
            # final admit installs the real one: they are finished=True
            # while pending, and a finished slot's masked window writes
            # scatter through its device row — a real row here would let
            # those writes corrupt the half-prefilled pages (the chunk
            # programs address the pages via their own explicit row)
            def row(slot, pages):
                if slot in self._prefilling:
                    return self._table_row([])
                return self._table_row(pages)
            t_tbl = jnp.stack([row(s, p)
                               for s, p in enumerate(self._slot_pages_t)])
            new_caches = dict(t_cache=dataclasses.replace(
                self.state.t_cache, page_table=t_tbl))
            if self.drafter_paged:
                d_tbl = jnp.stack([row(s, p)
                                   for s, p in enumerate(self._slot_pages_d)])
                new_caches["d_cache"] = dataclasses.replace(
                    self.state.d_cache, page_table=d_tbl)
            self.state = dataclasses.replace(self.state, **new_caches)

    # ------------------------------------------------------------ overrides
    def _match_blocks(self, req: Request) -> Tuple[List[int], int]:
        """(all block keys of the truncated prompt, matched block count).
        The match is capped at prompt_len-1 tokens: the admission must
        forward at least the last prompt token to produce tok0's logits, and
        the cap also keeps the drafter's first-draft rewrite of position
        prompt_len-1 out of shared pages."""
        from specdec_tpu.serve.prefix_cache import block_keys
        n = min(len(req.prompt_ids), self.max_prompt_len)
        keys = block_keys(req.prompt_ids[:n], self.page_size)
        m = min(self.prefix_cache.match_len(keys),
                (n - 1) // self.page_size)
        return keys, m

    def _can_admit(self, req: Request) -> bool:
        need = self._needed_now(min(len(req.prompt_ids), self.max_prompt_len)
                                + 1)
        if not self.prefix_caching:
            return (len(self._alloc_t.free) >= need and
                    (not self.drafter_paged
                     or len(self._alloc_d.free) >= need))
        _, m = self._match_blocks(req)
        avail = len(self._alloc_t.free)
        if self.drafter_paged:
            avail = min(avail, len(self._alloc_d.free))
        return need - m <= avail + self.prefix_cache.evictable

    def _begin_admit(self, slot: int, req: Request):
        """Acquire prefix blocks + allocate pages for the whole prompt, and
        mark the slot prefilling (offset starts past the cached prefix)."""
        n = min(len(req.prompt_ids), self.max_prompt_len)
        need = self._needed_now(n + 1)
        keys: List[int] = []
        m = 0
        if self.prefix_caching:
            keys, m = self._match_blocks(req)
            for k in keys[:m]:
                self.prefix_cache.acquire(k)
            hits = [self.prefix_cache.pages(k) for k in keys[:m]]
            self.prefix_cache.hit_tokens += m * self.page_size
            self.prefix_cache.lookup_tokens += n
        else:
            hits = []
        req.dequeue_time = req.dequeue_time or time.time()
        self._slot_shared[slot] = list(keys[:m])
        owner_t, owner_d = ("t", slot, req.request_id), ("d", slot, req.request_id)
        self._slot_pages_t[slot] = ([h[0] for h in hits]
                                    + self._alloc(self._alloc_t, owner_t,
                                                  need - m))
        if self.drafter_paged:
            self._slot_pages_d[slot] = ([h[1] for h in hits]
                                        + self._alloc(self._alloc_d, owner_d,
                                                      need - m))
        self._prefilling[slot] = [req, keys, m, n, m * self.page_size]

    def _advance_prefill(self, slot: int) -> bool:
        """Run ONE prefill slice for a pending slot. Non-final slices only
        touch the pools (_prefill_chunk); the final slice is the normal
        partial-prefill admission (commits tok0, installs counters). Returns
        True when the slot became active."""
        req, keys, m, n, offset = self._prefilling[slot]
        P = self.max_prompt_len
        chunk = self.prefill_chunk or P
        remaining = n - offset
        if remaining > chunk:
            tok = np.asarray(req.prompt_ids[offset:offset + chunk], np.int32)
            self.state = _prefill_chunk(
                self.drafter_cfg, self.drafter_params, self.target_cfg,
                self.target_params, self.state, jnp.asarray(tok),
                jnp.int32(offset),
                self._table_row(self._slot_pages_t[slot]),
                self._table_row(self._slot_pages_d[slot]),
                drafter_paged=self.drafter_paged)
            self._prefilling[slot][4] = offset + chunk
            return False

        bucket = next((b for b in self.prefill_buckets if b >= remaining), P)
        prompt = np.zeros((P,), np.int32)
        prompt[:n] = req.prompt_ids[:n]
        suffix = np.zeros((bucket,), np.int32)
        suffix[:remaining] = req.prompt_ids[offset:n]
        if offset == 0 and os.getenv("SPECDEC_PAGED_DENSE_ADMIT", "1") != "0":
            # no cached prefix, no prior chunks: dense-prefill fast path
            # (slotted-speed admission, one scatter installs the pages)
            self.state = _admit_slot_dense(
                self.drafter_cfg, self.drafter_params, self.target_cfg,
                self.target_params, self.state, jnp.int32(slot),
                jnp.asarray(prompt), jnp.int32(n),
                jnp.int32(req.max_new_tokens),
                self._table_row(self._slot_pages_t[slot]),
                self._table_row(self._slot_pages_d[slot]),
                self.processor, self.eos_ids, self._next_key(),
                drafter_paged=self.drafter_paged)
        elif self.drafter_paged:
            self.state = _admit_slot_paged(
                self.drafter_cfg, self.drafter_params, self.target_cfg,
                self.target_params, self.state, jnp.int32(slot),
                jnp.asarray(prompt), jnp.asarray(suffix), jnp.int32(offset),
                jnp.int32(n), jnp.int32(req.max_new_tokens),
                self._table_row(self._slot_pages_t[slot]),
                self._table_row(self._slot_pages_d[slot]),
                self.processor, self.eos_ids, self._next_key())
        else:
            self.state = _admit_slot_hybrid(
                self.drafter_cfg, self.drafter_params, self.target_cfg,
                self.target_params, self.state, jnp.int32(slot),
                jnp.asarray(prompt), jnp.asarray(suffix), jnp.int32(offset),
                jnp.int32(n), jnp.int32(req.max_new_tokens),
                self._table_row(self._slot_pages_t[slot]),
                self.processor, self.eos_ids, self._next_key())
        if self.prefix_caching:
            # hand the freshly prefilled full prompt blocks to the cache
            # (refcount 1, held by this slot until release)
            owner_t = ("t", slot, req.request_id)
            owner_d = ("d", slot, req.request_id)
            for i in range(m, n // self.page_size):
                tp = self._slot_pages_t[slot][i]
                dp = (self._slot_pages_d[slot][i]
                      if self.drafter_paged else -1)
                if self.prefix_cache.insert(keys[i], tp, dp):
                    self._alloc_t.disown(owner_t, tp)
                    if self.drafter_paged:
                        self._alloc_d.disown(owner_d, dp)
                    self._slot_shared[slot].append(keys[i])
        del self._prefilling[slot]
        self.slot_req[slot] = req
        from specdec_tpu.engine.metrics import RequestMetrics
        req.metrics = RequestMetrics(
            prompt_tokens=n, start_time=req.submit_time,
            queue_seconds=(req.dequeue_time or req.submit_time)
            - req.submit_time)
        return True

    def _admit(self, slot: int, req: Request, sync: bool = True):
        self._begin_admit(slot, req)
        while not self._advance_prefill(slot):
            pass
        # TTFT stamps at the admission prefill that commits tok0 (see
        # ContinuousBatcher._stamp_admissions); bursts share one sync
        if sync:
            self._stamp_admissions([slot])

    def _harvest(self, slot: int, buf, pos, plen, accepted, speculated):
        req = self.slot_req[slot]
        super()._harvest(slot, buf, pos, plen, accepted, speculated)
        if req is not None:
            self._release_slot_pages(slot, req)
            # stale table rows must stop pointing at recycled pages before
            # the next window runs
            self._tables_dirty = True

    def step(self):
        admitted = []
        # one prefill slice per pending slot per step: decode windows below
        # interleave with long admissions instead of stalling behind them
        for slot in list(self._prefilling):
            if self._advance_prefill(slot):
                admitted.append(slot)
        for slot in range(self.B):
            if (self.slot_req[slot] is None and slot not in self._prefilling
                    and self.queue and self._can_admit(self.queue[0])):
                req = self.queue.pop(0)
                if self.prefill_chunk is None:
                    self._admit(slot, req, sync=False)
                    admitted.append(slot)
                else:
                    self._begin_admit(slot, req)
                    if self._advance_prefill(slot):  # short prompt: done now
                        admitted.append(slot)
        if admitted:
            self._stamp_admissions(admitted)
        if all(r is None for r in self.slot_req):
            return bool(self._prefilling)
        self._top_up()
        return super()._window_and_harvest()

    def run(self):
        while (self.queue or self._prefilling
               or any(r is not None for r in self.slot_req)):
            self.step()
        return self.completed
