"""Fully device-resident NASD: n-gram drafting, verify, acceptance, and
table updates inside ONE jitted ``lax.while_loop`` — zero host syncs per
window (SURVEY.md §7.1 stretch goal realized).

Reference semantics preserved (ref: ngram_assisted/ngram_assisted.py:11-164):
exact-match acceptance of the target's own samples (:114-119 — emitted
tokens are ALWAYS target samples, so greedy output equals greedy AR
regardless of table contents), no residual adjustment (:140), gamma
truncation by ``stop_if_unknown`` (:95-99), committed-token + top-k filler
table updates (:148-155), prompt seeding (:71).

Divergence from the host-store path (documented, docs/PARITY.md): the
n-gram model is the fixed-capacity recency table of
``ngram/device_table.py`` instead of the dict count-argmax store — the
price of keeping the whole loop on device. The host path
(``ngram_assisted_speculative_generate``) remains the reference-parity
implementation; this one is the throughput variant (the host path pays an
RPC round-trip per window on remote-dispatch backends).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from specdec_tpu.core.cache import KVCache, init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_step
from specdec_tpu.ngram.device_table import (
    DeviceNGramTable, init_device_table, table_lookup, table_seed,
    table_update,
)
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import eos_mask, normalize_eos, pad_to_bucket


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NasdState:
    """Device-resident per-sequence state of a device-NASD generation.

    Field names intentionally match engine.batch_engine.BatchState (minus the
    drafter cache — the drafter here is the shared DeviceNGramTable, carried
    separately because it is GLOBAL across slots) so the batch engine's
    ``_pack_state``/``_unpack_state`` single-pull harvest works unchanged.
    """

    buf: jax.Array         # [B, S]
    pos: jax.Array         # [B]
    prompt_len: jax.Array  # [B]
    total_len: jax.Array   # [B]
    finished: jax.Array    # [B] bool
    t_cache: KVCache       # target cache (the only model in NASD)
    accepted: jax.Array    # [B]
    speculated: jax.Array  # [B]


def _nasd_window_body(cfg: ModelConfig, params, state: NasdState,
                      table: DeviceNGramTable, gamma: int,
                      processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                      filler_k: int, stop_if_unknown: bool,
                      key: jax.Array) -> Tuple[NasdState, DeviceNGramTable]:
    """One NASD draft/verify/accept/table-update window for the whole batch
    (traceable body shared by the one-shot batch generator and the serving
    scheduler's fused multi-window step — one implementation, never drift)."""
    buf, pos, finished = state.buf, state.pos, state.finished
    total_len = state.total_len
    B = buf.shape[0]
    rows = jnp.arange(B)
    n_ctx = table.orders[0] - 1
    V = cfg.vocab_size
    k_draft, k_sample = jax.random.split(key)

    def draft_step(carry, k):
        buf, known_all = carry
        ctxs = jax.vmap(
            lambda b: lax.dynamic_slice(buf[b], (pos[b] + k - n_ctx,),
                                        (n_ctx,)))(rows)
        keys = jax.random.split(jax.random.fold_in(k_draft, k), B)
        toks, known = jax.vmap(
            lambda c, kk: table_lookup(table, c, kk, V))(ctxs, keys)
        buf = buf.at[rows, pos + k].set(toks.astype(jnp.int32))
        return (buf, known_all.at[:, k].set(known)), toks

    (buf, known), drafts_t = lax.scan(
        draft_step, (buf, jnp.zeros((B, gamma), bool)),
        jnp.arange(gamma))
    drafts = drafts_t.T.astype(jnp.int32)               # [B, gamma]

    corrected_gamma = jnp.clip(total_len - pos - 1, 0, gamma)
    if stop_if_unknown:
        unk = ~known
        eff = jnp.where(jnp.any(unk, axis=1), jnp.argmax(unk, axis=1),
                        gamma)
    else:
        eff = jnp.full((B,), gamma, jnp.int32)
    eff = jnp.minimum(eff, corrected_gamma)

    first_tok = jnp.take_along_axis(buf, (pos - 1)[:, None], axis=1)
    t_in = jnp.concatenate([first_tok, drafts], axis=1)  # [B, g+1]
    logits, cache = forward_step(cfg, params, t_in, state.t_cache)
    p = processor(logits)                                # [B, g+1, V]
    keys = jax.random.split(k_sample, B * (gamma + 1))
    samples = jax.vmap(processor.sample)(
        p.reshape(B * (gamma + 1), V), keys)
    samples = samples.reshape(B, gamma + 1).astype(jnp.int32)

    idx = jnp.arange(gamma)[None, :]
    mismatch = (samples[:, :gamma] != drafts) & (idx < eff[:, None])
    n = jnp.where(jnp.any(mismatch, axis=1), jnp.argmax(mismatch, axis=1),
                  eff)

    buf = buf.at[rows, pos + n].set(samples[rows, n])
    cidx = jnp.arange(gamma + 1)[None, :]
    cand = jnp.where(cidx < n[:, None],
                     drafts[rows[:, None],
                            jnp.minimum(cidx, gamma - 1)], 0)
    cand = cand.at[rows, n].set(samples[rows, n])
    remaining = total_len - pos
    advance = jnp.minimum(n + 1, remaining)
    is_eos = eos_mask(cand, eos_ids) & (cidx <= n[:, None])
    any_eos = jnp.any(is_eos & (cidx < advance[:, None]), axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    advance = jnp.where(any_eos, jnp.minimum(first_eos + 1, advance),
                        advance)
    advance = jnp.where(finished, 0, advance)

    fillers = lax.top_k(p, filler_k)[1].astype(jnp.int32)  # [B, g+1, k]

    def upd_seq(b, tbl):
        def upd(i, t):
            ctx = lax.dynamic_slice(buf[b], (pos[b] + i - n_ctx,),
                                    (n_ctx,))
            tok_i = buf[b, pos[b] + i]
            # fillers FIRST, committed token LAST: the recency table
            # keeps the last writer, and the actual continuation must
            # win (the host store's count-argmax gets this for free;
            # writing fillers last measurably corrupted every
            # prediction to the k-th-best)
            if filler_k > 1:
                def fupd(j, tt):
                    return table_update(tt, ctx, fillers[b, i, j])
                t = lax.fori_loop(0, filler_k, fupd, t)
            return table_update(t, ctx, tok_i)
        return lax.fori_loop(0, advance[b], upd, tbl)

    table = lax.fori_loop(0, B, upd_seq, table)

    new_pos = pos + advance
    finished = finished | any_eos | (new_pos >= total_len)
    accepted = state.accepted + jnp.where(
        advance > 0, jnp.minimum(n, corrected_gamma), 0)
    speculated = state.speculated + jnp.where(advance > 0, eff, 0)
    state = dataclasses.replace(
        state, buf=buf, pos=new_pos, finished=finished,
        t_cache=cache.with_length(new_pos - 1),
        accepted=accepted, speculated=speculated)
    return state, table


@partial(jax.jit, static_argnames=(
    "cfg", "gamma", "processor", "eos_ids", "filler_k", "stop_if_unknown",
    "max_windows"), donate_argnames=("state", "table"))
def nasd_spec_windows(cfg: ModelConfig, params, state: NasdState,
                      table: DeviceNGramTable, gamma: int,
                      processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                      filler_k: int, stop_if_unknown: bool, key: jax.Array,
                      max_windows: int) -> Tuple[NasdState, DeviceNGramTable]:
    """Up to ``max_windows`` NASD windows in ONE device program with early
    exit — the serving scheduler's windows_per_sync step (mirror of
    engine.batch_engine.batch_spec_windows)."""

    def cond(st):
        i, state, table = st
        return (i < max_windows) & jnp.any(~state.finished)

    def body(st):
        i, state, table = st
        state, table = _nasd_window_body(
            cfg, params, state, table, gamma, processor, eos_ids, filler_k,
            stop_if_unknown, jax.random.fold_in(key, i))
        return (i + 1, state, table)

    _, state, table = lax.while_loop(cond, body, (jnp.int32(0), state, table))
    return state, table


@partial(jax.jit, static_argnames=(
    "cfg", "gamma", "gen_len", "processor", "eos_ids", "filler_k",
    "stop_if_unknown"))
def _device_nasd_generate_batch(
    cfg: ModelConfig, params, table: DeviceNGramTable,
    prompts: jax.Array, prompt_lens: jax.Array,
    gamma: int, gen_len: int,
    processor: LogitsProcessor,
    eos_ids: Tuple[int, ...],
    filler_k: int,
    stop_if_unknown: bool,
    key: jax.Array,
):
    """Whole-batch device NASD: one SHARED table, per-sequence drafting via
    vmapped lookups, ONE target verify per window, sequential (order-stable)
    table updates — all inside one jitted while_loop."""
    B, P = prompts.shape
    S = P + gen_len + gamma + 2
    n_ctx = table.orders[0] - 1
    max_windows = gen_len + 1
    rows = jnp.arange(B)

    cache = init_cache(cfg, B, S)
    buf = jnp.zeros((B, S), jnp.int32)
    buf = lax.dynamic_update_slice(buf, prompts, (0, 0))
    total_len = jnp.minimum(cfg.max_position_embeddings,
                            prompt_lens + gen_len)

    logits, cache = forward_step(cfg, params, prompts, cache)
    cache = cache.with_length(prompt_lens)
    last = jnp.take_along_axis(logits, (prompt_lens - 1)[:, None, None],
                               axis=1)[:, 0]                    # [B, V]
    p0 = processor(last)
    k_pre = jax.random.fold_in(key, 2 ** 31 - 1)
    tok0 = jax.vmap(processor.sample)(
        p0, jax.random.split(k_pre, B)).astype(jnp.int32)
    buf = buf.at[rows, prompt_lens].set(tok0)

    # seed from every prompt + its tok0, sequentially (order-stable)
    def seed_body(b, tbl):
        tbl = table_seed(tbl, prompts[b], prompt_lens[b])
        c0 = lax.dynamic_slice(buf[b], (prompt_lens[b] - n_ctx,), (n_ctx,))
        return table_update(tbl, c0, tok0[b])
    table = lax.fori_loop(0, B, seed_body, table)

    pos = prompt_lens + 1
    finished0 = eos_mask(tok0, eos_ids) | (pos >= total_len)
    zeros = jnp.zeros((B,), jnp.int32)
    state0 = NasdState(buf=buf, pos=pos, prompt_len=prompt_lens,
                       total_len=total_len, finished=finished0,
                       t_cache=cache, accepted=zeros, speculated=zeros)

    def cond(st):
        state, table, window = st
        return jnp.any(~state.finished) & (window < max_windows)

    def body(st):
        state, table, window = st
        state, table = _nasd_window_body(
            cfg, params, state, table, gamma, processor, eos_ids, filler_k,
            stop_if_unknown, jax.random.fold_in(key, window))
        return (state, table, window + 1)

    state, table, _ = lax.while_loop(cond, body, (state0, table, jnp.int32(0)))
    packed = jnp.concatenate(
        [state.buf, jnp.stack([state.pos - prompt_lens, state.accepted,
                               state.speculated], axis=1)],
        axis=1)
    return packed, table


def device_ngram_assisted_generate_batch(
    prompt_ids,
    cfg: ModelConfig,
    params,
    n: int = 3,
    table: Optional[DeviceNGramTable] = None,
    capacity: int = 1 << 16,
    gamma: int = 5,
    filler_top_k: int = 3,
    logits_processor: Optional[LogitsProcessor] = None,
    gen_len: int = 100,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    stop_if_unknown: bool = False,
    key: Optional[jax.Array] = None,
):
    """Batched device-table NASD. Returns (per-seq outputs, per-seq rates,
    updated table). ONE host pull for the whole generation."""
    from specdec_tpu.engine.batch_engine import _pad_batch

    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompts, lens = _pad_batch(prompt_ids, pad_token_id)
    if table is None:
        table = init_device_table(n, capacity)
    # degenerate prompts (< n tokens) are tolerated: context slices clamp at
    # the buffer start, so their first lookups hash padded grams — harmless
    # table noise, never an abort (a single short prompt must not poison a
    # whole harness batch). A minimum of 2 keeps pos-1 reads in-bounds.
    if int(min(len(p) for p in prompt_ids)) < 2:
        raise ValueError("prompts must have at least 2 tokens")

    packed, table = _device_nasd_generate_batch(
        cfg, params, table, prompts, lens, int(gamma), int(gen_len),
        processor, eos_ids, max(1, int(filler_top_k)),
        bool(stop_if_unknown), key)

    import numpy as np
    packed = np.asarray(packed)   # ONE pull
    B = packed.shape[0]
    plen = [min(len(pids), prompts.shape[1]) for pids in prompt_ids]
    outputs, rates = [], []
    for b in range(B):
        n_gen, acc, spec = (int(v) for v in packed[b, -3:])
        outputs.append(packed[b, plen[b]:plen[b] + n_gen].tolist())
        rates.append(acc / spec if spec > 0 else 0.0)
    return outputs, rates, table


def device_ngram_assisted_generate(
    inputs,
    cfg: ModelConfig,
    params,
    n: int = 3,
    table: Optional[DeviceNGramTable] = None,
    capacity: int = 1 << 16,
    gamma: int = 5,
    filler_top_k: int = 3,
    logits_processor: Optional[LogitsProcessor] = None,
    max_gen_len: int = 40,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    stop_if_unknown: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[List[int], float, DeviceNGramTable]:
    """Single-sequence device-table NASD: the B=1 case of the batch kernel
    (one implementation — the two loops must never drift). Returns
    (generated ids, acceptance, updated table); pass the table back in to
    accumulate across prompts (reset_in_between=False behavior)."""
    outs, rates, table = device_ngram_assisted_generate_batch(
        [inputs], cfg, params, n=n, table=table, capacity=capacity,
        gamma=gamma, filler_top_k=filler_top_k,
        logits_processor=logits_processor, gen_len=max_gen_len,
        eos_tokens_id=eos_tokens_id, pad_token_id=pad_token_id,
        stop_if_unknown=stop_if_unknown, key=key)
    return outs[0], rates[0], table
