"""Batched EAGLE speculative decoding: whole-batch feature-drafted windows.

Generalizes sampling/eagle_speculative.py's single-sequence loop to B rows
with the same structure engine/batch_engine.py gives model drafters: jitted
whole-batch window steps over static-shape state, per-sequence cache lengths
for divergent accept counts, fused multi-window dispatches, ONE packed pull
at harvest. Ref context: the reference has no EAGLE and no batched drafting
beyond its Python-loop batch path (ref: engine/infer_engine.py:149-359);
this is the beyond-reference drafter family made batch-serving-capable.

Invariants (same as the single-sequence loop, now per row):
- ``fbuf[b]`` holds the target's residual-stream feature for committed
  positions, valid through ``pos[b] - 2`` at window start
- drafter catch-up is a static-shape rewrite of the last gamma+1
  (feature, token) pairs ending at ``pos[b] - 2`` with the eagle cache
  length reset behind them; its output doubles as draft step 0
- verify features are written at ``pos[b] - 1 ..``; entries at or past a
  rejection are invalid but sit beyond the next window's read range
- rollback is length arithmetic on both caches

Finished rows: buf commits are masked; fbuf/e-cache writes land at or past
``pos - 1`` which is outside any later read range (reads stop at
``new_pos - 2`` and new_pos == pos for finished rows), so they need no mask
— masking fbuf would stream the full [B, S, D] buffer through a select
every window for nothing.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from specdec_tpu.core.cache import KVCache, init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.eagle import eagle_forward
from specdec_tpu.core.model import forward_step_features
from specdec_tpu.engine.batch_engine import (
    _eos_hit, _gather_last, _pack_state, _pad_batch, _unpack_state,
)
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import max_fn, normalize_eos


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EagleBatchState:
    """Device-resident state of a batched EAGLE generation. Field names
    match engine.batch_engine.BatchState where shared, so the packed-pull
    harvest (``_pack_state``/``_unpack_state``) works unchanged."""

    buf: jax.Array         # [B, S]
    pos: jax.Array         # [B]
    prompt_len: jax.Array  # [B]
    total_len: jax.Array   # [B]
    finished: jax.Array    # [B] bool
    fbuf: jax.Array        # [B, S, D] target features per committed position
    e_cache: KVCache       # eagle drafter cache
    t_cache: KVCache       # target cache
    accepted: jax.Array    # [B]
    speculated: jax.Array  # [B]


@partial(jax.jit, static_argnames=(
    "eagle_cfg", "target_cfg", "gen_len", "gamma", "processor",
    "first_target", "eos_ids"))
def eagle_batch_prefill(eagle_cfg: ModelConfig, eagle_params,
                        target_cfg: ModelConfig, target_params,
                        prompts: jax.Array, prompt_lens: jax.Array,
                        gen_len: int, gamma: int,
                        processor: LogitsProcessor, first_target: bool,
                        eos_ids: Tuple[int, ...],
                        key: jax.Array) -> EagleBatchState:
    """Target prefill over right-padded prompts seeds fbuf rows; the eagle
    cache needs no prefill (each window's catch-up rewrite re-derives it)."""
    B, P = prompts.shape
    S = P + gen_len + gamma + 2
    D = target_cfg.hidden_size
    buf = jnp.zeros((B, S), jnp.int32)
    buf = lax.dynamic_update_slice(buf, prompts, (0, 0))

    max_pos = min(eagle_cfg.max_position_embeddings,
                  target_cfg.max_position_embeddings)
    total_len = jnp.minimum(max_pos, prompt_lens + gen_len)

    t_cache = init_cache(target_cfg, B, S)
    t_logits, t_feats, t_cache = forward_step_features(
        target_cfg, target_params, prompts, t_cache)
    fbuf = jnp.zeros((B, S, D), target_cfg.dtype)
    fbuf = lax.dynamic_update_slice(fbuf, t_feats.astype(fbuf.dtype),
                                    (0, 0, 0))

    if first_target:
        last = jnp.take_along_axis(t_logits, (prompt_lens - 1)[:, None, None],
                                   axis=1)[:, 0]
        p0 = processor(last)
        keys = jax.random.split(jax.random.fold_in(key, 2 ** 31 - 1), B)
        tok0 = jax.vmap(processor.sample)(p0, keys).astype(jnp.int32)
        buf = buf.at[jnp.arange(B), prompt_lens].set(tok0)
        pos = prompt_lens + 1
        finished = _eos_hit(tok0, eos_ids) | (pos >= total_len)
    else:
        # requires every prompt_len >= 2 (catch-up pairs end at pos-2)
        pos = prompt_lens
        finished = pos >= total_len

    zeros = jnp.zeros((B,), jnp.int32)
    return EagleBatchState(
        buf=buf, pos=pos, prompt_len=prompt_lens, total_len=total_len,
        finished=finished, fbuf=fbuf,
        e_cache=init_cache(eagle_cfg, B, S),
        t_cache=t_cache.with_length(pos - 1),
        accepted=zeros, speculated=zeros)


def _eagle_window_body(eagle_cfg: ModelConfig, eagle_params,
                       target_cfg: ModelConfig, target_params,
                       state: EagleBatchState, gamma: int,
                       processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                       skip_sample_adjustment: bool,
                       key: jax.Array) -> EagleBatchState:
    """One whole-batch EAGLE draft/verify/accept window (traceable body
    shared by the single- and fused multi-window entry points)."""
    B, S = state.buf.shape
    D = state.fbuf.shape[-1]
    C = gamma + 1
    rows = jnp.arange(B)
    idxg = jnp.arange(gamma)
    pos = state.pos
    k_draft, k_accept, k_resample = jax.random.split(key, 3)

    # --- catch-up rewrite + draft step 0 (per row) --------------------------
    start = jnp.maximum(pos - 1 - C, 0)                     # [B]
    idx = pos - 2 - start                                    # [B] output slot
    tok_blk = jax.vmap(
        lambda b: lax.dynamic_slice(state.buf[b], (start[b] + 1,), (C,)))(rows)
    f_blk = jax.vmap(
        lambda b: lax.dynamic_slice(state.fbuf[b], (start[b], 0), (C, D)))(rows)
    e_cache = state.e_cache.with_length(start)
    logits_blk, fhat_blk, e_cache = eagle_forward(
        eagle_cfg, eagle_params, target_params, tok_blk, f_blk, e_cache)
    q0 = processor(logits_blk[rows, idx])                    # [B, V]
    keys0 = jax.random.split(jax.random.fold_in(k_draft, 0), B)
    x0 = jax.vmap(processor.sample)(q0, keys0).astype(jnp.int32)
    f0 = fhat_blk[rows, idx]                                 # [B, D]
    # drop garbage slots past the output pair (clamped-start early windows)
    e_cache = e_cache.with_length(pos - 1)

    # --- draft steps 1..gamma-1 on predicted features -----------------------
    def draft_step(carry, i):
        cache, prev_tok, prev_f = carry
        logits, f_hat, cache = eagle_forward(
            eagle_cfg, eagle_params, target_params,
            prev_tok[:, None], prev_f[:, None, :], cache)
        q = processor(logits[:, 0])
        keys = jax.random.split(jax.random.fold_in(k_draft, i), B)
        x = jax.vmap(processor.sample)(q, keys).astype(jnp.int32)
        return (cache, x, f_hat[:, 0]), (q, x)

    (e_cache, _, _), (q_rest, drafts_rest) = lax.scan(
        draft_step, (e_cache, x0, f0), jnp.arange(1, gamma))
    q_all = jnp.concatenate([q0[:, None], jnp.swapaxes(q_rest, 0, 1)], axis=1)
    drafts = jnp.concatenate([x0[:, None], jnp.swapaxes(drafts_rest, 0, 1)],
                             axis=1)                         # [B, gamma]

    # --- verify: ONE target forward over gamma+1 positions ------------------
    first_tok = _gather_last(state.buf, pos)
    t_in = jnp.concatenate([first_tok[:, None], drafts], axis=1)
    t_logits, t_feats, t_cache = forward_step_features(
        target_cfg, target_params, t_in, state.t_cache)
    p_all = processor(t_logits)                              # [B, g+1, V]
    fbuf = jax.vmap(
        lambda f, tf, o: lax.dynamic_update_slice(f, tf, (o, 0)))(
        state.fbuf, t_feats.astype(state.fbuf.dtype), pos - 1)

    # --- vectorized acceptance (ref :139-145) --------------------------------
    r = jax.random.uniform(k_accept, (B, gamma))
    p_x = jnp.take_along_axis(p_all[:, :gamma], drafts[..., None],
                              axis=2)[..., 0]
    q_x = jnp.take_along_axis(q_all, drafts[..., None], axis=2)[..., 0]
    reject = r > p_x / jnp.maximum(q_x, 1e-38)
    n = jnp.where(jnp.any(reject, axis=1), jnp.argmax(reject, axis=1), gamma)

    # --- next token: bonus or residual resample ------------------------------
    p_n = jnp.take_along_axis(p_all, n[:, None, None], axis=1)[:, 0]
    q_n = jnp.take_along_axis(q_all, jnp.minimum(n, gamma - 1)[:, None, None],
                              axis=1)[:, 0]
    if skip_sample_adjustment:
        resample_dist = p_n
    else:
        residual = max_fn(p_n - q_n)
        has_mass = jnp.sum(jnp.maximum(p_n - q_n, 0.0), axis=-1,
                           keepdims=True) > 1e-12
        resample_dist = jnp.where(has_mass, residual, p_n)
    next_dist = jnp.where((n == gamma)[:, None], p_n, resample_dist)
    keys = jax.random.split(k_resample, B)
    next_tok = jax.vmap(processor.sample)(next_dist, keys).astype(jnp.int32)

    # --- commit (identical bookkeeping to batch_engine._spec_window_body) ---
    cand = jnp.where(idxg[None, :] < n[:, None], drafts, 0)
    cand = jnp.concatenate([cand, jnp.zeros((B, 1), jnp.int32)], axis=1)
    cand = jax.vmap(lambda row, t, i: row.at[i].set(t))(cand, next_tok, n)

    remaining = state.total_len - pos
    advance = jnp.minimum(n + 1, remaining)
    idxg1 = jnp.arange(gamma + 1)
    is_eos = _eos_hit(cand, eos_ids) & (idxg1[None, :] <= n[:, None])
    within = is_eos & (idxg1[None, :] < advance[:, None])
    any_eos = jnp.any(within, axis=1)
    first_eos = jnp.argmax(within, axis=1)
    advance = jnp.where(any_eos, jnp.minimum(first_eos + 1, advance), advance)
    advance = jnp.where(state.finished, 0, advance)

    buf = jax.vmap(lambda row, c, o: lax.dynamic_update_slice(row, c, (o,)))(
        state.buf, cand, pos)
    buf = jnp.where(state.finished[:, None], state.buf, buf)
    new_pos = pos + advance
    finished = state.finished | any_eos | (new_pos >= state.total_len)

    corrected_gamma = jnp.clip(state.total_len - pos - 1, 0, gamma)
    active = ~state.finished
    accepted = state.accepted + jnp.where(
        active, jnp.minimum(n, corrected_gamma), 0)
    speculated = state.speculated + jnp.where(active, corrected_gamma, 0)

    return dataclasses.replace(
        state, buf=buf, pos=new_pos, finished=finished, fbuf=fbuf,
        e_cache=e_cache,  # next window's catch-up resets its length
        t_cache=t_cache.with_length(new_pos - 1),
        accepted=accepted, speculated=speculated)


@partial(jax.jit, static_argnames=(
    "eagle_cfg", "target_cfg", "gamma", "processor", "eos_ids",
    "skip_sample_adjustment"), donate_argnames=("state",))
def eagle_batch_window(eagle_cfg, eagle_params, target_cfg, target_params,
                       state: EagleBatchState, gamma: int,
                       processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                       skip_sample_adjustment: bool,
                       key: jax.Array) -> EagleBatchState:
    return _eagle_window_body(eagle_cfg, eagle_params, target_cfg,
                              target_params, state, gamma, processor, eos_ids,
                              skip_sample_adjustment, key)


@partial(jax.jit, static_argnames=(
    "eagle_cfg", "target_cfg", "gamma", "processor", "eos_ids",
    "skip_sample_adjustment", "max_windows"), donate_argnames=("state",))
def eagle_batch_windows(eagle_cfg, eagle_params, target_cfg, target_params,
                        state: EagleBatchState, gamma: int,
                        processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                        skip_sample_adjustment: bool, key: jax.Array,
                        max_windows: int) -> EagleBatchState:
    """Up to ``max_windows`` windows in ONE device program with early exit —
    the dispatch-amortizing step (mirror of batch_spec_windows)."""

    def cond(st):
        i, state = st
        return (i < max_windows) & jnp.any(~state.finished)

    def body(st):
        i, state = st
        state = _eagle_window_body(
            eagle_cfg, eagle_params, target_cfg, target_params, state, gamma,
            processor, eos_ids, skip_sample_adjustment,
            jax.random.fold_in(key, i))
        return (i + 1, state)

    _, state = lax.while_loop(cond, body, (jnp.int32(0), state))
    return state


def batch_eagle_generate(
    prompt_ids: Sequence[Sequence[int]],
    eagle_cfg: ModelConfig, eagle_params,
    target_cfg: ModelConfig, target_params,
    gamma: int = 5,
    gen_len: int = 100,
    logits_processor: Optional[LogitsProcessor] = None,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    first_target: bool = True,
    skip_sample_adjustment: bool = False,
    key: Optional[jax.Array] = None,
    first_token_callback: Optional[Callable[[int], None]] = None,
) -> Tuple[List[List[int]], List[float]]:
    """Batched EAGLE generation; API mirrors batch_speculative_generate.

    Returns (per-seq generated token lists, per-seq acceptance rates)."""
    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompts, lens = _pad_batch(prompt_ids, pad_token_id)
    B = prompts.shape[0]
    if not first_target and int(min(len(p) for p in prompt_ids)) < 2:
        raise ValueError("first_target=False requires prompts of >= 2 tokens")

    state = eagle_batch_prefill(
        eagle_cfg, eagle_params, target_cfg, target_params, prompts, lens,
        int(gen_len), int(gamma), processor, bool(first_target), eos_ids,
        jax.random.fold_in(key, 0))

    # first window separately (TTFT = first verified tokens), then fused
    # multi-window chunks (one dispatch per chunk, early exit inside)
    state = eagle_batch_window(
        eagle_cfg, eagle_params, target_cfg, target_params, state,
        int(gamma), processor, eos_ids, bool(skip_sample_adjustment),
        jax.random.fold_in(key, 1))
    np.asarray(state.pos)  # materialize: the window actually completed
    if first_token_callback is not None:
        for i in range(B):
            first_token_callback(i)

    chunk = 8
    round_idx = 0
    while not bool(np.asarray(state.finished).all()):
        state = eagle_batch_windows(
            eagle_cfg, eagle_params, target_cfg, target_params, state,
            int(gamma), processor, eos_ids, bool(skip_sample_adjustment),
            jax.random.fold_in(key, 1000 + round_idx), chunk)
        round_idx += 1
        if round_idx > gen_len + 2:
            break

    buf, pos, plen, accepted, speculated, _ = _unpack_state(
        np.asarray(_pack_state(state)))
    outputs = [buf[i, plen[i]:pos[i]].tolist() for i in range(B)]
    rates = [float(accepted[i]) / float(speculated[i]) if speculated[i] > 0
             else 0.0 for i in range(B)]
    return outputs, rates
