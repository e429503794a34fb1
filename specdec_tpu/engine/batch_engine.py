"""Batched speculative + autoregressive decoding.

Rebuild of the reference's batched hot path (ref: engine/infer_engine.py:99-502)
as jitted whole-batch window steps:

- drafter draft phase = ``lax.scan`` of gamma cached single-token steps over the
  full batch (ref :224-263 runs a Python loop with per-seq masking)
- target verify = ONE cached forward over gamma+1 positions per sequence
  (the reference re-forwards the ENTIRE prompt+generation uncached every
  window, ref :270-276 — a quirk SURVEY.md §7.3 says to fix, not copy)
- accept/reject/residual fully vectorized over [B, gamma] (ref :279-336 is a
  per-sequence per-draft Python loop with .item() syncs)
- per-sequence cache lengths make divergent accept counts free: rollback is
  length arithmetic, not slicing

Deliberate quirk fixes (documented divergences from ref):
- q/p use the configured logits processor, consistent with the single-sequence
  path (ref batched path hardcodes temp-1 softmax, :241,276)
- full-acceptance windows emit the bonus token (ref batched path drops it, :330-338)
- pad tokens never enter attention (ref includes them unmasked, :270)
- no token-id-0 sentinel trimming (ref :344-349); per-seq lengths are tracked
  exactly
- TTFT is recorded when the first *verified* token of a request exists
  (ref fires the callback when the first unverified draft appears, :261-263)
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from specdec_tpu.core.cache import KVCache, init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_step as _slotted_forward_step
from specdec_tpu.core.model import forward_step_paged


def forward_step(cfg, params, tokens, cache):
    """Dispatch on cache type: slotted KVCache or PagedKVCache (the window
    step below is cache-agnostic; the continuous batcher picks the mode)."""
    from specdec_tpu.core.paged_cache import PagedKVCache, QuantPagedKVCache
    if isinstance(cache, (PagedKVCache, QuantPagedKVCache)):
        return forward_step_paged(cfg, params, tokens, cache)
    return _slotted_forward_step(cfg, params, tokens, cache)
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import max_fn, normalize_eos


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchState:
    """Device-resident state of a batch generation."""

    buf: jax.Array        # [B, S] committed tokens (prompt + generated)
    pos: jax.Array        # [B] committed length per sequence
    prompt_len: jax.Array # [B]
    total_len: jax.Array  # [B] per-seq generation cap
    finished: jax.Array   # [B] bool
    d_cache: Optional[KVCache]
    t_cache: KVCache
    accepted: jax.Array   # [B] int32
    speculated: jax.Array # [B] int32
    # optional per-slot (temperature, top_k, top_p) [B, 3] f32 — consumed by
    # PerSlotProcessor for per-request sampling in serving; None = uniform
    samp: Optional[jax.Array] = None


@jax.jit
def _pack_state(state: "BatchState") -> jax.Array:
    """[B, S+5] int32: buf ++ [pos, prompt_len, accepted, speculated,
    finished]. On the tunneled backend each materialization is an RPC
    round-trip, so harvesting via ONE packed pull instead of 5-6 separate
    ``np.asarray`` calls saves ~100+ ms per sync."""
    cols = jnp.stack([state.pos, state.prompt_len, state.accepted,
                      state.speculated, state.finished.astype(jnp.int32)],
                     axis=1)
    return jnp.concatenate([state.buf, cols], axis=1)


def _unpack_state(packed: np.ndarray):
    """(buf, pos, prompt_len, accepted, speculated, finished) from the host
    copy of ``_pack_state``'s output."""
    buf = packed[:, :-5]
    pos, plen, acc, spec, fin = (packed[:, -5 + i] for i in range(5))
    return buf, pos, plen, acc, spec, fin.astype(bool)


def _gather_last(buf: jax.Array, pos: jax.Array) -> jax.Array:
    """buf[b, pos[b]-1] for each b."""
    return jnp.take_along_axis(buf, (pos - 1)[:, None], axis=1)[:, 0]


def _eos_hit(tokens: jax.Array, eos_ids: Tuple[int, ...]) -> jax.Array:
    if not eos_ids:
        return jnp.zeros(tokens.shape, dtype=bool)
    eos = jnp.asarray(eos_ids, dtype=tokens.dtype)
    return jnp.any(tokens[..., None] == eos, axis=-1)


@partial(jax.jit, static_argnames=(
    "drafter_cfg", "target_cfg", "gen_len", "gamma", "processor",
    "first_target", "use_drafter", "eos_ids"))
def batch_prefill(drafter_cfg: Optional[ModelConfig], drafter_params,
                  target_cfg: ModelConfig, target_params,
                  prompts: jax.Array, prompt_lens: jax.Array,
                  gen_len: int, gamma: int,
                  processor: LogitsProcessor, first_target: bool,
                  use_drafter: bool, eos_ids: Tuple[int, ...],
                  key: jax.Array, samp=None) -> BatchState:
    """Prefill both models on right-padded prompts; optionally commit the
    first token from the target (ref first_target, sampling/speculative_decoding.py:84-103)."""
    B, P = prompts.shape
    S = P + gen_len + gamma + 2
    buf = jnp.zeros((B, S), dtype=jnp.int32)
    buf = lax.dynamic_update_slice(buf, prompts, (0, 0))

    max_pos = target_cfg.max_position_embeddings
    if use_drafter:
        max_pos = min(max_pos, drafter_cfg.max_position_embeddings)
    total_len = jnp.minimum(max_pos, prompt_lens + gen_len)

    t_cache = init_cache(target_cfg, B, S)
    t_logits, t_cache = forward_step(target_cfg, target_params, prompts, t_cache)

    d_cache = None
    if use_drafter:
        d_cache = init_cache(drafter_cfg, B, S)
        _, d_cache = forward_step(drafter_cfg, drafter_params, prompts, d_cache)

    if first_target:
        last = jnp.take_along_axis(t_logits, (prompt_lens - 1)[:, None, None],
                                   axis=1)[:, 0]            # [B, V]
        p0 = processor.batched(last, samp)
        keys = jax.random.split(key, B)
        tok0 = processor.sample_batched(p0, keys, samp).astype(jnp.int32)
        buf = jax.vmap(lambda row, t, o: lax.dynamic_update_slice(row, t[None], (o,))
                       )(buf, tok0, prompt_lens)
        pos = prompt_lens + 1
        finished = _eos_hit(tok0, eos_ids) | (pos >= total_len)
    else:
        pos = prompt_lens
        finished = pos >= total_len

    t_cache = t_cache.with_length(pos - 1)
    if use_drafter:
        # drafter invariant: covers pos-2 (the window's first draft step
        # feeds two tokens — see _spec_window_body's catch-up fold)
        d_cache = d_cache.with_length(pos - 2)

    zeros = jnp.zeros((B,), jnp.int32)
    return BatchState(buf=buf, pos=pos, prompt_len=prompt_lens,
                      total_len=total_len, finished=finished,
                      d_cache=d_cache, t_cache=t_cache,
                      accepted=zeros, speculated=zeros, samp=samp)


def _spec_window_body(drafter_cfg: ModelConfig, drafter_params,
                      target_cfg: ModelConfig, target_params,
                      state: BatchState, gamma: int,
                      processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                      skip_sample_adjustment: bool,
                      key: jax.Array) -> BatchState:
    """One gamma-draft/verify/accept window for the whole batch (traceable
    body shared by the single-window and fused multi-window entry points)."""
    B = state.buf.shape[0]
    idxg = jnp.arange(gamma)

    first_tok = _gather_last(state.buf, state.pos)          # [B]
    k_draft, k_accept, k_resample = jax.random.split(key, 3)

    # --- draft phase (two-token first step: catch-up fold, see
    # sampling/speculative.py) ---------------------------------------------
    prev2 = jnp.stack([
        jnp.take_along_axis(state.buf, (state.pos - 2)[:, None], axis=1)[:, 0],
        first_tok], axis=1)                                  # [B, 2]
    logits2, d_cache = forward_step(drafter_cfg, drafter_params, prev2,
                                    state.d_cache)
    q0 = processor.batched(logits2[:, 1], state.samp)        # [B, V]
    keys0 = jax.random.split(jax.random.fold_in(k_draft, 0), B)
    x0 = processor.sample_batched(q0, keys0, state.samp).astype(jnp.int32)

    def draft_step(carry, i):
        cache, prev = carry
        logits, cache = forward_step(drafter_cfg, drafter_params,
                                     prev[:, None], cache)
        q = processor.batched(logits[:, 0], state.samp)     # [B, V]
        keys = jax.random.split(jax.random.fold_in(k_draft, i), B)
        x = processor.sample_batched(q, keys, state.samp).astype(jnp.int32)
        return (cache, x), (q, x)

    (d_cache, _), (q_rest, drafts_rest) = lax.scan(
        draft_step, (d_cache, x0), jnp.arange(1, gamma))
    q_all = jnp.concatenate([q0[:, None], jnp.swapaxes(q_rest, 0, 1)], axis=1)
    drafts = jnp.concatenate([x0[:, None], jnp.swapaxes(drafts_rest, 0, 1)],
                             axis=1)                        # [B, gamma]

    # --- verify phase ------------------------------------------------------
    t_in = jnp.concatenate([first_tok[:, None], drafts], axis=1)  # [B, gamma+1]
    t_logits, t_cache = forward_step(target_cfg, target_params, t_in,
                                     state.t_cache)
    p_all = processor.batched(t_logits, state.samp)         # [B, gamma+1, V]

    # --- vectorized acceptance --------------------------------------------
    r = jax.random.uniform(k_accept, (B, gamma))
    p_x = jnp.take_along_axis(p_all[:, :gamma], drafts[..., None], axis=2)[..., 0]
    q_x = jnp.take_along_axis(q_all, drafts[..., None], axis=2)[..., 0]
    reject = r > p_x / jnp.maximum(q_x, 1e-38)
    n = jnp.where(jnp.any(reject, axis=1), jnp.argmax(reject, axis=1), gamma)

    # --- next token: bonus or residual resample ---------------------------
    p_n = jnp.take_along_axis(p_all, n[:, None, None], axis=1)[:, 0]       # [B, V]
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
    next_tok = processor.sample_batched(next_dist, keys,
                                        state.samp).astype(jnp.int32)

    # --- commit ------------------------------------------------------------
    cand = jnp.where(idxg[None, :] < n[:, None], drafts, 0)
    cand = jnp.concatenate([cand, jnp.zeros((B, 1), jnp.int32)], axis=1)
    cand = jax.vmap(lambda row, t, i: row.at[i].set(t))(cand, next_tok, n)

    remaining = state.total_len - state.pos
    advance = jnp.minimum(n + 1, remaining)
    idxg1 = jnp.arange(gamma + 1)
    is_eos = _eos_hit(cand, eos_ids) & (idxg1[None, :] <= n[:, None])
    within = is_eos & (idxg1[None, :] < advance[:, None])
    any_eos = jnp.any(within, axis=1)
    first_eos = jnp.argmax(within, axis=1)
    advance = jnp.where(any_eos, jnp.minimum(first_eos + 1, advance), advance)
    advance = jnp.where(state.finished, 0, advance)

    buf = jax.vmap(lambda row, c, o: lax.dynamic_update_slice(row, c, (o,))
                   )(state.buf, cand, state.pos)
    # finished sequences must not see their buffer mutated past pos
    buf = jnp.where(state.finished[:, None], state.buf, buf)
    new_pos = state.pos + advance
    finished = state.finished | any_eos | (new_pos >= state.total_len)

    # --- bookkeeping (corrected gamma, ref :106,147,189) -------------------
    corrected_gamma = jnp.clip(state.total_len - state.pos - 1, 0, gamma)
    active = ~state.finished
    accepted = state.accepted + jnp.where(
        active, jnp.minimum(n, corrected_gamma), 0)
    speculated = state.speculated + jnp.where(active, corrected_gamma, 0)

    return dataclasses.replace(
        state, buf=buf, pos=new_pos, finished=finished,
        d_cache=d_cache.with_length(new_pos - 2),
        t_cache=t_cache.with_length(new_pos - 1),
        accepted=accepted, speculated=speculated)


@partial(jax.jit, static_argnames=(
    "drafter_cfg", "target_cfg", "gamma", "processor", "eos_ids",
    "skip_sample_adjustment"), donate_argnames=("state",))
def batch_spec_window(drafter_cfg, drafter_params, target_cfg, target_params,
                      state: BatchState, gamma: int,
                      processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                      skip_sample_adjustment: bool,
                      key: jax.Array) -> BatchState:
    return _spec_window_body(drafter_cfg, drafter_params, target_cfg,
                             target_params, state, gamma, processor, eos_ids,
                             skip_sample_adjustment, key)


@partial(jax.jit, static_argnames=(
    "drafter_cfg", "target_cfg", "gamma", "processor", "eos_ids",
    "skip_sample_adjustment", "max_windows"), donate_argnames=("state",))
def batch_spec_windows(drafter_cfg, drafter_params, target_cfg, target_params,
                       state: BatchState, gamma: int,
                       processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                       skip_sample_adjustment: bool, key: jax.Array,
                       max_windows: int) -> BatchState:
    """Run up to ``max_windows`` windows in ONE device program, exiting early
    when every sequence is finished — amortizes the per-dispatch host cost
    across windows (serving uses this as windows_per_sync)."""

    def cond(st):
        i, state = st
        return (i < max_windows) & jnp.any(~state.finished)

    def body(st):
        i, state = st
        state = _spec_window_body(
            drafter_cfg, drafter_params, target_cfg, target_params, state,
            gamma, processor, eos_ids, skip_sample_adjustment,
            jax.random.fold_in(key, i))
        return (i + 1, state)

    _, state = lax.while_loop(cond, body, (jnp.int32(0), state))
    return state


@partial(jax.jit, static_argnames=("target_cfg", "processor", "eos_ids"),
         donate_argnames=("state",))
def batch_ar_step(target_cfg: ModelConfig, target_params, state: BatchState,
                  processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                  key: jax.Array) -> BatchState:
    """One batched AR token step (ref: engine/infer_engine.py:408-487 redesigned:
    no per-layer cache scatter gymnastics — per-seq lengths do the compaction)."""
    B = state.buf.shape[0]
    last = _gather_last(state.buf, state.pos)
    logits, t_cache = forward_step(target_cfg, target_params, last[:, None],
                                   state.t_cache)
    keys = jax.random.split(key, B)
    tok = processor.sample_from_logits_batched(
        logits[:, 0], keys, state.samp).astype(jnp.int32)

    advance = jnp.where(state.finished | (state.pos >= state.total_len), 0, 1)
    buf = jax.vmap(lambda row, t, o: lax.dynamic_update_slice(row, t[None], (o,))
                   )(state.buf, tok, state.pos)
    buf = jnp.where(state.finished[:, None], state.buf, buf)
    new_pos = state.pos + advance
    finished = state.finished | _eos_hit(tok, eos_ids) | (new_pos >= state.total_len)
    return dataclasses.replace(state, buf=buf, pos=new_pos, finished=finished,
                               t_cache=t_cache.with_length(new_pos - 1))


# ---------------------------------------------------------------------------
# Host-side drivers (window loop + TTFT hooks + output extraction)
# ---------------------------------------------------------------------------

def _pad_batch(prompt_ids: Sequence[Sequence[int]], pad_id: int,
               bucket: int = 64) -> Tuple[jax.Array, jax.Array]:
    lens = [len(p) for p in prompt_ids]
    P = max(bucket, ((max(lens) + bucket - 1) // bucket) * bucket)
    arr = np.full((len(prompt_ids), P), pad_id, dtype=np.int32)
    for i, p in enumerate(prompt_ids):
        arr[i, :len(p)] = np.asarray(p, dtype=np.int32)
    return jnp.asarray(arr), jnp.asarray(lens, dtype=jnp.int32)


def batch_speculative_generate(
    prompt_ids: Sequence[Sequence[int]],
    drafter_cfg: ModelConfig, drafter_params,
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
    """Batched speculative generation (ref: engine/infer_engine.py:149-359).

    Returns (per-seq generated token lists, per-seq acceptance rates).
    """
    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompts, lens = _pad_batch(prompt_ids, pad_token_id)
    B = prompts.shape[0]

    state = batch_prefill(drafter_cfg, drafter_params, target_cfg, target_params,
                          prompts, lens, int(gen_len), int(gamma), processor,
                          bool(first_target), True, eos_ids,
                          jax.random.fold_in(key, 0))

    # first window separately (TTFT = first verified tokens), then fused
    # multi-window chunks (one dispatch per chunk, early exit inside)
    state = batch_spec_window(
        drafter_cfg, drafter_params, target_cfg, target_params, state,
        int(gamma), processor, eos_ids, bool(skip_sample_adjustment),
        jax.random.fold_in(key, 1))
    np.asarray(state.pos)  # materialize: the window actually completed
    if first_token_callback is not None:
        for i in range(B):
            first_token_callback(i)

    chunk = 8
    round_idx = 0
    while not bool(np.asarray(state.finished).all()):
        state = batch_spec_windows(
            drafter_cfg, drafter_params, target_cfg, target_params, state,
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


def batch_autoregressive_generate(
    prompt_ids: Sequence[Sequence[int]],
    target_cfg: ModelConfig, target_params,
    gen_len: int = 100,
    logits_processor: Optional[LogitsProcessor] = None,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    key: Optional[jax.Array] = None,
    first_token_callback: Optional[Callable[[int], None]] = None,
    steps_per_host_sync: int = 16,
) -> List[List[int]]:
    """Batched AR baseline (ref: engine/infer_engine.py:408-502). Runs
    ``steps_per_host_sync`` jitted steps between finished-mask checks to keep
    the host off the critical path."""
    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompts, lens = _pad_batch(prompt_ids, pad_token_id)
    B = prompts.shape[0]

    state = batch_prefill(None, None, target_cfg, target_params, prompts, lens,
                          int(gen_len), 0, processor, True, False, eos_ids,
                          jax.random.fold_in(key, 0))
    if first_token_callback is not None:
        state.pos.block_until_ready()
        for i in range(B):
            first_token_callback(i)

    step = 0
    while step < gen_len + 1:
        if bool(np.asarray(state.finished).all()):
            break
        for _ in range(steps_per_host_sync):
            state = batch_ar_step(target_cfg, target_params, state, processor,
                                  eos_ids, jax.random.fold_in(key, step + 1))
            step += 1

    buf, pos, plen, _, _, _ = _unpack_state(np.asarray(_pack_state(state)))
    return [buf[i, plen[i]:pos[i]].tolist() for i in range(B)]
