"""Autoregressive baseline generation (ref: sampling/base_decoding.py:10-65).

TPU-native redesign: the whole generation is ONE jitted program — prefill +
``lax.while_loop`` over single-token steps — instead of a Python token loop
with per-step host sync. The KV cache is always on (static-shape slotted cache;
the reference's ``use_cache=False`` default worked around torch cache
instability, ref README.md:271-274, which doesn't apply here).

Host wrapper keeps the reference's API shape: list[int] prompt in,
list[int] generated out, EOS-token set, pad bucketing for compile reuse.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from specdec_tpu.core.cache import KVCache, init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_step
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import eos_mask, normalize_eos, pad_to_bucket


@partial(jax.jit, static_argnames=("cfg", "gen_len", "processor", "eos_ids"))
def _ar_generate(cfg: ModelConfig, params, prompt: jax.Array, prompt_len: jax.Array,
                 gen_len: int, processor: LogitsProcessor,
                 eos_ids: Tuple[int, ...], key: jax.Array):
    """prompt: [P_pad] int32 (right-padded). Returns (buf, n_generated)."""
    P = prompt.shape[0]
    S = P + gen_len
    buf = jnp.zeros((S,), dtype=jnp.int32).at[:P].set(prompt)

    cache = init_cache(cfg, 1, S)
    logits, cache = forward_step(cfg, params, prompt[None, :], cache)
    cache = cache.with_length(prompt_len[None])
    last_logits = logits[0, prompt_len - 1]

    total_len = jnp.minimum(cfg.max_position_embeddings, prompt_len + gen_len)

    def cond(state):
        buf, cache, pos, last_logits, finished, step = state
        return (~finished) & (pos < total_len)

    def body(state):
        buf, cache, pos, last_logits, finished, step = state
        tok = processor.sample_from_logits(last_logits,
                                           jax.random.fold_in(key, step))
        tok = tok.astype(jnp.int32)
        buf = lax.dynamic_update_index_in_dim(buf, tok, pos, axis=0)
        finished = eos_mask(tok, eos_ids)
        logits, cache = forward_step(cfg, params, tok[None, None], cache)
        return (buf, cache, pos + 1, logits[0, 0], finished, step + 1)

    state = (buf, cache, prompt_len, last_logits, jnp.asarray(False), jnp.int32(0))
    buf, _, pos, _, _, _ = lax.while_loop(cond, body, state)
    # fold n_generated into the buffer: ONE host pull instead of two RPC
    # round-trips on the tunneled backend
    return jnp.concatenate([buf, (pos - prompt_len)[None]])


def autoregressive_generate(
    inputs: Sequence[int],
    cfg: ModelConfig,
    params,
    max_gen_len: int = 40,
    logits_processor: Optional[LogitsProcessor] = None,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    key: Optional[jax.Array] = None,
    use_cache: bool = True,  # accepted for API parity; cache is always slotted
    debug: bool = False,
) -> List[int]:
    """Generate greedily/sampled from the target alone (ref
    sampling/base_decoding.py:10-65 signature parity)."""
    del use_cache, debug
    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompt, n = pad_to_bucket(inputs, pad_token_id)
    packed = _ar_generate(cfg, params, prompt, jnp.int32(n), int(max_gen_len),
                          processor, eos_ids, key)
    # ONE host transfer: per-element indexing of a device array costs a full
    # host<->device round trip per token (and n_gen rides in the same array)
    import numpy as np
    packed = np.asarray(packed)
    buf, n_gen = packed[:-1], int(packed[-1])
    return buf[n:n + n_gen].tolist()


# ---------------------------------------------------------------------------
# Beam search (ref: sampling/base_decoding.py:69-187)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "gen_len", "num_beams", "top_k",
                                   "eos_ids", "pad_id"))
def _beam_search(cfg: ModelConfig, params, prompt: jax.Array,
                 prompt_len: jax.Array, gen_len: int, num_beams: int,
                 top_k: int, alpha: float, min_length: float,
                 eos_ids: Tuple[int, ...], pad_id: int):
    """Length-penalized beam search as one jitted program.

    Reference semantics preserved (ref :106-187): score = cumulative
    log-prob / ((min_length + length)/(min_length + 1))**alpha, with the
    prefill seeding cum-logprob at 1.0 (ref :124-131); expansion token equal
    to EOS *or pad* finishes a beam (ref :156-157); finished beams carry
    themselves as frozen candidates (ref :140-146) and bypass dedup; duplicate
    expansion candidates (identical full sequences) are dropped keeping the
    earliest (ref :159-165); loop ends when every beam is finished; returns
    the best beam (ref :185-187).

    TPU-first redesign: beams are a batch dimension over a shared KV cache
    (the reference re-forwards the whole prefix each step, cacheless —
    ref :103 "Cache is not available yet"); beam reordering gathers cache
    rows; candidate scoring/dedup is fully vectorized over K*(k+1) slots.
    """
    K, k = num_beams, top_k
    P = prompt.shape[0]
    S = P + gen_len
    NEG = jnp.float32(-1e30)

    total_len = jnp.minimum(cfg.max_position_embeddings, prompt_len + gen_len)

    def lp(length):
        return ((min_length + length) / (min_length + 1.0)) ** alpha

    # --- prefill: replicate prompt across beams, seed with top-K tokens ----
    cache = init_cache(cfg, K, S)
    prompts = jnp.broadcast_to(prompt[None, :], (K, P))
    logits, cache = forward_step(cfg, params, prompts, cache)
    cache = cache.with_length(jnp.full((K,), prompt_len, jnp.int32))

    buf = jnp.full((K, S), pad_id, dtype=jnp.int32)
    buf = lax.dynamic_update_slice(buf, prompts, (0, 0))

    logp0 = jax.nn.log_softmax(
        lax.dynamic_index_in_dim(logits[0], prompt_len - 1, axis=0,
                                 keepdims=False))
    top_probs0, top_tokens0 = lax.top_k(logp0, K)
    buf = jax.vmap(lambda row, t, o: lax.dynamic_update_slice(
        row, t[None], (o,)))(buf, top_tokens0.astype(jnp.int32),
                             jnp.full((K,), prompt_len, jnp.int32))
    cum = 1.0 + top_probs0                               # ref :124-130 offset
    score = cum / lp(1.0)
    last_index = jnp.full((K,), -1, jnp.int32)

    def cond(st):
        buf, cum, score, last_index, cache, cur = st
        return (cur < total_len) & jnp.any(last_index < 0)

    def body(st):
        buf, cum, score, last_index, cache, cur = st
        finished = last_index >= 0

        last_tok = jnp.take_along_axis(buf, (cur - 1)[None][:, None] *
                                       jnp.ones((K, 1), jnp.int32), axis=1)
        logits, new_cache = forward_step(cfg, params, last_tok, cache)
        logp = jax.nn.log_softmax(logits[:, 0], axis=-1)   # [K, V]
        top_probs, top_tokens = lax.top_k(logp, k)         # [K, k]
        top_tokens = top_tokens.astype(jnp.int32)

        cur_len = (cur - prompt_len).astype(jnp.float32)
        penalty = lp(cur_len)

        # --- candidate slots: per beam [self, exp_0..exp_{k-1}] ------------
        C = K * (k + 1)
        slot_parent = jnp.repeat(jnp.arange(K), k + 1)           # [C]
        slot_is_self = (jnp.arange(C) % (k + 1)) == 0
        exp_idx = jnp.maximum(jnp.arange(C) % (k + 1) - 1, 0)

        exp_score = (cum[slot_parent] + top_probs[slot_parent, exp_idx]) / \
            jnp.where(penalty != 0, penalty, 1.0)
        exp_tok = top_tokens[slot_parent, exp_idx]
        self_score = score[slot_parent]
        parent_fin = finished[slot_parent]

        cand_score = jnp.where(
            slot_is_self,
            jnp.where(parent_fin, self_score, NEG),
            jnp.where(parent_fin, NEG, exp_score))
        # token occupying position `cur` in the candidate's sequence
        parent_tok_at_cur = jnp.take_along_axis(
            buf, cur * jnp.ones((K, 1), jnp.int32), axis=1)[:, 0]
        cand_tok = jnp.where(slot_is_self, parent_tok_at_cur[slot_parent],
                             exp_tok)

        # --- dedup: drop expansion candidates equal to an earlier candidate
        row_eq = jnp.all(buf[:, None, :] == buf[None, :, :], axis=-1)  # [K,K]
        same = row_eq[slot_parent[:, None], slot_parent[None, :]] & \
            (cand_tok[:, None] == cand_tok[None, :])
        earlier = jnp.arange(C)[None, :] < jnp.arange(C)[:, None]
        alive = cand_score > NEG / 2
        dup = jnp.any(same & earlier & alive[None, :], axis=1) & (~slot_is_self)
        cand_score = jnp.where(dup, NEG, cand_score)

        # --- select top K candidates ---------------------------------------
        new_score, sel = lax.top_k(cand_score, K)
        sel_parent = slot_parent[sel]
        sel_self = slot_is_self[sel]
        sel_tok = cand_tok[sel]

        new_buf = buf[sel_parent]
        written = jax.vmap(lambda row, t: row.at[cur].set(t))(new_buf, sel_tok)
        new_buf = jnp.where(sel_self[:, None], new_buf, written)

        new_cum_exp = cum[sel_parent] + top_probs[sel_parent,
                                                  jnp.maximum(sel % (k + 1) - 1, 0)]
        new_cum = jnp.where(sel_self, cum[sel_parent], new_cum_exp)

        is_stop = _tok_in(sel_tok, eos_ids) | (sel_tok == pad_id)
        new_last = jnp.where(sel_self, last_index[sel_parent],
                             jnp.where(is_stop, cur, -1)).astype(jnp.int32)

        # reorder the cache to follow the selected parents (lengths all equal
        # `cur` here — forward_step already advanced them past token cur-1)
        new_cache = KVCache(k=new_cache.k[:, sel_parent],
                            v=new_cache.v[:, sel_parent],
                            length=new_cache.length[sel_parent])
        return (new_buf, new_cum, new_score, new_last, new_cache, cur + 1)

    st = (buf, cum, score, last_index, cache, prompt_len + 1)
    buf, cum, score, last_index, cache, cur = lax.while_loop(cond, body, st)
    last_index = jnp.where(last_index < 0, total_len - 1, last_index)
    # fold last_index into the buffer: ONE host pull
    return jnp.concatenate([buf[0], last_index[0][None]])


def _tok_in(tokens: jax.Array, ids: Tuple[int, ...]) -> jax.Array:
    if not ids:
        return jnp.zeros(tokens.shape, dtype=bool)
    arr = jnp.asarray(ids, dtype=tokens.dtype)
    return jnp.any(tokens[..., None] == arr, axis=-1)


def beam_search_generate(
    inputs: Sequence[int],
    cfg: ModelConfig,
    params,
    max_gen_len: int = 40,
    num_beams: int = 4,
    top_k: int = 3,
    min_length: float = 5.0,
    alpha: float = 1.2,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    debug: bool = False,
) -> List[int]:
    """Beam search baseline with reference API parity (ref
    sampling/base_decoding.py:69-81)."""
    del debug
    eos_ids = normalize_eos(eos_tokens_id)
    prompt, n = pad_to_bucket(inputs, pad_token_id)
    assert n < cfg.max_position_embeddings, \
        "Prompt length exceeds maximum sequence length."
    packed = _beam_search(cfg, params, prompt, jnp.int32(n),
                          int(max_gen_len), int(num_beams), int(top_k),
                          float(alpha), float(min_length), eos_ids,
                          int(pad_token_id))
    import numpy as np
    packed = np.asarray(packed)   # ONE pull (last index rides along)
    buf, last = packed[:-1], int(packed[-1])
    return buf[n:last + 1].tolist()
