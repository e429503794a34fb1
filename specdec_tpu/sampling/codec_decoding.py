"""Encoder-decoder generation: AR baseline + speculative decoding.

Reference semantics (ref: sampling/codec_base_decoding.py:9-73,
sampling/codec_speculative_decoding.py:22-193) preserved:
- decoding starts from ``decoder_start_token_id`` at decoder position 0
  (ref codec_speculative_decoding.py:81); the returned sequence INCLUDES that
  start token (ref :102,155,187 return ``decoded_input_ids[0, :pos]``)
- the generation budget is ``total_len = min(max_pos - prompt_len - 1,
  max_gen_len + 1)`` decoder positions (ref :79)
- the encoder prompt is fixed; every decoder forward cross-attends it
- acceptance/residual/bonus/EOS semantics identical to the decoder-only loop

TPU-first structure mirrors sampling/speculative.py: encoder runs once per
model, cross-attention K/V are precomputed, and the whole decode is one jitted
``lax.while_loop`` over gamma-windows with slotted-cache length rollback.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from specdec_tpu.core.cache import init_cache
from specdec_tpu.core.codec_model import (
    CodecConfig, decode_step, encode, init_cross_kv,
)
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import eos_mask, max_fn, normalize_eos, pad_to_bucket


# init_cache expects num_layers/num_kv_heads/head_dim attrs; CodecConfig differs —
# use an adapter
def _codec_cache(cfg: CodecConfig, cache_len: int):
    import dataclasses as _dc

    class _Shim:
        num_layers = cfg.num_decoder_layers
        num_kv_heads = cfg.num_heads
        head_dim = cfg.d_kv
        dtype = cfg.dtype
    return init_cache(_Shim, 1, cache_len)


@partial(jax.jit, static_argnames=("cfg", "gen_budget", "processor", "eos_ids",
                                   "cache_len"))
def _codec_ar(cfg: CodecConfig, params, prompt, prompt_len,
              gen_budget: int, processor: LogitsProcessor,
              eos_ids: Tuple[int, ...], cache_len: int, key):
    mask = (jnp.arange(prompt.shape[0]) < prompt_len).astype(jnp.int32)[None, :]
    enc_out = encode(cfg, params, prompt[None, :], mask)
    ck, cv = init_cross_kv(cfg, params, enc_out)
    cache = _codec_cache(cfg, cache_len)

    buf = jnp.zeros((cache_len,), jnp.int32)
    buf = buf.at[0].set(cfg.decoder_start_token_id)
    total_len = jnp.minimum(
        cfg.max_position_embeddings - prompt_len - 1, gen_budget)

    def cond(st):
        buf, cache, pos, finished, step = st
        return (~finished) & (pos < total_len)

    def body(st):
        buf, cache, pos, finished, step = st
        prev = lax.dynamic_index_in_dim(buf, pos - 1, 0, keepdims=False)
        logits, cache = decode_step(cfg, params, prev[None, None], cache,
                                    ck, cv, mask)
        probs = processor(logits[0, 0])
        tok = processor.sample(probs, jax.random.fold_in(key, step))
        tok = tok.astype(jnp.int32)
        buf = lax.dynamic_update_index_in_dim(buf, tok, pos, axis=0)
        finished = eos_mask(tok, eos_ids)
        return (buf, cache, pos + 1, finished, step + 1)

    st = (buf, cache, jnp.int32(1), jnp.asarray(False), jnp.int32(0))
    buf, _, pos, _, _ = lax.while_loop(cond, body, st)
    # fold pos into the buffer: ONE host pull (RPC round-trips dominate on
    # the tunneled backend; see sampling/speculative.py)
    return jnp.concatenate([buf, pos[None]])


def autoregressive_generate_encoder_decoder(
    inputs: Sequence[int],
    cfg: CodecConfig,
    params,
    max_gen_len: int = 40,
    logits_processor: Optional[LogitsProcessor] = None,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    use_cache: bool = True,
    key: Optional[jax.Array] = None,
    debug: bool = False,
) -> List[int]:
    """AR over decoder ids with fixed encoder prompt (ref
    codec_base_decoding.py:9-73)."""
    del use_cache, debug
    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompt, n = pad_to_bucket(inputs, pad_token_id)
    gen_budget = max_gen_len + 1
    cache_len = gen_budget + 8
    packed = _codec_ar(cfg, params, prompt, jnp.int32(n), gen_budget,
                       processor, eos_ids, cache_len, key)
    import numpy as np
    packed = np.asarray(packed)   # ONE pull (pos rides in the same array)
    return packed[:int(packed[-1])].tolist()


@partial(jax.jit, static_argnames=(
    "drafter_cfg", "target_cfg", "gamma", "gen_budget", "processor",
    "eos_ids", "first_target", "skip_sample_adjustment", "cache_len"))
def _codec_spec(drafter_cfg: CodecConfig, drafter_params,
                target_cfg: CodecConfig, target_params,
                prompt, prompt_len, gamma: int, gen_budget: int,
                processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                first_target: bool, skip_sample_adjustment: bool,
                cache_len: int, key):
    mask = (jnp.arange(prompt.shape[0]) < prompt_len).astype(jnp.int32)[None, :]
    t_enc = encode(target_cfg, target_params, prompt[None, :], mask)
    t_ck, t_cv = init_cross_kv(target_cfg, target_params, t_enc)
    d_enc = encode(drafter_cfg, drafter_params, prompt[None, :], mask)
    d_ck, d_cv = init_cross_kv(drafter_cfg, drafter_params, d_enc)
    t_cache = _codec_cache(target_cfg, cache_len)
    d_cache = _codec_cache(drafter_cfg, cache_len)

    buf = jnp.zeros((cache_len,), jnp.int32)
    buf = buf.at[0].set(target_cfg.decoder_start_token_id)
    total_len = jnp.minimum(
        target_cfg.max_position_embeddings - prompt_len - 1, gen_budget)

    def t_step(tokens, cache):
        return decode_step(target_cfg, target_params, tokens, cache,
                           t_ck, t_cv, mask)

    def d_step(tokens, cache):
        return decode_step(drafter_cfg, drafter_params, tokens, cache,
                           d_ck, d_cv, mask)

    if first_target:
        logits, t_cache = t_step(buf[:1][None, :], t_cache)
        p0 = processor(logits[0, 0])
        tok0 = processor.sample(p0, jax.random.fold_in(key, 2**31 - 1))
        tok0 = tok0.astype(jnp.int32)
        buf = buf.at[1].set(tok0)
        pos = jnp.int32(2)
        finished0 = eos_mask(tok0, eos_ids) | (pos >= total_len)
        # target cache covers decoder pos 0 = pos-1-... set to pos-1=1 ✓
        t_cache = t_cache.with_length(jnp.full((1,), 1, jnp.int32))
    else:
        pos = jnp.int32(1)
        finished0 = pos >= total_len
        t_cache = t_cache.with_length(jnp.zeros((1,), jnp.int32))
    d_cache = d_cache.with_length((pos - 1)[None])

    def cond(st):
        (buf, pos, d_cache, t_cache, finished, accepted, speculated,
         window) = st
        return (~finished) & (pos < total_len) & (window < gen_budget)

    def body(st):
        (buf, pos, d_cache, t_cache, finished, accepted, speculated,
         window) = st
        wkey = jax.random.fold_in(key, window)
        k_draft, k_accept, k_resample = jax.random.split(wkey, 3)

        first_tok = lax.dynamic_index_in_dim(buf, pos - 1, 0, keepdims=False)

        def draft(carry, i):
            cache, prev = carry
            logits, cache = d_step(prev[None, None], cache)
            q = processor(logits[0, 0])
            x = processor.sample(q, jax.random.fold_in(k_draft, i))
            return (cache, x.astype(jnp.int32)), (q, x.astype(jnp.int32))

        (d_cache2, last_draft), (q_all, drafts) = lax.scan(
            draft, (d_cache, first_tok), jnp.arange(gamma))
        _, d_cache2 = d_step(last_draft[None, None], d_cache2)

        t_in = jnp.concatenate([first_tok[None], drafts])
        t_logits, t_cache2 = t_step(t_in[None, :], t_cache)
        p_all = processor(t_logits[0])

        r = jax.random.uniform(k_accept, (gamma,))
        idx = jnp.arange(gamma)
        p_x = p_all[idx, drafts]
        q_x = q_all[idx, drafts]
        reject = r > p_x / jnp.maximum(q_x, 1e-38)
        n = jnp.where(jnp.any(reject), jnp.argmax(reject), gamma)

        p_n = p_all[jnp.minimum(n, gamma)]
        q_n = q_all[jnp.minimum(n, gamma - 1)]
        if skip_sample_adjustment:
            resample = p_n
        else:
            residual = max_fn(p_n - q_n)
            has_mass = jnp.sum(jnp.maximum(p_n - q_n, 0.0)) > 1e-12
            resample = jnp.where(has_mass, residual, p_n)
        next_dist = jnp.where(n == gamma, p_all[gamma], resample)
        next_tok = processor.sample(next_dist, k_resample).astype(jnp.int32)

        cand = jnp.where(idx < n, drafts, 0)
        cand = jnp.append(cand, 0).at[n].set(next_tok)

        remaining = total_len - pos
        advance = jnp.minimum(n + 1, remaining)
        is_eos = eos_mask(cand, eos_ids) & (jnp.arange(gamma + 1) <= n)
        within = is_eos & (jnp.arange(gamma + 1) < advance)
        any_eos = jnp.any(within)
        advance = jnp.where(any_eos, jnp.minimum(jnp.argmax(within) + 1,
                                                 advance), advance)

        buf = lax.dynamic_update_slice(buf, cand, (pos,))
        new_pos = pos + advance
        finished = any_eos | (new_pos >= total_len)

        corrected_gamma = jnp.clip(total_len - pos - 1, 0, gamma)
        accepted = accepted + jnp.minimum(n, corrected_gamma)
        speculated = speculated + corrected_gamma

        d_cache2 = d_cache2.with_length((new_pos - 1)[None])
        t_cache2 = t_cache2.with_length((new_pos - 1)[None])
        return (buf, new_pos, d_cache2, t_cache2, finished, accepted,
                speculated, window + 1)

    st = (buf, pos, d_cache, t_cache, finished0, jnp.int32(0), jnp.int32(0),
          jnp.int32(0))
    buf, pos, _, _, _, accepted, speculated, _ = lax.while_loop(cond, body, st)
    # fold scalar stats into the buffer: ONE host pull
    return jnp.concatenate([buf, jnp.stack([pos, accepted, speculated])])


def speculative_generate_encoder_decoder(
    inputs: Sequence[int],
    drafter_cfg: CodecConfig, drafter_params,
    target_cfg: CodecConfig, target_params,
    gamma: int = 5,
    logits_processor: Optional[LogitsProcessor] = None,
    max_gen_len: int = 40,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    use_cache: bool = True,
    skip_sample_adjustment: bool = False,
    first_target: bool = True,
    key: Optional[jax.Array] = None,
    debug: bool = False,
) -> Tuple[List[int], float]:
    """Speculative decoding for encoder-decoder models (ref
    codec_speculative_decoding.py:22-60 signature parity)."""
    del use_cache, debug
    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompt, n = pad_to_bucket(inputs, pad_token_id)
    gen_budget = max_gen_len + 1
    cache_len = gen_budget + gamma + 4

    packed = _codec_spec(
        drafter_cfg, drafter_params, target_cfg, target_params, prompt,
        jnp.int32(n), int(gamma), gen_budget, processor, eos_ids,
        bool(first_target), bool(skip_sample_adjustment), cache_len, key)
    import numpy as np
    packed = np.asarray(packed)   # ONE pull (stats ride in the same array)
    pos, accepted, speculated = (int(v) for v in packed[-3:])
    rate = accepted / speculated if speculated > 0 else 0.0
    return packed[:pos].tolist(), rate
