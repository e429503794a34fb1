"""N-gram-assisted speculative decoding (NASD).

Reference semantics (ref: ngram_assisted/ngram_assisted.py:11-164) preserved:
- drafts come from the n-gram store, NOT a model; ``stop_if_unknown`` truncates
  the window at the first unknown context (ref :95-99)
- acceptance is *sample equality*: draw from the target's processed dist at
  each draft position; accept while the sample equals the drafted token
  (ref :114-119) — no probability-ratio test, no residual adjustment (ref :140)
- on rejection the emitted token is exactly that drawn sample; on full
  acceptance, a bonus draw from the extra target position (ref :132-141)
- the store is updated with accepted context→token pairs plus the target's
  top-``filler_top_k`` tokens at each position (ref :148-155)
- acceptance-rate accounting over the (possibly truncated) effective gamma

TPU-first structure: one jitted verify step per window (target forward over
gamma+1 positions + vectorized sample/match/commit on device), with the
host↔device boundary crossed once per *window*, not per token (SURVEY.md §3.5
notes the reference crosses it per token). The effective gamma is a traced
scalar so truncated windows reuse the same compiled program.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from specdec_tpu.core.cache import init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_step
from specdec_tpu.ngram.storage import INgramStorage
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import normalize_eos, pad_to_bucket


@partial(jax.jit, static_argnames=("cfg", "processor", "gamma", "filler_k",
                                   "cache_len"))
def _nasd_prefill(cfg: ModelConfig, params, prompt, prompt_len, processor,
                  gamma, filler_k, cache_len: int, key):
    """Target prefill; returns (first sampled token, cache)."""
    cache = init_cache(cfg, 1, cache_len)
    logits, cache = forward_step(cfg, params, prompt[None, :], cache)
    cache = cache.with_length(prompt_len[None])
    p = processor(logits[0, prompt_len - 1])
    tok = processor.sample(p, key).astype(jnp.int32)
    return tok, cache


@partial(jax.jit, static_argnames=("cfg", "processor", "gamma", "filler_k"))
def _nasd_verify(cfg: ModelConfig, params, cache, last_tok, drafts,
                 eff_gamma, processor: LogitsProcessor, gamma: int,
                 filler_k: int, key):
    """One verify window. drafts: [gamma] int32 (entries >= eff_gamma ignored).

    Returns (n, samples[gamma+1], fillers[gamma+1, filler_k], new_cache).
    The emitted token for the window is samples[n] (exact-match acceptance
    makes the rejection sample and the bonus sample the same object).
    """
    t_in = jnp.concatenate([last_tok[None], drafts])      # [gamma+1]
    logits, cache = forward_step(cfg, params, t_in[None, :], cache)
    p = processor(logits[0])                              # [gamma+1, V]

    keys = jax.random.split(key, gamma + 1)
    samples = jax.vmap(lambda pi, ki: processor.sample(pi, ki))(p, keys)
    samples = samples.astype(jnp.int32)

    idx = jnp.arange(gamma)
    mismatch = (samples[:gamma] != drafts) & (idx < eff_gamma)
    n = jnp.where(jnp.any(mismatch), jnp.argmax(mismatch), eff_gamma)

    fillers = lax.top_k(p, filler_k)[1].astype(jnp.int32)  # [gamma+1, filler_k]
    # cache already covers pos-1+gamma+1 tokens; roll to pos+n (= new_pos-1)
    new_len = cache.length - (gamma + 1) + n + 1
    return n, samples, fillers, cache.with_length(new_len)


def ngram_assisted_speculative_generate(
    inputs: Sequence[int],
    ngramstorage: INgramStorage,
    target_cfg: ModelConfig,
    target_params,
    gamma: int = 5,
    filler_top_k: int = 3,
    logits_processor: Optional[LogitsProcessor] = None,
    max_gen_len: int = 40,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    use_cache: bool = True,   # parity arg; slotted cache is always used
    first_target: bool = True,
    stop_if_unknown: bool = False,
    key: Optional[jax.Array] = None,
    debug: bool = False,
) -> Tuple[List[int], float]:
    """Reference-API-parity NASD generation (ref: ngram_assisted.py:11-26)."""
    del use_cache
    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_set = set(normalize_eos(eos_tokens_id))
    gamma = int(gamma)
    filler_k = max(1, int(filler_top_k))

    prompt_ids = [int(t) for t in inputs]
    prompt_len = len(prompt_ids)
    total_len = min(target_cfg.max_position_embeddings, prompt_len + max_gen_len)
    prompt, _ = pad_to_bucket(prompt_ids, pad_token_id)
    cache_len = prompt.shape[0] + max_gen_len + gamma + 2

    ngramstorage.initialize(prompt_ids)

    tokens = list(prompt_ids)  # committed context (host copy)
    accepted = 0
    speculated = 0

    if not first_target:
        raise NotImplementedError(
            "NASD requires the target prefill step (first_target=True), as in "
            "all reference call sites (ref: infer.py:838, benchmark paths)")

    tok0, cache = _nasd_prefill(
        target_cfg, target_params, prompt, jnp.int32(prompt_len), processor,
        gamma, filler_k, cache_len, jax.random.fold_in(key, 2**31 - 1))
    tok0 = int(tok0)
    tokens.append(tok0)
    ngramstorage.update(prompt_ids, [tok0])
    if tok0 in eos_set or len(tokens) >= total_len:
        return tokens[prompt_len:], 0.0

    window = 0
    while len(tokens) < total_len:
        pos = len(tokens)
        corrected_gamma = min(gamma, total_len - pos - 1)

        # --- host draft phase: n-gram lookups over the running context ------
        drafts = []
        ctx = list(tokens)
        eff = corrected_gamma
        for k in range(corrected_gamma):
            tok, known = ngramstorage.next_token(ctx)
            if not known and stop_if_unknown:
                eff = k
                break
            drafts.append(tok)
            ctx.append(tok)
        speculated += eff
        drafts_arr = np.zeros((gamma,), np.int32)
        drafts_arr[:len(drafts)] = drafts[:gamma]

        # --- device verify window -------------------------------------------
        n, samples, fillers, cache = _nasd_verify(
            target_cfg, target_params, cache, jnp.int32(tokens[-1]),
            jnp.asarray(drafts_arr), jnp.int32(eff), processor, gamma,
            filler_k, jax.random.fold_in(key, window))
        n = int(n)
        samples = np.asarray(samples)
        fillers = np.asarray(fillers)
        accepted += n

        committed = drafts[:n] + [int(samples[n])]

        # --- storage updates (accepted tokens + top-k fillers, ref :148-155)
        ctx = list(tokens)
        for i, tok in enumerate(committed):
            ngramstorage.update(ctx, [tok])
            if filler_top_k > 1:
                ngramstorage.update(ctx, [int(t) for t in fillers[i]])
            ctx.append(tok)

        # --- commit + EOS ----------------------------------------------------
        stop_at = None
        for i, tok in enumerate(committed):
            tokens.append(tok)
            if tok in eos_set:
                stop_at = i
                break
        if debug:
            print(f"[nasd] window={window} eff_gamma={eff} accepted={n} "
                  f"emitted={committed}")
        if stop_at is not None:
            break
        # keep device cache consistent with host commit length
        window += 1

    rate = accepted / speculated if speculated > 0 else 0.0
    return tokens[prompt_len:], rate
