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
    # single packed host pull per window (see _nasd_batch_verify)
    packed = jnp.concatenate([n[None], samples, fillers.reshape(-1)])
    return packed, cache.with_length(new_len)


@partial(jax.jit, static_argnames=("cfg", "processor", "gamma", "filler_k"),
         donate_argnames=("cache",))
def _nasd_batch_verify(cfg: ModelConfig, params, cache, last_toks, drafts,
                       eff, active, processor: LogitsProcessor, gamma: int,
                       filler_k: int, key):
    """One verify window for a whole batch: ONE target forward over
    [B, gamma+1], vectorized exact-match acceptance, per-seq cache-length
    rollback. Finished slots (``active`` False) advance nothing.

    Returns (n[B], samples[B, gamma+1], fillers[B, gamma+1, filler_k],
    new_cache). The sequential reference has no batched NASD at all (ref:
    ngram_assisted/ngram_assisted.py is bs=1); this is the batch extension
    the harness uses so the ngram method scales with batch size.
    """
    B = last_toks.shape[0]
    t_in = jnp.concatenate([last_toks[:, None], drafts], axis=1)  # [B, g+1]
    logits, cache = forward_step(cfg, params, t_in, cache)
    p = processor(logits)                                  # [B, g+1, V]

    keys = jax.random.split(key, B * (gamma + 1))
    flat = p.reshape(B * (gamma + 1), -1)
    samples = jax.vmap(lambda pi, ki: processor.sample(pi, ki))(flat, keys)
    samples = samples.reshape(B, gamma + 1).astype(jnp.int32)

    idx = jnp.arange(gamma)
    mismatch = (samples[:, :gamma] != drafts) & (idx[None, :] < eff[:, None])
    n = jnp.where(jnp.any(mismatch, axis=1), jnp.argmax(mismatch, axis=1), eff)

    fillers = lax.top_k(p, filler_k)[1].astype(jnp.int32)  # [B, g+1, k]
    advance = jnp.where(active, n + 1, 0)
    new_len = cache.length - (gamma + 1) + advance
    # pack (n, samples, fillers) into ONE [B, 1+(g+1)+(g+1)*k] array: the
    # host loop syncs every window, and each separate materialization is an
    # RPC round-trip (~35 ms) on the tunneled backend
    packed = jnp.concatenate(
        [n[:, None], samples, fillers.reshape(B, -1)], axis=1)
    return packed, cache.with_length(new_len)


def batch_ngram_assisted_generate(
    prompt_ids: Sequence[Sequence[int]],
    ngramstorage: INgramStorage,
    target_cfg: ModelConfig,
    target_params,
    gamma: int = 5,
    filler_top_k: int = 3,
    logits_processor: Optional[LogitsProcessor] = None,
    gen_len: int = 100,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    stop_if_unknown: bool = False,
    key: Optional[jax.Array] = None,
    first_token_callback=None,
) -> Tuple[List[List[int]], List[float]]:
    """Batched NASD: host drafts per sequence from the SHARED n-gram store,
    ONE jitted verify per window for the whole batch.

    Reference semantics per sequence are those of
    ``ngram_assisted_speculative_generate`` (exact-match acceptance, no
    residual, filler updates); the only divergence is update interleaving —
    store updates land window-by-window round-robin across the batch instead
    of sequence-by-sequence (documented in docs/PARITY.md). Under greedy
    sampling each sequence still equals its AR oracle regardless of store
    contents, since emitted tokens are always the target's own samples.

    Returns (per-seq generated token lists, per-seq acceptance rates).
    """
    from specdec_tpu.engine.batch_engine import batch_prefill

    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_set = set(normalize_eos(eos_tokens_id))
    gamma = int(gamma)
    filler_k = max(1, int(filler_top_k))
    B = len(prompt_ids)

    prompts_host = [[int(t) for t in p] for p in prompt_ids]
    from specdec_tpu.engine.batch_engine import _pad_batch
    prompts, lens = _pad_batch(prompts_host, pad_token_id)

    # prefill key folded with a sentinel the window loop can never produce
    # (windows fold 0..N): reusing fold_in(key, 0) for both made the prefill
    # tok0 draws and the first verify window's sample draws share keys —
    # correlated samples (the single-seq path's 2**31-1 convention, :297)
    state = batch_prefill(None, None, target_cfg, target_params, prompts,
                          lens, int(gen_len), gamma, processor, True, False,
                          tuple(sorted(eos_set)),
                          jax.random.fold_in(key, 2 ** 31 - 1))
    cache = state.t_cache
    # ONE packed pull for the prefill harvest (CLAUDE.md single-RPC rule);
    # total_len is recomputed host-side from the packed prompt lengths
    from specdec_tpu.engine.batch_engine import _pack_state, _unpack_state
    buf0, pos0, plen0, _, _, finished0 = _unpack_state(
        np.asarray(_pack_state(state)))
    total_len = np.minimum(target_cfg.max_position_embeddings,
                           plen0 + int(gen_len))

    tokens: List[List[int]] = []
    for b in range(B):
        ngramstorage.initialize(prompts_host[b])
        tokens.append(buf0[b, :pos0[b]].tolist())
        tok0 = tokens[b][-1]
        ngramstorage.update(prompts_host[b], [tok0])
        if first_token_callback is not None:
            first_token_callback(b)
    finished = [bool(finished0[b]) for b in range(B)]
    accepted = np.zeros(B, np.int64)
    speculated = np.zeros(B, np.int64)

    window = 0
    while not all(finished):
        drafts_arr = np.zeros((B, gamma), np.int32)
        eff_arr = np.zeros((B,), np.int32)
        last_arr = np.zeros((B,), np.int32)
        drafts_host: List[List[int]] = [[] for _ in range(B)]
        for b in range(B):
            if finished[b]:
                continue
            last_arr[b] = tokens[b][-1]
            corrected_gamma = min(gamma, int(total_len[b]) - len(tokens[b]) - 1)
            ctx = list(tokens[b])
            eff = corrected_gamma
            for k in range(corrected_gamma):
                tok, known = ngramstorage.next_token(ctx)
                if not known and stop_if_unknown:
                    eff = k
                    break
                drafts_host[b].append(tok)
                ctx.append(tok)
            eff_arr[b] = eff
            speculated[b] += eff
            drafts_arr[b, :len(drafts_host[b])] = drafts_host[b][:gamma]

        active = jnp.asarray([not f for f in finished])
        packed, cache = _nasd_batch_verify(
            target_cfg, target_params, cache, jnp.asarray(last_arr),
            jnp.asarray(drafts_arr), jnp.asarray(eff_arr), active, processor,
            gamma, filler_k, jax.random.fold_in(key, window))
        packed = np.asarray(packed)   # ONE pull per window
        n = packed[:, 0]
        samples = packed[:, 1:gamma + 2]
        fillers = packed[:, gamma + 2:].reshape(B, gamma + 1, filler_k)

        for b in range(B):
            if finished[b]:
                continue
            nb = int(n[b])
            accepted[b] += nb
            committed = drafts_host[b][:nb] + [int(samples[b, nb])]
            ctx = list(tokens[b])
            for i, tok in enumerate(committed):
                ngramstorage.update(ctx, [tok])
                if filler_top_k > 1:
                    ngramstorage.update(ctx, [int(t) for t in fillers[b, i]])
                ctx.append(tok)
            for tok in committed:
                tokens[b].append(tok)
                if tok in eos_set:
                    finished[b] = True
                    break
            if len(tokens[b]) >= int(total_len[b]):
                finished[b] = True
        # device cache lengths advanced n+1 inside the verify; host commits
        # may stop early at EOS — freeze those slots by marking finished (the
        # stale cache rows past pos are never read again)
        window += 1
        if window > gen_len + 2:
            break

    plen = [len(p) for p in prompts_host]
    outputs = [tokens[b][plen[b]:] for b in range(B)]
    rates = [float(accepted[b]) / float(speculated[b]) if speculated[b] > 0
             else 0.0 for b in range(B)]
    return outputs, rates


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
        packed, cache = _nasd_verify(
            target_cfg, target_params, cache, jnp.int32(tokens[-1]),
            jnp.asarray(drafts_arr), jnp.int32(eff), processor, gamma,
            filler_k, jax.random.fold_in(key, window))
        packed = np.asarray(packed)   # ONE pull per window
        n = int(packed[0])
        samples = packed[1:gamma + 2]
        fillers = packed[gamma + 2:].reshape(gamma + 1, filler_k)
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
