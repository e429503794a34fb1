"""Single-sequence EAGLE speculative decoding (feature-level drafting).

Same draft-gamma-then-verify skeleton and distribution-defining semantics as
sampling/speculative.py (ref: sampling/speculative_decoding.py:23-189 —
processed-distribution acceptance, residual max(p-q,0) with zero-mass
fallback, bonus token, EOS-in-draft truncation, corrected_gamma bookkeeping),
but the drafter is the EAGLE feature predictor of core/eagle.py instead of a
standalone model. Because draft distributions come from a proper softmax head,
the full Leviathan rejection-sampling correctness carries over: the output
distribution equals the target's regardless of drafter quality.

TPU-first structure (ONE jitted ``lax.while_loop``, zero host syncs):
- a feature buffer ``fbuf`` [S, D] holds the target's residual-stream feature
  for every committed position (written by prefill and by each verify
  forward). Invariant at window start: valid through ``pos - 2`` — exactly
  what drafting needs, and the strongest invariant available: the feature at
  ``pos - 1`` is computed under the REJECTED draft token in the resample
  case, and never computed at all for a full-accept bonus token.
- drafter catch-up is a static-shape REWRITE: each window re-forwards the
  last ``gamma + 1`` (feature, token) pairs ending at ``pos - 2`` with the
  drafter cache length reset behind them — covers any accept count from the
  previous window (max gamma+1 new commits) without dynamic shapes, and its
  final position doubles as draft step 0 (the same fold that lets
  speculative.py feed two tokens at window start). A one-layer drafter makes
  the redundant re-forward a bandwidth-equivalent no-op (a T=gamma+1 matvec
  streams the same weight bytes as T=1).
- draft steps 2..gamma autoregress on the drafter's own PREDICTED features
  (f_hat carried through the scan) — the EAGLE rollout regime.
- rollback is length arithmetic on both caches, as everywhere in this repo.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from specdec_tpu.core.cache import init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.eagle import eagle_forward
from specdec_tpu.core.model import forward_step_features
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import eos_mask, max_fn, normalize_eos, pad_to_bucket


@partial(jax.jit, static_argnames=(
    "eagle_cfg", "target_cfg", "gamma", "gen_len", "processor", "eos_ids",
    "first_target", "skip_sample_adjustment"))
def _eagle_generate(
    eagle_cfg: ModelConfig, eagle_params,
    target_cfg: ModelConfig, target_params,
    prompt: jax.Array, prompt_len: jax.Array,
    gamma: int, gen_len: int,
    processor: LogitsProcessor,
    eos_ids: Tuple[int, ...],
    first_target: bool,
    skip_sample_adjustment: bool,
    key: jax.Array,
):
    """Returns (packed buf+stats, per-window accept log); see speculative.py."""
    P = prompt.shape[0]
    S = P + gen_len + gamma + 2
    D = target_cfg.hidden_size
    max_windows = gen_len + 1
    C = gamma + 1  # catch-up block length (max commits per window)

    e_cache = init_cache(eagle_cfg, 1, S)
    t_cache = init_cache(target_cfg, 1, S)
    buf = jnp.zeros((S,), dtype=jnp.int32).at[:P].set(prompt)
    fbuf = jnp.zeros((S, D), dtype=target_cfg.dtype)

    max_pos = min(eagle_cfg.max_position_embeddings,
                  target_cfg.max_position_embeddings)
    total_len = jnp.minimum(max_pos, prompt_len + gen_len)

    # --- target prefill (features seed fbuf[0:P]) ---------------------------
    t_logits, t_feats, t_cache = forward_step_features(
        target_cfg, target_params, prompt[None, :], t_cache)
    fbuf = fbuf.at[:P].set(t_feats[0].astype(fbuf.dtype))

    if first_target:
        p0 = processor(t_logits[0, prompt_len - 1])
        tok0 = processor.sample(p0, jax.random.fold_in(key, 2**31 - 1)).astype(jnp.int32)
        buf = lax.dynamic_update_index_in_dim(buf, tok0, prompt_len, axis=0)
        pos = prompt_len + 1
        finished0 = eos_mask(tok0, eos_ids) | (pos >= total_len)
        t_cache = t_cache.with_length(jnp.full((1,), prompt_len, jnp.int32))
    else:
        # requires prompt_len >= 2 (the catch-up block ends at pair pos-2 >= 0)
        pos = prompt_len
        finished0 = pos >= total_len
        t_cache = t_cache.with_length(jnp.full((1,), prompt_len - 1, jnp.int32))

    accept_log = jnp.full((max_windows,), -1, dtype=jnp.int32)

    def cond(st):
        (buf, fbuf, pos, e_cache, t_cache, finished, accepted, speculated,
         window, accept_log) = st
        return (~finished) & (pos < total_len) & (window < max_windows)

    def body(st):
        (buf, fbuf, pos, e_cache, t_cache, finished, accepted, speculated,
         window, accept_log) = st
        wkey = jax.random.fold_in(key, window)
        k_draft, k_accept, k_resample = jax.random.split(wkey, 3)

        # --- catch-up rewrite + draft step 0 --------------------------------
        # pairs (fbuf[j], buf[j+1]) for the C slots ending at j = pos-2; the
        # drafter cache restarts at `start`, so any stale deeper entries are
        # masked (key position >= length) and later overwritten
        start = jnp.maximum(pos - 1 - C, 0)
        idx = pos - 2 - start                                # output slot
        tok_blk = lax.dynamic_slice(buf, (start + 1,), (C,))
        f_blk = lax.dynamic_slice(fbuf, (start, 0), (C, D))
        e_cache = e_cache.with_length(start[None].astype(jnp.int32))
        logits_blk, fhat_blk, e_cache = eagle_forward(
            eagle_cfg, eagle_params, target_params,
            tok_blk[None, :], f_blk[None, :, :], e_cache)
        q0 = processor(logits_blk[0, idx])
        x0 = processor.sample(q0, jax.random.fold_in(k_draft, 0)).astype(jnp.int32)
        f0 = fhat_blk[0, idx]
        # drop garbage slots past the output pair (clamped-start early windows)
        e_cache = e_cache.with_length((pos - 1)[None].astype(jnp.int32))

        # --- draft steps 1..gamma-1 on predicted features -------------------
        def draft_step(carry, i):
            cache, prev_tok, prev_f = carry
            logits, f_hat, cache = eagle_forward(
                eagle_cfg, eagle_params, target_params,
                prev_tok[None, None], prev_f[None, None, :], cache)
            q = processor(logits[0, 0])
            x = processor.sample(q, jax.random.fold_in(k_draft, i)).astype(jnp.int32)
            return (cache, x, f_hat[0, 0]), (q, x)

        (e_cache, _, _), (q_rest, drafts_rest) = lax.scan(
            draft_step, (e_cache, x0, f0), jnp.arange(1, gamma))
        q_all = jnp.concatenate([q0[None], q_rest])          # [gamma, V]
        drafts = jnp.concatenate([x0[None], drafts_rest])    # [gamma]

        # --- verify: ONE target forward over gamma+1 positions --------------
        first_tok = lax.dynamic_index_in_dim(buf, pos - 1, axis=0, keepdims=False)
        t_in = jnp.concatenate([first_tok[None], drafts])
        t_logits, t_feats, t_cache = forward_step_features(
            target_cfg, target_params, t_in[None, :], t_cache)
        p_all = processor(t_logits[0])                       # [gamma+1, V]
        # features for positions pos-1 .. pos+gamma-1; entries at or past the
        # first rejection are invalid but sit beyond the next window's read
        # range (invariant: reads stop at new_pos-2) and get overwritten
        fbuf = lax.dynamic_update_slice(
            fbuf, t_feats[0].astype(fbuf.dtype), (pos - 1, 0))

        # --- vectorized acceptance (ref :139-145) ---------------------------
        r = jax.random.uniform(k_accept, (gamma,))
        gidx = jnp.arange(gamma)
        p_x = p_all[gidx, drafts]
        q_x = q_all[gidx, drafts]
        reject = r > p_x / jnp.maximum(q_x, 1e-38)
        n = jnp.where(jnp.any(reject), jnp.argmax(reject), gamma)

        # --- next token: bonus (n==gamma) or residual resample --------------
        p_n = p_all[jnp.minimum(n, gamma)]
        q_n = q_all[jnp.minimum(n, gamma - 1)]
        if skip_sample_adjustment:
            resample_dist = p_n
        else:
            residual = max_fn(p_n - q_n)
            has_mass = jnp.sum(jnp.maximum(p_n - q_n, 0.0)) > 1e-12
            resample_dist = jnp.where(has_mass, residual, p_n)
        next_dist = jnp.where(n == gamma, p_all[gamma], resample_dist)
        next_tok = processor.sample(next_dist, k_resample).astype(jnp.int32)

        # --- commit ----------------------------------------------------------
        cand = jnp.where(gidx < n, drafts, 0)
        cand = jnp.append(cand, 0)
        cand = cand.at[n].set(next_tok)

        remaining = total_len - pos
        advance = jnp.minimum(n + 1, remaining)
        is_eos = eos_mask(cand, eos_ids) & (jnp.arange(gamma + 1) <= n)
        any_eos = jnp.any(is_eos & (jnp.arange(gamma + 1) < advance))
        first_eos = jnp.argmax(is_eos)
        advance = jnp.where(any_eos, jnp.minimum(first_eos + 1, advance), advance)

        buf = lax.dynamic_update_slice(buf, cand, (pos,))
        new_pos = pos + advance
        finished = any_eos | (new_pos >= total_len)

        corrected_gamma = jnp.clip(total_len - pos - 1, 0, gamma)
        accepted = accepted + jnp.minimum(n, corrected_gamma)
        speculated = speculated + corrected_gamma

        t_cache = t_cache.with_length(jnp.full((1,), new_pos - 1, jnp.int32))
        # e_cache needs no restore: the next catch-up resets its length

        accept_log = accept_log.at[window].set(n)
        return (buf, fbuf, new_pos, e_cache, t_cache, finished, accepted,
                speculated, window + 1, accept_log)

    st = (buf, fbuf, pos, e_cache, t_cache, finished0,
          jnp.int32(0), jnp.int32(0), jnp.int32(0), accept_log)
    (buf, fbuf, pos, _, _, _, accepted, speculated, windows, accept_log) = \
        lax.while_loop(cond, body, st)
    packed = jnp.concatenate(
        [buf, jnp.stack([pos - prompt_len, accepted, speculated])])
    return packed, accept_log


def eagle_generate(
    inputs: Sequence[int],
    eagle_cfg: ModelConfig, eagle_params,
    target_cfg: ModelConfig, target_params,
    tokenizer=None,
    gamma: int = 5,
    logits_processor: Optional[LogitsProcessor] = None,
    max_gen_len: int = 40,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    skip_sample_adjustment: bool = False,
    first_target: bool = True,
    key: Optional[jax.Array] = None,
    debug: bool = False,
) -> Tuple[List[int], float]:
    """EAGLE-drafted speculative generation; API mirrors
    ``speculative_generate`` (returns (generated ids, acceptance_rate)).

    ``eagle_cfg`` must share the target's dims (build it as
    ``target_cfg.replace(num_layers=<depth>)``); ``eagle_params`` from
    core/eagle.py::init_eagle_params, trained via engine/eagle_train.py.
    """
    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompt, n = pad_to_bucket(inputs, pad_token_id)
    if not first_target and n < 2:
        # the catch-up block's last pair index is pos-2: with first_target
        # the prefill token makes pos >= n+1 (so n >= 1 suffices), without it
        # a 1-token prompt would index pair -1
        raise ValueError(f"first_target=False requires a prompt of >= 2 "
                         f"tokens (got {n})")

    packed, accept_log = _eagle_generate(
        eagle_cfg, eagle_params, target_cfg, target_params,
        prompt, jnp.int32(n), int(gamma), int(max_gen_len),
        processor, eos_ids, bool(first_target), bool(skip_sample_adjustment),
        key)

    import numpy as np
    packed = np.asarray(packed)  # ONE host transfer
    buf = packed[:-3]
    n_gen, accepted, speculated = (int(v) for v in packed[-3:])
    rate = accepted / speculated if speculated > 0 else 0.0
    if debug:
        from specdec_tpu.utils import printing
        log = [int(a) for a in np.asarray(accept_log) if int(a) >= 0]
        print(f"[eagle] windows={len(log)} accepts/window={log} "
              f"acceptance={rate:.3f}")
        pos = n
        for n_acc in log:
            committed = buf[pos:min(pos + n_acc + 1, n + n_gen)].tolist()
            if not committed:
                break
            printing.speculative_step(tokenizer, committed[:-1],
                                      len(committed) - 1, committed[-1])
            pos += len(committed)
    return buf[n:n + n_gen].tolist(), rate
