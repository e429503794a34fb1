"""Single-sequence speculative decoding (draft-gamma-then-verify).

Reference semantics (ref: sampling/speculative_decoding.py:23-189, SURVEY.md
§2.1) preserved exactly where they define the output distribution:

- acceptance test on *processed* distributions: draw r ~ U[0,1) per draft,
  reject at the first i with r_i > p_i(x_i)/q_i(x_i)  (ref :139-145)
- residual resample on rejection from norm(max(p-q, 0))  (ref :10-19,167-168),
  skippable via ``skip_sample_adjustment`` (ref :169-170); zero-mass residual
  falls back to p (the batched reference's guard, ref engine/infer_engine.py:319-321)
- bonus token from the target's extra position when all gamma accepted (ref :158-160)
- EOS inside accepted drafts truncates and stops (ref :149-155)
- ``first_target`` prefill emits token 1 from the target before the loop (ref :84-103)
- acceptance-rate bookkeeping over corrected_gamma = min(gamma, total_len-pos-1)
  (ref :106)

TPU-first redesign (NOT the reference's host loop):
- the whole generation is ONE jitted ``lax.while_loop``; a window body runs the
  drafter as a ``lax.scan`` of gamma cached single-token steps, one target
  forward over gamma+1 positions, then a fully vectorized accept/commit — zero
  host round-trips per token or per window
- the accept prefix is computed with cumprod/argmax instead of a Python break
  (SURVEY.md §7.3)
- "cache pruning" on rejection (ref :162-165 / utils/caching.py) is per-seq
  length arithmetic on static-shape slotted caches: the drafter additionally
  consumes its own last draft token so both caches always cover pos'-1 tokens
  for ANY accept count, making rollback a pure scalar assignment
- RNG is JAX counter-based: one key folded per window, split across draft
  sampling / acceptance draws / resample.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from specdec_tpu.core.cache import init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_step
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import eos_mask, max_fn, normalize_eos, pad_to_bucket


@partial(jax.jit, static_argnames=(
    "drafter_cfg", "target_cfg", "gamma", "gen_len", "processor", "eos_ids",
    "first_target", "skip_sample_adjustment"))
def _spec_generate(
    drafter_cfg: ModelConfig, drafter_params,
    target_cfg: ModelConfig, target_params,
    prompt: jax.Array, prompt_len: jax.Array,
    gamma: int, gen_len: int,
    processor: LogitsProcessor,
    eos_ids: Tuple[int, ...],
    first_target: bool,
    skip_sample_adjustment: bool,
    key: jax.Array,
):
    """Returns (buf, n_generated, accepted, speculated, per-window accept log)."""
    P = prompt.shape[0]
    S = P + gen_len + gamma + 2  # slack: a window may overrun the cap before clamping
    max_windows = gen_len + 1

    d_cache = init_cache(drafter_cfg, 1, S)
    t_cache = init_cache(target_cfg, 1, S)
    buf = jnp.zeros((S,), dtype=jnp.int32).at[:P].set(prompt)

    max_pos = min(drafter_cfg.max_position_embeddings,
                  target_cfg.max_position_embeddings)
    total_len = jnp.minimum(max_pos, prompt_len + gen_len)

    # --- prefills -----------------------------------------------------------
    t_logits, t_cache = forward_step(target_cfg, target_params, prompt[None, :], t_cache)
    _, d_cache = forward_step(drafter_cfg, drafter_params, prompt[None, :], d_cache)

    if first_target:
        # target emits generation token 1 before the loop (ref :84-103)
        p0 = processor(t_logits[0, prompt_len - 1])
        tok0 = processor.sample(p0, jax.random.fold_in(key, 2**31 - 1)).astype(jnp.int32)
        buf = lax.dynamic_update_index_in_dim(buf, tok0, prompt_len, axis=0)
        pos = prompt_len + 1
        finished0 = eos_mask(tok0, eos_ids) | (pos >= total_len)
        # invariants at window start: target cache covers pos-1 tokens;
        # drafter cache covers pos-2 (its first draft step feeds TWO tokens,
        # which folds the accepted-bonus catch-up into the window — one fewer
        # drafter forward per window than the naive extra catch-up pass)
        d_cache = d_cache.with_length(jnp.full((1,), prompt_len - 1, jnp.int32))
        t_cache = t_cache.with_length(jnp.full((1,), prompt_len, jnp.int32))
    else:
        # note: requires prompt_len >= 2 (drafter window start reads pos-2)
        pos = prompt_len
        finished0 = pos >= total_len
        d_cache = d_cache.with_length(jnp.full((1,), prompt_len - 2, jnp.int32))
        t_cache = t_cache.with_length(jnp.full((1,), prompt_len - 1, jnp.int32))

    accept_log = jnp.full((max_windows,), -1, dtype=jnp.int32)

    def cond(st):
        (buf, pos, d_cache, t_cache, finished, accepted, speculated,
         window, accept_log) = st
        return (~finished) & (pos < total_len) & (window < max_windows)

    def body(st):
        (buf, pos, d_cache, t_cache, finished, accepted, speculated,
         window, accept_log) = st
        wkey = jax.random.fold_in(key, window)
        k_draft, k_accept, k_resample = jax.random.split(wkey, 3)

        # --- draft phase: gamma cached drafter forwards ---------------------
        # step 0 feeds TWO tokens (buf[pos-2], buf[pos-1]): the drafter cache
        # covers pos-2 at window start, so this simultaneously catches up the
        # previous window's last committed token and drafts x0 — bandwidth
        # cost of a T=2 matvec equals a T=1 one, saving a forward per window
        first_tok = lax.dynamic_index_in_dim(buf, pos - 1, axis=0, keepdims=False)
        prev2 = lax.dynamic_slice(buf, (pos - 2,), (2,))
        logits2, d_cache = forward_step(drafter_cfg, drafter_params,
                                        prev2[None, :], d_cache)
        q0 = processor(logits2[0, 1])
        x0 = processor.sample(q0, jax.random.fold_in(k_draft, 0)).astype(jnp.int32)

        def draft_step(carry, i):
            cache, prev_tok = carry
            logits, cache = forward_step(drafter_cfg, drafter_params,
                                         prev_tok[None, None], cache)
            q = processor(logits[0, 0])                     # [V], processed dist
            x = processor.sample(q, jax.random.fold_in(k_draft, i)).astype(jnp.int32)
            return (cache, x), (q, x)

        (d_cache, _), (q_rest, drafts_rest) = lax.scan(
            draft_step, (d_cache, x0), jnp.arange(1, gamma))
        q_all = jnp.concatenate([q0[None], q_rest])         # [gamma, V]
        drafts = jnp.concatenate([x0[None], drafts_rest])   # [gamma]
        # drafter cache now covers pos+gamma-1 tokens (>= new_pos-2 for any
        # accept count incl. the full-accept+bonus case)

        # --- verify phase: ONE target forward over gamma+1 positions --------
        t_in = jnp.concatenate([first_tok[None], drafts])   # [gamma+1]
        t_logits, t_cache = forward_step(target_cfg, target_params,
                                         t_in[None, :], t_cache)
        p_all = processor(t_logits[0])                      # [gamma+1, V]

        # --- vectorized acceptance (ref :139-145) ---------------------------
        r = jax.random.uniform(k_accept, (gamma,))
        idx = jnp.arange(gamma)
        p_x = p_all[idx, drafts]
        q_x = q_all[idx, drafts]
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

        # --- commit: candidates = drafts[:n] + next_tok ---------------------
        cand = jnp.where(idx < n, drafts, 0)
        cand = jnp.append(cand, 0)
        cand = cand.at[n].set(next_tok)                     # [gamma+1]

        remaining = total_len - pos
        advance = jnp.minimum(n + 1, remaining)
        # EOS inside committed tokens truncates (ref :149-155)
        is_eos = eos_mask(cand, eos_ids) & (jnp.arange(gamma + 1) <= n)
        any_eos = jnp.any(is_eos & (jnp.arange(gamma + 1) < advance))
        first_eos = jnp.argmax(is_eos)
        advance = jnp.where(any_eos, jnp.minimum(first_eos + 1, advance), advance)

        buf = lax.dynamic_update_slice(buf, cand, (pos,))
        new_pos = pos + advance
        finished = any_eos | (new_pos >= total_len)

        # acceptance bookkeeping over corrected_gamma (ref :106,147,189)
        corrected_gamma = jnp.clip(total_len - pos - 1, 0, gamma)
        accepted = accepted + jnp.minimum(n, corrected_gamma)
        speculated = speculated + corrected_gamma

        # restore invariants: target covers new_pos-1, drafter new_pos-2
        d_cache = d_cache.with_length(jnp.full((1,), new_pos - 2, jnp.int32))
        t_cache = t_cache.with_length(jnp.full((1,), new_pos - 1, jnp.int32))

        accept_log = accept_log.at[window].set(n)
        return (buf, new_pos, d_cache, t_cache, finished, accepted, speculated,
                window + 1, accept_log)

    st = (buf, pos, d_cache, t_cache, finished0,
          jnp.int32(0), jnp.int32(0), jnp.int32(0), accept_log)
    (buf, pos, _, _, _, accepted, speculated, windows, accept_log) = \
        lax.while_loop(cond, body, st)
    # fold the scalar stats into the token buffer so the host retrieves ONE
    # array: on the tunneled backend every materialization is an RPC
    # round-trip (~tens of ms), so buf+3 separate int() pulls cost 4 RPCs
    packed = jnp.concatenate(
        [buf, jnp.stack([pos - prompt_len, accepted, speculated])])
    return packed, accept_log


def speculative_generate(
    inputs: Sequence[int],
    drafter_cfg: ModelConfig, drafter_params,
    target_cfg: ModelConfig, target_params,
    tokenizer=None,             # used for debug visualization (ref :27)
    gamma: int = 5,
    logits_processor: Optional[LogitsProcessor] = None,
    max_gen_len: int = 40,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    use_cache: bool = True,     # parity arg; slotted cache is always used
    skip_sample_adjustment: bool = False,
    first_target: bool = True,
    key: Optional[jax.Array] = None,
    debug: bool = False,
) -> Tuple[List[int], float]:
    """Reference-API-parity wrapper (ref: sampling/speculative_decoding.py:23-56).

    Returns (generated token ids, acceptance_rate).
    """
    del use_cache
    processor = logits_processor or GreedyProcessor()
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompt, n = pad_to_bucket(inputs, pad_token_id)
    if not first_target and n < 2:
        # the drafter's catch-up fold reads buf[pos-2] at window start; with
        # first_target the prefill token makes pos >= prompt_len+1, but
        # without it a 1-token prompt would read before the buffer
        raise ValueError(
            f"first_target=False requires a prompt of >= 2 tokens (got {n})")

    packed, accept_log = _spec_generate(
        drafter_cfg, drafter_params, target_cfg, target_params,
        prompt, jnp.int32(n), int(gamma), int(max_gen_len),
        processor, eos_ids, bool(first_target), bool(skip_sample_adjustment), key)

    import numpy as np
    packed = np.asarray(packed)  # ONE host transfer (scalars folded into buf)
    buf = packed[:-3]
    n_gen, accepted, speculated = (int(v) for v in packed[-3:])
    rate = accepted / speculated if speculated > 0 else 0.0
    if debug:
        from specdec_tpu.utils import printing
        log = [int(a) for a in np.asarray(accept_log) if int(a) >= 0]
        print(f"[specdec] windows={len(log)} accepts/window={log} "
              f"acceptance={rate:.3f}")
        # colored visualization of the committed stream, green = draft-
        # accepted spans, blue = target-sampled tokens (ref printing.py:29-42)
        pos = n
        for n_acc in log:
            committed = buf[pos:min(pos + n_acc + 1, n + n_gen)].tolist()
            if not committed:
                break
            printing.speculative_step(tokenizer, committed[:-1],
                                      len(committed) - 1, committed[-1])
            pos += len(committed)
    return buf[n:n + n_gen].tolist(), rate
