"""EAGLE tree speculative decoding (greedy-exact, static topology).

The EAGLE-2 decoding regime: the feature-predictor drafter (core/eagle.py)
expands a static candidate TREE instead of a chain — each node of level l
proposes its top-``branching[l]`` next tokens from the drafter head — and
the target verifies the whole tree in ONE ancestor-masked forward
(core.model.forward_step_tree_features). Composition of the repo's two
beyond-reference capabilities: tree verification (sampling/tree_speculative
.py) and EAGLE drafting (sampling/eagle_speculative.py); docs/PARITY.md.

Structure per window (ONE jitted ``lax.while_loop`` overall):
- eagle catch-up rewrite (identical to the chain loop): re-forward the last
  gamma_c = max-depth+1 committed (feature, token) pairs ending at pos-2;
  the last output IS the root pair — its logits rank the root's children
  (level 1) and its f_hat is the root's predicted feature
- levels 1..depth-1: one ``eagle_forward_tree`` call per level (ancestor
  masks sliced from the shared TreeTopology; node j's pair = (token_j,
  f_hat of parent)); level `depth` needs no drafter forward (no children),
  and the eagle cache needs NO compaction — the next window's catch-up
  re-derives it, the same property that makes chain-eagle rollback free
- target verify over root + all nodes with features; greedy chain
  acceptance (child accepted iff token == target argmax at parent — output
  is EXACTLY greedy AR for any drafter/topology, the tree_speculative.py
  oracle); accepted-path features written to fbuf, target KV compacted.

Like tree_speculative.py, the processor selects the acceptance regime:
GreedyProcessor/None is greedy-exact (output == greedy AR); any sampling
processor runs SpecInfer multi-draft rejection over eagle-drafted children
(shared implementation: tree_speculative._sampled_tree_accept), emitting a
stream distributed exactly as target AR sampling.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from specdec_tpu.core.cache import compact_path, init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.eagle import eagle_forward, eagle_forward_tree
from specdec_tpu.core.model import (
    forward_step_features, forward_step_tree_features,
)
from specdec_tpu.sampling.processors import GreedyProcessor
from specdec_tpu.sampling.tree_speculative import (
    _greedy_tree_accept, _sampled_tree_accept, _topology,
)
from specdec_tpu.sampling.utils import eos_mask, normalize_eos, pad_to_bucket


@partial(jax.jit, static_argnames=("eagle_cfg", "target_cfg", "topo",
                                   "gen_len", "eos_ids", "processor"))
def _eagle_tree_generate(
    eagle_cfg: ModelConfig, eagle_params,
    target_cfg: ModelConfig, target_params,
    prompt: jax.Array, prompt_len: jax.Array,
    topo, gen_len: int,
    eos_ids: Tuple[int, ...],
    processor=None,                      # None => greedy-exact mode
    key: Optional[jax.Array] = None,
):
    d = topo.depth
    N = topo.num_nodes
    V = target_cfg.vocab_size
    P = prompt.shape[0]
    D = target_cfg.hidden_size
    S = P + gen_len + N + 2
    max_windows = gen_len + 1
    C = d + 2  # catch-up block length (max commits per window = d+1, +1 pair)

    e_cache = init_cache(eagle_cfg, 1, S)
    t_cache = init_cache(target_cfg, 1, S)
    buf = jnp.zeros((S,), jnp.int32).at[:P].set(prompt)
    fbuf = jnp.zeros((S, D), dtype=target_cfg.dtype)
    total_len = jnp.minimum(
        min(eagle_cfg.max_position_embeddings,
            target_cfg.max_position_embeddings), prompt_len + gen_len)

    # target prefill seeds fbuf; the root of window 0 is the prompt's last
    # token, verified logits produce token 1 inside the window (same shape
    # as tree_speculative.py's prefill)
    _, t_feats, t_cache = forward_step_features(
        target_cfg, target_params, prompt[None, :], t_cache)
    fbuf = fbuf.at[:P].set(t_feats[0].astype(fbuf.dtype))
    t_cache = t_cache.with_length(jnp.full((1,), prompt_len - 1, jnp.int32))

    pos = prompt_len
    depths = topo.depths
    anc = topo.ancestor

    def cond(st):
        buf, fbuf, pos, e_cache, t_cache, finished, acc, spec, window = st
        return (~finished) & (pos < total_len) & (window < max_windows)

    def body(st):
        buf, fbuf, pos, e_cache, t_cache, finished, acc_cnt, spec_cnt, \
            window = st

        # --- eagle catch-up rewrite (chain loop's invariant, C pairs ending
        # at pos-2); output slot idx: logits rank root children, f_hat is
        # the root's predicted feature -----------------------------------
        start = jnp.maximum(pos - 1 - C, 0)
        idx = pos - 2 - start
        tok_blk = lax.dynamic_slice(buf, (start + 1,), (C,))
        f_blk = lax.dynamic_slice(fbuf, (start, 0), (C, D))
        e_cache = e_cache.with_length(start[None].astype(jnp.int32))
        logits_blk, fhat_blk, e_cache = eagle_forward(
            eagle_cfg, eagle_params, target_params,
            tok_blk[None, :], f_blk[None, :, :], e_cache)
        root_logits = logits_blk[0, idx]                     # [V]
        f_root = fhat_blk[0, idx]                            # [D]
        e_cache = e_cache.with_length((pos - 1)[None].astype(jnp.int32))

        wkey = (jax.random.fold_in(key, window) if processor is not None
                else None)
        root = lax.dynamic_index_in_dim(buf, pos - 1, 0, keepdims=False)
        tree_toks = jnp.zeros((N,), jnp.int32).at[0].set(root)
        q_nodes = jnp.zeros((N, V), jnp.float32)
        # f_hat per node: node 0 = root's predicted feature from catch-up
        tree_fhat = jnp.zeros((N, D), fbuf.dtype).at[0].set(
            f_root.astype(fbuf.dtype))

        # level 1 straight from the catch-up logits
        b1 = topo.branching[0]
        l1 = topo.level_nodes(1)
        if processor is None:
            top1 = lax.top_k(root_logits, b1)[1].astype(jnp.int32)
            tree_toks = tree_toks.at[l1].set(top1)
        else:
            q0 = processor(root_logits)
            q_nodes = q_nodes.at[0].set(q0)
            keys1 = jax.random.split(jax.random.fold_in(wkey, 0), b1)
            kids1 = jax.vmap(lambda kk: processor.sample(q0, kk))(keys1)
            tree_toks = tree_toks.at[l1].set(kids1.astype(jnp.int32))

        # --- levels 2..d: eagle tree forwards over the PREVIOUS level ----
        # (expanding level l+1 needs level l's f_hat; the last level's
        # children don't exist, so level d itself is never forwarded)
        e_start = (pos - 1)[None].astype(jnp.int32)  # eagle tree node-1 slot
        for l in range(1, d):
            ls = topo.level_nodes(l)
            toks_l = tree_toks[ls][None, :]
            parents = topo.parent[ls.start:ls.stop]          # static np
            feats_l = tree_fhat[jnp.asarray(parents)][None, :, :]
            E = topo.level_start[l + 1]
            # eagle tree node j <-> target node j+1 (the root pair is the
            # catch-up's last entry, already in the cache prefix)
            mask_l = anc[ls, 1:E]
            logits_l, fhat_l, e_cache = eagle_forward_tree(
                eagle_cfg, eagle_params, target_params, toks_l, feats_l,
                e_cache, depths[ls] - 1, mask_l, tree_start=e_start)
            tree_fhat = tree_fhat.at[ls].set(fhat_l[0].astype(fbuf.dtype))
            b = topo.branching[l]
            cs = topo.level_nodes(l + 1)
            if processor is None:
                top = lax.top_k(logits_l[0], b)[1].astype(jnp.int32)
                tree_toks = tree_toks.at[cs].set(top.reshape(-1))
            else:
                q_l = processor(logits_l[0])                 # [n_l, V]
                q_nodes = q_nodes.at[ls].set(q_l)
                n_l = topo.level_sizes[l]
                keys = jax.random.split(
                    jax.random.fold_in(wkey, l), n_l * b).reshape(n_l, b)
                kids = jax.vmap(lambda qi, ks: jax.vmap(
                    lambda kk: processor.sample(qi, kk))(ks))(q_l, keys)
                tree_toks = tree_toks.at[cs].set(
                    kids.reshape(-1).astype(jnp.int32))

        # --- target verify: whole tree, with features --------------------
        t_logits, t_feats, t_cache_l = forward_step_tree_features(
            target_cfg, target_params, tree_toks[None, :], t_cache,
            depths, anc)

        # --- path acceptance (shared with tree_speculative.py) -----------
        if processor is None:
            targmax = jnp.argmax(t_logits[0], axis=-1).astype(jnp.int32)
            chain, n_acc, bonus = _greedy_tree_accept(topo, tree_toks,
                                                      targmax)
        else:
            p_nodes = processor(t_logits[0])
            chain, n_acc, bonus = _sampled_tree_accept(
                topo, tree_toks, q_nodes, p_nodes, processor,
                jax.random.fold_in(wkey, 2 ** 20))

        # --- commit tokens ------------------------------------------------
        li = jnp.arange(d + 1)
        chain_toks = tree_toks[chain]
        cand = jnp.concatenate(
            [jnp.where(li[:d] < n_acc, chain_toks, 0),
             jnp.zeros((1,), jnp.int32)])
        cand = cand.at[n_acc].set(bonus)

        remaining = total_len - pos
        advance = jnp.minimum(n_acc + 1, remaining)
        is_eos = eos_mask(cand, eos_ids) & (li <= n_acc)
        any_eos = jnp.any(is_eos & (li < advance))
        first_eos = jnp.argmax(is_eos)
        advance = jnp.where(any_eos, jnp.minimum(first_eos + 1, advance),
                            advance)

        buf = lax.dynamic_update_slice(buf, cand, (pos,))
        new_pos = pos + advance
        finished = any_eos | (new_pos >= total_len)

        # --- commit features: verify features along root+accepted chain
        # land at positions pos-1 .. pos-1+d (entries past n_acc are
        # chain-frozen garbage but sit beyond the next window's read range,
        # which stops at new_pos-2 = pos-1+n_acc) -------------------------
        path_nodes = jnp.concatenate([jnp.zeros((1,), jnp.int32), chain])
        path_feats = t_feats[0][path_nodes].astype(fbuf.dtype)   # [d+1, D]
        fbuf = lax.dynamic_update_slice(fbuf, path_feats, (pos - 1, 0))

        # --- compact the accepted path in the TARGET cache only (the eagle
        # cache is re-derived by the next catch-up) -----------------------
        t_start = t_cache.length  # [1] = pos-1 (tree node 0 slot)
        t_cache = compact_path(t_cache_l, t_start[0] + chain, t_start[0] + 1,
                               (new_pos - 1)[None].astype(jnp.int32))

        corrected = jnp.clip(total_len - pos - 1, 0, d)
        acc_cnt = acc_cnt + jnp.minimum(n_acc, corrected)
        spec_cnt = spec_cnt + corrected
        return (buf, fbuf, new_pos, e_cache, t_cache, finished, acc_cnt,
                spec_cnt, window + 1)

    st = (buf, fbuf, pos, e_cache, t_cache, pos >= total_len,
          jnp.int32(0), jnp.int32(0), jnp.int32(0))
    buf, fbuf, pos, _, _, _, acc_cnt, spec_cnt, windows = lax.while_loop(
        cond, body, st)
    packed = jnp.concatenate(
        [buf, jnp.stack([pos - prompt_len, acc_cnt, spec_cnt, windows])])
    return packed


def eagle_tree_generate(
    inputs: Sequence[int],
    eagle_cfg: ModelConfig, eagle_params,
    target_cfg: ModelConfig, target_params,
    branching: Tuple[int, ...] = (3, 2, 1),
    max_gen_len: int = 40,
    logits_processor=None,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    key: Optional[jax.Array] = None,
) -> Tuple[List[int], float]:
    """EAGLE tree speculation. Returns (generated ids, chain-depth
    acceptance rate). GreedyProcessor/None: greedy-exact mode (output is
    token-identical to greedy AR for any drafter/topology); any sampling
    processor: SpecInfer multi-draft rejection (output distributed exactly
    as target AR sampling). See the module docstring."""
    sampled = (logits_processor is not None
               and not isinstance(logits_processor, GreedyProcessor))
    processor = logits_processor if sampled else None
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompt, n = pad_to_bucket(inputs, pad_token_id)
    if n < 2:
        raise ValueError("eagle tree speculation needs a prompt of >= 2 "
                         "tokens (the catch-up block ends at pair pos-2)")
    topo = _topology(tuple(int(b) for b in branching))

    packed = _eagle_tree_generate(
        eagle_cfg, eagle_params, target_cfg, target_params,
        prompt, jnp.int32(n), topo, int(max_gen_len), eos_ids,
        processor=processor, key=key)

    packed = np.asarray(packed)   # ONE pull
    n_gen, acc, spec, _ = (int(v) for v in packed[-4:])
    rate = acc / spec if spec > 0 else 0.0
    return packed[n:n + n_gen].tolist(), rate
