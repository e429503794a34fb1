"""Tree speculative decoding (greedy-exact, static topology).

Chain speculation verifies ONE candidate continuation per target forward;
tree speculation (SpecInfer/EAGLE/Medusa lineage) verifies a whole TREE of
candidates in the same single forward — when the drafter's top-1 is wrong
but its top-2 is right, the chain window stalls while the tree keeps going.
TPU-first design constraints shape everything here:

- the topology is STATIC (a branching tuple, e.g. (2, 2, 2): each node of
  level l gets branching[l] children) so every shape is compile-time fixed;
- tree attention is the ancestor mask threaded through
  ``core.model.forward_step_tree`` (tokens attend to prefix + ancestors;
  rope positions are prefix+depth, independent of storage slot);
- the accepted root-to-leaf path is COMPACTED into contiguous cache slots
  (one gather + one contiguous write per model) — no recompute;
- the whole generation is ONE jitted ``lax.while_loop``.

Two acceptance regimes, selected by the logits processor:

- GREEDY-EXACT (GreedyProcessor / None): children are the drafter's top-k;
  acceptance takes a child iff its token equals the target's argmax at the
  parent, and the bonus token is the target argmax at the last accepted
  node — by induction the emitted stream is EXACTLY the greedy AR stream,
  for ANY drafter and topology (the same oracle the chain path has under
  greedy).
- SAMPLED (any sampling processor): SpecInfer-style multi-draft rejection
  (Miao et al., 2023; see PAPERS.md). Children are drawn IID from the
  drafter's PROCESSED distribution q; the walk from the root examines each
  child j in order and accepts it with prob min(1, r(x_j)/q(x_j)) where r
  starts at the target's processed p and after each rejection becomes
  norm(max(r - q, 0)) — the multi-draft generalization of the chain path's
  accept/residual rule (ref: sampling/speculative_decoding.py:139-152),
  collapsing to it at branching (1,)*gamma. On full acceptance the bonus
  samples from p at the leaf; on rejection the correction samples from the
  final residual. The emitted stream is distributed EXACTLY as target AR
  sampling for any drafter/topology (SpecInfer Thm 1; TV-distance oracle in
  tests/test_tree_speculative.py).
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
from specdec_tpu.core.model import forward_step, forward_step_tree
from specdec_tpu.sampling.processors import GreedyProcessor
from specdec_tpu.sampling.utils import (
    eos_mask, max_fn, normalize_eos, pad_to_bucket,
)


class TreeTopology:
    """Static node bookkeeping for a branching tuple.

    Node 0 is the root (depth 0, the last committed token); level l
    (1..depth) holds prod(branching[:l]) nodes, numbered level by level.
    """

    def __init__(self, branching: Tuple[int, ...]):
        assert branching and all(b >= 1 for b in branching)
        self.branching = tuple(int(b) for b in branching)
        self.depth = len(self.branching)
        sizes = [1]
        for b in self.branching:
            sizes.append(sizes[-1] * b)
        self.level_sizes = sizes                      # [1, n1, ..., nd]
        self.level_start = np.cumsum([0] + sizes).tolist()   # start idx
        self.num_nodes = int(np.sum(sizes))

        parent = np.zeros((self.num_nodes,), np.int32)
        depth = np.zeros((self.num_nodes,), np.int32)
        for l in range(1, self.depth + 1):
            b = self.branching[l - 1]
            ps, cs = self.level_start[l - 1], self.level_start[l]
            for i in range(sizes[l]):
                parent[cs + i] = ps + i // b
                depth[cs + i] = l
        self.parent = parent
        self.depths = jnp.asarray(depth)

        anc = np.zeros((self.num_nodes, self.num_nodes), bool)
        for i in range(self.num_nodes):
            j = i
            anc[i, i] = True
            while j != 0:
                j = int(parent[j])
                anc[i, j] = True
        self.ancestor = jnp.asarray(anc)              # [N, N] incl. self

    def level_nodes(self, l: int) -> slice:
        return slice(self.level_start[l], self.level_start[l + 1])


_TOPO_CACHE = {}


def _topology(branching: Tuple[int, ...]) -> TreeTopology:
    """Topologies are jit static args (hashed by identity) — cache per
    branching tuple so repeated calls reuse the compiled program."""
    if branching not in _TOPO_CACHE:
        _TOPO_CACHE[branching] = TreeTopology(branching)
    return _TOPO_CACHE[branching]


def _greedy_tree_accept(topo: TreeTopology, tree_toks: jax.Array,
                        targmax: jax.Array):
    """Greedy path walk: child accepted iff token == target argmax at the
    parent (at most one child of a node can match — top-k children are
    distinct). Returns (chain [d], n_acc, next_tok)."""
    d = topo.depth
    cur = jnp.int32(0)
    alive = jnp.asarray(True)
    chain = jnp.zeros((d,), jnp.int32)
    n_acc = jnp.int32(0)
    for l in range(d):
        b = topo.branching[l]
        ps, cs = topo.level_start[l], topo.level_start[l + 1]
        first_child = cs + (cur - ps) * b
        child_idx = first_child + jnp.arange(b)
        child_toks = tree_toks[child_idx]
        match = child_toks == targmax[cur]
        hit = jnp.any(match)
        nxt = child_idx[jnp.argmax(match)]
        alive = alive & hit
        cur = jnp.where(alive, nxt, cur)
        chain = chain.at[l].set(cur)
        n_acc = n_acc + alive.astype(jnp.int32)
    return chain, n_acc, targmax[cur]


def _sampled_tree_accept(topo: TreeTopology, tree_toks: jax.Array,
                         q_nodes: jax.Array, p_nodes: jax.Array,
                         processor, key: jax.Array):
    """SpecInfer multi-draft rejection walk (shared by the model-drafter and
    EAGLE tree loops — one implementation of the distribution-defining rule).

    q_nodes[i]: the drafter's processed distribution AT node i (i.e. over
    node i's children — children of i were sampled IID from it); p_nodes[i]:
    the target's processed distribution at node i. The walk examines a
    node's children in order, accepting child j with prob
    min(1, r(x_j)/q(x_j)); each rejection updates the residual
    r <- norm(max(r - q, 0)) (zero-mass residual falls back to r unchanged,
    the measure-zero analog of the chain path's p fallback). Returns
    (chain [d], n_acc, next_tok): on full acceptance next_tok ~ p at the
    leaf; on rejection next_tok ~ the final residual."""
    d = topo.depth
    k_accept, k_final = jax.random.split(key)
    cur = jnp.int32(0)
    alive = jnp.asarray(True)
    chain = jnp.zeros((d,), jnp.int32)
    n_acc = jnp.int32(0)
    r = p_nodes[0]
    died_dist = jnp.zeros_like(r)
    uidx = 0
    for l in range(d):
        b = topo.branching[l]
        ps, cs = topo.level_start[l], topo.level_start[l + 1]
        first_child = cs + (cur - ps) * b
        q_cur = q_nodes[cur]                                 # [V]
        accepted_l = jnp.asarray(False)
        for j in range(b):
            ci = first_child + j
            x = tree_toks[ci]
            u = jax.random.uniform(jax.random.fold_in(k_accept, uidx))
            uidx += 1
            examined = alive & (~accepted_l)
            acc_j = examined & (u <= r[x] / jnp.maximum(q_cur[x], 1e-38))
            cur = jnp.where(acc_j, ci, cur)
            # residual update only where this child was examined & rejected
            res = max_fn(r - q_cur)
            mass = jnp.sum(res)
            res = jnp.where(mass > 1e-12, res / jnp.maximum(mass, 1e-38), r)
            r = jnp.where(examined & (~acc_j), res, r)
            accepted_l = accepted_l | acc_j
        just_died = alive & (~accepted_l)
        died_dist = jnp.where(just_died, r, died_dist)
        alive = alive & accepted_l
        chain = chain.at[l].set(cur)
        n_acc = n_acc + alive.astype(jnp.int32)
        r = jnp.where(alive, p_nodes[cur], r)   # fresh target dist next level
    final_dist = jnp.where(alive, p_nodes[cur], died_dist)
    next_tok = processor.sample(final_dist, k_final).astype(jnp.int32)
    return chain, n_acc, next_tok


@partial(jax.jit, static_argnames=("drafter_cfg", "target_cfg", "topo",
                                   "gen_len", "eos_ids", "processor"))
def _tree_spec_generate(
    drafter_cfg: ModelConfig, drafter_params,
    target_cfg: ModelConfig, target_params,
    prompt: jax.Array, prompt_len: jax.Array,
    topo: TreeTopology, gen_len: int,
    eos_ids: Tuple[int, ...],
    processor=None,                      # None => greedy-exact mode
    key: Optional[jax.Array] = None,
):
    d = topo.depth
    N = topo.num_nodes
    V = target_cfg.vocab_size
    P = prompt.shape[0]
    S = P + gen_len + N + 2
    max_windows = gen_len + 1

    d_cache = init_cache(drafter_cfg, 1, S)
    t_cache = init_cache(target_cfg, 1, S)
    buf = jnp.zeros((S,), jnp.int32).at[:P].set(prompt)
    total_len = jnp.minimum(
        min(drafter_cfg.max_position_embeddings,
            target_cfg.max_position_embeddings), prompt_len + gen_len)

    # prefill both models over the prompt MINUS the last token (it becomes
    # the first window's root); target emits nothing here — the root's
    # verify logits produce token 1 inside the first window
    t_logits, t_cache = forward_step(target_cfg, target_params,
                                     prompt[None, :], t_cache)
    _, d_cache = forward_step(drafter_cfg, drafter_params, prompt[None, :],
                              d_cache)
    d_cache = d_cache.with_length(jnp.full((1,), prompt_len - 1, jnp.int32))
    t_cache = t_cache.with_length(jnp.full((1,), prompt_len - 1, jnp.int32))

    pos = prompt_len
    depths = topo.depths
    anc = topo.ancestor

    def cond(st):
        buf, pos, d_cache, t_cache, finished, acc, spec, window = st
        return (~finished) & (pos < total_len) & (window < max_windows)

    def body(st):
        buf, pos, d_cache, t_cache, finished, acc_cnt, spec_cnt, window = st
        wkey = (jax.random.fold_in(key, window) if processor is not None
                else None)

        root = lax.dynamic_index_in_dim(buf, pos - 1, 0, keepdims=False)
        tree_toks = jnp.zeros((N,), jnp.int32).at[0].set(root)
        q_nodes = jnp.zeros((N, V), jnp.float32)
        start = d_cache.length  # [1] = pos-1 (tree node 0 slot, both models)

        # --- drafter expansion, level by level ---------------------------
        d_cache_l = d_cache
        for l in range(d):
            ls = topo.level_nodes(l)
            toks_l = tree_toks[ls]                   # [n_l]
            E = topo.level_start[l + 1]              # nodes incl. level l
            mask_l = anc[ls, :E]                     # [n_l, E]
            logits_l, d_cache_l = forward_step_tree(
                drafter_cfg, drafter_params, toks_l[None, :], d_cache_l,
                depths[ls], mask_l, tree_start=start)
            b = topo.branching[l]
            cs = topo.level_nodes(l + 1)
            if processor is None:
                # greedy mode: children = distinct top-k
                top = lax.top_k(logits_l[0], b)[1].astype(jnp.int32)
                tree_toks = tree_toks.at[cs].set(top.reshape(-1))
            else:
                # sampled mode: children IID from the PROCESSED drafter
                # distribution (multi-draft rejection needs q, not top-k)
                q_l = processor(logits_l[0])                 # [n_l, V]
                q_nodes = q_nodes.at[ls].set(q_l)
                n_l = topo.level_sizes[l]
                keys = jax.random.split(
                    jax.random.fold_in(wkey, l), n_l * b).reshape(n_l, b)
                kids = jax.vmap(lambda qi, ks: jax.vmap(
                    lambda kk: processor.sample(qi, kk))(ks))(q_l, keys)
                tree_toks = tree_toks.at[cs].set(
                    kids.reshape(-1).astype(jnp.int32))
        # process the last level too so the drafter cache mirrors the
        # target's tree rows (compaction then applies to both)
        ls = topo.level_nodes(d)
        _, d_cache_l = forward_step_tree(
            drafter_cfg, drafter_params, tree_toks[ls][None, :], d_cache_l,
            depths[ls], anc[ls, :N], tree_start=start)

        # --- target verify: the WHOLE tree in one forward ----------------
        t_logits, t_cache_l = forward_step_tree(
            target_cfg, target_params, tree_toks[None, :], t_cache,
            depths, anc)

        # --- path acceptance ----------------------------------------------
        if processor is None:
            targmax = jnp.argmax(t_logits[0], axis=-1).astype(jnp.int32)
            chain, n_acc, bonus = _greedy_tree_accept(topo, tree_toks,
                                                      targmax)
        else:
            p_nodes = processor(t_logits[0])                 # [N, V]
            chain, n_acc, bonus = _sampled_tree_accept(
                topo, tree_toks, q_nodes, p_nodes, processor,
                jax.random.fold_in(wkey, 2 ** 20))

        # --- commit: accepted chain tokens then the bonus ----------------
        li = jnp.arange(d + 1)
        chain_toks = tree_toks[chain]                            # [d]
        cand = jnp.concatenate(
            [jnp.where(li[:d] < n_acc, chain_toks, 0),
             jnp.zeros((1,), jnp.int32)])
        cand = cand.at[n_acc].set(bonus)   # entries past n_acc: don't-care

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

        # --- compact the accepted path into contiguous slots -------------
        # tree rows live at slots start..start+N-1 in node order; the chain
        # node at depth j must land at slot start+j (root stays at start)
        new_len = (new_pos - 1)[None].astype(jnp.int32)
        d_cache = compact_path(d_cache_l, start[0] + chain, start[0] + 1,
                               new_len)
        t_cache = compact_path(t_cache_l, start[0] + chain, start[0] + 1,
                               new_len)

        corrected = jnp.clip(total_len - pos - 1, 0, d)
        acc_cnt = acc_cnt + jnp.minimum(n_acc, corrected)
        spec_cnt = spec_cnt + corrected
        return (buf, new_pos, d_cache, t_cache, finished, acc_cnt, spec_cnt,
                window + 1)

    st = (buf, pos, d_cache, t_cache, pos >= total_len,
          jnp.int32(0), jnp.int32(0), jnp.int32(0))
    buf, pos, _, _, _, acc_cnt, spec_cnt, windows = lax.while_loop(
        cond, body, st)
    packed = jnp.concatenate(
        [buf, jnp.stack([pos - prompt_len, acc_cnt, spec_cnt, windows])])
    return packed


def tree_speculative_generate(
    inputs: Sequence[int],
    drafter_cfg: ModelConfig, drafter_params,
    target_cfg: ModelConfig, target_params,
    branching: Tuple[int, ...] = (2, 2, 1, 1),
    max_gen_len: int = 40,
    logits_processor=None,
    eos_tokens_id=1,
    pad_token_id: int = 0,
    key: Optional[jax.Array] = None,
) -> Tuple[List[int], float]:
    """Tree speculation. Returns (generated ids, chain-depth acceptance
    rate = accepted depth / max depth per window).

    GreedyProcessor/None selects the greedy-exact mode (output is
    token-identical to greedy AR for any drafter/topology); any sampling
    processor selects SpecInfer multi-draft rejection (output distributed
    exactly as target AR sampling). See the module docstring."""
    sampled = (logits_processor is not None
               and not isinstance(logits_processor, GreedyProcessor))
    processor = logits_processor if sampled else None
    key = key if key is not None else jax.random.key(0)
    eos_ids = normalize_eos(eos_tokens_id)
    prompt, n = pad_to_bucket(inputs, pad_token_id)
    if n < 2:
        raise ValueError("tree speculation needs a prompt of >= 2 tokens")
    topo = _topology(tuple(int(b) for b in branching))

    packed = _tree_spec_generate(
        drafter_cfg, drafter_params, target_cfg, target_params,
        prompt, jnp.int32(n), topo, int(max_gen_len), eos_ids,
        processor=processor, key=key)

    packed = np.asarray(packed)   # ONE pull
    n_gen, acc, spec, _ = (int(v) for v in packed[-4:])
    rate = acc / spec if spec > 0 else 0.0
    return packed[n:n + n_gen].tolist(), rate
