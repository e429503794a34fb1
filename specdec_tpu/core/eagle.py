"""EAGLE-style feature-predictor drafter (beyond-reference capability).

The reference's drafters are independent small checkpoints (ref:
engine/model_loader.py:104-111 loads a second AutoModelForCausalLM). EAGLE
(Li et al., 2024 — see PAPERS.md) replaces the drafter with a one-layer
*feature autoregressor* riding on the target itself: it predicts the target's
next-position hidden state from (current hidden state, next token embedding),
and reuses the target's own LM head to turn predicted features into draft
distributions. Drafting cost per token ≈ one fc + one transformer block + the
shared head — far below a standalone drafter of comparable acceptance, because
the rich target feature does most of the work.

TPU-native design:
- the drafter is the SAME pure-pytree block stack as the target
  (core/model.py::_block, stacked layers, ``lax.scan``), so quantized weight
  containers, sharding PartitionSpecs, and the slotted KVCache all apply
  unchanged; its config is ``target_cfg.replace(num_layers=k)`` (k=1 default)
- the fusion layer is a single matmul over concat(embed, feature) — [2D, D]
- logits reuse the target's ``final_norm`` + ``lm_head``/tied embedding, so
  a predicted feature that EQUALS the true feature reproduces the target's
  distribution exactly (the training fixed point)

Feature definition: the pre-final-norm residual stream
(core/model.py::forward_step_features). Training lives in
engine/eagle_train.py; the generation loop in sampling/eagle_speculative.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from specdec_tpu.core.cache import KVCache, QuantKVCache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import _block, _mm, _norm, init_params
from specdec_tpu.core.rope import rope_cos_sin

Params = Dict[str, Any]


def init_eagle_params(cfg: ModelConfig, key: jax.Array,
                      scale: float = 0.02) -> Params:
    """Random-init an EAGLE drafter for a target with ``cfg`` dims.

    ``cfg.num_layers`` is the DRAFTER depth (1 for classic EAGLE) — build it
    via ``target_cfg.replace(num_layers=1)``. The fc fusion weight starts as
    [I; 0] over the (embed, feature) concat — identity on the feature half —
    so the untrained drafter already echoes the target's own representation
    instead of noise (faster, more stable training than a random fc).
    """
    D = cfg.hidden_size
    k_fc, k_layers = jax.random.split(key)
    base = init_params(cfg, k_layers, scale=scale)
    fc = jnp.concatenate([
        jax.random.normal(k_fc, (D, D), jnp.float32) * scale,
        jnp.eye(D, dtype=jnp.float32),
    ], axis=0).astype(cfg.dtype)
    return {
        "fc_w": fc,                       # [2D, D]: rows 0..D embed, D..2D feature
        "fc_b": jnp.zeros((D,), cfg.dtype),
        "layers": base["layers"],
    }


def _eagle_common(cfg: ModelConfig, eagle_params: Params,
                  target_params: Params, tokens: jax.Array,
                  feats: jax.Array, cache: KVCache, q_pos: jax.Array,
                  tree) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Shared drafter body for the sequential and tree forwards (ONE
    implementation — any fc/head/norm change must hit both paths, mirroring
    core.model._forward_common): fc fusion over (embed, feature) pairs, the
    block-stack scan, and the target's final-norm + head."""
    T = tokens.shape[1]
    offsets = cache.length
    cos, sin = rope_cos_sin(q_pos, cfg.rotary_dim, cfg.rope_theta,
                            scaling=cfg.rope_scaling)

    emb = target_params["embed"][tokens].astype(cfg.dtype)
    x = jnp.concatenate([emb, feats.astype(cfg.dtype)], axis=-1)
    x = _mm(x, eagle_params["fc_w"]) + eagle_params["fc_b"]

    def body(carry, scanned):
        h = carry
        lp, lk, lv = scanned
        h, lk, lv = _block(cfg, lp, h, cos, sin, q_pos, lk, lv, offsets,
                           tree=tree)
        return h, (lk, lv)

    quant = isinstance(cache, QuantKVCache)
    k_in = (cache.k, cache.k_scale) if quant else cache.k
    v_in = (cache.v, cache.v_scale) if quant else cache.v
    x, (new_k, new_v) = lax.scan(
        body, x, (eagle_params["layers"], k_in, v_in))

    f_hat = x
    h = _norm(cfg, x, target_params["final_norm_w"],
              target_params.get("final_norm_b"))
    if cfg.tie_embeddings:
        logits = jnp.einsum("btd,vd->btv", h, target_params["embed"],
                            preferred_element_type=jnp.float32)
    else:
        logits = _mm(h, target_params["lm_head"]).astype(jnp.float32)
    if cfg.logit_softcap > 0.0:
        logits = jnp.tanh(logits / cfg.logit_softcap) * cfg.logit_softcap
    if quant:
        return logits, f_hat, QuantKVCache(
            k=new_k[0], k_scale=new_k[1], v=new_v[0], v_scale=new_v[1],
            length=cache.length + T)
    return logits, f_hat, KVCache(k=new_k, v=new_v, length=cache.length + T)


def eagle_forward(cfg: ModelConfig, eagle_params: Params,
                  target_params: Params, tokens: jax.Array,
                  feats: jax.Array, cache: KVCache,
                  ) -> Tuple[jax.Array, jax.Array, KVCache]:
    """One drafter forward over a [B, T] block of (token, feature) pairs.

    Position ``j`` of the block pairs the target feature of sequence position
    ``q_pos[j]`` with the token at ``q_pos[j] + 1``; the output feature
    ``f_hat[:, j]`` predicts the target's feature at ``q_pos[j] + 1`` and
    ``logits[:, j]`` its distribution for the token at ``q_pos[j] + 2``.

    tokens: [B, T] int32; feats: [B, T, D] (target residual stream, see
    forward_step_features); cache: drafter KVCache (num_layers = drafter
    depth). Returns (logits [B, T, V] f32, f_hat [B, T, D], advanced cache).
    """
    B, T = tokens.shape
    q_pos = cache.length[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    return _eagle_common(cfg, eagle_params, target_params, tokens, feats,
                         cache, q_pos, tree=None)


def eagle_forward_tree(cfg: ModelConfig, eagle_params: Params,
                       target_params: Params, tokens: jax.Array,
                       feats: jax.Array, cache: KVCache,
                       depths: jax.Array, tree_mask: jax.Array,
                       tree_start: Optional[jax.Array] = None,
                       ) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Tree-structured drafter forward: the N (token, parent-feature) pairs
    are TREE nodes, not a sequence (sampling/eagle_tree.py expands level by
    level). Rope position of node j is ``tree_start + depths[j]`` and it
    attends to the drafter-cache prefix (which ends with the committed
    root pair) plus its tree ANCESTORS only — the same ancestor-mask
    contract as core.model.forward_step_tree. Returns
    (logits [B, N, V] f32, f_hat [B, N, D], cache advanced by N)."""
    if tree_start is None:
        tree_start = cache.length
    q_pos = tree_start[:, None] + depths[None, :].astype(jnp.int32)
    return _eagle_common(cfg, eagle_params, target_params, tokens, feats,
                         cache, q_pos, tree=(tree_start, tree_mask))
