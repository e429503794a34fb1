"""TPU-native decoder-only transformer forward pass.

Functional (pure-pytree) model covering the HF families the reference loads via
``AutoModelForCausalLM`` (ref: engine/model_loader.py:81-111): llama/mistral/qwen
(RMSNorm, RoPE, SwiGLU, GQA, optional qk-norm) and gpt-neox/pythia (LayerNorm,
parallel residual, partial rotary, biases).

Design notes (TPU-first, not a port):
- layers are *stacked* (leading ``L`` axis) and traversed with ``lax.scan`` —
  one compiled block body regardless of depth, fast compiles, and a clean
  leading axis for pipeline-stage sharding later;
- there is ONE code path: ``forward_step`` processes a [B, T] block against a
  static-shape ``KVCache`` at per-sequence offsets. Prefill, single-token
  decode, and the (gamma+1)-token speculative verify are all the same function
  with a different T. ``forward_full`` is a thin wrapper over a scratch cache;
- attention uses grouped-query einsums (KV heads never materialized repeated)
  with f32 softmax; masking is ``key_pos <= query_pos`` which subsumes
  causality, cache validity, and staleness after rollback.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from specdec_tpu.core.cache import (
    KVCache, QuantKVCache, init_cache, write_block, write_block_quant,
)
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.rope import apply_rope, rope_cos_sin


def _mm(x, w):
    """Dense or quantized matmul (weight-only INT8/NF4 go through the fused
    Pallas dequant-matmul kernel — see specdec_tpu/quant, ops/quant_matmul)."""
    from specdec_tpu.quant.core import qmatmul
    return qmatmul(x, w)

Params = Dict[str, Any]

_NEG_INF = -1e30


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * lax.rsqrt(var + eps)
    return (w * normed.astype(x.dtype)).astype(x.dtype)


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * lax.rsqrt(var + eps)
    return (normed.astype(x.dtype) * w + b).astype(x.dtype)


def _norm(cfg: ModelConfig, x, w, b=None):
    if cfg.norm_type == "rmsnorm":
        return rms_norm(x, w, cfg.norm_eps)
    return layer_norm(x, w, b, cfg.norm_eps)


def _act(cfg: ModelConfig, x):
    if cfg.act == "silu":
        return jax.nn.silu(x)
    if cfg.act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if cfg.act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {cfg.act}")


def _attention(cfg: ModelConfig, q, k_all, v_all, q_pos, k_len, tree=None):
    """q: [B,T,Hq,Dh]; k_all/v_all: [B,S,Hk,Dh] — or, for a quantized cache,
    (int8 [B,S,Hk,Dh], f32 [B,S,Hk] scale) pairs; q_pos: [B,T] absolute
    positions.

    Mask admits key position s iff s <= q_pos[b, t] (and s < k_len safety bound,
    implied because q_pos < written length). Softmax in f32.

    Quantized K/V stay int8 end-to-end: k-scales multiply the SCORES after
    the q·k dot (scores are per-(s, h) — exactly one scale each) and
    v-scales fold into the probabilities before the value dot, so no
    dequantized [B, S, Hk, Dh] tensor is ever materialized.

    ``tree``: optional (start [B], tree_mask [T, E]) for tree-structured
    query blocks (speculative trees): key SLOTS in [start, start+E) carry
    tree tokens (E >= T: earlier-written levels plus this block) whose
    attention is by ANCESTRY, not slot position — the position test is
    overridden by tree_mask there (prefix keys < start keep the position
    test; q_pos already encodes prefix+depth for rope).
    """
    k_scale = v_scale = None
    if isinstance(k_all, tuple):
        k_all, k_scale = k_all
        v_all, v_scale = v_all
    B, T, Hq, Dh = q.shape
    S = k_all.shape[1]
    Hk = cfg.num_kv_heads
    G = cfg.q_per_kv
    if (tree is None
            and cfg.attention_impl == "flash" and cfg.logit_softcap == 0.0
            and T * G <= 1024  # decode/verify blocks only: the kernel holds
            # the whole [T*G, Dh] query block (+f32 scratch) in VMEM, so
            # prefill-sized T must take the XLA path
            and jax.default_backend() == "tpu"):
        if k_scale is not None:
            # int8 KV: stream the quantized tiles directly (half the HBM
            # traffic of a dequantized stream — the KV-bound batch-decode
            # regime this kernel exists for)
            from specdec_tpu.ops.decode_attention import (
                flash_decode_attention_quant,
            )
            out = flash_decode_attention_quant(q, k_all, k_scale, v_all,
                                               v_scale, q_pos[:, 0], Hk)
        else:
            from specdec_tpu.ops.decode_attention import (
                flash_decode_attention,
            )
            out = flash_decode_attention(q, k_all, v_all, q_pos[:, 0], Hk)
        return out.reshape(B, T, Hq * Dh)
    qg = q.reshape(B, T, Hk, G, Dh)
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
    k_dot = k_all.astype(qg.dtype) if k_scale is not None else k_all
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k_dot,
                        preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        # one scale per (sequence slot, kv head): [B,S,Hk] -> [B,Hk,1,1,S]
        scores = scores * jnp.transpose(k_scale, (0, 2, 1))[:, :, None, None, :]
    k_pos = jnp.arange(S, dtype=jnp.int32)
    mask = k_pos[None, None, :] <= q_pos[:, :, None]  # [B,T,S]
    if tree is not None:
        start, tree_mask = tree               # [B], [T, E] bool
        E = tree_mask.shape[1]
        is_tree = ((k_pos[None, :] >= start[:, None]) &
                   (k_pos[None, :] < start[:, None] + E))  # [B, S]
        slot = jnp.clip(k_pos[None, :] - start[:, None], 0, E - 1)  # [B, S]
        tm = jnp.transpose(tree_mask[:, slot], (1, 0, 2))  # [B, T, S]
        mask = jnp.where(is_tree[:, None, :], tm, mask)
    scores = jnp.where(mask[:, None, None, :, :], scores, _NEG_INF)
    if cfg.logit_softcap > 0.0:
        scores = jnp.tanh(scores / cfg.logit_softcap) * cfg.logit_softcap
    if v_scale is not None:
        probs = jax.nn.softmax(scores, axis=-1)
        # fold the v-scales into the probs ([B,S,Hk] -> [B,Hk,1,1,S]); the
        # value dot then reads int8 V directly
        probs = probs * jnp.transpose(v_scale, (0, 2, 1))[:, :, None, None, :]
        out = jnp.einsum("bhgts,bshd->bthgd", probs.astype(cfg.dtype),
                         v_all.astype(cfg.dtype))
    else:
        probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
        out = jnp.einsum("bhgts,bshd->bthgd", probs, v_all)
    return out.reshape(B, T, Hq * Dh)


def _block(cfg: ModelConfig, lp: Params, x, cos, sin, q_pos,
           layer_k, layer_v, offsets, tree=None):
    """One transformer block over a [B, T, D] activation block.

    Returns (new_x, new_layer_k, new_layer_v).
    """
    B, T, D = x.shape
    Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = _norm(cfg, x, lp["attn_norm_w"], lp.get("attn_norm_b"))
    q, k, v = _qkv(cfg, lp, h)
    q = q.reshape(B, T, Hq, Dh)
    k = k.reshape(B, T, Hk, Dh)
    v = v.reshape(B, T, Hk, Dh)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm_w"], cfg.norm_eps)
        k = rms_norm(k, lp["k_norm_w"], cfg.norm_eps)
    rd = cfg.rotary_dim
    q = apply_rope(q, cos, sin, rd)
    k = apply_rope(k, cos, sin, rd)

    if isinstance(layer_k, tuple):
        # quantized cache: layer_k/layer_v are (int8 values, f32 scales)
        kq, ks, vq, vs = write_block_quant(layer_k[0], layer_k[1],
                                           layer_v[0], layer_v[1],
                                           k, v, offsets)
        layer_k, layer_v = (kq, ks), (vq, vs)
    else:
        layer_k, layer_v = write_block(layer_k, layer_v, k, v, offsets)
    attn = _attention(cfg, q, layer_k, layer_v, q_pos, None, tree=tree)
    attn = _mm(attn, lp["wo"])
    if cfg.attn_out_bias:
        attn = attn + lp["bo"]

    if cfg.parallel_residual:
        m = _norm(cfg, x, lp["mlp_norm_w"], lp.get("mlp_norm_b"))
    else:
        x = x + attn
        m = _norm(cfg, x, lp["mlp_norm_w"], lp.get("mlp_norm_b"))

    mlp = _mlp_up(cfg, lp, m)
    mlp = _mm(mlp, lp["w_down"])
    if cfg.mlp_bias:
        mlp = mlp + lp["b_down"]

    if cfg.parallel_residual:
        x = x + attn + mlp
    else:
        x = x + mlp
    return x, layer_k, layer_v


def _qkv(cfg: ModelConfig, lp: Params, h):
    """q/k/v projections; a fused ``wqkv`` weight (quantize_params(fuse=True))
    runs as ONE matmul/kernel launch and is split afterwards."""
    Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "wqkv" in lp:
        qkv = _mm(h, lp["wqkv"])
        if cfg.attn_qkv_bias:
            qkv = qkv + lp["bqkv"]
        q = qkv[..., :Hq * Dh]
        k = qkv[..., Hq * Dh:(Hq + Hk) * Dh]
        v = qkv[..., (Hq + Hk) * Dh:]
        return q, k, v
    q = _mm(h, lp["wq"])
    k = _mm(h, lp["wk"])
    v = _mm(h, lp["wv"])
    if cfg.attn_qkv_bias:
        q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    return q, k, v


def _mlp_up(cfg: ModelConfig, lp: Params, m):
    """Gate/up projections (fused ``w_gateup`` runs as one launch)."""
    if cfg.gated_mlp:
        if "w_gateup" in lp:
            gu = _mm(m, lp["w_gateup"])
            if cfg.mlp_bias:
                gu = gu + lp["b_gateup"]
            F = gu.shape[-1] // 2
            return _act(cfg, gu[..., :F]) * gu[..., F:]
        gate = _mm(m, lp["w_gate"])
        up = _mm(m, lp["w_up"])
        if cfg.mlp_bias:
            gate, up = gate + lp["b_gate"], up + lp["b_up"]
        return _act(cfg, gate) * up
    up = _mm(m, lp["w_up"])
    if cfg.mlp_bias:
        up = up + lp["b_up"]
    return _act(cfg, up)


def _split_stacked_quant(layers):
    """Partition a layer dict into (scan-friendly dense leaves, stacked
    4-bit containers). The containers are CLOSED OVER by the scan body and
    accessed per layer through quant/core.StackedSlice — scanning them as
    xs makes XLA materialize each layer\'s packed weights into the Pallas
    custom call (profiled ~0.85 ms/token at 1.1B; see StackedSlice)."""
    from specdec_tpu.quant.core import FP4Weight, Int4Weight, NF4Weight
    q4 = {k: v for k, v in layers.items()
          if isinstance(v, (NF4Weight, FP4Weight, Int4Weight))}
    dense = {k: v for k, v in layers.items() if k not in q4}
    return dense, q4


def _layer_params(lp_dense, q4, i):
    from specdec_tpu.quant.core import StackedSlice
    lp = dict(lp_dense)
    for name, cont in q4.items():
        lp[name] = StackedSlice(cont, i)
    return lp


def _forward_common(cfg: ModelConfig, params: Params, tokens: jax.Array,
                    cache: KVCache, q_pos: jax.Array, tree,
                    ) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Shared embed → layer scan → final norm → logits head pipeline of
    ``forward_step`` and ``forward_step_tree`` (ONE implementation — any
    head/norm change must hit both paths identically).

    Returns (logits, features, cache) where ``features`` is the residual
    stream AFTER the layer scan and BEFORE the final norm — the hidden state
    EAGLE-style feature-predictor drafters condition on (core/eagle.py).
    Callers that drop it pay nothing: XLA dead-code-eliminates the extra
    output under jit."""
    T = tokens.shape[1]
    offsets = cache.length
    cos, sin = rope_cos_sin(q_pos, cfg.rotary_dim, cfg.rope_theta,
                            scaling=cfg.rope_scaling)
    x = params["embed"][tokens].astype(cfg.dtype)
    if cfg.embed_scale != 1.0:  # gemma: sqrt(hidden) on the embedding only
        x = x * jnp.asarray(cfg.embed_scale, cfg.dtype)

    dense_layers, q4_stack = _split_stacked_quant(params["layers"])

    def body(carry, scanned):
        h = carry
        lp, i, lk, lv = scanned
        lp = _layer_params(lp, q4_stack, i)
        h, lk, lv = _block(cfg, lp, h, cos, sin, q_pos, lk, lv, offsets,
                           tree=tree)
        return h, (lk, lv)

    # layer K/V travel through the scan as (values, scales) pairs when the
    # cache is quantized (all leaves have the leading L axis); _block and
    # _attention branch on the pair structure at trace time. 4-bit weight
    # containers do NOT ride the scan: the body closes over the full stack
    # and indexes it per layer (see _split_stacked_quant)
    quant = isinstance(cache, QuantKVCache)
    k_in = (cache.k, cache.k_scale) if quant else cache.k
    v_in = (cache.v, cache.v_scale) if quant else cache.v
    idxs = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    x, (new_k, new_v) = lax.scan(body, x, (dense_layers, idxs, k_in, v_in))

    feats = x
    x = _norm(cfg, x, params["final_norm_w"], params.get("final_norm_b"))
    if cfg.tie_embeddings:
        logits = jnp.einsum("btd,vd->btv", x, params["embed"],
                            preferred_element_type=jnp.float32)
    else:
        logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    if cfg.logit_softcap > 0.0:
        logits = jnp.tanh(logits / cfg.logit_softcap) * cfg.logit_softcap
    if quant:
        return logits, feats, QuantKVCache(
            k=new_k[0], k_scale=new_k[1], v=new_v[0], v_scale=new_v[1],
            length=cache.length + T)
    return logits, feats, KVCache(k=new_k, v=new_v, length=cache.length + T)


def forward_step(cfg: ModelConfig, params: Params, tokens: jax.Array,
                 cache: KVCache) -> Tuple[jax.Array, KVCache]:
    """Process a [B, T] token block against the cache at per-seq offsets.

    Writes the block's K/V at ``cache.length`` (per sequence), attends over
    everything written so far, and returns logits [B, T, vocab] (f32) plus the
    cache advanced by T. Callers that prefilled right-padded prompts set the
    true per-seq lengths afterwards via ``cache.with_length`` — stale entries
    are masked and later overwritten (see core/cache.py).
    """
    B, T = tokens.shape
    q_pos = cache.length[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    logits, _, cache = _forward_common(cfg, params, tokens, cache, q_pos,
                                       tree=None)
    return logits, cache


def forward_step_features(cfg: ModelConfig, params: Params, tokens: jax.Array,
                          cache: KVCache,
                          ) -> Tuple[jax.Array, jax.Array, KVCache]:
    """``forward_step`` that also returns the pre-final-norm residual stream
    ([B, T, D] "features"), which EAGLE-style drafters autoregress on
    (core/eagle.py). Same cache semantics as ``forward_step``."""
    B, T = tokens.shape
    q_pos = cache.length[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    return _forward_common(cfg, params, tokens, cache, q_pos, tree=None)


def forward_step_tree(cfg: ModelConfig, params: Params, tokens: jax.Array,
                      cache: KVCache, depths: jax.Array,
                      tree_mask: jax.Array,
                      tree_start: Optional[jax.Array] = None,
                      ) -> Tuple[jax.Array, KVCache]:
    """Process a [B, N] block of TREE-structured tokens against the cache.

    Tree speculation (EAGLE/SpecInfer-style, static topology): the N tokens
    are tree nodes, not a sequence. Each node's rope position is
    ``cache.length + depths[node]`` and it attends to the prefix plus its
    ANCESTORS only (``tree_mask[q, k]``, ancestor-or-self, True on the
    diagonal). K/V are written at slots length..length+N-1 — slot order is
    storage only; masking is entirely by ancestry, and the accepted path is
    later compacted to contiguous slots (sampling/tree_speculative.py).
    ``tree_start`` (default: current length) is the slot of tree node 0 —
    pass it on level-by-level expansion calls, where the cache has already
    advanced past earlier levels but ancestry masking must cover them
    (tree_mask is then [N, E] with E = nodes written so far + N).
    Returns (logits [B, N, V] f32, cache advanced by N)."""
    if tree_start is None:
        tree_start = cache.length
    q_pos = tree_start[:, None] + depths[None, :].astype(jnp.int32)  # [B, N]
    logits, _, cache = _forward_common(cfg, params, tokens, cache, q_pos,
                                       tree=(tree_start, tree_mask))
    return logits, cache


def forward_step_tree_features(cfg: ModelConfig, params: Params,
                               tokens: jax.Array, cache: KVCache,
                               depths: jax.Array, tree_mask: jax.Array,
                               tree_start: Optional[jax.Array] = None,
                               ) -> Tuple[jax.Array, jax.Array, KVCache]:
    """``forward_step_tree`` that also returns the pre-final-norm residual
    stream per tree node ([B, N, D]) — the features EAGLE tree drafting
    writes back along the accepted path (sampling/eagle_tree.py). Same cache
    semantics as ``forward_step_tree``."""
    if tree_start is None:
        tree_start = cache.length
    q_pos = tree_start[:, None] + depths[None, :].astype(jnp.int32)
    return _forward_common(cfg, params, tokens, cache, q_pos,
                           tree=(tree_start, tree_mask))


def forward_full(cfg: ModelConfig, params: Params, tokens: jax.Array) -> jax.Array:
    """Causal full-sequence forward (no persistent cache); logits [B, T, V] f32."""
    B, T = tokens.shape
    cache = init_cache(cfg, B, T)
    logits, _ = forward_step(cfg, params, tokens, cache)
    return logits


def init_params(cfg: ModelConfig, key: jax.Array, scale: float = 0.02) -> Params:
    """Random init (normal * scale); used by tests and synthetic benchmarks."""
    keys = iter(jax.random.split(key, 64))

    def w(shape, s=scale):
        return (jax.random.normal(next(keys), shape, dtype=jnp.float32) * s
                ).astype(cfg.dtype)

    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    layers: Params = {
        "attn_norm_w": jnp.ones((L, D), cfg.dtype),
        "mlp_norm_w": jnp.ones((L, D), cfg.dtype),
        "wq": w((L, D, Hq * Dh)),
        "wk": w((L, D, Hk * Dh)),
        "wv": w((L, D, Hk * Dh)),
        "wo": w((L, Hq * Dh, D)),
        "w_up": w((L, D, F)),
        "w_down": w((L, F, D)),
    }
    if cfg.gated_mlp:
        layers["w_gate"] = w((L, D, F))
    if cfg.norm_type == "layernorm":
        layers["attn_norm_b"] = jnp.zeros((L, D), cfg.dtype)
        layers["mlp_norm_b"] = jnp.zeros((L, D), cfg.dtype)
    if cfg.attn_qkv_bias:
        layers["bq"] = jnp.zeros((L, Hq * Dh), cfg.dtype)
        layers["bk"] = jnp.zeros((L, Hk * Dh), cfg.dtype)
        layers["bv"] = jnp.zeros((L, Hk * Dh), cfg.dtype)
    if cfg.attn_out_bias:
        layers["bo"] = jnp.zeros((L, D), cfg.dtype)
    if cfg.mlp_bias:
        layers["b_up"] = jnp.zeros((L, F), cfg.dtype)
        layers["b_down"] = jnp.zeros((L, D), cfg.dtype)
        if cfg.gated_mlp:
            layers["b_gate"] = jnp.zeros((L, F), cfg.dtype)
    if cfg.qk_norm:
        layers["q_norm_w"] = jnp.ones((L, Dh), cfg.dtype)
        layers["k_norm_w"] = jnp.ones((L, Dh), cfg.dtype)

    params: Params = {
        "embed": w((cfg.vocab_size, D)),
        "layers": layers,
        "final_norm_w": jnp.ones((D,), cfg.dtype),
    }
    if cfg.norm_type == "layernorm":
        params["final_norm_b"] = jnp.zeros((D,), cfg.dtype)
    if not cfg.tie_embeddings:
        params["lm_head"] = w((D, cfg.vocab_size))
    return params


# ---------------------------------------------------------------------------
# Paged-cache forward (serving path; see core/paged_cache.py)
# ---------------------------------------------------------------------------

def forward_step_paged(cfg: ModelConfig, params: Params, tokens: jax.Array,
                       cache, use_kernel: Optional[bool] = None):
    """forward_step over a PagedKVCache: identical math to the slotted path
    (oracle-tested), but K/V live in a page pool addressed through per-seq
    page tables. Attention uses the Pallas paged kernel on TPU
    (ops/paged_attention.py) and a gather-based XLA path elsewhere."""
    from specdec_tpu.core.paged_cache import (
        PagedKVCache, QuantPagedKVCache, gather_page_scales, gather_pages,
        write_block_paged_quant_stacked, write_block_paged_stacked,
    )

    B, T = tokens.shape
    offsets = cache.length
    q_pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(q_pos, cfg.rotary_dim, cfg.rope_theta,
                            scaling=cfg.rope_scaling)
    page_size = cache.page_size
    quant = isinstance(cache, QuantPagedKVCache)
    if use_kernel is None:
        # same VMEM guard as the flash path (_attention): both paged kernels
        # hold the whole [T*G, Dh] query block plus f32 scratch in VMEM, so
        # prefill-sized T (chunked-admission blocks at high GQA ratios) must
        # take the gather path rather than fail Mosaic compilation at runtime.
        # SPECDEC_PAGED_KERNEL=kernel|gather forces one path (A/B probes and
        # regime-specific serving overrides; tools/exp_paged_residual.py).
        import os
        mode = os.getenv("SPECDEC_PAGED_KERNEL", "auto").lower()
        ok = (jax.default_backend() == "tpu"
              and cfg.logit_softcap == 0.0
              and T * cfg.q_per_kv <= 1024)
        use_kernel = False if mode == "gather" else ok

    x = params["embed"][tokens].astype(cfg.dtype)
    if cfg.embed_scale != 1.0:  # gemma: sqrt(hidden) on the embedding only
        x = x * jnp.asarray(cfg.embed_scale, cfg.dtype)

    dense_layers, q4_stack = _split_stacked_quant(params["layers"])

    def body(carry, scanned):
        # pools ride the scan CARRY as full [L, ...] stacks (writes scatter
        # at layer index i; reads slice the layer) — as scan xs/ys, XLA
        # materialized every layer's pool slice into the write and DUS-ed
        # it back into a fresh stacked output, ~1.8 ms per decode window at
        # the 1.1B serving shape (round-5 xplane trace; the same
        # scan-materialization class round 4 fixed for quantized weights)
        h, pk, pv = carry
        lp, i = scanned
        lp = _layer_params(lp, q4_stack, i)
        Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        hh = _norm(cfg, h, lp["attn_norm_w"], lp.get("attn_norm_b"))
        q, k, v = _qkv(cfg, lp, hh)
        q = q.reshape(B, T, Hq, Dh)
        k = k.reshape(B, T, Hk, Dh)
        v = v.reshape(B, T, Hk, Dh)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm_w"], cfg.norm_eps)
            k = rms_norm(k, lp["k_norm_w"], cfg.norm_eps)
        q = apply_rope(q, cos, sin, cfg.rotary_dim)
        k = apply_rope(k, cos, sin, cfg.rotary_dim)

        if quant:
            pk, pv = write_block_paged_quant_stacked(
                pk, pv, i, k, v, cache.page_table, offsets, page_size)
            # the READ slices the layer out of the carried stacks: a
            # stacked-pool kernel variant (layer scalar-prefetch,
            # ops/paged_attention.py *_stacked) measured 40 ms/window
            # SLOWER on chip — the extra leading block dim defeats the
            # clamped-page DMA elision — so the sliced per-layer kernel
            # stays (round-5 measurement, docs/BENCHMARKS.md)
            kq = lax.dynamic_index_in_dim(pk[0], i, 0, keepdims=False)
            ks = lax.dynamic_index_in_dim(pk[1], i, 0, keepdims=False)
            vq = lax.dynamic_index_in_dim(pv[0], i, 0, keepdims=False)
            vs = lax.dynamic_index_in_dim(pv[1], i, 0, keepdims=False)
            if use_kernel:
                from specdec_tpu.ops.paged_attention import (
                    paged_decode_attention_quant,
                )
                attn = paged_decode_attention_quant(
                    q, kq, ks, vq, vs, cache.page_table, offsets, Hk)
                attn = attn.reshape(B, T, Hq * Dh)
            else:
                k_all = (gather_pages(kq, cache.page_table),
                         gather_page_scales(ks, cache.page_table))
                v_all = (gather_pages(vq, cache.page_table),
                         gather_page_scales(vs, cache.page_table))
                attn = _attention(cfg, q, k_all, v_all, q_pos, None)
        else:
            pk, pv = write_block_paged_stacked(pk, pv, i, k, v,
                                               cache.page_table, offsets,
                                               page_size)
            lk = lax.dynamic_index_in_dim(pk, i, 0, keepdims=False)
            lv = lax.dynamic_index_in_dim(pv, i, 0, keepdims=False)
            if use_kernel:
                from specdec_tpu.ops.paged_attention import (
                    paged_decode_attention,
                )
                attn = paged_decode_attention(q, lk, lv, cache.page_table,
                                              offsets, Hk)
                attn = attn.reshape(B, T, Hq * Dh)
            else:
                k_all = gather_pages(lk, cache.page_table)
                v_all = gather_pages(lv, cache.page_table)
                attn = _attention(cfg, q, k_all, v_all, q_pos, None)
        attn = _mm(attn, lp["wo"])
        if cfg.attn_out_bias:
            attn = attn + lp["bo"]

        if cfg.parallel_residual:
            m = _norm(cfg, h, lp["mlp_norm_w"], lp.get("mlp_norm_b"))
        else:
            h = h + attn
            m = _norm(cfg, h, lp["mlp_norm_w"], lp.get("mlp_norm_b"))
        mlp = _mlp_up(cfg, lp, m)
        mlp = _mm(mlp, lp["w_down"])
        if cfg.mlp_bias:
            mlp = mlp + lp["b_down"]
        h = (h + attn + mlp) if cfg.parallel_residual else (h + mlp)
        return (h, pk, pv), None

    k_in = (cache.k, cache.k_scale) if quant else cache.k
    v_in = (cache.v, cache.v_scale) if quant else cache.v
    idxs = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (x, new_k, new_v), _ = lax.scan(body, (x, k_in, v_in),
                                    (dense_layers, idxs))

    x = _norm(cfg, x, params["final_norm_w"], params.get("final_norm_b"))
    if cfg.tie_embeddings:
        logits = jnp.einsum("btd,vd->btv", x, params["embed"],
                            preferred_element_type=jnp.float32)
    else:
        logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    if cfg.logit_softcap > 0.0:
        logits = jnp.tanh(logits / cfg.logit_softcap) * cfg.logit_softcap

    import dataclasses as _dc
    if quant:
        new_cache = _dc.replace(cache, k=new_k[0], k_scale=new_k[1],
                                v=new_v[0], v_scale=new_v[1],
                                length=cache.length + T)
    else:
        new_cache = _dc.replace(cache, k=new_k, v=new_v,
                                length=cache.length + T)
    return logits, new_cache
