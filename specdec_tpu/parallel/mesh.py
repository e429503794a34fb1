"""Device-mesh construction and GSPMD partition specs.

The reference's "parallelism" is GPU placement strings + vLLM TP/PP passthrough
(ref: engine/model_loader.py:32-68, engine/vllm_engine.py:93-94; SURVEY.md
§2.7). The TPU-native replacement is a first-class ('data', 'model') mesh with
megatron-style tensor parallelism expressed as PartitionSpecs and left to
GSPMD/XLA to lower into ICI collectives — no NCCL analog in user code:

- attention qkv projections column-parallel (heads split over 'model'),
  output projection row-parallel
- MLP up/gate column-parallel, down row-parallel
- embedding vocab-parallel, lm_head vocab-parallel
- KV cache sharded over ('data' on batch, 'model' on kv-heads)
- drafter typically *replicated* (it is small; replication avoids collectives
  in the latency-critical draft loop) — pass ``replicated=True``

Pipeline/sequence/expert parallelism are not required for reference parity
(SURVEY.md §2.7: PP/SP/EP absent in-reference); the stacked-layer leading axis
and the cache's sequence axis keep both addable without a rewrite.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from specdec_tpu.core.cache import KVCache
from specdec_tpu.core.config import ModelConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(devices=None, tp: Optional[int] = None,
               dp: Optional[int] = None) -> Mesh:
    """Build a ('data','model') mesh. Defaults: all devices on 'model' (pure
    TP) unless dp given. tp*dp must equal the device count."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    assert tp * dp == n, f"tp({tp}) * dp({dp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_pspecs(cfg: ModelConfig, replicated: bool = False):
    """PartitionSpec pytree matching the params structure of core/model.py."""
    m = MODEL_AXIS if not replicated else None
    layers = {
        "attn_norm_w": P(), "mlp_norm_w": P(),
        "wq": P(None, None, m), "wk": P(None, None, m), "wv": P(None, None, m),
        "wo": P(None, m, None),
        "w_up": P(None, None, m), "w_down": P(None, m, None),
    }
    if cfg.gated_mlp:
        layers["w_gate"] = P(None, None, m)
    if cfg.norm_type == "layernorm":
        layers["attn_norm_b"] = P()
        layers["mlp_norm_b"] = P()
    if cfg.attn_qkv_bias:
        layers.update(bq=P(None, m), bk=P(None, m), bv=P(None, m))
    if cfg.attn_out_bias:
        layers["bo"] = P()
    if cfg.mlp_bias:
        layers.update(b_up=P(None, m), b_down=P())
        if cfg.gated_mlp:
            layers["b_gate"] = P(None, m)
    if cfg.qk_norm:
        layers.update(q_norm_w=P(), k_norm_w=P())
    specs = {
        "embed": P(m, None),          # vocab-parallel embedding
        "layers": layers,
        "final_norm_w": P(),
    }
    if cfg.norm_type == "layernorm":
        specs["final_norm_b"] = P()
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, m)  # vocab-parallel head
    return specs


def cache_pspec(cfg: ModelConfig, replicated_model: bool = False):
    """PartitionSpecs matching the cache pytree cfg selects: [L, B, S, Hk,
    Dh] values (head-sharded over 'model' like the kv projections), plus
    [L, B, S, Hk] scales for the int8 format."""
    m = None if replicated_model else MODEL_AXIS
    kv = P(None, DATA_AXIS, None, m, None)
    if getattr(cfg, "kv_quant", "none") == "int8":
        from specdec_tpu.core.cache import QuantKVCache
        return QuantKVCache(
            k=kv, v=kv,
            k_scale=P(None, DATA_AXIS, None, m),
            v_scale=P(None, DATA_AXIS, None, m),
            length=P(DATA_AXIS),
        )
    return KVCache(
        k=kv,
        v=kv,
        length=P(DATA_AXIS),
    )


def batch_state_pspecs(drafter_replicated: bool = True):
    """PartitionSpecs for engine.batch_engine.BatchState (data-sharded host
    state, model-sharded target cache, replicated-or-sharded drafter cache)."""
    from specdec_tpu.engine.batch_engine import BatchState

    d = P(DATA_AXIS)
    return BatchState(
        buf=P(DATA_AXIS, None), pos=d, prompt_len=d, total_len=d, finished=d,
        d_cache=KVCache(k=P(None, DATA_AXIS, None, None, None),
                        v=P(None, DATA_AXIS, None, None, None),
                        length=d) if drafter_replicated else
        KVCache(k=P(None, DATA_AXIS, None, MODEL_AXIS, None),
                v=P(None, DATA_AXIS, None, MODEL_AXIS, None),
                length=d),
        t_cache=KVCache(k=P(None, DATA_AXIS, None, MODEL_AXIS, None),
                        v=P(None, DATA_AXIS, None, MODEL_AXIS, None),
                        length=d),
        accepted=d, speculated=d)


# layer-dict weight roles: column-parallel ([.., K, N] sharded on N) for the
# qkv/up projections INCLUDING their fused forms (fusion concatenates along
# N, so column sharding stays valid), row-parallel (sharded on K) for the
# output projections whose matmul partial-sums all-reduce
_COL_W = ("wq", "wk", "wv", "wqkv", "w_gate", "w_up", "w_gateup")
_ROW_W = ("wo", "w_down")
_COL_B = ("bq", "bk", "bv", "bqkv", "b_gate", "b_up", "b_gateup")


def _expand_container_spec(w, spec):
    """Turn a DENSE weight PartitionSpec into the matching spec for a
    quantized container (quant/core.py): packed values/codes shard exactly
    like the dense weight (the packed K/8 and blocked K/64 axes sit where K
    sat); INT8's per-output-channel scale [..., 1, N] replicates K and
    follows N.

    pair4 caveat (round 4): the 4-bit word layout interleaves k across
    quarter-planes, so a contiguous packed-row shard no longer covers a
    contiguous k range. GSPMD keeps row-parallel (wo/w_down) sharding
    CORRECT — dequantize/matmul are global-semantics ops and XLA inserts
    the needed collectives (exercised by the CPU-mesh tests) — but the
    zero-communication row-parallel structure needs per-shard repacking
    when real multi-chip lands; column-parallel (N-axis) sharding, the
    layout serving actually uses for qkv/gateup, is unaffected."""
    from specdec_tpu.quant.core import (
        FP4Weight, Int4Weight, Int8Weight, NF4Weight,
    )
    if isinstance(w, Int8Weight):
        scale = list(spec)
        scale[-2] = None
        return Int8Weight(q=spec, scale=P(*scale))
    if isinstance(w, (Int4Weight, NF4Weight, FP4Weight)):
        # absmax: replicate the (tiny) block-row axis — it is 1/64th of the
        # weight bytes, and row-sharding it both hits divisibility walls at
        # small shapes and (post-pair4) would not map to contiguous k anyway
        amspec = list(spec)
        amspec[-2] = None
        return type(w)(spec, P(*amspec))
    return spec


def pspecs_for_params(params, cfg: ModelConfig, replicated: bool = False):
    """PartitionSpec pytree derived from the ACTUAL params structure — dense
    or quantized, fused or unfused. Quantized containers expand to matching
    specs per leaf (``_expand_container_spec``); unknown layer keys
    replicate, which is always correct (GSPMD reshards as needed)."""
    m = MODEL_AXIS if not replicated else None
    out = {}
    for key, val in params.items():
        if key == "layers":
            layers = {}
            for name, w in val.items():
                if name in _COL_W:
                    spec = P(None, None, m)
                elif name in _ROW_W:
                    spec = P(None, m, None)
                elif name in _COL_B:
                    spec = P(None, m)
                else:
                    spec = P()
                layers[name] = _expand_container_spec(w, spec)
            out["layers"] = layers
        elif key == "embed":
            out[key] = P(m, None)
        elif key == "lm_head":
            out[key] = _expand_container_spec(val, P(None, m))
        else:
            out[key] = P()  # norms and other vectors replicate
    return out


def shard_params(params, cfg: ModelConfig, mesh: Mesh,
                 replicated: bool = False):
    """device_put a params pytree onto the mesh per ``pspecs_for_params``
    (handles dense, fused, and quantized-container layouts)."""
    specs = pspecs_for_params(params, cfg, replicated=replicated)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_cache(cache: KVCache, cfg: ModelConfig, mesh: Mesh,
                replicated_model: bool = False) -> KVCache:
    specs = cache_pspec(cfg, replicated_model)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs)
