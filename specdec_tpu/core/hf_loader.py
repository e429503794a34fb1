"""HuggingFace checkpoint → specdec_tpu params conversion.

Replaces the reference's model loading (ref: engine/model_loader.py:13-141,
engine/models.py:5-26) — but instead of instantiating torch modules on GPUs, we
convert weights into a pure JAX pytree (optionally sharded onto a device mesh by
the caller). torch is only used as a CPU-side tensor reader.

Supported families: llama/mistral/tinyllama, qwen2, qwen3 (qk-norm), gemma
(scaled embeddings, (1+w) norms, GeGLU), gpt-neox (pythia). The reference additionally relied on HF generate-time behavior; all
decode logic lives in specdec_tpu.sampling / specdec_tpu.engine instead.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from specdec_tpu.core.config import ModelConfig

Params = Dict[str, Any]


def _rope_scaling_from_hf(hf_cfg) -> tuple:
    """Parse HF ``rope_scaling`` into the hashable ModelConfig tuple.

    Llama-3.1/3.2 checkpoints (the BASELINE ladder's named models) ship
    llama3-type scaling; loading them without this silently produced wrong
    frequencies for every position past nothing at all — the scaling applies
    at ALL positions. Supported: llama3, linear, default/none. Anything else
    (yarn, dynamic, longrope) raises rather than silently mis-rotating.
    """
    rs = getattr(hf_cfg, "rope_scaling", None)
    if not rs:
        return ()
    kind = rs.get("rope_type", rs.get("type", "default"))
    if kind in ("default", None):
        return ()
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "llama3":
        return ("llama3", float(rs["factor"]), float(rs["low_freq_factor"]),
                float(rs["high_freq_factor"]),
                float(rs["original_max_position_embeddings"]))
    raise ValueError(f"unsupported rope_scaling type: {kind!r}")


def config_from_hf(hf_cfg, dtype=jnp.float32) -> ModelConfig:
    mt = getattr(hf_cfg, "model_type", "llama")
    if mt in ("llama", "mistral", "qwen2", "qwen3"):
        head_dim = getattr(hf_cfg, "head_dim", None) or (
            hf_cfg.hidden_size // hf_cfg.num_attention_heads)
        return ModelConfig(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            intermediate_size=hf_cfg.intermediate_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            num_kv_heads=getattr(hf_cfg, "num_key_value_heads",
                                 hf_cfg.num_attention_heads),
            head_dim=head_dim,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
            rope_scaling=_rope_scaling_from_hf(hf_cfg),
            norm_eps=hf_cfg.rms_norm_eps,
            norm_type="rmsnorm",
            act="silu",
            gated_mlp=True,
            attn_qkv_bias=(mt == "qwen2"),
            qk_norm=(mt == "qwen3"),
            tie_embeddings=getattr(hf_cfg, "tie_word_embeddings", False),
            dtype=dtype,
        )
    if mt == "gemma":
        # gemma quirks vs llama: explicit head_dim, sqrt(hidden) embedding
        # scale, GeGLU with tanh-gelu, (1+w) RMSNorm scaling (folded into the
        # converted weights — the model's rms_norm stays generic), tied head.
        # gemma2 (post-norms, attn softcap, sliding window) is NOT supported.
        act = getattr(hf_cfg, "hidden_activation", None) or hf_cfg.hidden_act
        return ModelConfig(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            intermediate_size=hf_cfg.intermediate_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            num_kv_heads=getattr(hf_cfg, "num_key_value_heads",
                                 hf_cfg.num_attention_heads),
            head_dim=hf_cfg.head_dim,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
            rope_scaling=_rope_scaling_from_hf(hf_cfg),
            norm_eps=hf_cfg.rms_norm_eps,
            norm_type="rmsnorm",
            act="gelu_tanh" if act == "gelu_pytorch_tanh" else act,
            gated_mlp=True,
            tie_embeddings=getattr(hf_cfg, "tie_word_embeddings", True),
            embed_scale=float(hf_cfg.hidden_size) ** 0.5,
            dtype=dtype,
        )
    if mt == "gpt_neox":
        head_dim = hf_cfg.hidden_size // hf_cfg.num_attention_heads
        return ModelConfig(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            intermediate_size=hf_cfg.intermediate_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            num_kv_heads=hf_cfg.num_attention_heads,
            head_dim=head_dim,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            rope_theta=getattr(hf_cfg, "rotary_emb_base", 10000.0),
            rotary_pct=getattr(hf_cfg, "rotary_pct", 1.0),
            norm_eps=hf_cfg.layer_norm_eps,
            norm_type="layernorm",
            act="gelu",
            gated_mlp=False,
            parallel_residual=getattr(hf_cfg, "use_parallel_residual", True),
            attn_qkv_bias=getattr(hf_cfg, "attention_bias", True),
            attn_out_bias=getattr(hf_cfg, "attention_bias", True),
            mlp_bias=True,
            tie_embeddings=getattr(hf_cfg, "tie_word_embeddings", False),
            dtype=dtype,
        )
    raise ValueError(f"unsupported model_type: {mt}")


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16) → f32 numpy
    return t.detach().to("cpu").float().numpy()


def _stack(sd: Dict[str, np.ndarray], pattern: str, L: int,
           transpose: bool = False) -> np.ndarray:
    mats = [sd[pattern.format(i)] for i in range(L)]
    out = np.stack(mats, axis=0)
    if transpose:
        out = np.swapaxes(out, -1, -2)
    return out


def params_from_hf(hf_model, cfg: ModelConfig) -> Params:
    """Convert an HF torch model's state dict to a specdec_tpu params pytree."""
    sd = {k: _np(v) for k, v in hf_model.state_dict().items()}
    mt = hf_model.config.model_type
    if mt in ("llama", "mistral", "qwen2", "qwen3", "gemma"):
        return _params_from_llama_sd(sd, cfg, mt)
    if mt == "gpt_neox":
        return _params_from_neox_sd(sd, cfg)
    raise ValueError(f"unsupported model_type: {mt}")


def _cast(a: np.ndarray, cfg: ModelConfig):
    return jnp.asarray(a, dtype=cfg.dtype)


def _params_from_llama_sd(sd, cfg: ModelConfig, mt: str) -> Params:
    L = cfg.num_layers
    p = "model.layers.{}."
    layers: Params = {
        "attn_norm_w": _cast(_stack(sd, p + "input_layernorm.weight", L), cfg),
        "mlp_norm_w": _cast(_stack(sd, p + "post_attention_layernorm.weight", L), cfg),
        # torch Linear stores [out, in] → transpose to [in, out]
        "wq": _cast(_stack(sd, p + "self_attn.q_proj.weight", L, transpose=True), cfg),
        "wk": _cast(_stack(sd, p + "self_attn.k_proj.weight", L, transpose=True), cfg),
        "wv": _cast(_stack(sd, p + "self_attn.v_proj.weight", L, transpose=True), cfg),
        "wo": _cast(_stack(sd, p + "self_attn.o_proj.weight", L, transpose=True), cfg),
        "w_gate": _cast(_stack(sd, p + "mlp.gate_proj.weight", L, transpose=True), cfg),
        "w_up": _cast(_stack(sd, p + "mlp.up_proj.weight", L, transpose=True), cfg),
        "w_down": _cast(_stack(sd, p + "mlp.down_proj.weight", L, transpose=True), cfg),
    }
    if cfg.attn_qkv_bias:
        layers["bq"] = _cast(_stack(sd, p + "self_attn.q_proj.bias", L), cfg)
        layers["bk"] = _cast(_stack(sd, p + "self_attn.k_proj.bias", L), cfg)
        layers["bv"] = _cast(_stack(sd, p + "self_attn.v_proj.bias", L), cfg)
    if cfg.qk_norm:
        layers["q_norm_w"] = _cast(_stack(sd, p + "self_attn.q_norm.weight", L), cfg)
        layers["k_norm_w"] = _cast(_stack(sd, p + "self_attn.k_norm.weight", L), cfg)
    params: Params = {
        "embed": _cast(sd["model.embed_tokens.weight"], cfg),
        "layers": layers,
        "final_norm_w": _cast(sd["model.norm.weight"], cfg),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _cast(np.swapaxes(sd["lm_head.weight"], 0, 1), cfg)
    if mt == "gemma":
        # gemma's RMSNorm scales by (1 + weight); fold the +1 here so the
        # model's rms_norm stays family-generic
        for key in ("attn_norm_w", "mlp_norm_w"):
            layers[key] = layers[key] + 1.0
        params["final_norm_w"] = params["final_norm_w"] + 1.0
    return params


def _params_from_neox_sd(sd, cfg: ModelConfig) -> Params:
    L, D = cfg.num_layers, cfg.hidden_size
    H, Dh = cfg.num_heads, cfg.head_dim
    p = "gpt_neox.layers.{}."

    # Fused qkv: rows laid out per head as [q(Dh), k(Dh), v(Dh)]
    # (HF splits qkv.view(B,T,H,3*Dh) into thirds along the last dim).
    qkv_w = _stack(sd, p + "attention.query_key_value.weight", L)  # [L, 3HDh, D]
    qkv_w = qkv_w.reshape(L, H, 3, Dh, D)
    qkv_b = _stack(sd, p + "attention.query_key_value.bias", L).reshape(L, H, 3, Dh)

    def split_w(j):  # → [L, D, H*Dh]
        return np.swapaxes(qkv_w[:, :, j].reshape(L, H * Dh, D), 1, 2)

    def split_b(j):  # → [L, H*Dh]
        return qkv_b[:, :, j].reshape(L, H * Dh)

    layers: Params = {
        "attn_norm_w": _cast(_stack(sd, p + "input_layernorm.weight", L), cfg),
        "attn_norm_b": _cast(_stack(sd, p + "input_layernorm.bias", L), cfg),
        "mlp_norm_w": _cast(_stack(sd, p + "post_attention_layernorm.weight", L), cfg),
        "mlp_norm_b": _cast(_stack(sd, p + "post_attention_layernorm.bias", L), cfg),
        "wq": _cast(split_w(0), cfg),
        "wk": _cast(split_w(1), cfg),
        "wv": _cast(split_w(2), cfg),
        "bq": _cast(split_b(0), cfg),
        "bk": _cast(split_b(1), cfg),
        "bv": _cast(split_b(2), cfg),
        "wo": _cast(_stack(sd, p + "attention.dense.weight", L, transpose=True), cfg),
        "bo": _cast(_stack(sd, p + "attention.dense.bias", L), cfg),
        "w_up": _cast(_stack(sd, p + "mlp.dense_h_to_4h.weight", L, transpose=True), cfg),
        "b_up": _cast(_stack(sd, p + "mlp.dense_h_to_4h.bias", L), cfg),
        "w_down": _cast(_stack(sd, p + "mlp.dense_4h_to_h.weight", L, transpose=True), cfg),
        "b_down": _cast(_stack(sd, p + "mlp.dense_4h_to_h.bias", L), cfg),
    }
    params: Params = {
        "embed": _cast(sd["gpt_neox.embed_in.weight"], cfg),
        "layers": layers,
        "final_norm_w": _cast(sd["gpt_neox.final_layer_norm.weight"], cfg),
        "final_norm_b": _cast(sd["gpt_neox.final_layer_norm.bias"], cfg),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _cast(np.swapaxes(sd["embed_out.weight"], 0, 1), cfg)
    return params


def load_hf_model(path: str, dtype=jnp.bfloat16) -> Tuple[ModelConfig, Params]:
    """Load a local HF checkpoint (no network) and convert to JAX params."""
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(path)
    cfg = config_from_hf(hf_cfg, dtype=dtype)
    model = AutoModelForCausalLM.from_pretrained(path, torch_dtype="float32")
    params = params_from_hf(model, cfg)
    del model
    return cfg, params
