"""Model configuration for the TPU-native decoder stack.

One config dataclass covers the decoder-only families the reference exercises
through HuggingFace ``AutoModelForCausalLM`` (ref: engine/model_loader.py:81-111):
llama-family (Llama/Mistral/TinyLlama), qwen2/3 (qkv bias, qk-norm), and
gpt-neox/pythia (layernorm, parallel residual, partial rotary, fused qkv).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0
    # rope_scaling spec as a hashable tuple (config is a static jit arg):
    # () | ("linear", factor) | ("llama3", factor, low_freq_factor,
    # high_freq_factor, original_max_position_embeddings). Parsed from HF
    # config.json by hf_loader.config_from_hf; applied in core/rope.py.
    rope_scaling: tuple = ()
    # fraction of head_dim that is rotated (gpt-neox ``rotary_pct``; 1.0 for llama)
    rotary_pct: float = 1.0
    norm_eps: float = 1e-5
    norm_type: str = "rmsnorm"  # "rmsnorm" | "layernorm"
    act: str = "silu"  # "silu" (gated, llama) | "gelu" (ungated, neox)
    gated_mlp: bool = True
    parallel_residual: bool = False  # gpt-neox: x + attn(ln1 x) + mlp(ln2 x)
    attn_qkv_bias: bool = False  # qwen2, gpt-neox
    attn_out_bias: bool = False  # gpt-neox
    mlp_bias: bool = False  # gpt-neox
    qk_norm: bool = False  # qwen3: per-head RMSNorm on q and k
    tie_embeddings: bool = False
    # multiplier on the embedding output only (gemma: sqrt(hidden_size); the
    # tied lm_head uses the UNSCALED table, so this cannot be folded into
    # the weights at load time)
    embed_scale: float = 1.0
    dtype: Any = jnp.float32

    # logit soft-capping (gemma2-style); 0 disables
    logit_softcap: float = 0.0

    # "xla" (fused einsum attention) | "flash" (Pallas flash-decode kernel,
    # ops/decode_attention.py; TPU-only, falls back to xla elsewhere)
    attention_impl: str = "xla"

    # KV-cache quantization: "none" | "int8" (per-(position, head) absmax
    # scales; halves KV HBM + stream bandwidth). Applies to the slotted
    # cache (core/cache.py) AND the paged pool (core/paged_cache.py::
    # QuantPagedKVCache — a given pool then backs twice the tokens; the
    # Pallas paged kernel reads raw values, so quantized pools take the
    # gather path) — every generation loop and scheduler builds caches
    # through init_cache/init_paged_cache(cfg, ...). Attention
    # stays exact-per-quantized-value: scores scale AFTER the q·k dot and
    # v scales fold into the probs, so no dequantized K/V is materialized.
    kv_quant: str = "none"

    @property
    def q_per_kv(self) -> int:
        return self.num_heads // self.num_kv_heads

    @property
    def rotary_dim(self) -> int:
        d = int(self.head_dim * self.rotary_pct)
        return d - (d % 2)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def tiny_config(vocab_size: int = 256, **kw) -> ModelConfig:
    """A minimal config for unit tests."""
    base = dict(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        max_position_embeddings=512,
    )
    base.update(kw)
    return ModelConfig(**base)
