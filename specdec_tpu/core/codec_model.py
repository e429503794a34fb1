"""Encoder-decoder (T5-family) model for codec speculative decoding.

The reference supports encoder-decoder models through
``speculative_generate_encoder_decoder`` / ``autoregressive_generate_encoder_decoder``
(ref: sampling/codec_speculative_decoding.py:22-193,
sampling/codec_base_decoding.py:9-73), relying on HF T5 internals. This module
is the TPU-native model those loops need:

- T5 layer norm (= RMSNorm, no bias/mean), pre-norm residual blocks
- relative position bias (log-bucketed, bidirectional for the encoder,
  causal for the decoder), computed on the fly from integer positions so the
  decoder handles arbitrary per-window cache offsets; NO attention scaling by
  1/sqrt(d) and no projection biases (T5 quirks preserved for logit parity)
- decoder self-attention uses the same static-shape slotted KVCache as the
  decoder-only stack (rollback = length arithmetic); cross-attention K/V are
  computed once per request from the encoder output and stay fixed
- tied embeddings scale decoder output by d_model^-0.5 before the LM head
  (HF T5 behavior)

Weights load from HF ``T5ForConditionalGeneration`` via
``codec_params_from_hf`` (core/hf_loader.py handles decoder-only families).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from specdec_tpu.core.cache import KVCache, init_cache, write_block
from specdec_tpu.core.model import rms_norm

Params = Dict[str, Any]

_NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    vocab_size: int
    d_model: int
    d_kv: int
    d_ff: int
    num_heads: int
    num_encoder_layers: int
    num_decoder_layers: int
    rel_buckets: int = 32
    rel_max_distance: int = 128
    norm_eps: float = 1e-6
    gated_ffn: bool = False  # t5 v1.1 / flan use gated-gelu
    tie_embeddings: bool = True
    decoder_start_token_id: int = 0
    max_position_embeddings: int = 512  # budget only; T5 has no abs positions
    dtype: Any = jnp.float32

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv

    def replace(self, **kw) -> "CodecConfig":
        return dataclasses.replace(self, **kw)


def rel_position_bucket(rel: jax.Array, bidirectional: bool, num_buckets: int,
                        max_distance: int) -> jax.Array:
    """T5's log-spaced relative position bucketing (matches HF)."""
    out = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        out = out + (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact) /
        np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return out + jnp.where(is_small, rel, large)


def _rel_bias(cfg: CodecConfig, table: jax.Array, q_pos: jax.Array,
              k_pos: jax.Array, bidirectional: bool) -> jax.Array:
    """table: [num_buckets, H]; q_pos: [B, T]; k_pos: [S] → bias [B, H, T, S]."""
    rel = k_pos[None, None, :] - q_pos[:, :, None]           # [B, T, S]
    bucket = rel_position_bucket(rel, bidirectional, cfg.rel_buckets,
                                 cfg.rel_max_distance)
    bias = table[bucket]                                      # [B, T, S, H]
    return jnp.transpose(bias, (0, 3, 1, 2)).astype(jnp.float32)


def _mha(cfg: CodecConfig, q, k, v, bias, mask):
    """q: [B,T,H,Dk]; k/v: [B,S,H,Dk]; bias [B,H,T,S] or None; mask [B,T,S].

    NO 1/sqrt(d) scaling (T5)."""
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    scores = jnp.where(mask[:, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def _proj(x, w):
    return jnp.einsum("btd,dk->btk", x, w)


def _ffn(cfg: CodecConfig, lp: Params, x):
    h = rms_norm(x, lp["ffn_norm_w"], cfg.norm_eps)
    if cfg.gated_ffn:
        # HF T5 gated-gelu uses the tanh-approximate "gelu_new"
        a = jax.nn.gelu(_proj(h, lp["wi_0"]), approximate=True)
        inner = a * _proj(h, lp["wi_1"])
    else:
        inner = jax.nn.relu(_proj(h, lp["wi"]))
    return x + _proj(inner, lp["wo_ffn"])


def encode(cfg: CodecConfig, params: Params, input_ids: jax.Array,
           input_mask: jax.Array) -> jax.Array:
    """Bidirectional encoder; returns [B, S, D] (final-normed)."""
    B, S = input_ids.shape
    x = params["embed"][input_ids].astype(cfg.dtype)
    pos = jnp.arange(S, dtype=jnp.int32)
    bias = _rel_bias(cfg, params["enc_rel_bias"], pos[None, :].repeat(B, 0),
                     pos, bidirectional=True)
    mask = (input_mask[:, None, :] > 0) & jnp.ones((B, S, S), bool)

    def body(x, lp):
        h = rms_norm(x, lp["attn_norm_w"], cfg.norm_eps)
        q = _proj(h, lp["wq"]).reshape(B, S, cfg.num_heads, cfg.d_kv)
        k = _proj(h, lp["wk"]).reshape(B, S, cfg.num_heads, cfg.d_kv)
        v = _proj(h, lp["wv"]).reshape(B, S, cfg.num_heads, cfg.d_kv)
        attn = _mha(cfg, q, k, v, bias, mask).reshape(B, S, cfg.inner_dim)
        x = x + _proj(attn, lp["wo"])
        x = _ffn(cfg, lp, x)
        return x, None

    x, _ = lax.scan(body, x, params["enc_layers"])
    return rms_norm(x, params["enc_final_norm_w"], cfg.norm_eps)


def init_cross_kv(cfg: CodecConfig, params: Params,
                  enc_out: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-request cross-attention K/V: [L, B, S_enc, H, Dk] each."""
    B, S, _ = enc_out.shape

    def body(_, lp):
        k = _proj(enc_out, lp["cross_wk"]).reshape(B, S, cfg.num_heads, cfg.d_kv)
        v = _proj(enc_out, lp["cross_wv"]).reshape(B, S, cfg.num_heads, cfg.d_kv)
        return None, (k, v)

    _, (ck, cv) = lax.scan(body, None, params["dec_layers"])
    return ck, cv


def decode_step(cfg: CodecConfig, params: Params, tokens: jax.Array,
                cache: KVCache, cross_k: jax.Array, cross_v: jax.Array,
                enc_mask: jax.Array) -> Tuple[jax.Array, KVCache]:
    """Process a [B, T] decoder-token block against the self-attn cache at
    per-seq offsets; cross-attends the fixed encoder output. Returns
    (logits [B, T, V] f32, advanced cache)."""
    B, T = tokens.shape
    offsets = cache.length
    q_pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    S = cache.max_seq_len
    k_pos = jnp.arange(S, dtype=jnp.int32)

    x = params["embed"][tokens].astype(cfg.dtype)
    self_bias = _rel_bias(cfg, params["dec_rel_bias"], q_pos, k_pos,
                          bidirectional=False)
    self_mask = k_pos[None, None, :] <= q_pos[:, :, None]
    cross_mask = (enc_mask[:, None, :] > 0) & jnp.ones(
        (B, T, enc_mask.shape[1]), bool)

    def body(x, scanned):
        lp, lk, lv, ck, cv = scanned
        h = rms_norm(x, lp["attn_norm_w"], cfg.norm_eps)
        q = _proj(h, lp["wq"]).reshape(B, T, cfg.num_heads, cfg.d_kv)
        k = _proj(h, lp["wk"]).reshape(B, T, cfg.num_heads, cfg.d_kv)
        v = _proj(h, lp["wv"]).reshape(B, T, cfg.num_heads, cfg.d_kv)
        lk, lv = write_block(lk, lv, k, v, offsets)
        attn = _mha(cfg, q, lk, lv, self_bias, self_mask)
        x = x + _proj(attn.reshape(B, T, cfg.inner_dim), lp["wo"])

        h = rms_norm(x, lp["cross_norm_w"], cfg.norm_eps)
        q = _proj(h, lp["cross_wq"]).reshape(B, T, cfg.num_heads, cfg.d_kv)
        attn = _mha(cfg, q, ck, cv, None, cross_mask)
        x = x + _proj(attn.reshape(B, T, cfg.inner_dim), lp["cross_wo"])

        x = _ffn(cfg, lp, x)
        return x, (lk, lv)

    x, (new_k, new_v) = lax.scan(
        body, x, (params["dec_layers"], cache.k, cache.v, cross_k, cross_v))

    x = rms_norm(x, params["dec_final_norm_w"], cfg.norm_eps)
    if cfg.tie_embeddings:
        x = x * (cfg.d_model ** -0.5)     # HF T5 tied-head rescale
        logits = jnp.einsum("btd,vd->btv", x, params["embed"],
                            preferred_element_type=jnp.float32)
    else:
        logits = jnp.einsum("btd,dv->btv", x, params["lm_head"],
                            preferred_element_type=jnp.float32)
    return logits, KVCache(k=new_k, v=new_v, length=cache.length + T)


# ---------------------------------------------------------------------------
# HF conversion + random init
# ---------------------------------------------------------------------------

def codec_config_from_hf(hf_cfg, dtype=jnp.float32) -> CodecConfig:
    return CodecConfig(
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.d_model,
        d_kv=hf_cfg.d_kv,
        d_ff=hf_cfg.d_ff,
        num_heads=hf_cfg.num_heads,
        num_encoder_layers=hf_cfg.num_layers,
        num_decoder_layers=hf_cfg.num_decoder_layers,
        rel_buckets=hf_cfg.relative_attention_num_buckets,
        rel_max_distance=getattr(hf_cfg, "relative_attention_max_distance", 128),
        norm_eps=hf_cfg.layer_norm_epsilon,
        gated_ffn="gated" in getattr(hf_cfg, "feed_forward_proj", "relu"),
        tie_embeddings=getattr(hf_cfg, "tie_word_embeddings", True),
        decoder_start_token_id=hf_cfg.decoder_start_token_id,
        max_position_embeddings=getattr(hf_cfg, "n_positions", 512),
        dtype=dtype,
    )


def codec_params_from_hf(hf_model, cfg: CodecConfig) -> Params:
    sd = {k: (v.detach().to("cpu").float().numpy())
          for k, v in hf_model.state_dict().items()}

    def tr(name):
        return np.swapaxes(sd[name], 0, 1)

    def stack(pattern, L, transpose=True):
        mats = [sd[pattern.format(i)] for i in range(L)]
        out = np.stack(mats, 0)
        return np.swapaxes(out, 1, 2) if transpose else out

    def cast(a):
        return jnp.asarray(a, dtype=cfg.dtype)

    Le, Ld = cfg.num_encoder_layers, cfg.num_decoder_layers
    e = "encoder.block.{}.layer."
    enc_layers = {
        "attn_norm_w": cast(stack(e + "0.layer_norm.weight", Le, False)),
        "wq": cast(stack(e + "0.SelfAttention.q.weight", Le)),
        "wk": cast(stack(e + "0.SelfAttention.k.weight", Le)),
        "wv": cast(stack(e + "0.SelfAttention.v.weight", Le)),
        "wo": cast(stack(e + "0.SelfAttention.o.weight", Le)),
        "ffn_norm_w": cast(stack(e + "1.layer_norm.weight", Le, False)),
    }
    d = "decoder.block.{}.layer."
    dec_layers = {
        "attn_norm_w": cast(stack(d + "0.layer_norm.weight", Ld, False)),
        "wq": cast(stack(d + "0.SelfAttention.q.weight", Ld)),
        "wk": cast(stack(d + "0.SelfAttention.k.weight", Ld)),
        "wv": cast(stack(d + "0.SelfAttention.v.weight", Ld)),
        "wo": cast(stack(d + "0.SelfAttention.o.weight", Ld)),
        "cross_norm_w": cast(stack(d + "1.layer_norm.weight", Ld, False)),
        "cross_wq": cast(stack(d + "1.EncDecAttention.q.weight", Ld)),
        "cross_wk": cast(stack(d + "1.EncDecAttention.k.weight", Ld)),
        "cross_wv": cast(stack(d + "1.EncDecAttention.v.weight", Ld)),
        "cross_wo": cast(stack(d + "1.EncDecAttention.o.weight", Ld)),
        "ffn_norm_w": cast(stack(d + "2.layer_norm.weight", Ld, False)),
    }
    if cfg.gated_ffn:
        enc_layers["wi_0"] = cast(stack(e + "1.DenseReluDense.wi_0.weight", Le))
        enc_layers["wi_1"] = cast(stack(e + "1.DenseReluDense.wi_1.weight", Le))
        dec_layers["wi_0"] = cast(stack(d + "2.DenseReluDense.wi_0.weight", Ld))
        dec_layers["wi_1"] = cast(stack(d + "2.DenseReluDense.wi_1.weight", Ld))
    else:
        enc_layers["wi"] = cast(stack(e + "1.DenseReluDense.wi.weight", Le))
        dec_layers["wi"] = cast(stack(d + "2.DenseReluDense.wi.weight", Ld))
    enc_layers["wo_ffn"] = cast(stack(e + "1.DenseReluDense.wo.weight", Le))
    dec_layers["wo_ffn"] = cast(stack(d + "2.DenseReluDense.wo.weight", Ld))

    params: Params = {
        "embed": cast(sd["shared.weight"]),
        "enc_layers": enc_layers,
        "dec_layers": dec_layers,
        "enc_rel_bias": cast(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"]),
        "dec_rel_bias": cast(
            sd["decoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"]),
        "enc_final_norm_w": cast(sd["encoder.final_layer_norm.weight"]),
        "dec_final_norm_w": cast(sd["decoder.final_layer_norm.weight"]),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = cast(np.swapaxes(sd["lm_head.weight"], 0, 1))
    return params


def init_codec_params(cfg: CodecConfig, key: jax.Array,
                      scale: float = 0.02) -> Params:
    keys = iter(jax.random.split(key, 64))

    def w(shape, s=scale):
        return (jax.random.normal(next(keys), shape, dtype=jnp.float32) * s
                ).astype(cfg.dtype)

    D, I, F, H = cfg.d_model, cfg.inner_dim, cfg.d_ff, cfg.num_heads
    Le, Ld = cfg.num_encoder_layers, cfg.num_decoder_layers

    def ffn(L):
        out = {"ffn_norm_w": jnp.ones((L, D), cfg.dtype),
               "wo_ffn": w((L, F, D))}
        if cfg.gated_ffn:
            out.update(wi_0=w((L, D, F)), wi_1=w((L, D, F)))
        else:
            out["wi"] = w((L, D, F))
        return out

    enc_layers = {
        "attn_norm_w": jnp.ones((Le, D), cfg.dtype),
        "wq": w((Le, D, I)), "wk": w((Le, D, I)), "wv": w((Le, D, I)),
        "wo": w((Le, I, D)), **ffn(Le),
    }
    dec_layers = {
        "attn_norm_w": jnp.ones((Ld, D), cfg.dtype),
        "wq": w((Ld, D, I)), "wk": w((Ld, D, I)), "wv": w((Ld, D, I)),
        "wo": w((Ld, I, D)),
        "cross_norm_w": jnp.ones((Ld, D), cfg.dtype),
        "cross_wq": w((Ld, D, I)), "cross_wk": w((Ld, D, I)),
        "cross_wv": w((Ld, D, I)), "cross_wo": w((Ld, I, D)),
        **ffn(Ld),
    }
    params: Params = {
        "embed": w((cfg.vocab_size, D)),
        "enc_layers": enc_layers,
        "dec_layers": dec_layers,
        "enc_rel_bias": w((cfg.rel_buckets, H)),
        "dec_rel_bias": w((cfg.rel_buckets, H)),
        "enc_final_norm_w": jnp.ones((D,), cfg.dtype),
        "dec_final_norm_w": jnp.ones((D,), cfg.dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = w((D, cfg.vocab_size))
    return params
