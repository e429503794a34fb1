"""Static-shape slotted KV cache with per-sequence length counters.

TPU-first replacement for the reference's cache pruning (ref: utils/caching.py:6-77,
which slices tokens off HF ``DynamicCache`` tensors). Under XLA everything is
static-shaped: the cache is a fixed ``[L, B, S_max, H_kv, D_h]`` buffer and
"pruning n tokens" is ``length -= n`` — stale entries are masked out of attention
(key position < length) and later overwritten in place. Rollback after a rejected
draft window is therefore free.

Two storage formats share one interface (length arithmetic, slot install,
path compaction): ``KVCache`` at cfg.dtype, and ``QuantKVCache`` holding
int8 K/V with per-(position, head) absmax scales — half the HBM and half
the decode-time KV stream (``cfg.kv_quant = "int8"``; beyond-reference, the
reference keeps fp16 HF caches). Quantization error stays out of the dot
products: attention applies k-scales AFTER the q·k product and folds
v-scales into the probabilities (core/model.py::_attention), so the int8
values are used exactly as stored.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """k/v: [num_layers, batch, max_seq, num_kv_heads, head_dim]; length: [batch]."""

    k: jax.Array
    v: jax.Array
    length: jax.Array  # int32 [batch] — number of valid tokens per sequence

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[2]

    def with_length(self, length: jax.Array) -> "KVCache":
        return dataclasses.replace(self, length=length)

    def rolled_back(self, n: jax.Array) -> "KVCache":
        """Drop the last ``n`` (per-seq) tokens: pure arithmetic, no data movement."""
        return self.with_length(jnp.maximum(self.length - n, 0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantKVCache:
    """INT8 K/V with per-(position, head) scales.

    k/v: int8 [L, B, S, Hk, Dh]; k_scale/v_scale: f32 [L, B, S, Hk]
    (dequantized value = q * scale); length: int32 [B]. Same length-counter
    semantics as KVCache.
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    length: jax.Array

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[2]

    def with_length(self, length: jax.Array) -> "QuantKVCache":
        return dataclasses.replace(self, length=length)

    def rolled_back(self, n: jax.Array) -> "QuantKVCache":
        return self.with_length(jnp.maximum(self.length - n, 0))


def init_cache(cfg, batch_size: int, max_seq_len: int, dtype=None):
    """Build the cache ``cfg`` asks for (cfg.kv_quant selects the format) —
    every generation loop and scheduler allocates through here, so the
    config field flows to all of them."""
    shape = (cfg.num_layers, batch_size, max_seq_len, cfg.num_kv_heads,
             cfg.head_dim)
    if getattr(cfg, "kv_quant", "none") == "int8":
        return QuantKVCache(
            k=jnp.zeros(shape, dtype=jnp.int8),
            v=jnp.zeros(shape, dtype=jnp.int8),
            k_scale=jnp.zeros(shape[:-1], dtype=jnp.float32),
            v_scale=jnp.zeros(shape[:-1], dtype=jnp.float32),
            length=jnp.zeros((batch_size,), dtype=jnp.int32),
        )
    dtype = dtype or cfg.dtype
    return KVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        length=jnp.zeros((batch_size,), dtype=jnp.int32),
    )


def quantize_kv_block(blk: jax.Array):
    """[B, T, Hk, Dh] float block -> (int8 values, f32 [B, T, Hk] scales)
    with per-(position, head) absmax scaling (the vector a single attention
    score consumes with one scale)."""
    absmax = jnp.max(jnp.abs(blk.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(blk.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def write_block(layer_k: jax.Array, layer_v: jax.Array, new_k: jax.Array,
                new_v: jax.Array, offsets: jax.Array):
    """Write a [B, T, H_kv, D_h] block into one layer's [B, S, H_kv, D_h] cache
    at per-sequence offsets (vmapped dynamic_update_slice → scatter on TPU)."""

    def one(c, blk, off):
        return jax.lax.dynamic_update_slice(c, blk, (off, 0, 0))

    return (jax.vmap(one)(layer_k, new_k, offsets),
            jax.vmap(one)(layer_v, new_v, offsets))


def write_block_quant(layer_kq, layer_ks, layer_vq, layer_vs,
                      new_k, new_v, offsets):
    """Quantized write_block: quantize the new [B, T, Hk, Dh] blocks and
    scatter values + scales at per-sequence offsets."""

    def one(c, blk, off):
        return jax.lax.dynamic_update_slice(c, blk, (off,) + (0,) * (c.ndim - 1))

    kq, ks = quantize_kv_block(new_k)
    vq, vs = quantize_kv_block(new_v)
    return (jax.vmap(one)(layer_kq, kq, offsets),
            jax.vmap(one)(layer_ks, ks, offsets),
            jax.vmap(one)(layer_vq, vq, offsets),
            jax.vmap(one)(layer_vs, vs, offsets))


def _array_fields(cache):
    return [f.name for f in dataclasses.fields(cache) if f.name != "length"]


def install_slot(dst, src, slot: jax.Array, new_len: jax.Array):
    """Copy a batch-of-one cache ``src`` into ``dst``'s batch row ``slot``
    (axis 1) across every storage field, and set that row's length — the
    scheduler-admission primitive, format-agnostic (KVCache/QuantKVCache;
    both keep batch at axis 1 on every array field)."""
    upd = {
        name: jax.lax.dynamic_update_slice_in_dim(
            getattr(dst, name), getattr(src, name), slot, axis=1)
        for name in _array_fields(dst)
    }
    length = jax.lax.dynamic_update_index_in_dim(dst.length, new_len, slot,
                                                 axis=0)
    return dataclasses.replace(dst, length=length, **upd)


def zero_slot(cache, slot: jax.Array, new_len: jax.Array):
    """Zero batch row ``slot`` (axis 1) of every storage field and set its
    length — slot-recycling hygiene for caches whose stale rows would
    otherwise be attended (serve/eagle_scheduler.py)."""
    def zero(arr):
        blank = jnp.zeros_like(jax.lax.dynamic_slice_in_dim(arr, 0, 1,
                                                            axis=1))
        return jax.lax.dynamic_update_slice_in_dim(arr, blank, slot, axis=1)

    upd = {name: zero(getattr(cache, name)) for name in _array_fields(cache)}
    length = jax.lax.dynamic_update_index_in_dim(cache.length, new_len, slot,
                                                 axis=0)
    return dataclasses.replace(cache, length=length, **upd)


def compact_path(cache, idx: jax.Array, dest: jax.Array,
                 new_length: jax.Array):
    """Gather rows at slot indices ``idx`` (sequence axis 2) and write them
    contiguously starting at slot ``dest``; set length. The accepted-path
    compaction primitive of tree speculation, format-agnostic (scales have
    the same leading [L, B, S] axes as values)."""
    def move(arr):
        rows = jnp.take(arr, idx, axis=2)
        zeros = (0,) * (arr.ndim - 3)
        return jax.lax.dynamic_update_slice(arr, rows, (0, 0, dest) + zeros)

    upd = {name: move(getattr(cache, name)) for name in _array_fields(cache)}
    return dataclasses.replace(cache, length=new_length, **upd)
