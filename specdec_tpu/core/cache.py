"""Static-shape slotted KV cache with per-sequence length counters.

TPU-first replacement for the reference's cache pruning (ref: utils/caching.py:6-77,
which slices tokens off HF ``DynamicCache`` tensors). Under XLA everything is
static-shaped: the cache is a fixed ``[L, B, S_max, H_kv, D_h]`` buffer and
"pruning n tokens" is ``length -= n`` — stale entries are masked out of attention
(key position < length) and later overwritten in place. Rollback after a rejected
draft window is therefore free.
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


def init_cache(cfg, batch_size: int, max_seq_len: int, dtype=None) -> KVCache:
    dtype = dtype or cfg.dtype
    shape = (cfg.num_layers, batch_size, max_seq_len, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        length=jnp.zeros((batch_size,), dtype=jnp.int32),
    )


def write_block(layer_k: jax.Array, layer_v: jax.Array, new_k: jax.Array,
                new_v: jax.Array, offsets: jax.Array):
    """Write a [B, T, H_kv, D_h] block into one layer's [B, S, H_kv, D_h] cache
    at per-sequence offsets (vmapped dynamic_update_slice → scatter on TPU)."""

    def one(c, blk, off):
        return jax.lax.dynamic_update_slice(c, blk, (off, 0, 0))

    return (jax.vmap(one)(layer_k, new_k, offsets),
            jax.vmap(one)(layer_v, new_v, offsets))
