"""Shared helpers for the decode loops."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def max_fn(x: jax.Array) -> jax.Array:
    """Residual distribution: norm(max(x, 0)) (ref:
    sampling/speculative_decoding.py:10-19). Adds a guard for zero mass —
    callers fall back to the raw target distribution in that case, matching
    the batched reference path (ref: engine/infer_engine.py:319-321)."""
    pos = jnp.maximum(x, 0.0)
    total = jnp.sum(pos, axis=-1, keepdims=True)
    return pos / jnp.maximum(total, 1e-38)


def residual_mass(p: jax.Array, q: jax.Array) -> jax.Array:
    return jnp.sum(jnp.maximum(p - q, 0.0), axis=-1)


def eos_mask(tokens: jax.Array, eos_ids: Tuple[int, ...]) -> jax.Array:
    """Boolean mask of which tokens are in the (static) EOS set."""
    if not eos_ids:
        return jnp.zeros(tokens.shape, dtype=bool)
    eos = jnp.asarray(eos_ids, dtype=tokens.dtype)
    return jnp.any(tokens[..., None] == eos, axis=-1)


def pad_to_bucket(ids: Sequence[int], pad_id: int, bucket: int = 64):
    """Right-pad a prompt to the next bucket multiple so jit compiles once per
    bucket, not once per prompt length."""
    import numpy as np

    n = len(ids)
    padded_len = max(bucket, ((n + bucket - 1) // bucket) * bucket)
    out = np.full((padded_len,), pad_id, dtype=np.int32)
    out[:n] = np.asarray(ids, dtype=np.int32)
    return jnp.asarray(out), n


def normalize_eos(eos_tokens_id) -> Tuple[int, ...]:
    if eos_tokens_id is None:
        return ()
    if isinstance(eos_tokens_id, int):
        return (eos_tokens_id,)
    return tuple(int(t) for t in eos_tokens_id)
