"""Rotary position embeddings (rotate-half convention, matching HF llama/neox).

Computed on the fly from integer positions — no precomputed tables, so arbitrary
per-sequence positions (needed for per-seq cache offsets in batched speculative
decoding) cost nothing extra under XLA fusion.
"""
from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, rotary_dim: int, theta: float,
                 dtype=jnp.float32):
    """positions: [...,] int32 → (cos, sin) of shape [..., rotary_dim].

    Frequencies follow HF convention: inv_freq[j] = theta^(-2j/rotary_dim),
    j in [0, rotary_dim/2), and cos/sin are duplicated across the two halves
    (rotate-half layout).
    """
    half = rotary_dim // 2
    j = jnp.arange(half, dtype=jnp.float32)
    inv_freq = theta ** (-2.0 * j / rotary_dim)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., half]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [..., rotary_dim]
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               rotary_dim: int) -> jnp.ndarray:
    """x: [..., H, D_h]; cos/sin: broadcastable [..., rotary_dim].

    Rotates the first ``rotary_dim`` features (rotate-half), passes the rest
    through unchanged (gpt-neox partial rotary, ref rotary_pct=0.25).
    """
    if rotary_dim == x.shape[-1]:
        rot, rest = x, None
    else:
        rot, rest = x[..., :rotary_dim], x[..., rotary_dim:]
    half = rotary_dim // 2
    x1, x2 = rot[..., :half], rot[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]
    out = (rot * cos + rotated * sin).astype(x.dtype)
    if rest is not None:
        out = jnp.concatenate([out, rest], axis=-1)
    return out
