"""Rotary position embeddings (rotate-half convention, matching HF llama/neox).

Computed on the fly from integer positions — no precomputed tables, so arbitrary
per-sequence positions (needed for per-seq cache offsets in batched speculative
decoding) cost nothing extra under XLA fusion.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def scaled_inv_freq(inv_freq: jnp.ndarray, scaling: tuple) -> jnp.ndarray:
    """Apply a rope_scaling spec to base inverse frequencies.

    ``scaling`` is the hashable tuple stored in ``ModelConfig.rope_scaling``:
      ()                                        — no scaling
      ("linear", factor)                        — HF "linear" (positions / factor)
      ("llama3", factor, low_freq_factor,
       high_freq_factor, original_max_pos)      — llama-3.1 frequency-banded
                                                   NTK scaling

    The llama3 branch reproduces HF transformers'
    ``_compute_llama3_parameters`` exactly: wavelengths longer than
    original_max/low_freq_factor are scaled by 1/factor, shorter than
    original_max/high_freq_factor are untouched, and the band between is
    linearly interpolated in 1/wavelength space. The reference inherits this
    from HF checkpoints for free (ref: engine/model_loader.py:81-88 loads any
    HF config); here it is computed natively and parity-tested against torch.
    """
    if not scaling:
        return inv_freq
    kind = scaling[0]
    if kind == "linear":
        return inv_freq / scaling[1]
    if kind == "llama3":
        _, factor, low_ff, high_ff, orig_max = scaling
        wavelen = 2.0 * math.pi / inv_freq
        low_wl = orig_max / low_ff
        high_wl = orig_max / high_ff
        smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
        smoothed = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        out = jnp.where(wavelen > low_wl, inv_freq / factor, inv_freq)
        is_medium = (wavelen >= high_wl) & (wavelen <= low_wl)
        return jnp.where(is_medium, smoothed, out)
    raise ValueError(f"unsupported rope_scaling kind: {kind!r}")


def rope_cos_sin(positions: jnp.ndarray, rotary_dim: int, theta: float,
                 dtype=jnp.float32, scaling: tuple = ()):
    """positions: [...,] int32 → (cos, sin) of shape [..., rotary_dim].

    Frequencies follow HF convention: inv_freq[j] = theta^(-2j/rotary_dim),
    j in [0, rotary_dim/2), and cos/sin are duplicated across the two halves
    (rotate-half layout). ``scaling`` (see ``scaled_inv_freq``) remaps the
    frequencies for long-context checkpoints (llama-3.1/3.2 ``rope_scaling``).
    """
    half = rotary_dim // 2
    j = jnp.arange(half, dtype=jnp.float32)
    inv_freq = theta ** (-2.0 * j / rotary_dim)
    inv_freq = scaled_inv_freq(inv_freq, scaling)
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
