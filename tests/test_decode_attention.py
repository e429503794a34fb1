"""Flash-decode attention kernel vs the XLA reference attention (interpret
mode on CPU): T=1 decode, gamma+1 verify blocks, ragged per-seq offsets, GQA."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import _attention
from specdec_tpu.ops.decode_attention import flash_decode_attention

RNG = np.random.default_rng(0)


def _case(B, T, Hq, Hk, Dh, S, offsets):
    q = jnp.asarray(RNG.normal(size=(B, T, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, S, Hk, Dh)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, S, Hk, Dh)).astype(np.float32))
    off = jnp.asarray(offsets, jnp.int32)
    cfg = tiny_config(num_heads=Hq, num_kv_heads=Hk, head_dim=Dh,
                      hidden_size=Hq * Dh, intermediate_size=Hq * Dh)
    q_pos = off[:, None] + jnp.arange(T)[None, :]
    ref = _attention(cfg, q, k, v, q_pos, None)
    with pltpu.force_tpu_interpret_mode():
        got = flash_decode_attention(q, k, v, off, num_kv_heads=Hk, tile_s=64)
    got = got.reshape(B, T, Hq * Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_single_token_decode():
    _case(B=2, T=1, Hq=8, Hk=4, Dh=16, S=128, offsets=[37, 90])


def test_verify_block_gqa():
    _case(B=3, T=5, Hq=8, Hk=2, Dh=32, S=192, offsets=[10, 64, 180 - 5])


def test_mha_no_grouping_unaligned_s():
    _case(B=1, T=3, Hq=4, Hk=4, Dh=16, S=100, offsets=[50])


def test_zero_offset_prefill_like():
    _case(B=2, T=8, Hq=4, Hk=2, Dh=16, S=64, offsets=[0, 0])


def test_long_cache_mostly_dead_tiles():
    """Live length << cache capacity: 8 S-tiles, only the first 1-2 live —
    exercises the length-aware tile clamp/skip against the XLA oracle."""
    _case(B=2, T=1, Hq=8, Hk=4, Dh=16, S=512, offsets=[40, 100])


def _case_quant(B, T, Hq, Hk, Dh, S, offsets):
    """Quantized kernel vs the XLA quantized-attention oracle (both consume
    the same int8 values + scales, so agreement is to f32 tolerance)."""
    from specdec_tpu.core.cache import quantize_kv_block
    from specdec_tpu.ops.decode_attention import flash_decode_attention_quant

    q = jnp.asarray(RNG.normal(size=(B, T, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, S, Hk, Dh)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, S, Hk, Dh)).astype(np.float32))
    kq, ks = quantize_kv_block(k)
    vq, vs = quantize_kv_block(v)
    off = jnp.asarray(offsets, jnp.int32)
    cfg = tiny_config(num_heads=Hq, num_kv_heads=Hk, head_dim=Dh,
                      hidden_size=Hq * Dh, intermediate_size=Hq * Dh,
                      kv_quant="int8")
    q_pos = off[:, None] + jnp.arange(T)[None, :]
    ref = _attention(cfg, q, (kq, ks), (vq, vs), q_pos, None)
    with pltpu.force_tpu_interpret_mode():
        got = flash_decode_attention_quant(q, kq, ks, vq, vs, off,
                                           num_kv_heads=Hk, tile_s=64)
    got = got.reshape(B, T, Hq * Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_quant_single_token_decode():
    _case_quant(B=2, T=1, Hq=8, Hk=4, Dh=16, S=128, offsets=[37, 90])


def test_quant_verify_block_gqa():
    _case_quant(B=3, T=5, Hq=8, Hk=2, Dh=32, S=192, offsets=[10, 64, 175])


def test_quant_unaligned_s_and_dead_tiles():
    _case_quant(B=2, T=1, Hq=4, Hk=4, Dh=16, S=200, offsets=[15, 120])
