"""Host-side (numpy) quantizers, bit-compatible with quant/core.py.

Why these exist: the tunneled TPU client RETAINS a host copy of every buffer
transferred to the device for the lifetime of the process (measured:
+0.39 GB RSS per 0.4 GB transfer, unreclaimed after del+gc). Streaming a
checkpoint through device-side quantization therefore pins the FULL dense
model in host RAM — 15 GB for 8B bf16 — defeating the streaming loader's
memory budget. Quantizing each layer on the host first means only the
quantized bytes (0.56/weight at INT4) ever cross the transfer boundary.

Bit-compatibility contract: integer codes/packed words are exactly equal to
the device quantizers' output on the same f32 input (IEEE single-precision
divide/round/compare sequences are replicated op for op); f32 scales agree
to 1 ULP (XLA may reassociate the absmax reduction). Enforced by
tests/test_quant.py::test_host_quantizers_match_device and the streamed-vs-
post-hoc loader tests.
"""
from __future__ import annotations

import numpy as np

from specdec_tpu.quant.core import (
    FP4_VALUES, FP4Weight, Int4Weight, Int8Weight, NF4_BLOCK, NF4_CODEBOOK,
    NF4Weight, _am_pack,
)


def _pack_nibbles_np(code: np.ndarray) -> np.ndarray:
    """codes [..., K, N] (0..15) -> int32 words [..., K//8, N] in the PAIR4
    layout (word r bits [4p+16h, +4) = code for k = p*(K/4) + 2r + h) — the
    layout quant/core._pack_nibbles produces and the Pallas kernels consume
    (see its docstring for why)."""
    *lead, K, N = code.shape
    assert K % 8 == 0
    c = code.astype(np.uint32).reshape(*lead, 4, K // 8, 2, N)
    sh = ((np.arange(4, dtype=np.uint32) * 4)[:, None, None]
          + (np.arange(2, dtype=np.uint32) * 16)[None, :, None])
    shifts = sh.reshape(*([1] * len(lead)), 4, 1, 2, 1)
    words = np.bitwise_or.reduce(
        np.bitwise_or.reduce(c << shifts, axis=-2), axis=-3)
    return words.view(np.int32)


def quantize_int8_np(w: np.ndarray) -> Int8Weight:
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = absmax / np.float32(127.0)
    q = np.clip(np.round(w / np.maximum(scale, np.float32(1e-12))),
                -127, 127)
    return Int8Weight(q=q.astype(np.int8), scale=scale)


def _blocked(w: np.ndarray):
    w = np.asarray(w, np.float32)
    *lead, K, N = w.shape
    assert K % NF4_BLOCK == 0, f"K={K} not divisible by {NF4_BLOCK}"
    blocks = w.reshape(*lead, K // NF4_BLOCK, NF4_BLOCK, N)
    absmax = np.max(np.abs(blocks), axis=-2)
    return blocks, absmax, lead, K, N


def _bf16_scale_np(absmax: np.ndarray, div: float):
    """Host mirror of quant/core._bf16_scale (bit-identical bf16 rounding:
    numpy/ml_dtypes and XLA both round-to-nearest-even)."""
    import ml_dtypes
    stored = (absmax / np.float32(div)).astype(ml_dtypes.bfloat16)
    return stored, stored.astype(np.float32) * np.float32(div)


def quantize_int4_np(w: np.ndarray) -> Int4Weight:
    blocks, absmax, lead, K, N = _blocked(w)
    stored, denom = _bf16_scale_np(absmax, 7.0)
    q = np.round(blocks / np.maximum(denom[..., None, :],
                                     np.float32(1e-12)) * np.float32(7.0))
    code = (np.clip(q, -7, 7) + 8).reshape(*lead, K, N)
    return Int4Weight(packed=_pack_nibbles_np(code), absmax=_am_pack(stored))


def quantize_nf4_np(w: np.ndarray) -> NF4Weight:
    blocks, absmax, lead, K, N = _blocked(w)
    stored, denom = _bf16_scale_np(absmax, 1.0)
    normed = blocks / np.maximum(denom[..., None, :], np.float32(1e-12))
    mids = (NF4_CODEBOOK[1:] + NF4_CODEBOOK[:-1]) / np.float32(2.0)
    code = np.searchsorted(mids, normed).reshape(*lead, K, N)
    return NF4Weight(packed=_pack_nibbles_np(code), absmax=_am_pack(stored))


def quantize_fp4_np(w: np.ndarray) -> FP4Weight:
    blocks, absmax, lead, K, N = _blocked(w)
    stored, denom = _bf16_scale_np(absmax, 6.0)
    scaled = blocks / np.maximum(denom[..., None, :],
                                 np.float32(1e-12)) * np.float32(6.0)
    mags = np.abs(scaled)
    grid = np.asarray(FP4_VALUES, np.float32)
    mids = (grid[1:] + grid[:-1]) / np.float32(2.0)
    mag_code = np.searchsorted(mids, mags)
    sign = (scaled < 0).astype(np.int64)
    code = ((sign << 3) | mag_code).reshape(*lead, K, N)
    return FP4Weight(packed=_pack_nibbles_np(code), absmax=_am_pack(stored))


HOST_QUANTIZERS = {"int8": quantize_int8_np, "int4": quantize_int4_np,
                   "nf4": quantize_nf4_np, "fp4": quantize_fp4_np}


def quantize_layer_dict_np(layers: dict, fn, fuse: bool) -> dict:
    """Host mirror of quant/core._quantize_layer_dict (np.concatenate for
    the fused wqkv / w_gateup weights)."""
    from specdec_tpu.quant.core import _QUANTIZABLE

    layers = dict(layers)
    if fuse and "wq" in layers:
        layers["wqkv"] = fn(np.concatenate(
            [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1))
        if "bq" in layers:
            layers["bqkv"] = np.concatenate(
                [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")],
                axis=-1)
        if "w_gate" in layers:
            layers["w_gateup"] = fn(np.concatenate(
                [layers.pop("w_gate"), layers.pop("w_up")], axis=-1))
            if "b_gate" in layers:
                layers["b_gateup"] = np.concatenate(
                    [layers.pop("b_gate"), layers.pop("b_up")], axis=-1)
    for name in _QUANTIZABLE:
        if name in layers:
            layers[name] = fn(layers[name])
    return layers


def quantize_np_chunked(fn, w: np.ndarray, chunk_cols: int = 8192):
    """``fn(w)`` computed in output-column slices, bit-identical to the
    whole-matrix call: every host quantizer is per-output-column independent
    (int8 reduces absmax over K per column; the 4-bit schemes block along K
    per column), so slicing the trailing N axis changes nothing.

    Why: whole-matrix quantization of an 8B lm_head ([4096, 128256])
    materializes several ~2.1 GB f32/uint32 intermediates simultaneously —
    measured +11 GB host RSS spike at the end of the 8B streamed load.
    Chunking bounds the transient to ~chunk_cols/N of that; the assembled
    container (packed codes + scales) is small.
    """
    N = w.shape[-1]
    if N <= chunk_cols:
        return fn(w)
    parts = [fn(w[..., s:s + chunk_cols]) for s in range(0, N, chunk_cols)]
    # containers are registered pytrees with array leaves; concat leafwise
    import jax
    return jax.tree.map(
        lambda *xs: np.concatenate(xs, axis=-1), *parts)
