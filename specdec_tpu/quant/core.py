"""Weight-only quantization: INT8 (per-channel) and NF4 (blockwise 4-bit).

The reference *declares* bitsandbytes but never enables it (every in-repo
``quantization_config=None`` — ref: engine/model_loader.py:83,106,
infer.py:121,125; SURVEY.md §0). The TPU build makes quantization first-class
(BASELINE.json north star: INT8 and NF4/INT4 targets through fused Pallas
dequant+matmul kernels):

- ``Int8Weight``: symmetric per-output-channel int8, scale = absmax/127
- ``NF4Weight``: 4-bit NormalFloat codes (QLoRA codebook) packed 8 codes per
  int32 word along the reduction dim (pair4 layout — see ``_pack_nibbles``),
  blockwise absmax over 64-element column blocks

Containers are pytree dataclasses, so quantized layers stack with a leading
layer axis and traverse ``lax.scan`` exactly like dense layers. ``qmatmul``
dispatches: dense arrays use the MXU directly; quantized weights use the
fused Pallas kernel on TPU (ops/pallas/quant_matmul.py) and an XLA
dequant-then-matmul fallback elsewhere — the fallback is also the correctness
oracle for the kernel tests.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# NF4 codebook from the QLoRA paper (quantiles of N(0,1), normalized to
# [-1, 1]); identical constants to bitsandbytes' nf4 data type.
NF4_CODEBOOK = np.asarray([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], dtype=np.float32)

NF4_BLOCK = 64  # absmax block length along the reduction dimension


def _bf16_scale(absmax, div: float):
    """(stored bf16 scale, f32 normalization denominator).

    Scales are STORED in bf16 (round 4): at 8B the f32 absmax stream is
    ~470 MB/forward — ~8% of the 4-bit weight traffic — and bf16 rounding
    perturbs a scale by <=2^-9 relative, an order below the 4-bit block
    quantization error itself (ppl gates in tests/test_evaluate.py hold).
    Codes are quantized against the ROUNDED scale so encode and decode see
    the same number (host mirror quant/host.py does the identical
    sequence)."""
    stored = (absmax / div).astype(jnp.bfloat16)
    return stored, stored.astype(jnp.float32) * div


def _am_pack(am):
    """absmax natural row order (g = k // 64) -> STORED block-major,
    quarter-minor order (row b*4 + p for natural g = p*(G/4) + b).

    Why: the pair4 kernel consumes absmax as [G/4, 4, N] tiles (block-major
    so the sublane dim is the full quarter count — Mosaic tiling). Storing
    that order makes the kernel's view a FREE leading-dim reshape; storing
    natural order forced a transpose of the full f32 absmax on EVERY kernel
    call — at 8B that is ~470 MB/forward of pure copy traffic (measured as
    part of the round-4 e2e-vs-ceiling gap). Applied iff G % 4 == 0 (always
    true for kernel-eligible K % 512 == 0 shapes); smaller test shapes stay
    natural and use the XLA path."""
    *lead, G, N = am.shape
    if G % 4 != 0:
        return am
    return am.reshape(*lead, 4, G // 4, N).swapaxes(-3, -2).reshape(
        *lead, G, N)


def _am_unpack(am):
    """Inverse of ``_am_pack`` (the dequantize/oracle path)."""
    *lead, G, N = am.shape
    if G % 4 != 0:
        return am
    return am.reshape(*lead, G // 4, 4, N).swapaxes(-3, -2).reshape(
        *lead, G, N)


def _pair_shifts(lead_dims: int, np_mod=jnp):
    """[4, 1, 2, 1]-shaped shift table for the pair4 layout: nibble position
    p + 4h sits at bit 4p + 16h."""
    sh = (np_mod.arange(4, dtype=np_mod.int32) * 4)[:, None, None] \
        + (np_mod.arange(2, dtype=np_mod.int32) * 16)[None, :, None]
    return sh.reshape(*([1] * lead_dims), 4, 1, 2, 1)


def _pack_nibbles(code: jax.Array) -> jax.Array:
    """codes [..., K, N] (values 0..15) -> int32 words [..., K//8, N] in the
    PAIR4 layout: word r bit range [4p + 16h, +4) holds the code for
    k = p*(K/4) + 2r + h   (p in 0..3, h in 0..1).

    Why this order (round 4, VERDICT r3 #1): the fused kernel's decode cost
    rules the 4-bit bandwidth roofline, and pair4 lets ONE shift+mask grab
    TWO nibbles ((word >> 4p) & 0x000F000F), one OR of 0x4300_4300 assemble
    two bf16 "128+nib" values in a single 32-bit lane, and one
    ``pltpu.bitcast`` split them into rows — measured on chip, i32->bf16
    bitcast interleaves with the LOW half at even rows, so the (2r, 2r+1)
    k-pairing makes the decoded rows land k-contiguous with zero shuffling
    (tools/exp_bitcast_probe.py). Round 1-3 history: uint8 nibbles (Mosaic
    sub-word emulation, the measured round-1 bottleneck) -> interleaved
    k=8r+j int32 words (rounds 2-3) -> pair4 (round 4).

    All 32-bit decode arithmetic stays in native lanes; K must be divisible
    by 8 (the fused kernels additionally want K % 256 == 0 — the caller
    falls back to the XLA dequant path otherwise)."""
    *lead, K, N = code.shape
    assert K % 8 == 0
    c = code.astype(jnp.int32).reshape(*lead, 4, K // 8, 2, N)
    return jnp.sum(c << _pair_shifts(len(lead)),
                   axis=(-4, -2)).astype(jnp.int32)


def _unpack_nibbles(packed: jax.Array) -> jax.Array:
    """int32 words [..., K8, N] -> codes [..., K8*8, N] int32 (inverse of
    ``_pack_nibbles``; the XLA fallback / oracle path)."""
    *lead, K8, N = packed.shape
    p = packed[..., None, :, None, :]
    codes = (p >> _pair_shifts(len(lead))) & 0xF
    return codes.reshape(*lead, K8 * 8, N)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Int8Weight:
    """w ≈ q * scale;  q: [..., K, N] int8, scale: [..., 1, N] f32."""

    q: jax.Array
    scale: jax.Array

    @property
    def shape(self):
        return self.q.shape

    @property
    def out_dtype(self):
        return jnp.bfloat16


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NF4Weight:
    """w[k, n] ≈ codebook[code(k, n)] * absmax[k // 64, n].

    packed: [..., K//8, N] int32 in the pair4 layout — word r holds the code
    for k = p*(K/4) + 2r + h at bits [4p+16h, +4) (see ``_pack_nibbles``);
    absmax: [..., K//64, N] f32. K (the reduction dim) must be divisible
    by 64.
    """

    packed: jax.Array
    absmax: jax.Array

    @property
    def shape(self):
        p = self.packed.shape
        return (*p[:-2], p[-2] * 8, p[-1])

    @property
    def out_dtype(self):
        return jnp.bfloat16


def quantize_int8(w: jax.Array) -> Int8Weight:
    """Symmetric per-output-channel (last dim) int8 quantization."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(w / jnp.maximum(scale, 1e-12)), -127, 127)
    return Int8Weight(q=q.astype(jnp.int8), scale=scale)


def quantize_nf4(w: jax.Array) -> NF4Weight:
    """Blockwise NF4: codes = nearest codebook entry of w/absmax per
    64-element block along the reduction (second-to-last) dim.

    Stacked (leading-layer-axis) weights quantize one slice at a time: the
    f32 upcast + normalization intermediates are ~4x the weight bytes, which
    exhausts HBM if materialized for a whole fused 22-layer stack at once.
    """
    if w.ndim >= 3:
        slices = [quantize_nf4(w[i]) for i in range(w.shape[0])]
        return NF4Weight(
            packed=jnp.stack([s.packed for s in slices]),
            absmax=jnp.stack([s.absmax for s in slices]))
    w = w.astype(jnp.float32)
    *lead, K, N = w.shape
    assert K % NF4_BLOCK == 0, f"K={K} not divisible by {NF4_BLOCK}"
    blocks = w.reshape(*lead, K // NF4_BLOCK, NF4_BLOCK, N)
    absmax = jnp.max(jnp.abs(blocks), axis=-2)               # [..., K/64, N]
    stored, denom = _bf16_scale(absmax, 1.0)
    normed = blocks / jnp.maximum(denom[..., None, :], 1e-12)
    # nearest codebook entry via midpoint boundaries (the codebook is sorted);
    # O(elements) memory — an argmin over a broadcast distance tensor would
    # materialize elements x 16 floats and OOMs on stacked full-model weights
    cb = jnp.asarray(NF4_CODEBOOK)
    mids = (cb[1:] + cb[:-1]) / 2.0
    code = jnp.searchsorted(mids, normed)
    code = code.reshape(*lead, K, N)
    return NF4Weight(packed=_pack_nibbles(code), absmax=_am_pack(stored))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Int4Weight:
    """w[k, n] ≈ (code(k, n) − 8) * absmax[k // 64, n]   (absmax pre-divided
    by 7 at quantize time, so decode is pure ``(c − 8) * absmax``).

    Same packing as NF4Weight (int32 words of 8 codes along K; blockwise
    scale over 64-element K blocks). Codes live in 1..15 — a symmetric ±7
    grid. This is the *throughput* 4-bit dtype: decode is ~3 VPU ops/weight
    (sub, int→float, scale-mul) vs NF4's ~20-op select tree, which round-1
    measured as the VPU-bound bottleneck of the 4-bit decode path
    (docs/BENCHMARKS.md). Accuracy sits between FP4 and NF4 on normal weights.
    """

    packed: jax.Array
    absmax: jax.Array

    @property
    def shape(self):
        p = self.packed.shape
        return (*p[:-2], p[-2] * 8, p[-1])

    @property
    def out_dtype(self):
        return jnp.bfloat16


def quantize_int4(w: jax.Array) -> Int4Weight:
    """Blockwise symmetric INT4: q = clip(round(w/absmax·7), −7, 7) + 8."""
    if w.ndim >= 3:  # chunk stacked weights (see quantize_nf4)
        slices = [quantize_int4(w[i]) for i in range(w.shape[0])]
        return Int4Weight(
            packed=jnp.stack([s.packed for s in slices]),
            absmax=jnp.stack([s.absmax for s in slices]))
    w = w.astype(jnp.float32)
    *lead, K, N = w.shape
    assert K % NF4_BLOCK == 0, f"K={K} not divisible by {NF4_BLOCK}"
    blocks = w.reshape(*lead, K // NF4_BLOCK, NF4_BLOCK, N)
    absmax = jnp.max(jnp.abs(blocks), axis=-2)
    stored, denom = _bf16_scale(absmax, 7.0)
    q = jnp.round(blocks / jnp.maximum(denom[..., None, :], 1e-12) * 7.0)
    code = (jnp.clip(q, -7, 7) + 8).reshape(*lead, K, N)
    return Int4Weight(packed=_pack_nibbles(code), absmax=_am_pack(stored))


def _int4_decode(code: jax.Array) -> jax.Array:
    """4-bit symmetric code → float value (±7 grid; scale lives in absmax)."""
    return (code.astype(jnp.int32) - 8).astype(jnp.float32)


def _nf4_decode(code: jax.Array) -> jax.Array:
    """4-bit code → codebook value via a balanced select tree (gatherless —
    TPU-friendly inside Pallas kernels too)."""
    c = code.astype(jnp.int32)
    table = NF4_CODEBOOK

    def level(lov, hiv, bit):
        return jnp.where((c & bit) != 0, hiv, lov)

    # binary select over 4 bits
    vals = [jnp.float32(v) for v in table]
    stage = [level(vals[i], vals[i + 1], 1) for i in range(0, 16, 2)]
    stage = [jnp.where((c & 2) != 0, stage[i + 1], stage[i])
             for i in range(0, 8, 2)]
    stage = [jnp.where((c & 4) != 0, stage[i + 1], stage[i])
             for i in range(0, 4, 2)]
    return jnp.where((c & 8) != 0, stage[1], stage[0])


# NF4 codebook rounded to bf16 and packed two-per-int32-word (word i holds
# codes 2i at bits [0,16) and 2i+1 at bits [16,32), each as bf16 bit
# patterns). A bf16 value's f32 bit pattern is its 16 bits shifted into the
# high half, so decode is: 3-bit select tree over words (7 selects, half the
# codebook tree's 15) + one shift/mask on the last code bit + a free bitcast.
# bf16 rounding perturbs the codebook by <= 0.31% relative — an order below
# the 4-bit block-quantization error itself (ppl gates in tests/test_evaluate
# hold for both variants).
def _nf4_packed_words() -> list:
    import ml_dtypes
    u16 = NF4_CODEBOOK.astype(ml_dtypes.bfloat16).view(np.uint16)
    return [int(u16[2 * i]) | (int(u16[2 * i + 1]) << 16) for i in range(8)]


_NF4_WORDS = _nf4_packed_words()


def _nf4_decode_bits(code: jax.Array) -> jax.Array:
    """NF4 code → bf16-rounded codebook value via packed-word bit assembly
    (the VPU-lean variant of ``_nf4_decode``; ~14 vector ops vs ~19)."""
    c = code.astype(jnp.int32)
    # sign-safe int32 constants (words >= 0x80000000 would overflow int32)
    w = [jnp.int32(np.int32(np.uint32(x))) for x in _NF4_WORDS]
    b1 = (c & 2) != 0
    t0 = jnp.where(b1, w[1], w[0])
    t1 = jnp.where(b1, w[3], w[2])
    t2 = jnp.where(b1, w[5], w[4])
    t3 = jnp.where(b1, w[7], w[6])
    b2 = (c & 4) != 0
    u0 = jnp.where(b2, t1, t0)
    u1 = jnp.where(b2, t3, t2)
    word = jnp.where((c & 8) != 0, u1, u0)
    bits = jnp.where((c & 1) != 0,
                     word & jnp.int32(np.int32(np.uint32(0xFFFF0000))),
                     word << 16)
    return lax.bitcast_convert_type(bits, jnp.float32)


def _dequant4(w: Any, decode, dtype) -> jax.Array:
    """Decode a 4-bit container's int32 words to the full matrix."""
    vals = decode(_unpack_nibbles(w.packed))
    *lead, K, N = vals.shape
    scaled = vals.reshape(*lead, K // NF4_BLOCK, NF4_BLOCK, N) * \
        _am_unpack(w.absmax).astype(jnp.float32)[..., None, :]
    return scaled.reshape(*lead, K, N).astype(dtype)


def dequantize(w: Any, dtype=jnp.float32) -> jax.Array:
    """Materialize a quantized weight (reference path + test oracle)."""
    if isinstance(w, Int8Weight):
        return (w.q.astype(jnp.float32) * w.scale).astype(dtype)
    if isinstance(w, FP4Weight):
        return _dequant4(w, _fp4_decode, dtype)
    if isinstance(w, Int4Weight):
        return _dequant4(w, _int4_decode, dtype)
    if isinstance(w, NF4Weight):
        return _dequant4(w, _nf4_decode, dtype)
    return jnp.asarray(w, dtype=dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedSlice:
    """One layer\'s view into a STACKED 4-bit container: the full [L, ...]
    container plus a traced layer index.

    Why this exists (round 4): scanning quantized containers as lax.scan xs
    hands the Pallas kernel a dynamic-slice of the stack, and XLA
    MATERIALIZES that slice into a fresh buffer per layer per step —
    profiled at ~0.85 ms/token (1.1B) / ~4.7 ms (8B), comparable to the
    matmuls themselves (tools/exp_profile_ar.py). The model scan instead
    closes over the full stacked containers and scans only the layer INDEX;
    qmatmul on a StackedSlice feeds the stacked arrays straight to the
    kernel, which selects the layer via a scalar-prefetched index map —
    zero copies. Constructed only inside traces (core/model.py)."""

    container: Any
    idx: jax.Array


def qmatmul(x: jax.Array, w: Any, precision=None) -> jax.Array:
    """x @ w for dense or quantized w. Dense → MXU einsum; quantized → fused
    Pallas kernel on TPU, XLA dequant fallback elsewhere."""
    if isinstance(w, StackedSlice):
        from specdec_tpu.ops.quant_matmul import quant_matmul_stacked
        return quant_matmul_stacked(x, w.container, w.idx)
    if isinstance(w, (Int8Weight, NF4Weight, FP4Weight, Int4Weight)):
        from specdec_tpu.ops.quant_matmul import quant_matmul
        return quant_matmul(x, w)
    return jnp.matmul(x, w, precision=precision)


_QUANTIZABLE = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def _quantize_layer_dict(layers: dict, fn, fuse: bool) -> dict:
    """Quantize one layer-dict (stacked or single-layer) in place-by-copy;
    the shared worker of ``quantize_params`` and ``init_quantized_params``."""
    layers = dict(layers)
    if fuse and "wq" in layers:
        layers["wqkv"] = fn(jnp.concatenate(
            [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1))
        if "bq" in layers:
            layers["bqkv"] = jnp.concatenate(
                [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")],
                axis=-1)
        if "w_gate" in layers:
            layers["w_gateup"] = fn(jnp.concatenate(
                [layers.pop("w_gate"), layers.pop("w_up")], axis=-1))
            if "b_gate" in layers:
                layers["b_gateup"] = jnp.concatenate(
                    [layers.pop("b_gate"), layers.pop("b_up")], axis=-1)
    for name in _QUANTIZABLE:
        if name in layers:
            layers[name] = fn(layers[name])
    return layers


def quantize_params(params, kind: str = "int8",
                    quantize_lm_head: bool = True, fuse: bool = False):
    """Quantize the transformer-layer projection weights of a params pytree
    (embeddings and norms stay dense, like bitsandbytes' default).

    ``fuse=True`` concatenates q/k/v into one ``wqkv`` weight and gate/up into
    one ``w_gateup`` along the output dim before quantizing — one fused kernel
    launch instead of three/two per block (launch overhead is the measured
    bottleneck of the quantized decode path). core/model.py splits the fused
    outputs; per-output-channel (INT8) and per-column-block (NF4) scales make
    fusion exact, not an approximation.
    """
    fn = {"int8": quantize_int8, "nf4": quantize_nf4,
          "fp4": quantize_fp4, "int4": quantize_int4}[kind]
    out = dict(params)
    out["layers"] = _quantize_layer_dict(params["layers"], fn, fuse)
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = fn(params["lm_head"])
    return out


def init_quantized_params(cfg, key: jax.Array, kind: str = "int8",
                          scale: float = 0.02, fuse: bool = True,
                          layer_out_scales=None):
    """Random-init a model DIRECTLY into quantized form, one layer at a time.

    ``init_params`` + ``quantize_params`` materializes the full dense stack
    first — fine at 1.1B, but an 8B bf16 stack is ~16 GB and fills a v5e
    chip's entire HBM before quantization begins. This builder keeps peak
    memory at (quantized stack) + (one dense layer): per layer, generate the
    dense weights, quantize, append; then concatenate the per-layer quantized
    containers along the leading layer axis (containers are pytrees, so
    ``tree.map(concatenate)`` stacks packed/absmax/q/scale leaves uniformly).

    ``layer_out_scales``: optional length-L sequence multiplying each layer's
    wo/w_down before quantization (bench.py's LayerSkip damped-tail
    structure). Embeddings and norms stay dense, as in ``quantize_params``.
    """
    from functools import partial

    from specdec_tpu.core.model import init_params

    fn = {"int8": quantize_int8, "nf4": quantize_nf4,
          "fp4": quantize_fp4, "int4": quantize_int4}[kind]
    L = cfg.num_layers
    one = cfg.replace(num_layers=1)
    keys = jax.random.split(key, L + 2)

    @partial(jax.jit, static_argnums=())
    def build_layer(k, out_scale):
        lay = init_params(one, k, scale)["layers"]
        for name in ("wo", "w_down"):
            lay[name] = (lay[name].astype(jnp.float32)
                         * out_scale).astype(cfg.dtype)
        return _quantize_layer_dict(lay, fn, fuse)

    # write each quantized layer into a preallocated stack with buffer
    # DONATION — a concatenate of L per-layer fragments keeps fragments +
    # result live simultaneously (2x the weight footprint: measured
    # ResourceExhausted building 8B INT8 on a 16 GB chip); donation keeps
    # peak memory at stack + one dense layer
    @partial(jax.jit, donate_argnums=(0,))
    def write_layer(stacked, lay, i):
        return jax.tree.map(
            lambda s, l: lax.dynamic_update_slice_in_dim(s, l, i, axis=0),
            stacked, lay)

    first = build_layer(keys[0], jnp.float32(
        1.0 if layer_out_scales is None else float(layer_out_scales[0])))
    stacked = jax.tree.map(
        lambda x: jnp.zeros((L,) + x.shape[1:], x.dtype), first)
    stacked = write_layer(stacked, first, jnp.int32(0))
    del first
    for i in range(1, L):
        s = 1.0 if layer_out_scales is None else float(layer_out_scales[i])
        stacked = write_layer(stacked, build_layer(keys[i], jnp.float32(s)),
                              jnp.int32(i))

    # embed/head built and quantized UNDER jit: eagerly, an 8B-vocab head
    # (4096x128256) materializes a ~2 GB f32/int32 buffer per elementwise op
    # of the quantize chain (measured ResourceExhausted); jit fuses them
    D = cfg.hidden_size

    @jax.jit
    def build_embed(k):
        return (jax.random.normal(k, (cfg.vocab_size, D), jnp.float32)
                * scale).astype(cfg.dtype)

    @jax.jit
    def build_head(k):
        head = (jax.random.normal(k, (D, cfg.vocab_size), jnp.float32)
                * scale).astype(cfg.dtype)
        return fn(head)

    params = {"embed": build_embed(keys[L]), "layers": stacked,
              "final_norm_w": jnp.ones((D,), cfg.dtype)}
    if cfg.norm_type == "layernorm":
        params["final_norm_b"] = jnp.zeros((D,), cfg.dtype)
    if not cfg.tie_embeddings:
        params["lm_head"] = build_head(keys[L + 1])
    return params


# ---------------------------------------------------------------------------
# FP4 (e2m1): the throughput-oriented 4-bit dtype
# ---------------------------------------------------------------------------
# NF4's codebook needs a 15-select decode tree (~30 VPU ops/weight — measured
# VPU-bound at ~108 tok/s on the 1.1B model). FP4's value set
# {0, 0.5, 1, 1.5, 2, 3, 4, 6} (x sign) decodes in ~8 arithmetic ops:
# magnitude = 2^(e-1) * (1 + m/2) with an e=0 subnormal, which is a 3-select
# chain plus one multiply. bitsandbytes ships the same fp4 alternative next
# to nf4 for the same reason.

FP4_VALUES = np.asarray(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], dtype=np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FP4Weight:
    """w[k, n] ~ fp4(code) * absmax[k//64, n] / 6 (same packing as NF4Weight:
    int32 words of 8 codes along K; blockwise absmax)."""

    packed: jax.Array
    absmax: jax.Array

    @property
    def shape(self):
        p = self.packed.shape
        return (*p[:-2], p[-2] * 8, p[-1])

    @property
    def out_dtype(self):
        return jnp.bfloat16


def _fp4_decode(code: jax.Array) -> jax.Array:
    """nibble (s e1e0 m) -> value; pure arithmetic, kernel-friendly."""
    c = code.astype(jnp.int32)
    s = (c >> 3) & 1
    e = (c >> 1) & 3
    m = (c & 1).astype(jnp.float32)
    half_m = 0.5 * m
    # 2^(e-1) for e>=1 via a short select chain; e==0 is the subnormal 0.5*m
    base = jnp.where(e == 1, 1.0, jnp.where(e == 2, 2.0, 4.0))
    mag = jnp.where(e == 0, half_m, base * (1.0 + half_m))
    return jnp.where(s == 1, -mag, mag)


def _fp4_decode_bits(code: jax.Array) -> jax.Array:
    """FP4 decode by assembling f32 *bits* directly: the e2m1 nibble is a
    mini-float, so for e>=1 the f32 value is exactly ``(z + 252) << 22`` with
    ``z = e:m`` (exponent 126+e, mantissa m<<22); e==0 subnormals {0, 0.5}
    are 0x3F000000·m. Sign ORs into bit 31. One integer select chain, one
    bitcast, no float compares — the VPU-lean variant of ``_fp4_decode``."""
    from jax import lax
    c = code.astype(jnp.int32)
    s31 = (c & 8) << 28
    norm = (((c & 7) + 252) << 22) | s31
    sub = (c & 1) * 0x3F000000 | s31
    bits = jnp.where((c & 6) == 0, sub, norm)
    return lax.bitcast_convert_type(bits, jnp.float32)


def quantize_fp4(w: jax.Array) -> FP4Weight:
    """Blockwise FP4: nearest value of the e2m1 grid after scaling the
    64-block absmax onto the grid maximum (6.0)."""
    if w.ndim >= 3:  # chunk stacked weights (see quantize_nf4)
        slices = [quantize_fp4(w[i]) for i in range(w.shape[0])]
        return FP4Weight(
            packed=jnp.stack([s.packed for s in slices]),
            absmax=jnp.stack([s.absmax for s in slices]))
    w = w.astype(jnp.float32)
    *lead, K, N = w.shape
    assert K % NF4_BLOCK == 0, f"K={K} not divisible by {NF4_BLOCK}"
    blocks = w.reshape(*lead, K // NF4_BLOCK, NF4_BLOCK, N)
    absmax = jnp.max(jnp.abs(blocks), axis=-2)
    stored, denom = _bf16_scale(absmax, 6.0)
    scaled = blocks / jnp.maximum(denom[..., None, :], 1e-12) * 6.0
    mags = jnp.abs(scaled)
    grid = jnp.asarray(FP4_VALUES)
    mids = (grid[1:] + grid[:-1]) / 2.0
    mag_code = jnp.searchsorted(mids, mags)             # 0..7
    sign = (scaled < 0).astype(jnp.int32)
    code = ((sign << 3) | mag_code).reshape(*lead, K, N)
    return FP4Weight(packed=_pack_nibbles(code), absmax=_am_pack(stored))
