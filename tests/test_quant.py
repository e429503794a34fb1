"""Quantization tests: container round-trips, fused-kernel vs XLA-oracle
equivalence (interpret mode), and end-to-end quantized model behavior."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import forward_full, init_params
from specdec_tpu.quant import (
    Int4Weight, Int8Weight, NF4Weight, dequantize, quantize_int8,
    quantize_nf4, quantize_params, qmatmul, NF4_CODEBOOK,
)
from specdec_tpu.ops.quant_matmul import _int8_matmul_2d, _nf4_matmul_2d


RNG = np.random.default_rng(0)


def test_int8_roundtrip_error():
    w = jnp.asarray(RNG.normal(size=(512, 96)).astype(np.float32))
    qw = quantize_int8(w)
    assert qw.q.dtype == jnp.int8
    deq = dequantize(qw)
    # symmetric per-channel int8: max error <= scale/2 per channel
    err = np.abs(np.asarray(deq - w))
    scale = np.asarray(qw.scale)[0]
    assert (err <= scale / 2 + 1e-6).all()


def test_nf4_roundtrip_error():
    w = jnp.asarray(RNG.normal(size=(128, 64)).astype(np.float32))
    qw = quantize_nf4(w)
    assert qw.packed.dtype == jnp.int32
    assert qw.packed.shape == (16, 64)
    assert qw.absmax.shape == (2, 64)
    deq = np.asarray(dequantize(qw))
    # every dequantized value must be codebook[c] * blockwise absmax
    am = np.repeat(np.asarray(qw.absmax), 64, axis=0)
    normed = deq / np.maximum(am, 1e-12)
    dist = np.abs(normed[..., None] - NF4_CODEBOOK).min(-1)
    assert dist.max() < 1e-6
    # reconstruction is the nearest-codebook projection
    w_np = np.asarray(w)
    norm_w = w_np / np.maximum(am, 1e-12)
    nearest = NF4_CODEBOOK[np.abs(norm_w[..., None] - NF4_CODEBOOK).argmin(-1)]
    np.testing.assert_allclose(normed, nearest, atol=1e-6)


def test_qmatmul_fallback_matches_dense():
    x = jnp.asarray(RNG.normal(size=(3, 128)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(128, 64)).astype(np.float32))
    for quant in (quantize_int8, quantize_nf4):
        qw = quant(w)
        out = qmatmul(x, qw)
        oracle = x @ dequantize(qw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                                   rtol=1e-4, atol=1e-4)


def test_int8_pallas_kernel_matches_oracle_interpret():
    """Run the fused kernel in interpreter mode on CPU against the XLA
    dequant oracle (non-divisible shapes exercise the padding path)."""
    x = jnp.asarray(RNG.normal(size=(3, 160)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(160, 100)).astype(np.float32))
    qw = quantize_int8(w)
    with pltpu.force_tpu_interpret_mode():
        out = _int8_matmul_2d(x, qw.q, qw.scale, tile_n=128, tile_k=128)
    oracle = (x @ dequantize(qw)).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(oracle, dtype=np.float32),
                               rtol=2e-2, atol=2e-1)


def test_nf4_pallas_kernel_matches_oracle_interpret():
    x = jnp.asarray(RNG.normal(size=(2, 512)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(512, 96)).astype(np.float32))
    qw = quantize_nf4(w)
    with pltpu.force_tpu_interpret_mode():
        out = _nf4_matmul_2d(x, qw.packed, qw.absmax, tile_n=128, tile_k=512)
    oracle = (x @ dequantize(qw)).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(oracle, dtype=np.float32),
                               rtol=2e-2, atol=2e-1)


VOCAB = 64
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=64,
                  intermediate_size=128, num_heads=4, num_kv_heads=2,
                  head_dim=16)


def test_quantized_model_end_to_end():
    """INT8-quantized tiny model: logits stay close to dense (same argmax for
    most positions) and the full generation path runs."""
    from specdec_tpu.sampling.base_decoding import autoregressive_generate

    params = init_params(CFG, jax.random.key(0), scale=0.3)
    qparams = quantize_params(params, kind="int8")
    assert isinstance(qparams["layers"]["wq"], Int8Weight)
    assert isinstance(qparams["lm_head"], Int8Weight)

    tokens = jnp.asarray(RNG.integers(0, VOCAB, size=(1, 12)).astype(np.int32))
    dense = np.asarray(forward_full(CFG, params, tokens))
    quant = np.asarray(forward_full(CFG, qparams, tokens))
    agree = (dense.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.8, f"argmax agreement {agree}"

    out = autoregressive_generate([3, 5, 9], CFG, qparams, max_gen_len=8,
                                  eos_tokens_id=(), key=jax.random.key(1))
    assert len(out) == 8


def test_nf4_quantized_spec_decode_runs():
    """NF4 target + dense drafter through the speculative loop."""
    from specdec_tpu.sampling.speculative import speculative_generate

    params = init_params(CFG, jax.random.key(0), scale=0.3)
    qparams = quantize_params(params, kind="nf4")
    assert isinstance(qparams["layers"]["w_up"], NF4Weight)
    out, rate = speculative_generate(
        [3, 5, 9, 11], CFG, params, CFG, qparams, gamma=2, max_gen_len=6,
        eos_tokens_id=(), key=jax.random.key(2))
    assert len(out) == 6
    assert 0.0 <= rate <= 1.0


def test_quantized_self_draft_spec_equals_quantized_ar():
    """The headline operating point (bench.py): BOTH models quantized. With
    the quantized target drafting for itself, greedy spec must reproduce the
    quantized-AR stream exactly with acceptance 1.0 — the oracle that
    quantized weights flow through the whole speculative loop unchanged."""
    from specdec_tpu.sampling.base_decoding import autoregressive_generate
    from specdec_tpu.sampling.speculative import speculative_generate

    params = init_params(CFG, jax.random.key(0), scale=0.3)
    q = quantize_params(params, kind="int4", fuse=True)
    ar = autoregressive_generate([3, 5, 9, 11], CFG, q, max_gen_len=10,
                                 eos_tokens_id=(), key=jax.random.key(3))
    spec, rate = speculative_generate(
        [3, 5, 9, 11], CFG, q, CFG, q, gamma=3, max_gen_len=10,
        eos_tokens_id=(), key=jax.random.key(4))
    assert spec == ar
    assert rate == 1.0


def test_layer_sliced_quantized_drafter_runs():
    """bench.py's LayerSkip drafter at the quantized operating point: slice
    the leading layer axis of the fused quantized containers via tree.map
    (containers are registered pytrees, so the slice hits packed/absmax/q/
    scale leaves uniformly) and run the spec loop."""
    from specdec_tpu.sampling.speculative import speculative_generate

    params = init_params(CFG, jax.random.key(0), scale=0.3)
    q = quantize_params(params, kind="int4", fuse=True)
    drafter = dict(q)
    drafter["layers"] = jax.tree.map(lambda x: x[:2], q["layers"])
    d_cfg = CFG.replace(num_layers=2)
    out, rate = speculative_generate(
        [3, 5, 9, 11], d_cfg, drafter, CFG, q, gamma=3, max_gen_len=8,
        eos_tokens_id=(), key=jax.random.key(5))
    assert len(out) == 8
    assert 0.0 <= rate <= 1.0


def test_init_quantized_params_runs_and_matches_structure():
    """Per-layer quantized init (the 8B memory-safe build path): same pytree
    structure as post-hoc fused quantization, damped-tail layer_out_scales
    applied, and the generation path runs."""
    from specdec_tpu.quant import init_quantized_params
    from specdec_tpu.sampling.base_decoding import autoregressive_generate

    q = init_quantized_params(CFG, jax.random.key(7), kind="int4",
                              layer_out_scales=[1.0, 0.1])
    ref = quantize_params(init_params(CFG, jax.random.key(7), scale=0.02),
                          kind="int4", fuse=True)
    assert jax.tree.structure(q) == jax.tree.structure(ref)
    for (pa, a), (pb, b) in zip(jax.tree.leaves_with_path(q),
                                jax.tree.leaves_with_path(ref)):
        assert a.shape == b.shape and a.dtype == b.dtype, (pa, pb)
    # the damped layer carries smaller wo scales than the undamped one
    am = np.asarray(q["layers"]["wo"].absmax, np.float32)
    assert am[1:].mean() < 0.5 * am[:1].mean()
    out = autoregressive_generate([3, 5, 9], CFG, q, max_gen_len=6,
                                  eos_tokens_id=(), key=jax.random.key(8))
    assert len(out) == 6


def test_synthetic_loader_quantized_build():
    """synthetic: presets with quantization build directly into quantized
    containers (no dense stack materialized) and report the kind."""
    from specdec_tpu.engine.model_loader import load_models

    bundle = load_models("synthetic:tiny", quantization="int4")
    assert bundle["target"].get("quantized") == "int4"
    assert isinstance(bundle["target"]["params"]["layers"]["wqkv"], Int4Weight)


def test_fused_quantization_matches_unfused():
    """fuse=True (one wqkv / w_gateup launch per block) must be numerically
    identical to unfused quantization — scales are per-output-channel, so
    concatenation before quantization changes nothing."""
    params = init_params(CFG, jax.random.key(0), scale=0.3)
    toks = jnp.asarray(RNG.integers(0, VOCAB, size=(1, 10)).astype(np.int32))
    unfused = np.asarray(forward_full(CFG, quantize_params(params, "int8"),
                                      toks))
    qf = quantize_params(params, "int8", fuse=True)
    assert "wqkv" in qf["layers"] and "wq" not in qf["layers"]
    assert "w_gateup" in qf["layers"]
    fused = np.asarray(forward_full(CFG, qf, toks))
    np.testing.assert_allclose(fused, unfused, rtol=1e-5, atol=1e-5)


def test_fused_qkv_bias_model():
    cfg = CFG.replace(attn_qkv_bias=True)
    params = init_params(cfg, jax.random.key(1), scale=0.3)
    toks = jnp.asarray(RNG.integers(0, VOCAB, size=(1, 8)).astype(np.int32))
    unfused = np.asarray(forward_full(cfg, quantize_params(params, "int8"),
                                      toks))
    fused = np.asarray(forward_full(
        cfg, quantize_params(params, "int8", fuse=True), toks))
    np.testing.assert_allclose(fused, unfused, rtol=1e-5, atol=1e-5)


def test_fp4_roundtrip_and_fallback():
    from specdec_tpu.quant.core import FP4_VALUES, FP4Weight, quantize_fp4

    w = jnp.asarray(RNG.normal(size=(128, 64)).astype(np.float32))
    qw = quantize_fp4(w)
    assert isinstance(qw, FP4Weight)
    deq = np.asarray(dequantize(qw))
    # every dequantized magnitude must sit on the fp4 grid x blockwise scale
    am = np.repeat(np.asarray(qw.absmax), 64, axis=0)
    normed = np.abs(deq) / np.maximum(am, 1e-12)
    dist = np.abs(normed[..., None] - FP4_VALUES).min(-1)
    assert dist.max() < 1e-5
    # nearest projection: fp4 error is bounded by half the largest grid gap
    err = np.abs(deq - np.asarray(w)) / np.maximum(am * 6.0, 1e-12)
    assert err.max() <= (1.0 / 6.0) + 1e-5  # largest gap is 2.0 on the 0..6 grid

    x = jnp.asarray(RNG.normal(size=(3, 128)).astype(np.float32))
    out = qmatmul(x, qw)
    oracle = x @ dequantize(qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)


def test_fp4_pallas_kernel_matches_oracle_interpret():
    from specdec_tpu.quant.core import quantize_fp4
    x = jnp.asarray(RNG.normal(size=(2, 512)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(512, 96)).astype(np.float32))
    qw = quantize_fp4(w)
    with pltpu.force_tpu_interpret_mode():
        out = _nf4_matmul_2d(x, qw.packed, qw.absmax, tile_n=128, tile_k=512,
                             codec="fp4")
    oracle = (x @ dequantize(qw)).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(oracle, dtype=np.float32),
                               rtol=2e-2, atol=2e-1)


def test_fp4_model_end_to_end():
    from specdec_tpu.sampling.base_decoding import autoregressive_generate
    params = init_params(CFG, jax.random.key(0), scale=0.3)
    qp = quantize_params(params, kind="fp4", fuse=True)
    out = autoregressive_generate([3, 5, 9], CFG, qp, max_gen_len=6,
                                  eos_tokens_id=(), key=jax.random.key(1))
    assert len(out) == 6


def test_int4_roundtrip_and_fallback():
    from specdec_tpu.quant.core import Int4Weight, quantize_int4

    w = jnp.asarray(RNG.normal(size=(128, 64)).astype(np.float32))
    qw = quantize_int4(w)
    assert isinstance(qw, Int4Weight)
    deq = np.asarray(dequantize(qw))
    # every dequantized value sits on the symmetric +-7 grid x blockwise scale
    am = np.repeat(np.asarray(qw.absmax), 64, axis=0)  # absmax/7 per element
    normed = deq / np.maximum(am, 1e-12)
    assert np.abs(normed - np.round(normed)).max() < 1e-5
    assert np.abs(np.round(normed)).max() <= 7
    # nearest projection: error bounded by half a grid step (absmax/7/2)
    err = np.abs(deq - np.asarray(w))
    assert (err <= am / 2 + 1e-6).all()

    x = jnp.asarray(RNG.normal(size=(3, 128)).astype(np.float32))
    out = qmatmul(x, qw)
    oracle = x @ dequantize(qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)


def test_int4_pallas_kernel_matches_oracle_interpret():
    from specdec_tpu.quant.core import quantize_int4
    x = jnp.asarray(RNG.normal(size=(2, 512)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(512, 96)).astype(np.float32))
    qw = quantize_int4(w)
    with pltpu.force_tpu_interpret_mode():
        out = _nf4_matmul_2d(x, qw.packed, qw.absmax, tile_n=128, tile_k=512,
                             codec="int4")
    oracle = (x @ dequantize(qw)).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(oracle, dtype=np.float32),
                               rtol=2e-2, atol=2e-1)


def test_fp4_bit_assembly_decode_matches_select_chain():
    """_fp4_decode_bits (f32 bit assembly) must equal _fp4_decode on all 16
    nibbles — it is the default in-kernel FP4 decoder."""
    from specdec_tpu.quant.core import _fp4_decode, _fp4_decode_bits
    codes = jnp.arange(16, dtype=jnp.uint8)
    np.testing.assert_array_equal(np.asarray(_fp4_decode(codes)),
                                  np.asarray(_fp4_decode_bits(codes)))


def test_int4_model_end_to_end():
    from specdec_tpu.sampling.base_decoding import autoregressive_generate
    from specdec_tpu.quant.core import Int4Weight
    params = init_params(CFG, jax.random.key(0), scale=0.3)
    qp = quantize_params(params, kind="int4", fuse=True)
    assert isinstance(qp["layers"]["wqkv"], Int4Weight)
    out = autoregressive_generate([3, 5, 9], CFG, qp, max_gen_len=6,
                                  eos_tokens_id=(), key=jax.random.key(1))
    assert len(out) == 6


def test_nf4_decode_bits_matches_codebook():
    """The packed bf16-word decode must equal the f32 codebook rounded to
    bf16 — exactly (bit-assembly is not an approximation beyond the bf16
    rounding of the table)."""
    import ml_dtypes
    from specdec_tpu.quant.core import _nf4_decode_bits

    codes = jnp.arange(16, dtype=jnp.int32)
    got = np.asarray(_nf4_decode_bits(codes))
    want = NF4_CODEBOOK.astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(got, want)
    # and the rounding is far below the 4-bit block-quant error
    rel = np.max(np.abs(got - NF4_CODEBOOK) / np.maximum(np.abs(NF4_CODEBOOK), 1e-9))
    assert rel < 0.0032


def test_nf4_bits_kernel_matches_oracle_interpret():
    key = jax.random.key(11)
    w = jax.random.normal(key, (512, 256), jnp.float32) * 0.1
    qw = quantize_nf4(w)
    x = jax.random.normal(jax.random.key(12), (4, 512), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = _nf4_matmul_2d(x, qw.packed, qw.absmax, tile_n=128, tile_k=512,
                             codec="nf4")  # default codec = packed bits decode
    oracle = x.astype(jnp.float32) @ dequantize(qw, jnp.float32)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(oracle),
                               rtol=2e-2, atol=2e-1)


def test_host_quantizers_match_device():
    """quant/host.py's numpy quantizers must be bit-compatible with the
    device (quant/core.py) versions: exact integer codes/packed words,
    1-ULP scales (XLA may reassociate the absmax reduction). The streaming
    loader quantizes on host (transferred-buffer retention on the tunneled
    backend), so this equivalence is what makes its output interchangeable
    with quantize_params'."""
    import numpy as np
    import jax
    from specdec_tpu.quant import core as qc
    from specdec_tpu.quant import host as qh

    rng = np.random.default_rng(5)
    w = (rng.standard_normal((2, 128, 96)) * 0.3).astype(np.float32)
    # include exact-zero columns and large outliers
    w[:, :, 0] = 0.0
    w[0, 3, 5] = 50.0

    for name, dev_fn, host_fn in (
            ("int8", qc.quantize_int8, qh.quantize_int8_np),
            ("int4", qc.quantize_int4, qh.quantize_int4_np),
            ("nf4", qc.quantize_nf4, qh.quantize_nf4_np),
            ("fp4", qc.quantize_fp4, qh.quantize_fp4_np)):
        dev = dev_fn(jax.numpy.asarray(w))
        host = host_fn(w)
        d_leaves = jax.tree_util.tree_leaves_with_path(dev)
        h_leaves = jax.tree_util.tree_leaves_with_path(host)
        for (k, a), (_, b) in zip(d_leaves, h_leaves):
            a, b = np.asarray(a), np.asarray(b)
            if np.issubdtype(a.dtype, np.integer):
                np.testing.assert_array_equal(b, a, err_msg=f"{name}{k}")
            else:
                np.testing.assert_allclose(b, a, rtol=1e-6,
                                           err_msg=f"{name}{k}")


def test_chunked_host_quantization_bit_identical():
    """quantize_np_chunked == whole-matrix call for every scheme (the
    streamed loader quantizes the lm_head in column chunks to bound host
    transients; all four quantizers are per-output-column independent)."""
    from specdec_tpu.quant.host import HOST_QUANTIZERS, quantize_np_chunked

    rng = np.random.default_rng(5)
    w = (rng.standard_normal((256, 300), dtype=np.float32) * 3).astype(
        np.float32)
    for kind, fn in HOST_QUANTIZERS.items():
        whole = fn(w)
        chunked = quantize_np_chunked(fn, w, chunk_cols=64)  # 300 % 64 != 0
        for a, b in zip(jax.tree.leaves(whole), jax.tree.leaves(chunked)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=kind)


def test_stacked_kernel_matches_oracle_interpret():
    """The scalar-prefetch stacked path (quant_matmul_stacked) must equal
    the per-layer 2D kernel/oracle for every layer index, both codecs."""
    from specdec_tpu.ops.quant_matmul import _q4_matmul_stacked
    from specdec_tpu.quant.core import quantize_int4

    L, K, N = 3, 512, 256
    w = jnp.asarray(RNG.normal(size=(L, K, N)).astype(np.float32) * 0.1)
    x = jnp.asarray(RNG.normal(size=(2, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    for quant, codec in ((quantize_int4, "int4"), (quantize_nf4, "nf4")):
        qw = quant(w)
        for i in range(L):
            with pltpu.force_tpu_interpret_mode():
                out = _q4_matmul_stacked(x, qw.packed, qw.absmax,
                                         jnp.int32(i), 256, 512, codec=codec)
            layer = type(qw)(packed=qw.packed[i], absmax=qw.absmax[i])
            oracle = (x @ dequantize(layer, jnp.float32)).astype(jnp.bfloat16)
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(oracle, np.float32),
                rtol=2e-2, atol=2e-1)


def test_vmem_tile_planner_fits_budget():
    """VERDICT r4 #1: every (Mp, K, N) must get a kernel plan whose blocks
    fit the 16 MiB scoped-VMEM limit. Round 4's fixed (tile_n=1024,
    tile_k=2048) tiles cost 18.1M at the Mp=1024 8B prefill shape and died
    at compile on chip (/tmp/r4logs/tree_8b.log)."""
    from specdec_tpu.ops.quant_matmul import (
        _VMEM_BUDGET, _fit_tiles, _q4_chunk_rows, _q4_vmem_bytes)

    # the budget model reproduces the compiler's number on the failing
    # instance (compiler said 18.12M)
    assert abs(_q4_vmem_bytes(1024, 1024, 2048) - 18.12 * 2**20) < 0.05 * 2**20
    for Mp in (8, 64, 1024, 4096, 16384):
        tn, tk, rows = _fit_tiles(Mp, 4096, 6144, exact_n=True)
        assert tn and tk and 4096 % tk == 0 and 6144 % tn == 0
        assert _q4_vmem_bytes(min(Mp, rows), tn, tk) <= _VMEM_BUDGET
        chunk = _q4_chunk_rows(Mp, tn, tk)
        assert _q4_vmem_bytes(min(Mp, chunk), tn, tk) <= _VMEM_BUDGET
    # decode shapes (tiny M) keep the measured round-4 tile winners
    assert _fit_tiles(16, 4096, 6144, exact_n=True)[:2] == (1024, 2048)


def test_q4_kernel_chunks_large_m_interpret(monkeypatch):
    """Force the M-chunking fallback with a tiny budget: output must be
    bit-identical to the unchunked kernel (the CPU fallback-trigger test
    from VERDICT r4 #1's done-criterion)."""
    import specdec_tpu.ops.quant_matmul as qm
    from specdec_tpu.quant.core import quantize_int4

    x = jnp.asarray(RNG.normal(size=(40, 512)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(512, 128)).astype(np.float32) * 0.1)
    qw = quantize_int4(w)
    with pltpu.force_tpu_interpret_mode():
        whole = qm._nf4_matmul_2d(x, qw.packed, qw.absmax, tile_n=128,
                                  tile_k=512, codec="int4")
    monkeypatch.setattr(qm, "_VMEM_BUDGET", qm._q4_vmem_bytes(16, 128, 512))
    assert qm._q4_chunk_rows(40, 128, 512) == 16  # chunking now triggers
    qm._nf4_matmul_2d.clear_cache()  # same shape would hit the stale trace
    with pltpu.force_tpu_interpret_mode():
        chunked = qm._nf4_matmul_2d(x, qw.packed, qw.absmax, tile_n=128,
                                    tile_k=512, codec="int4")
    np.testing.assert_array_equal(np.asarray(whole, np.float32),
                                  np.asarray(chunked, np.float32))


def test_stacked_kernel_chunks_large_m_interpret(monkeypatch):
    """Same forced-chunk check for the stacked scalar-prefetch path — the
    kernel instance that actually OOM'd on chip in round 4."""
    import specdec_tpu.ops.quant_matmul as qm
    from specdec_tpu.quant.core import quantize_int4

    L, K, N = 2, 512, 256
    w = jnp.asarray(RNG.normal(size=(L, K, N)).astype(np.float32) * 0.1)
    x = jnp.asarray(RNG.normal(size=(40, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    qw = quantize_int4(w)
    with pltpu.force_tpu_interpret_mode():
        whole = qm._q4_matmul_stacked(x, qw.packed, qw.absmax, jnp.int32(1),
                                      256, 512, codec="int4")
    monkeypatch.setattr(qm, "_VMEM_BUDGET", qm._q4_vmem_bytes(16, 256, 512))
    assert qm._q4_chunk_rows(40, 256, 512) == 16
    qm._q4_matmul_stacked.clear_cache()
    with pltpu.force_tpu_interpret_mode():
        chunked = qm._q4_matmul_stacked(x, qw.packed, qw.absmax,
                                        jnp.int32(1), 256, 512, codec="int4")
    np.testing.assert_array_equal(np.asarray(whole, np.float32),
                                  np.asarray(chunked, np.float32))
