"""Streaming safetensors loader + rope_scaling parity.

Covers the round-3 real-checkpoint path (core/stream_loader.py): sharded
checkpoints via model.safetensors.index.json, direct-to-quantized streaming
(bit-identical to the full-load + quantize_params path), and llama3-type
rope_scaling (the BASELINE ladder's Llama-3.1/3.2 checkpoints) checked
against HF torch end to end."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _build_llama(rope_scaling=None, dtype=None):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(7)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        rope_scaling=rope_scaling, tie_word_embeddings=False,
        eos_token_id=2, bos_token_id=1, pad_token_id=0,
    )
    model = LlamaForCausalLM(cfg).eval()
    if dtype is not None:
        model = model.to(dtype)
    return model


@pytest.fixture(scope="module")
def llama3_scaled_ckpt(tmp_path_factory):
    """A checkpoint with llama-3.1-style rope_scaling active at every
    position (original_max_position_embeddings tiny so the banding kicks in
    immediately)."""
    d = tmp_path_factory.mktemp("rope_ckpt")
    model = _build_llama(rope_scaling={
        "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
        "high_freq_factor": 4.0, "original_max_position_embeddings": 64,
    })
    model.save_pretrained(d)
    return str(d), model


def test_llama3_inv_freq_matches_transformers(llama3_scaled_ckpt):
    """scaled_inv_freq reproduces HF's _compute_llama3_parameters exactly."""
    from specdec_tpu.core.rope import scaled_inv_freq

    path, model = llama3_scaled_ckpt
    theirs = model.model.rotary_emb.inv_freq.float().numpy()
    head_dim = 64 // 4
    j = np.arange(head_dim // 2, dtype=np.float32)
    base = 10000.0 ** (-2.0 * j / head_dim)
    ours = np.asarray(scaled_inv_freq(
        jnp.asarray(base), ("llama3", 8.0, 1.0, 4.0, 64.0)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=0)


def test_rope_scaling_logits_match_torch(llama3_scaled_ckpt):
    """End-to-end: a rope_scaling checkpoint loaded through the streaming
    loader produces HF-torch logits, at positions inside AND outside the
    original context (scaling applies at all positions)."""
    import torch
    from specdec_tpu.core.model import forward_full
    from specdec_tpu.core.stream_loader import load_hf_streamed

    path, model = llama3_scaled_ckpt
    cfg, params = load_hf_streamed(path, dtype=jnp.float32)
    assert cfg.rope_scaling == ("llama3", 8.0, 1.0, 4.0, 64.0)

    rng = np.random.default_rng(0)
    toks = rng.integers(3, 250, size=(2, 96), dtype=np.int64)  # > orig_max=64
    ours = np.asarray(forward_full(cfg, params, jnp.asarray(toks, jnp.int32)))
    with torch.no_grad():
        theirs = model(torch.tensor(toks)).logits.float().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_rope_scaling_changes_output(llama3_scaled_ckpt):
    """Guard against silently ignoring the scaling: dropping it must move
    the logits (this is exactly the bug the loader used to have)."""
    from specdec_tpu.core.model import forward_full
    from specdec_tpu.core.stream_loader import load_hf_streamed

    path, _ = llama3_scaled_ckpt
    cfg, params = load_hf_streamed(path, dtype=jnp.float32)
    toks = jnp.asarray([[5, 9, 33, 2, 41, 7, 8, 9] * 8], jnp.int32)
    scaled = np.asarray(forward_full(cfg, params, toks))
    unscaled = np.asarray(forward_full(
        cfg.replace(rope_scaling=()), params, toks))
    assert np.abs(scaled - unscaled).max() > 1e-3


def test_linear_rope_scaling_parses_and_runs(tmp_path):
    from specdec_tpu.core.model import forward_full
    from specdec_tpu.core.stream_loader import load_hf_streamed
    import torch

    model = _build_llama(rope_scaling={"rope_type": "linear", "factor": 2.0})
    model.save_pretrained(tmp_path)
    cfg, params = load_hf_streamed(str(tmp_path), dtype=jnp.float32)
    assert cfg.rope_scaling == ("linear", 2.0)
    toks = np.asarray([[5, 9, 33, 2, 41, 7]], np.int64)
    ours = np.asarray(forward_full(cfg, params, jnp.asarray(toks, jnp.int32)))
    with torch.no_grad():
        theirs = model(torch.tensor(toks)).logits.float().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_unsupported_rope_scaling_raises():
    from types import SimpleNamespace
    from specdec_tpu.core.hf_loader import _rope_scaling_from_hf

    cfg = SimpleNamespace(rope_scaling={"rope_type": "yarn", "factor": 4.0})
    with pytest.raises(ValueError, match="yarn"):
        _rope_scaling_from_hf(cfg)


def _shard_checkpoint(src_dir, dst_dir, n_shards=3):
    """Re-write a single-file checkpoint as a sharded one with an index (the
    layout large HF checkpoints actually ship)."""
    from safetensors import safe_open
    from safetensors.numpy import save_file

    os.makedirs(dst_dir, exist_ok=True)
    with safe_open(os.path.join(src_dir, "model.safetensors"),
                   framework="np") as f:
        names = sorted(f.keys())
        tensors = {k: f.get_tensor(k) for k in names}
    weight_map = {}
    for s in range(n_shards):
        fname = f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"
        chunk = {k: tensors[k] for k in names[s::n_shards]}
        save_file(chunk, os.path.join(dst_dir, fname))
        weight_map.update({k: fname for k in chunk})
    with open(os.path.join(dst_dir, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {}, "weight_map": weight_map}, f)
    for extra in ("config.json", "generation_config.json"):
        p = os.path.join(src_dir, extra)
        if os.path.exists(p):
            with open(p) as fi, open(os.path.join(dst_dir, extra), "w") as fo:
                fo.write(fi.read())


@pytest.fixture(scope="module")
def plain_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("plain_ckpt")
    model = _build_llama()
    model.save_pretrained(d)
    # minimal fast tokenizer so load_models can resolve one from the dir
    from tokenizers import Tokenizer, models, pre_tokenizers
    from tokenizers.trainers import BpeTrainer
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = BpeTrainer(vocab_size=256,
                         special_tokens=["<pad>", "<s>", "</s>", "<unk>"])
    tok.train_from_iterator(
        ["the quick brown fox jumps over the lazy dog"] * 50, trainer)
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "eos_token": "</s>", "pad_token": "<pad>", "unk_token": "<unk>",
    }))
    return str(d), model


def test_sharded_checkpoint_loads_identically(plain_ckpt, tmp_path):
    """index.json multi-shard layout → identical pytree to single-file."""
    from specdec_tpu.core.stream_loader import load_hf_streamed

    src, _ = plain_ckpt
    dst = str(tmp_path / "sharded")
    _shard_checkpoint(src, dst, n_shards=3)
    cfg_a, a = load_hf_streamed(src, dtype=jnp.float32)
    cfg_b, b = load_hf_streamed(dst, dtype=jnp.float32)
    assert cfg_a == cfg_b
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_streamed_matches_full_load(plain_ckpt):
    """Streaming layer-by-layer == torch full-load conversion, leaf for
    leaf (same transposes, same stacking order)."""
    from specdec_tpu.core.hf_loader import load_hf_model
    from specdec_tpu.core.stream_loader import load_hf_streamed

    path, _ = plain_ckpt
    cfg_s, streamed = load_hf_streamed(path, dtype=jnp.float32)
    cfg_f, full = load_hf_model(path, dtype=jnp.float32)
    assert cfg_s == cfg_f
    fs = jax.tree_util.tree_leaves_with_path(streamed)
    ff = jax.tree_util.tree_leaves_with_path(full)
    assert [k for k, _ in fs] == [k for k, _ in ff]
    for (k, x), (_, y) in zip(fs, ff):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=str(k))


@pytest.mark.parametrize("kind", ["int8", "int4"])
def test_streamed_quantized_matches_post_hoc(plain_ckpt, kind):
    """Direct-to-quantized streaming produces the SAME containers as loading
    dense then quantize_params(fuse=True) — bit-identical packed words and
    scales, without ever holding the dense stack."""
    from specdec_tpu.core.hf_loader import load_hf_model
    from specdec_tpu.core.stream_loader import load_hf_streamed
    from specdec_tpu.quant import quantize_params

    path, _ = plain_ckpt
    _, streamed = load_hf_streamed(path, dtype=jnp.float32,
                                   quantization=kind)
    cfg, dense = load_hf_model(path, dtype=jnp.float32)
    ref = quantize_params(dense, kind=kind, fuse=True)
    fs = jax.tree_util.tree_leaves_with_path(streamed)
    fr = jax.tree_util.tree_leaves_with_path(ref)
    assert [k for k, _ in fs] == [k for k, _ in fr]
    for (k, x), (_, y) in zip(fs, fr):
        x, y = np.asarray(x), np.asarray(y)
        if np.issubdtype(x.dtype, np.integer):
            # packed codes must match exactly
            np.testing.assert_array_equal(x, y, err_msg=str(k))
        else:
            # scales: jit fusion reassociates the absmax reduction → 1-ULP
            # wiggle vs the eager path
            np.testing.assert_allclose(x, y, rtol=1e-6, err_msg=str(k))


def test_streamed_quantized_generates(plain_ckpt):
    """A quantized streamed checkpoint generates through load_models (the
    harness path) with the 'quantized' tag set (no double quantization)."""
    from specdec_tpu.engine.model_loader import load_models
    from specdec_tpu.sampling.base_decoding import autoregressive_generate

    path, _ = plain_ckpt
    bundle = load_models(path, None, dtype=jnp.bfloat16, quantization="int8")
    assert bundle["target"].get("quantized") == "int8"
    out = autoregressive_generate(
        [5, 9, 33], bundle["target"]["cfg"], bundle["target"]["params"],
        max_gen_len=6, eos_tokens_id=())
    assert len(out) == 6
