"""Logit parity of the TPU-native decoder vs HF torch reference models.

The reference's only correctness oracle is eyeballing HF outputs (SURVEY.md §4);
we make it a real test: build tiny random HF models (llama w/ GQA, qwen2 biases,
qwen3 qk-norm, gpt-neox parallel-residual + partial rotary), convert weights via
core/hf_loader, and require logits to match within f32 tolerance — for full
prefill, cached incremental decode, and per-seq-offset batched decode.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from specdec_tpu.core.cache import init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.hf_loader import config_from_hf, params_from_hf
from specdec_tpu.core.model import forward_full, forward_step


def _llama_model(num_kv_heads=2):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=num_kv_heads, max_position_embeddings=256,
        rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
    )
    return LlamaForCausalLM(cfg).eval()


def _qwen2_model():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(1)
    cfg = Qwen2Config(
        vocab_size=96, hidden_size=48, intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    return Qwen2ForCausalLM(cfg).eval()


def _qwen3_model():
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(2)
    cfg = Qwen3Config(
        vocab_size=96, hidden_size=48, intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    return Qwen3ForCausalLM(cfg).eval()


def _neox_model():
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(3)
    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=256, rotary_pct=0.25,
        use_parallel_residual=True, layer_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    return GPTNeoXForCausalLM(cfg).eval()


def _gemma_model():
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(4)
    cfg = GemmaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        tie_word_embeddings=True,
    )
    return GemmaForCausalLM(cfg).eval()


MODELS = {
    "llama_gqa": _llama_model,
    "qwen2": _qwen2_model,
    "qwen3": _qwen3_model,
    "gpt_neox": _neox_model,
    # gemma: sqrt(hidden) embed scale, (1+w) norms, GeGLU tanh, MQA, tied head
    "gemma": _gemma_model,
}


def _hf_logits(model, tokens_np):
    import torch

    with torch.no_grad():
        out = model(torch.tensor(tokens_np))
    return out.logits.float().numpy()


@pytest.mark.parametrize("name", list(MODELS))
def test_full_forward_parity(name):
    model = MODELS[name]()
    cfg = config_from_hf(model.config, dtype=jnp.float32)
    params = params_from_hf(model, cfg)

    rng = np.random.default_rng(7)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 17)).astype(np.int32)
    ours = np.asarray(forward_full(cfg, params, jnp.asarray(tokens)))
    theirs = _hf_logits(model, tokens)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_cached_decode_matches_full_forward():
    """Prefill + T=1 steps + a 3-token block step must reproduce the
    no-cache full forward logits at every position."""
    model = _llama_model()
    cfg = config_from_hf(model.config, dtype=jnp.float32)
    params = params_from_hf(model, cfg)

    rng = np.random.default_rng(11)
    T = 12
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, T)).astype(np.int32))
    full = forward_full(cfg, params, tokens)

    cache = init_cache(cfg, 2, 64, dtype=jnp.float32)
    logits_p, cache = forward_step(cfg, params, tokens[:, :5], cache)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, :5]),
                               rtol=1e-4, atol=1e-4)
    for t in range(5, 8):
        logits_t, cache = forward_step(cfg, params, tokens[:, t:t + 1], cache)
        np.testing.assert_allclose(np.asarray(logits_t[:, 0]),
                                   np.asarray(full[:, t]), rtol=1e-4, atol=1e-4)
    # gamma-style multi-token block (the speculative verify shape)
    logits_b, cache = forward_step(cfg, params, tokens[:, 8:12], cache)
    np.testing.assert_allclose(np.asarray(logits_b), np.asarray(full[:, 8:12]),
                               rtol=1e-4, atol=1e-4)


def test_per_sequence_offsets_and_rollback():
    """Sequences at different cache lengths (right-padded prefill) decode
    correctly, and rollback-by-length-arithmetic reproduces pre-rollback state."""
    model = _llama_model()
    cfg = config_from_hf(model.config, dtype=jnp.float32)
    params = params_from_hf(model, cfg)

    rng = np.random.default_rng(13)
    lens = [9, 5]
    maxlen = max(lens)
    prompts = [rng.integers(1, cfg.vocab_size, size=(l,)).astype(np.int32) for l in lens]
    padded = np.zeros((2, maxlen), np.int32)
    for i, pr in enumerate(prompts):
        padded[i, :len(pr)] = pr

    cache = init_cache(cfg, 2, 64, dtype=jnp.float32)
    logits, cache = forward_step(cfg, params, jnp.asarray(padded), cache)
    cache = cache.with_length(jnp.asarray(lens, dtype=jnp.int32))

    # per-seq last-valid-position logits must equal unbatched full-forward logits
    for i, pr in enumerate(prompts):
        solo = forward_full(cfg, params, jnp.asarray(pr)[None, :])
        np.testing.assert_allclose(np.asarray(logits[i, len(pr) - 1]),
                                   np.asarray(solo[0, -1]), rtol=1e-4, atol=1e-4)

    # decode 2 tokens, roll back 2, decode again → identical logits
    step_tok = jnp.asarray([[3], [4]], dtype=jnp.int32)
    l1, cache2 = forward_step(cfg, params, step_tok, cache)
    l2, cache3 = forward_step(cfg, params, step_tok + 1, cache2)
    rolled = cache3.rolled_back(jnp.asarray([2, 2], dtype=jnp.int32))
    l1b, cache2b = forward_step(cfg, params, step_tok, rolled)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l1b), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache2.length), np.asarray(cache2b.length))
