"""Encoder-decoder (T5) tests: logit parity vs HF torch, cached decode
equivalence, AR + speculative codec generation semantics."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from specdec_tpu.core.codec_model import (
    CodecConfig, codec_config_from_hf, codec_params_from_hf, decode_step,
    encode, init_codec_params, init_cross_kv,
)
from specdec_tpu.sampling.codec_decoding import (
    _codec_cache, autoregressive_generate_encoder_decoder,
    speculative_generate_encoder_decoder,
)


def _t5_model(gated=False):
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    torch.manual_seed(0)
    cfg = T5Config(
        vocab_size=96, d_model=48, d_kv=12, d_ff=96, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=0,
        tie_word_embeddings=True,
    )
    return T5ForConditionalGeneration(cfg).eval()


@pytest.mark.parametrize("gated", [False, True])
def test_t5_logit_parity(gated):
    import torch

    model = _t5_model(gated)
    cfg = codec_config_from_hf(model.config, dtype=jnp.float32)
    params = codec_params_from_hf(model, cfg)

    rng = np.random.default_rng(3)
    enc_ids = rng.integers(2, 96, size=(1, 9)).astype(np.int32)
    dec_ids = np.concatenate([[[0]],
                              rng.integers(2, 96, size=(1, 6))], 1).astype(np.int32)
    with torch.no_grad():
        out = model(input_ids=torch.tensor(enc_ids),
                    decoder_input_ids=torch.tensor(dec_ids))
    theirs = out.logits.float().numpy()

    mask = jnp.ones((1, 9), jnp.int32)
    enc_out = encode(cfg, params, jnp.asarray(enc_ids), mask)
    ck, cv = init_cross_kv(cfg, params, enc_out)
    cache = _codec_cache(cfg, 16)
    ours, _ = decode_step(cfg, params, jnp.asarray(dec_ids), cache, ck, cv, mask)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_t5_cached_decode_matches_block_decode():
    model = _t5_model()
    cfg = codec_config_from_hf(model.config, dtype=jnp.float32)
    params = codec_params_from_hf(model, cfg)

    rng = np.random.default_rng(5)
    enc_ids = jnp.asarray(rng.integers(2, 96, size=(1, 7)).astype(np.int32))
    dec_ids = jnp.asarray(
        np.concatenate([[[0]], rng.integers(2, 96, size=(1, 5))], 1).astype(np.int32))
    mask = jnp.ones((1, 7), jnp.int32)
    enc_out = encode(cfg, params, enc_ids, mask)
    ck, cv = init_cross_kv(cfg, params, enc_out)

    full, _ = decode_step(cfg, params, dec_ids, _codec_cache(cfg, 16), ck, cv, mask)
    cache = _codec_cache(cfg, 16)
    for t in range(dec_ids.shape[1]):
        step, cache = decode_step(cfg, params, dec_ids[:, t:t + 1], cache,
                                  ck, cv, mask)
        np.testing.assert_allclose(np.asarray(step[0, 0]),
                                   np.asarray(full[0, t]), rtol=1e-4, atol=1e-4)


CFG = CodecConfig(vocab_size=48, d_model=32, d_kv=8, d_ff=64, num_heads=4,
                  num_encoder_layers=2, num_decoder_layers=2, rel_buckets=8,
                  rel_max_distance=32, decoder_start_token_id=0,
                  max_position_embeddings=256)


def test_codec_ar_and_spec_generate():
    target = init_codec_params(CFG, jax.random.key(0), scale=0.4)
    noise = init_codec_params(CFG, jax.random.key(1), scale=0.1)
    drafter = jax.tree.map(lambda a, b: a + b, target, noise)
    prompt = [5, 9, 33, 2, 41, 7]

    ar = autoregressive_generate_encoder_decoder(
        prompt, CFG, target, max_gen_len=14, eos_tokens_id=(),
        key=jax.random.key(2))
    assert ar[0] == CFG.decoder_start_token_id
    assert len(ar) == 15  # start token + gen budget (ref total_len = gen+1)

    # self-draft greedy spec == AR (same oracle as decoder-only)
    spec, rate = speculative_generate_encoder_decoder(
        prompt, CFG, target, CFG, target, gamma=3, max_gen_len=14,
        eos_tokens_id=(), key=jax.random.key(3))
    assert spec == ar
    assert rate == 1.0

    # distinct drafter: deterministic per key, bounded, in-vocab
    out1, r1 = speculative_generate_encoder_decoder(
        prompt, CFG, drafter, CFG, target, gamma=3, max_gen_len=14,
        eos_tokens_id=(), key=jax.random.key(4))
    out2, _ = speculative_generate_encoder_decoder(
        prompt, CFG, drafter, CFG, target, gamma=3, max_gen_len=14,
        eos_tokens_id=(), key=jax.random.key(4))
    assert out1 == out2
    assert 0.0 <= r1 <= 1.0


def test_codec_eos_stops():
    target = init_codec_params(CFG, jax.random.key(0), scale=0.4)
    prompt = [5, 9, 33, 2]
    free = autoregressive_generate_encoder_decoder(
        prompt, CFG, target, max_gen_len=12, eos_tokens_id=(),
        key=jax.random.key(5))
    eos = free[4]
    out = autoregressive_generate_encoder_decoder(
        prompt, CFG, target, max_gen_len=12, eos_tokens_id=eos,
        key=jax.random.key(6))
    assert out == free[:free.index(eos) + 1]
