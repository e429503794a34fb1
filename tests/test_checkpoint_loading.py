"""End-to-end checkpoint loading: save a real HF checkpoint dir (config.json +
safetensors + tokenizer.json) locally and load it through the harness's
load_models — the same path a user takes with downloaded checkpoints."""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    d = tmp_path_factory.mktemp("ckpt")
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=300, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        tie_word_embeddings=False, eos_token_id=2, bos_token_id=1,
        pad_token_id=0,
    )
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(d)

    # minimal fast tokenizer (byte-level BPE over a toy alphabet)
    from tokenizers import Tokenizer, models, pre_tokenizers
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    from tokenizers.trainers import BpeTrainer
    trainer = BpeTrainer(vocab_size=300,
                         special_tokens=["<pad>", "<s>", "</s>", "<unk>"])
    tok.train_from_iterator(
        ["the quick brown fox jumps over the lazy dog"] * 50, trainer)
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "eos_token": "</s>", "pad_token": "<pad>", "unk_token": "<unk>",
    }))
    return str(d), model


def test_load_models_from_local_checkpoint(checkpoint_dir):
    from specdec_tpu.engine.model_loader import load_models

    path, hf_model = checkpoint_dir
    bundle = load_models(path, path, dtype=jnp.float32)
    cfg = bundle["target"]["cfg"]
    assert cfg.vocab_size == 300
    assert cfg.num_layers == 2
    assert bundle["end_tokens"], "eos must be discovered from the tokenizer"

    # loaded logits must match the torch model
    import torch
    from specdec_tpu.core.model import forward_full
    toks = np.asarray([[5, 9, 33, 2, 41]], np.int32)
    ours = np.asarray(forward_full(cfg, bundle["target"]["params"],
                                   jnp.asarray(toks)))
    with torch.no_grad():
        theirs = hf_model(torch.tensor(toks)).logits.float().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_generation_from_local_checkpoint(checkpoint_dir):
    from specdec_tpu.engine.infer_engine import tokenize_batch
    from specdec_tpu.engine.model_loader import load_models
    from specdec_tpu.sampling.speculative import speculative_generate

    path, _ = checkpoint_dir
    bundle = load_models(path, path, dtype=jnp.float32)
    ids = tokenize_batch(bundle["tokenizer"],
                         ["the quick brown fox"], 64, chat=False)[0]
    assert len(ids) > 0
    out, rate = speculative_generate(
        ids, bundle["drafter"]["cfg"], bundle["drafter"]["params"],
        bundle["target"]["cfg"], bundle["target"]["params"], gamma=3,
        max_gen_len=8, eos_tokens_id=bundle["end_tokens"],
        pad_token_id=bundle["pad_token_id"], key=jax.random.key(0))
    assert 0 < len(out) <= 8
    assert rate == 1.0  # self-draft greedy
    text = bundle["tokenizer"].decode(out, skip_special_tokens=True)
    assert isinstance(text, str)


def test_layerskip_drafter_spec():
    """DRAFTER_MODEL=layerskip:k builds the drafter from the target's first
    k layers — dense and quantized — and greedy self-speculation works
    through the bundle (quantized containers slice uniformly; the drafter
    SHARES the target's layer buffers)."""
    from specdec_tpu.engine.model_loader import load_models
    from specdec_tpu.sampling.base_decoding import autoregressive_generate
    from specdec_tpu.sampling.speculative import speculative_generate

    for quant in ("none", "int8"):
        bundle = load_models("synthetic:tiny", "layerskip:2",
                             quantization=quant, drafter_quantization=quant)
        t, d = bundle["target"], bundle["drafter"]
        assert d["cfg"].num_layers == 2
        prompt = [5, 9, 33, 2, 41, 7]
        out, rate = speculative_generate(
            prompt, d["cfg"], d["params"], t["cfg"], t["params"], gamma=3,
            max_gen_len=10, eos_tokens_id=(), key=jax.random.key(1))
        ar = autoregressive_generate(prompt, t["cfg"], t["params"],
                                     max_gen_len=10, eos_tokens_id=())
        assert len(out) == 10
        # a 2-of-4-layer prefix drafter is aligned but not exact:
        # acceptance is a real number in (0, 1]
        assert 0.0 <= rate <= 1.0
        assert out is not None and ar is not None


def test_damped_layerskip_preset_accepts():
    """synthetic:<preset>-ls<k> + layerskip:<k> reproduces the measured
    self-speculative operating point through the loader: acceptance well
    above the ~0 of an undamped random pair."""
    from specdec_tpu.engine.model_loader import load_models
    from specdec_tpu.sampling.processors import MultinomialProcessor
    from specdec_tpu.sampling.speculative import speculative_generate

    b = load_models("synthetic:tiny-ls2", "layerskip:2", quantization="int8",
                    drafter_quantization="int8")
    t, d = b["target"], b["drafter"]
    out, rate = speculative_generate(
        [5, 9, 33, 2, 41, 7], d["cfg"], d["params"], t["cfg"], t["params"],
        gamma=4, max_gen_len=32, eos_tokens_id=(),
        logits_processor=MultinomialProcessor(1.0), key=jax.random.key(1))
    assert len(out) == 32
    assert rate > 0.3, rate


def test_trained_drafter_checkpoint_roundtrip(tmp_path):
    """save_params/load_params must round-trip a trained EAGLE head exactly
    (dtypes included), and eagle:<dir> must load it through load_models."""
    from specdec_tpu.core.config import tiny_config
    from specdec_tpu.core.eagle import init_eagle_params
    from specdec_tpu.core.model import init_params
    from specdec_tpu.engine.checkpoint import load_params, save_params
    from specdec_tpu.engine.eagle_train import train_eagle

    cfg = tiny_config(vocab_size=32, num_layers=3, hidden_size=32,
                      intermediate_size=64, num_heads=4, num_kv_heads=2,
                      head_dim=8)
    ecfg = cfg.replace(num_layers=1)
    target = init_params(cfg, jax.random.key(0), scale=0.4)
    eagle = init_eagle_params(ecfg, jax.random.key(1))
    trained, _ = train_eagle(cfg, target, ecfg, eagle, steps=5, batch_size=2,
                             seq_len=16, key=jax.random.key(2))

    path = save_params(str(tmp_path / "eagle_head"), trained)
    back = load_params(path)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(trained),
            jax.tree_util.tree_leaves_with_path(back)):
        assert ka == kb
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(FileNotFoundError):
        load_params(str(tmp_path / "missing"))


def test_eagle_checkpoint_loader_spec(tmp_path, monkeypatch):
    """DRAFTER_MODEL=eagle:<dir> restores a saved head (depth inferred from
    the stacked layer axis) and generation runs through it."""
    from specdec_tpu.engine.model_loader import load_models
    from specdec_tpu.sampling.eagle_speculative import eagle_generate

    # train-and-save via the loader's own path (EAGLE_SAVE)
    save_dir = str(tmp_path / "head")
    monkeypatch.setenv("EAGLE_SAVE", save_dir)
    monkeypatch.setenv("EAGLE_TRAIN_BATCH", "2")
    monkeypatch.setenv("EAGLE_TRAIN_SEQ", "16")
    b1 = load_models("synthetic:tiny", "eagle:1@3")
    monkeypatch.delenv("EAGLE_SAVE")

    b2 = load_models("synthetic:tiny", f"eagle:{save_dir}")
    assert b2["drafter"]["eagle"]
    assert b2["drafter"]["cfg"].num_layers == 1
    for a, b in zip(jax.tree.leaves(b1["drafter"]["params"]),
                    jax.tree.leaves(b2["drafter"]["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out, rate = eagle_generate(
        [5, 9, 33, 2], b2["drafter"]["cfg"], b2["drafter"]["params"],
        b2["target"]["cfg"], b2["target"]["params"], gamma=3, max_gen_len=8,
        eos_tokens_id=(), key=jax.random.key(3))
    assert len(out) == 8
