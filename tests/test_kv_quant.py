"""INT8 KV-cache tests (cfg.kv_quant = "int8", core/cache.py QuantKVCache).

The design keeps quantization error OUT of the decode-path invariants:
attention consumes the int8 values exactly as stored (k-scales applied
after the q·k dot, v-scales folded into the probs), so every oracle that
compares two paths running the SAME cache format must hold bit-exactly —
self-draft spec == AR, tree == AR, serving == standalone — while accuracy
vs the unquantized cache is a bounded-error statement.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from specdec_tpu.core.cache import KVCache, QuantKVCache, init_cache
from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import forward_step, init_params
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.sampling.speculative import speculative_generate

VOCAB = 64
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=64,
                  intermediate_size=128, num_heads=4, num_kv_heads=2,
                  head_dim=16)
QCFG = CFG.replace(kv_quant="int8")
TARGET = init_params(CFG, jax.random.key(0), scale=0.3)
PROMPT = [5, 9, 33, 2, 41, 7]


def test_quant_cache_construction_and_rollback():
    c = init_cache(QCFG, 2, 32)
    assert isinstance(c, QuantKVCache)
    assert c.k.dtype == jnp.int8 and c.v.dtype == jnp.int8
    assert c.k_scale.shape == c.k.shape[:-1]
    c2 = c.with_length(jnp.asarray([5, 7], jnp.int32)).rolled_back(3)
    assert list(np.asarray(c2.length)) == [2, 4]
    assert isinstance(init_cache(CFG, 2, 32), KVCache)


def test_quant_forward_accuracy_bounded():
    """Prefill logits with the int8 cache must track the exact cache within
    a few percent (per-(position, head) absmax scaling)."""
    toks = jnp.asarray([PROMPT])
    lo_d, _ = forward_step(CFG, TARGET, toks, init_cache(CFG, 1, 32))
    lo_q, _ = forward_step(QCFG, TARGET, toks, init_cache(QCFG, 1, 32))
    err = float(jnp.max(jnp.abs(lo_q - lo_d)) / jnp.max(jnp.abs(lo_d)))
    assert err < 0.08, err


def test_quant_ar_and_self_draft_oracle():
    """Greedy self-draft spec over int8 KV == greedy AR over int8 KV with
    acceptance 1.0 (both paths consume identical quantized state)."""
    ar = autoregressive_generate(PROMPT, QCFG, TARGET, max_gen_len=24,
                                 eos_tokens_id=())
    assert len(ar) == 24 and all(0 <= t < VOCAB for t in ar)
    spec, rate = speculative_generate(PROMPT, QCFG, TARGET, QCFG, TARGET,
                                      gamma=4, max_gen_len=24,
                                      eos_tokens_id=())
    assert spec == ar and rate == 1.0


def test_quant_tree_oracle():
    """Greedy tree speculation over int8 KV == greedy AR over int8 KV — the
    accepted-path compaction must move the SCALES along with the values (a
    scale/value mismatch poisons later windows' prefix attention)."""
    from specdec_tpu.sampling.tree_speculative import tree_speculative_generate
    ar = autoregressive_generate(PROMPT, QCFG, TARGET, max_gen_len=24,
                                 eos_tokens_id=())
    out, _ = tree_speculative_generate(PROMPT, QCFG, TARGET, QCFG, TARGET,
                                       branching=(2, 2), max_gen_len=24,
                                       eos_tokens_id=())
    assert out == ar


def test_quant_eagle_chain_runs():
    """EAGLE chain decode with int8 KV on BOTH caches (the eagle cfg derives
    from the target cfg, so kv_quant flows to the drafter cache too)."""
    from specdec_tpu.core.eagle import init_eagle_params
    from specdec_tpu.sampling.eagle_speculative import eagle_generate
    ecfg = QCFG.replace(num_layers=1)
    ep = init_eagle_params(ecfg, jax.random.key(1))
    out, rate = eagle_generate(PROMPT, ecfg, ep, QCFG, TARGET, gamma=3,
                               max_gen_len=16, eos_tokens_id=(),
                               key=jax.random.key(2))
    assert len(out) == 16
    assert 0.0 <= rate <= 1.0


def test_quant_batched_matches_single():
    """Batched greedy AR over int8 KV equals single-sequence greedy AR over
    int8 KV per row (ragged lengths; install/scatter paths)."""
    from specdec_tpu.engine.batch_engine import batch_autoregressive_generate
    prompts = [PROMPT, [1, 1, 2, 3, 5, 8, 13, 21], [27, 4]]
    batch = batch_autoregressive_generate(prompts, QCFG, TARGET, gen_len=12,
                                          eos_tokens_id=(),
                                          key=jax.random.key(3))
    for i, p in enumerate(prompts):
        solo = autoregressive_generate(p, QCFG, TARGET, max_gen_len=12,
                                       eos_tokens_id=())
        assert batch[i] == solo, f"seq {i}"


def test_quant_serving_matches_standalone():
    """Continuous batching over int8 KV == standalone greedy AR (int8) per
    request — exercises install_slot on QuantKVCache (values + scales)."""
    from specdec_tpu.serve import ContinuousBatcher
    prompts = [PROMPT, [1, 1, 2, 3, 5, 8, 13, 21], [27, 4, 9]]
    cb = ContinuousBatcher(QCFG, TARGET, QCFG, TARGET, num_slots=2, gamma=3,
                           max_prompt_len=64, max_new_tokens=10,
                           eos_tokens_id=())
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    for rid, p in zip(ids, prompts):
        want = autoregressive_generate(p, QCFG, TARGET, max_gen_len=10,
                                       eos_tokens_id=())
        assert done[rid].output_ids == want, f"request {rid}"


def test_quant_loader_env_surface(monkeypatch):
    from specdec_tpu.engine.model_loader import load_models
    b = load_models("synthetic:tiny", "layerskip:2", kv_quant="int8")
    assert b["target"]["cfg"].kv_quant == "int8"
    assert b["drafter"]["cfg"].kv_quant == "int8"
    b2 = load_models("synthetic:tiny")
    assert b2["target"]["cfg"].kv_quant == "none"


def test_quant_kv_nll_close_to_exact_cache():
    """Quality gate for the KV quantization itself: per-token NLL computed
    through the CACHED forward (the path that actually consumes quantized
    K/V) must sit within a small relative delta of the exact-cache NLL —
    the KV analog of the weight-quant ppl gates in tests/test_evaluate.py."""
    rng = np.random.default_rng(0)
    seqs = [rng.integers(1, VOCAB, size=n).tolist() for n in (9, 14, 20)]

    def cached_nll(cfg):
        total, n_tok = 0.0, 0
        for s in seqs:
            toks = jnp.asarray([s])
            logits, _ = forward_step(cfg, TARGET, toks,
                                     init_cache(cfg, 1, len(s) + 2))
            lp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), -1)
            total -= float(jnp.sum(lp[jnp.arange(len(s) - 1),
                                      jnp.asarray(s[1:])]))
            n_tok += len(s) - 1
        return total / n_tok

    exact = cached_nll(CFG)
    quant = cached_nll(QCFG)
    assert abs(quant - exact) / exact < 0.05, (exact, quant)
