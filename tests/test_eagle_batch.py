"""Batched EAGLE engine tests: determinism, ragged prompts, per-row EOS,
acceptance parity with the single-sequence loop (a feature-plumbing bug in
the batched catch-up/fbuf indexing would collapse a trained drafter's
acceptance), and first-token distribution preservation."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.eagle import init_eagle_params
from specdec_tpu.core.model import forward_full, init_params
from specdec_tpu.engine.eagle_batch import batch_eagle_generate
from specdec_tpu.engine.eagle_train import train_eagle
from specdec_tpu.sampling.eagle_speculative import eagle_generate
from specdec_tpu.sampling.processors import MultinomialProcessor

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=3, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2,
                  head_dim=8)
ECFG = CFG.replace(num_layers=1)

PROMPTS = [
    [3, 14, 15, 9, 2, 6],
    [1, 1, 2, 3, 5, 8, 13, 21],
    [27, 4, 11],
]


@pytest.fixture(scope="module")
def models(eagle_models):
    # shared session-scoped fixture (conftest.py): the 200-step training run
    # is paid once across the EAGLE test modules
    _, _, target, eagle, trained = eagle_models
    return target, eagle, trained


def test_batch_eagle_deterministic_ragged(models):
    target, eagle, _ = models
    outs1, rates = batch_eagle_generate(
        PROMPTS, ECFG, eagle, CFG, target, gamma=3, gen_len=20,
        eos_tokens_id=(), key=jax.random.key(5))
    outs2, _ = batch_eagle_generate(
        PROMPTS, ECFG, eagle, CFG, target, gamma=3, gen_len=20,
        eos_tokens_id=(), key=jax.random.key(5))
    assert outs1 == outs2
    for out, r in zip(outs1, rates):
        assert len(out) == 20
        assert all(0 <= t < VOCAB for t in out)
        assert 0.0 <= r <= 1.0


def test_batch_eagle_eos_per_row(models):
    """Re-running with an EOS drawn from row 1's output must truncate row 1
    at that EOS and leave rows whose outputs lack it at full length (same
    key => identical prefixes)."""
    target, eagle, _ = models
    full, _ = batch_eagle_generate(
        PROMPTS, ECFG, eagle, CFG, target, gamma=3, gen_len=20,
        eos_tokens_id=(), key=jax.random.key(8))
    eos = full[1][4]
    cut, _ = batch_eagle_generate(
        PROMPTS, ECFG, eagle, CFG, target, gamma=3, gen_len=20,
        eos_tokens_id=eos, key=jax.random.key(8))
    for b in range(len(PROMPTS)):
        if eos in full[b]:
            k = full[b].index(eos)
            assert cut[b] == full[b][:k + 1], f"row {b}"
        else:
            assert cut[b] == full[b], f"row {b}"


def test_batch_eagle_acceptance_parity_with_single(models):
    """A trained drafter's batched acceptance must track the single-sequence
    loop's (same drafting/verify algorithm; RNG streams differ, so compare
    means). A batched fbuf/catch-up indexing bug would feed the drafter wrong
    features and collapse this."""
    target, _, trained = models
    proc = MultinomialProcessor(temperature=1.0)

    single_rates = []
    for p in PROMPTS:
        for s in range(3):
            _, r = eagle_generate(p, ECFG, trained, CFG, target, gamma=4,
                                  max_gen_len=32, eos_tokens_id=(),
                                  logits_processor=proc,
                                  key=jax.random.key(50 + s))
            single_rates.append(r)
    batch_rates = []
    for s in range(3):
        _, rates = batch_eagle_generate(
            PROMPTS, ECFG, trained, CFG, target, gamma=4, gen_len=32,
            eos_tokens_id=(), logits_processor=proc,
            key=jax.random.key(60 + s))
        batch_rates.extend(rates)

    m_single = float(np.mean(single_rates))
    m_batch = float(np.mean(batch_rates))
    assert m_batch > 0.0
    assert abs(m_batch - m_single) < 0.15, (m_batch, m_single)
    # and training must actually matter in the batched path too
    _, rates0 = batch_eagle_generate(
        PROMPTS, ECFG, models[1], CFG, target, gamma=4, gen_len=32,
        eos_tokens_id=(), logits_processor=proc, key=jax.random.key(60))
    assert m_batch > float(np.mean(rates0))


def test_batch_eagle_first_token_distribution(models):
    """The first emitted token per row must follow the target's processed
    distribution (whole-batch accept/reject/residual path; same oracle as
    the single-sequence TV test, using B rows of the same prompt)."""
    target, eagle, _ = models
    proc = MultinomialProcessor(temperature=1.0)
    p = PROMPTS[0]
    B, n_calls = 8, 40

    samples = []
    for s in range(n_calls):
        outs, _ = batch_eagle_generate(
            [p] * B, ECFG, eagle, CFG, target, gamma=3, gen_len=1,
            eos_tokens_id=(), logits_processor=proc,
            key=jax.random.key(1000 + s))
        samples.extend(o[0] for o in outs)
    counts = np.bincount(np.asarray(samples), minlength=VOCAB) / len(samples)

    logits = forward_full(CFG, target, jnp.asarray(p)[None, :])
    want = np.asarray(proc(logits[0, -1]))
    tv = 0.5 * np.abs(counts - want).sum()
    assert tv < 0.12, f"TV distance {tv:.4f}"
