"""EAGLE feature-drafter tests: forward shapes, cache/block consistency,
determinism, EOS truncation, exact output-distribution preservation (the
rejection-sampling oracle — holds for ANY drafter quality), and training
lift on both the teacher-forced proxy and deployed acceptance."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from specdec_tpu.core.cache import init_cache
from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.eagle import eagle_forward, init_eagle_params
from specdec_tpu.core.model import forward_full, init_params
from specdec_tpu.engine.eagle_train import (
    eagle_acceptance_proxy, teacher_feats_probs, train_eagle,
)
from specdec_tpu.sampling.eagle_speculative import _eagle_generate, eagle_generate
from specdec_tpu.sampling.processors import MultinomialProcessor
from specdec_tpu.sampling.utils import pad_to_bucket

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=3, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8)
ECFG = CFG.replace(num_layers=1)

PROMPT = [3, 14, 15, 9, 2, 6]


@pytest.fixture(scope="module")
def models():
    target = init_params(CFG, jax.random.key(0), scale=0.4)
    eagle = init_eagle_params(ECFG, jax.random.key(1))
    return target, eagle


def test_eagle_forward_shapes(models):
    target, eagle = models
    B, T, D = 2, 5, CFG.hidden_size
    tokens = jnp.arange(B * T, dtype=jnp.int32).reshape(B, T) % VOCAB
    feats = jnp.ones((B, T, D), CFG.dtype) * 0.1
    cache = init_cache(ECFG, B, 16)
    logits, f_hat, cache2 = eagle_forward(ECFG, eagle, target, tokens, feats,
                                          cache)
    assert logits.shape == (B, T, VOCAB)
    assert f_hat.shape == (B, T, D)
    assert np.all(np.asarray(cache2.length) == T)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_eagle_incremental_matches_block(models):
    """Feeding (token, feature) pairs one at a time through the cache must
    reproduce the single-block forward (same invariance the main model's
    decode path relies on)."""
    target, eagle = models
    T, D = 6, CFG.hidden_size
    tokens = (jnp.arange(T, dtype=jnp.int32) * 5 + 1)[None, :] % VOCAB
    feats = jax.random.normal(jax.random.key(3), (1, T, D), CFG.dtype)

    logits_blk, fhat_blk, _ = eagle_forward(
        ECFG, eagle, target, tokens, feats, init_cache(ECFG, 1, T))

    cache = init_cache(ECFG, 1, T)
    outs = []
    for t in range(T):
        lo, fh, cache = eagle_forward(ECFG, eagle, target,
                                      tokens[:, t:t + 1], feats[:, t:t + 1],
                                      cache)
        outs.append(np.asarray(lo[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(logits_blk[0]),
                               rtol=2e-4, atol=2e-4)


def test_eagle_greedy_deterministic_full_length(models):
    """As with a distinct standalone drafter (test_speculative.py), greedy
    acceptance is probabilistic (r vs softmax ratio, ref :139-145) so exact
    AR equality is NOT guaranteed — the guarantees are determinism per key,
    full length, in-vocab tokens, and a sane acceptance rate. The exact
    output-distribution oracle is test_eagle_output_distribution_preserved."""
    target, eagle = models
    for gamma in (1, 3, 5):
        out1, rate = eagle_generate(
            PROMPT, ECFG, eagle, CFG, target, gamma=gamma, max_gen_len=30,
            eos_tokens_id=(), key=jax.random.key(6))
        out2, _ = eagle_generate(
            PROMPT, ECFG, eagle, CFG, target, gamma=gamma, max_gen_len=30,
            eos_tokens_id=(), key=jax.random.key(6))
        assert out1 == out2, f"gamma={gamma}"
        assert len(out1) == 30
        assert all(0 <= t < VOCAB for t in out1)
        assert 0.0 <= rate <= 1.0


def test_eagle_no_first_target(models):
    target, eagle = models
    out, _ = eagle_generate(
        PROMPT, ECFG, eagle, CFG, target, gamma=3, max_gen_len=16,
        eos_tokens_id=(), first_target=False, key=jax.random.key(7))
    assert len(out) == 16
    assert all(0 <= t < VOCAB for t in out)


def test_eagle_eos_truncation(models):
    """Re-running with an EOS id drawn from a previous run's output must
    reproduce the prefix and stop at the first EOS (ref :149-155)."""
    target, eagle = models
    full, _ = eagle_generate(
        PROMPT, ECFG, eagle, CFG, target, gamma=3, max_gen_len=20,
        eos_tokens_id=(), key=jax.random.key(10))
    eos = full[5]
    first_eos = full.index(eos)
    out, _ = eagle_generate(
        PROMPT, ECFG, eagle, CFG, target, gamma=3, max_gen_len=20,
        eos_tokens_id=eos, key=jax.random.key(10))
    assert out == full[:first_eos + 1]


def test_eagle_output_distribution_preserved(models):
    """First emitted token through the accept/reject/residual path must be
    distributed as the target's processed distribution (TV-distance check,
    same oracle as test_speculative.py)."""
    target, eagle = models
    proc = MultinomialProcessor(temperature=1.0)
    prompt, n = pad_to_bucket(PROMPT, 0)

    n_runs = 2500
    keys = jax.random.split(jax.random.key(42), n_runs)

    def one(key):
        packed, _ = _eagle_generate(
            ECFG, eagle, CFG, target, prompt, jnp.int32(n),
            3, 1, proc, (), False, False, key)
        return packed[n]

    tokens = np.asarray(jax.vmap(one)(keys))
    counts = np.bincount(tokens, minlength=VOCAB) / n_runs

    logits = forward_full(CFG, target, jnp.asarray(PROMPT)[None, :])
    p = np.asarray(proc(logits[0, -1]))
    tv = 0.5 * np.abs(counts - p).sum()
    assert tv < 0.06, f"TV distance {tv:.4f}"


def test_eagle_training_lifts_acceptance(models):
    """A short training run must lift both the teacher-forced acceptance
    proxy and the deployed e2e acceptance over the untrained drafter."""
    target, eagle0 = models
    probe = jax.random.randint(jax.random.key(99), (4, 48), 1, VOCAB)
    acc0, _ = eagle_acceptance_proxy(CFG, ECFG, eagle0, target, probe)

    trained, acc1 = train_eagle(
        CFG, target, ECFG, eagle0, steps=200, batch_size=8, seq_len=48,
        learning_rate=5e-3, cls_weight=1.0, key=jax.random.key(11))
    assert acc1 > float(acc0) + 0.1, (acc1, float(acc0))

    proc = MultinomialProcessor(temperature=1.0)

    def mean_rate(params):
        rates = []
        for s in range(6):
            _, r = eagle_generate(PROMPT, ECFG, params, CFG, target, gamma=4,
                                  max_gen_len=40, eos_tokens_id=(),
                                  logits_processor=proc,
                                  key=jax.random.key(100 + s))
            rates.append(r)
        return sum(rates) / len(rates)

    rate0, rate1 = mean_rate(eagle0), mean_rate(trained)
    assert rate1 > rate0, (rate1, rate0)


def test_teacher_feats_probs_consistency(models):
    """Features returned by the teacher pass must reproduce its own probs
    through the shared head (the EAGLE training fixed point)."""
    target, _ = models
    tokens = jax.random.randint(jax.random.key(1), (2, 10), 1, VOCAB)
    feats, probs = teacher_feats_probs(CFG, target, tokens)
    from specdec_tpu.core.model import _norm
    h = _norm(CFG, feats, target["final_norm_w"], target.get("final_norm_b"))
    logits = jnp.einsum("btd,dv->btv", h, target["lm_head"]
                        ) if "lm_head" in target else None
    assert logits is not None
    np.testing.assert_allclose(np.asarray(jax.nn.softmax(logits, -1)),
                               np.asarray(probs), rtol=1e-4, atol=1e-5)


def test_eagle_rollout_training_runs_and_lifts(models):
    """HASS-style multi-step training (rollout_steps=2): the unrolled loss
    must train at least as well as a short teacher-forced run from the same
    init (it optimizes the deployed conditioning directly). Positions of
    pass k>=2 sit at their TRUE rope offsets (k-1..L-2)."""
    target, eagle0 = models
    probe = jax.random.randint(jax.random.key(99), (4, 48), 1, VOCAB)
    acc0, _ = eagle_acceptance_proxy(CFG, ECFG, eagle0, target, probe)
    trained, acc = train_eagle(
        CFG, target, ECFG, eagle0, steps=200, batch_size=8, seq_len=48,
        learning_rate=5e-3, cls_weight=1.0, rollout_steps=2,
        key=jax.random.key(11))
    assert np.isfinite(acc)
    assert acc > float(acc0) + 0.1, (acc, float(acc0))
