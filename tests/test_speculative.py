"""Correctness tests for the speculative decoding core (SURVEY.md §4 plan):
greedy equivalence with the AR baseline, exact output-distribution preservation
(the Leviathan/Chen guarantee), full acceptance under self-drafting, EOS
truncation, and length-cap behavior."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import forward_full, init_params
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.sampling.processors import GreedyProcessor, MultinomialProcessor
from specdec_tpu.sampling.speculative import _spec_generate, speculative_generate
from specdec_tpu.sampling.utils import pad_to_bucket


VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8)


@pytest.fixture(scope="module")
def models():
    key = jax.random.key(0)
    target = init_params(CFG, key, scale=0.4)
    # drafter = perturbed target → correlated but distinct proposal dist
    noise = init_params(CFG, jax.random.key(1), scale=0.1)
    drafter = jax.tree.map(lambda a, b: a + b, target, noise)
    return target, drafter


PROMPT = [3, 14, 15, 9, 2, 6]


def test_greedy_equivalence_self_draft(models):
    """Reference acceptance is probabilistic even under GreedyProcessor
    (r vs softmax-ratio, ref :139-145), so AR equality is only guaranteed when
    drafter == target (ratio ≡ 1 → always accept → argmax chain). That case
    must match target-AR token-for-token."""
    target, _ = models
    ar = autoregressive_generate(PROMPT, CFG, target, max_gen_len=30,
                                 eos_tokens_id=(), key=jax.random.key(5))
    spec, rate = speculative_generate(
        PROMPT, CFG, target, CFG, target, gamma=4, max_gen_len=30,
        eos_tokens_id=(), key=jax.random.key(6))
    assert spec == ar
    assert rate == 1.0


def test_greedy_distinct_drafter_deterministic(models):
    """With a distinct drafter the greedy-spec output is stochastic across keys
    but must be deterministic for a fixed key, full-length, and in-vocab."""
    target, drafter = models
    out1, rate = speculative_generate(
        PROMPT, CFG, drafter, CFG, target, gamma=4, max_gen_len=30,
        eos_tokens_id=(), key=jax.random.key(6))
    out2, _ = speculative_generate(
        PROMPT, CFG, drafter, CFG, target, gamma=4, max_gen_len=30,
        eos_tokens_id=(), key=jax.random.key(6))
    assert out1 == out2
    assert len(out1) == 30
    assert all(0 <= t < VOCAB for t in out1)
    assert 0.0 <= rate <= 1.0


def test_self_draft_full_acceptance(models):
    """drafter == target with greedy sampling → every draft accepted."""
    target, _ = models
    spec, rate = speculative_generate(
        PROMPT, CFG, target, CFG, target, gamma=4, max_gen_len=24,
        eos_tokens_id=(), key=jax.random.key(7))
    assert rate == 1.0
    assert len(spec) == 24


def test_output_distribution_preserved(models):
    """The first token emitted through the accept/reject/residual path must be
    distributed exactly as the target's processed distribution (chi-square-ish
    TV-distance check over a toy vocab, SURVEY.md §4(c))."""
    target, drafter = models
    proc = MultinomialProcessor(temperature=1.0)
    prompt, n = pad_to_bucket(PROMPT, 0)

    n_runs = 2500
    keys = jax.random.split(jax.random.key(42), n_runs)

    def one(key):
        packed, _ = _spec_generate(
            CFG, drafter, CFG, target, prompt, jnp.int32(n),
            3, 1, proc, (), False, False, key)
        return packed[n]   # first generated token (stats ride at the tail)

    tokens = np.asarray(jax.vmap(one)(keys))
    counts = np.bincount(tokens, minlength=VOCAB) / n_runs

    logits = forward_full(CFG, target, jnp.asarray(PROMPT)[None, :])
    p = np.asarray(proc(logits[0, -1]))
    tv = 0.5 * np.abs(counts - p).sum()
    assert tv < 0.06, f"TV distance {tv:.4f} (spec output dist != target dist)"


def test_skip_sample_adjustment_still_targetish(models):
    target, drafter = models
    spec, rate = speculative_generate(
        PROMPT, CFG, drafter, CFG, target, gamma=4, max_gen_len=10,
        eos_tokens_id=(), skip_sample_adjustment=True, key=jax.random.key(8))
    assert len(spec) == 10


def test_eos_truncation(models):
    """Pick the 6th greedy token as 'EOS': both AR and (self-draft) spec must
    stop there with identical prefixes (EOS-in-drafts early-return, ref :149-155)."""
    target, _ = models
    full = autoregressive_generate(PROMPT, CFG, target, max_gen_len=20,
                                   eos_tokens_id=(), key=jax.random.key(9))
    eos = full[5]
    first_eos = full.index(eos)
    ar = autoregressive_generate(PROMPT, CFG, target, max_gen_len=20,
                                 eos_tokens_id=eos, key=jax.random.key(9))
    spec, _ = speculative_generate(
        PROMPT, CFG, target, CFG, target, gamma=3, max_gen_len=20,
        eos_tokens_id=eos, key=jax.random.key(10))
    assert ar == full[:first_eos + 1]
    assert spec == ar


def test_length_cap(models):
    target, drafter = models
    for gamma in (1, 3, 5):
        spec, _ = speculative_generate(
            PROMPT, CFG, drafter, CFG, target, gamma=gamma, max_gen_len=13,
            eos_tokens_id=(), key=jax.random.key(11))
        assert len(spec) == 13


def test_first_target_false(models):
    target, _ = models
    ar = autoregressive_generate(PROMPT, CFG, target, max_gen_len=12,
                                 eos_tokens_id=(), key=jax.random.key(12))
    spec, _ = speculative_generate(
        PROMPT, CFG, target, CFG, target, gamma=4, max_gen_len=12,
        eos_tokens_id=(), first_target=False, key=jax.random.key(13))
    assert spec == ar


def test_single_token_prompt(models):
    """Shortest valid prompt: with first_target=True the two-token first
    draft step reads buf[pos-2] = buf[0], which exists even for a one-token
    prompt (first_target=False is documented to require prompt_len >= 2)."""
    target, _ = models
    ar = autoregressive_generate([7], CFG, target, max_gen_len=10,
                                 eos_tokens_id=(), key=jax.random.key(20))
    spec, rate = speculative_generate(
        [7], CFG, target, CFG, target, gamma=3, max_gen_len=10,
        eos_tokens_id=(), key=jax.random.key(21))
    assert spec == ar
    assert rate == 1.0


def test_first_target_false_requires_two_token_prompt():
    import pytest as _pytest

    params = init_params(CFG, jax.random.key(0), scale=0.3)
    with _pytest.raises(ValueError, match="first_target=False"):
        speculative_generate([7], CFG, params, CFG, params, gamma=2,
                             max_gen_len=4, eos_tokens_id=(),
                             first_target=False, key=jax.random.key(1))
    # >=2 tokens works
    out, _ = speculative_generate([7, 9], CFG, params, CFG, params, gamma=2,
                                  max_gen_len=4, eos_tokens_id=(),
                                  first_target=False, key=jax.random.key(1))
    assert len(out) == 4
