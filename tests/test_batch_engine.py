"""Tests for the batched engine: batched results must agree with the
single-sequence paths (same algorithms, vectorized), handle ragged prompt
lengths, per-seq EOS, and per-seq acceptance accounting."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.engine.batch_engine import (
    batch_autoregressive_generate, batch_speculative_generate,
)
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.sampling.processors import GreedyProcessor

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8)


@pytest.fixture(scope="module")
def models():
    target = init_params(CFG, jax.random.key(0), scale=0.4)
    noise = init_params(CFG, jax.random.key(1), scale=0.1)
    drafter = jax.tree.map(lambda a, b: a + b, target, noise)
    return target, drafter


PROMPTS = [
    [3, 14, 15, 9, 2, 6],
    [1, 1, 2, 3, 5, 8, 13, 21],
    [27, 4],
]


def test_batch_ar_matches_single_ar(models):
    """Greedy batched AR must equal per-sequence greedy AR despite ragged
    prompt lengths (per-seq cache offsets)."""
    target, _ = models
    batch = batch_autoregressive_generate(
        PROMPTS, CFG, target, gen_len=16, eos_tokens_id=(),
        key=jax.random.key(3))
    for i, p in enumerate(PROMPTS):
        solo = autoregressive_generate(p, CFG, target, max_gen_len=16,
                                       eos_tokens_id=(), key=jax.random.key(4))
        assert batch[i] == solo, f"seq {i} diverged"


def test_batch_spec_self_draft_matches_ar(models):
    """Self-drafting batched spec with greedy => all accepted, equals AR."""
    target, _ = models
    ar = batch_autoregressive_generate(
        PROMPTS, CFG, target, gen_len=18, eos_tokens_id=(),
        key=jax.random.key(5))
    outs, rates = batch_speculative_generate(
        PROMPTS, CFG, target, CFG, target, gamma=4, gen_len=18,
        eos_tokens_id=(), key=jax.random.key(6))
    assert outs == ar
    assert all(r == 1.0 for r in rates)


def test_batch_spec_distinct_drafter(models):
    target, drafter = models
    outs, rates = batch_speculative_generate(
        PROMPTS, CFG, drafter, CFG, target, gamma=4, gen_len=20,
        eos_tokens_id=(), key=jax.random.key(7))
    assert all(len(o) == 20 for o in outs)
    assert all(0.0 <= r <= 1.0 for r in rates)
    # determinism
    outs2, _ = batch_speculative_generate(
        PROMPTS, CFG, drafter, CFG, target, gamma=4, gen_len=20,
        eos_tokens_id=(), key=jax.random.key(7))
    assert outs == outs2


def test_batch_per_seq_eos(models):
    """Each sequence stops at its own EOS; finished sequences' buffers are
    not mutated by later windows."""
    target, _ = models
    free = batch_autoregressive_generate(
        PROMPTS, CFG, target, gen_len=16, eos_tokens_id=(),
        key=jax.random.key(8))
    # choose the 4th generated token of sequence 0 as the EOS token
    eos = free[0][3]
    outs, _ = batch_speculative_generate(
        PROMPTS, CFG, target, CFG, target, gamma=3, gen_len=16,
        eos_tokens_id=eos, key=jax.random.key(9))
    ar = batch_autoregressive_generate(
        PROMPTS, CFG, target, gen_len=16, eos_tokens_id=eos,
        key=jax.random.key(10))
    assert outs == ar
    for o in outs:
        if eos in o:
            assert o.index(eos) == len(o) - 1  # truncated at first EOS


def test_batch_ttft_callback(models):
    target, drafter = models
    seen = []
    batch_speculative_generate(
        PROMPTS, CFG, drafter, CFG, target, gamma=3, gen_len=8,
        eos_tokens_id=(), key=jax.random.key(11),
        first_token_callback=seen.append)
    assert sorted(seen) == [0, 1, 2]
