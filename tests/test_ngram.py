"""Unit tests for n-gram storage (hand-computed cases, ref semantics
ngram_assisted/ngram_storage.py) and NASD generation (greedy equivalence of
committed tokens with target argmax, store adaptation)."""
import jax
import numpy as np

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.ngram import (
    NGramStorage, OneLevelNGramStorage, ngram_assisted_speculative_generate,
)
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.sampling.processors import GreedyProcessor


def test_one_level_storage_argmax_counts():
    s = OneLevelNGramStorage(n=3, vocab_size=50)
    s.initialize([1, 2, 3, 1, 2, 4, 1, 2, 4])  # (1,2)->3 once, (1,2)->4 twice
    tok, known = s.next_token([9, 1, 2])
    assert known and tok == 4
    _, known = s.next_token([5, 6])
    assert not known
    assert s.has_gram([1, 2, 4])
    assert not s.has_gram([1, 2, 9])
    s.reset()
    _, known = s.next_token([1, 2])
    assert not known


def test_one_level_requires_full_context():
    s = OneLevelNGramStorage(n=4, vocab_size=50)
    s.initialize([7, 8, 9, 10])
    tok, known = s.next_token([7, 8, 9])
    assert known and tok == 10
    _, known = s.next_token([8, 9])  # too short for n-1=3
    assert not known


def test_backoff_storage_prefers_highest_order():
    s = NGramStorage(n=4, vocab_size=50)
    # order-3 context (1,2,3)->7 ; order-2 context (2,3)->9 twice
    s.update([0, 1, 2, 3], [7])
    s.update([9, 2, 3], [9])
    s.update([8, 2, 3], [9])
    tok, known = s.next_token([1, 2, 3])
    assert known and tok == 7  # order-3 hit wins over order-2
    tok, known = s.next_token([5, 2, 3])
    assert known and tok == 9  # falls back to order-2
    _, known = s.next_token([40, 41])
    assert not known


def test_backoff_storage_count_updates():
    s = NGramStorage(n=3, vocab_size=50)
    s.update([1, 2], [5])
    s.update([1, 2], [6])
    s.update([1, 2], [6])
    tok, known = s.next_token([1, 2])
    assert known and tok == 6
    assert s.has_gram([1, 2, 5])
    assert not s.has_gram([1, 2, 7])


def test_storage_unknown_token_in_vocab_range():
    s = NGramStorage(n=3, vocab_size=17)
    for _ in range(50):
        tok, known = s.next_token([1, 2])
        assert not known and 0 <= tok < 17


VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8)


def test_nasd_greedy_equivalence():
    """With greedy processing, NASD acceptance is 'target argmax agrees', so
    the committed sequence must equal target-AR greedy output regardless of
    draft quality (SURVEY.md §2.1 note on NASD acceptance)."""
    params = init_params(CFG, jax.random.key(0), scale=0.4)
    prompt = [3, 14, 15, 9, 2, 6, 14, 15]
    ar = autoregressive_generate(prompt, CFG, params, max_gen_len=20,
                                 eos_tokens_id=(), key=jax.random.key(1))
    store = NGramStorage(n=3, vocab_size=VOCAB)
    out, rate = ngram_assisted_speculative_generate(
        prompt, store, CFG, params, gamma=4, filler_top_k=3,
        max_gen_len=20, eos_tokens_id=(), key=jax.random.key(2))
    assert out == ar
    assert 0.0 <= rate <= 1.0


def test_batched_nasd_greedy_equivalence():
    """Batched NASD (one jitted verify per window for the whole batch) must
    emit each sequence's greedy-AR output — exact-match acceptance makes every
    committed token a target sample, independent of shared-store contents."""
    from specdec_tpu.ngram.assisted import batch_ngram_assisted_generate

    params = init_params(CFG, jax.random.key(0), scale=0.4)
    prompts = [[3, 14, 15, 9, 2, 6, 14, 15],
               [7, 1, 4, 4, 20],
               [11, 30, 2, 17, 9, 28, 5]]
    oracles = [autoregressive_generate(p, CFG, params, max_gen_len=18,
                                       eos_tokens_id=(), key=jax.random.key(1))
               for p in prompts]
    store = NGramStorage(n=3, vocab_size=VOCAB)
    outs, rates = batch_ngram_assisted_generate(
        prompts, store, CFG, params, gamma=4, filler_top_k=3, gen_len=18,
        eos_tokens_id=(), key=jax.random.key(2))
    assert outs == oracles
    assert all(0.0 <= r <= 1.0 for r in rates)


def test_batched_nasd_eos_and_ragged_lengths():
    """EOS inside a window stops that sequence only; remaining sequences keep
    generating to their caps."""
    from specdec_tpu.ngram.assisted import batch_ngram_assisted_generate

    params = init_params(CFG, jax.random.key(0), scale=0.4)
    prompts = [[3, 14, 15, 9], [7, 1, 4, 4, 20, 2, 6]]
    ar0 = autoregressive_generate(prompts[0], CFG, params, max_gen_len=16,
                                  eos_tokens_id=(), key=jax.random.key(1))
    eos = ar0[5]  # force an early stop for seq 0 at its 6th token
    store = NGramStorage(n=3, vocab_size=VOCAB)
    outs, _ = batch_ngram_assisted_generate(
        prompts, store, CFG, params, gamma=3, filler_top_k=2, gen_len=16,
        eos_tokens_id=eos, key=jax.random.key(2))
    assert outs[0] == ar0[:6]  # stopped at the EOS token, inclusive
    assert eos not in outs[1] or outs[1].index(eos) == len(outs[1]) - 1
    assert len(outs[1]) <= 16


def test_nasd_stop_if_unknown_and_store_growth():
    params = init_params(CFG, jax.random.key(0), scale=0.4)
    prompt = [3, 14, 15, 9, 2, 6]
    store = NGramStorage(n=3, vocab_size=VOCAB)
    out, _ = ngram_assisted_speculative_generate(
        prompt, store, CFG, params, gamma=4, filler_top_k=3,
        max_gen_len=15, eos_tokens_id=(), stop_if_unknown=True,
        key=jax.random.key(3))
    assert len(out) == 15
    assert len(store.counts.get(2, {})) > 0  # store adapted during generation


def test_native_storage_matches_python_on_random_stream():
    """The C++ store must agree with the Python reference store on
    next_token/has_gram after identical random update/initialize streams."""
    from specdec_tpu.ngram.native import NativeNGramStorage, native_available
    if not native_available():
        import pytest
        pytest.skip("native toolchain unavailable")

    import random
    rng = random.Random(0)
    py = NGramStorage(n=4, vocab_size=40)
    nat = NativeNGramStorage(n=4, vocab_size=40)

    seed_seq = [rng.randrange(40) for _ in range(120)]
    py.initialize(seed_seq)
    nat.initialize(seed_seq)

    for _ in range(300):
        ctx = [rng.randrange(40) for _ in range(rng.randrange(1, 8))]
        toks = [rng.randrange(40) for _ in range(rng.randrange(1, 4))]
        py.update(ctx, toks)
        nat.update(ctx, toks)

    hits = 0
    for _ in range(500):
        ctx = [rng.randrange(40) for _ in range(rng.randrange(1, 8))]
        pt, pk = py.next_token(ctx)
        nt, nk = nat.next_token(ctx)
        assert pk == nk, f"known mismatch on {ctx}"
        if pk:
            hits += 1
            assert pt == nt, f"token mismatch on {ctx}: py={pt} nat={nt}"
        gram = ctx + [rng.randrange(40)]
        assert py.has_gram(gram) == nat.has_gram(gram), f"has_gram {gram}"
    assert hits > 20  # the stream must actually exercise known contexts

    py.reset(); nat.reset()
    _, pk = py.next_token([1, 2, 3])
    _, nk = nat.next_token([1, 2, 3])
    assert not pk and not nk


def test_native_storage_drives_nasd():
    from specdec_tpu.ngram.native import NativeNGramStorage, native_available
    if not native_available():
        import pytest
        pytest.skip("native toolchain unavailable")
    params = init_params(CFG, jax.random.key(0), scale=0.4)
    prompt = [3, 14, 15, 9, 2, 6, 14, 15]
    ar = autoregressive_generate(prompt, CFG, params, max_gen_len=15,
                                 eos_tokens_id=(), key=jax.random.key(1))
    store = NativeNGramStorage(n=3, vocab_size=VOCAB)
    out, rate = ngram_assisted_speculative_generate(
        prompt, store, CFG, params, gamma=4, filler_top_k=3,
        max_gen_len=15, eos_tokens_id=(), key=jax.random.key(2))
    assert out == ar
    assert store.size() > 0
