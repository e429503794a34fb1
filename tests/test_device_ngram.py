"""Device-resident n-gram table + fully-jitted NASD loop tests."""
import numpy as np
import jax
import jax.numpy as jnp

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.ngram.device_table import (
    init_device_table, table_lookup, table_seed, table_update,
)
from specdec_tpu.ngram.device_assisted import device_ngram_assisted_generate
from specdec_tpu.sampling.base_decoding import autoregressive_generate

VOCAB = 64
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=64,
                  intermediate_size=128, num_heads=4, num_kv_heads=2,
                  head_dim=16)
PARAMS = init_params(CFG, jax.random.key(0), scale=0.3)
KEY = jax.random.key(9)


def test_table_update_lookup_roundtrip():
    t = init_device_table(n=3, capacity=256)
    t = table_update(t, jnp.asarray([5, 9], jnp.int32), jnp.int32(33))
    tok, known = table_lookup(t, jnp.asarray([5, 9], jnp.int32), KEY, VOCAB)
    assert bool(known) and int(tok) == 33
    # unknown context -> known False, token in range
    tok2, known2 = table_lookup(t, jnp.asarray([7, 8], jnp.int32), KEY, VOCAB)
    assert not bool(known2) and 0 <= int(tok2) < VOCAB


def test_table_backoff_and_recency():
    t = init_device_table(n=3, capacity=256)
    # only the order-2 table knows context [.., 9]
    t = table_update(t, jnp.asarray([-1, 9], jnp.int32), jnp.int32(12))
    tok, known = table_lookup(t, jnp.asarray([4, 9], jnp.int32), KEY, VOCAB)
    # order-3 misses ([4,9] not stored), order-2 hits ([9] -> 12)
    assert bool(known) and int(tok) == 12
    # higher order wins over lower order once present
    t = table_update(t, jnp.asarray([4, 9], jnp.int32), jnp.int32(55))
    tok, known = table_lookup(t, jnp.asarray([4, 9], jnp.int32), KEY, VOCAB)
    assert bool(known) and int(tok) == 55
    # recency: a later update overwrites
    t = table_update(t, jnp.asarray([4, 9], jnp.int32), jnp.int32(56))
    tok, _ = table_lookup(t, jnp.asarray([4, 9], jnp.int32), KEY, VOCAB)
    assert int(tok) == 56


def test_table_seed_reproduces_prompt_grams():
    prompt = jnp.asarray([3, 7, 11, 3, 7, 11, 3, 7], jnp.int32)
    t = init_device_table(n=3, capacity=256)
    t = table_seed(t, prompt, jnp.int32(8))
    tok, known = table_lookup(t, jnp.asarray([3, 7], jnp.int32), KEY, VOCAB)
    assert bool(known) and int(tok) == 11
    tok, known = table_lookup(t, jnp.asarray([7, 11], jnp.int32), KEY, VOCAB)
    assert bool(known) and int(tok) == 3


def test_device_nasd_greedy_equals_ar():
    """Exact-match acceptance emits only the target's own samples, so greedy
    device-NASD output must equal greedy AR token-for-token — for ANY table
    contents (the same oracle as host NASD)."""
    prompt = [5, 9, 33, 2, 41, 7]
    ar = autoregressive_generate(prompt, CFG, PARAMS, max_gen_len=24,
                                 eos_tokens_id=())
    out, rate, table = device_ngram_assisted_generate(
        prompt, CFG, PARAMS, n=3, gamma=4, max_gen_len=24, eos_tokens_id=(),
        key=jax.random.key(1))
    assert out == ar
    assert 0.0 <= rate <= 1.0
    # table accumulated the generated stream (some bucket is non-empty)
    assert int(jnp.sum(table.ctx[0] >= 0)) > 0


def test_device_nasd_table_carryover_and_stop_if_unknown():
    prompt = [5, 9, 33, 2, 41, 7, 5, 9]
    out1, _, table = device_ngram_assisted_generate(
        prompt, CFG, PARAMS, n=3, gamma=3, max_gen_len=12, eos_tokens_id=(),
        stop_if_unknown=True, key=jax.random.key(2))
    # reuse the accumulated table on a second call (reset_in_between=False)
    out2, rate2, _ = device_ngram_assisted_generate(
        prompt, CFG, PARAMS, n=3, table=table, gamma=3, max_gen_len=12,
        eos_tokens_id=(), stop_if_unknown=True, key=jax.random.key(3))
    ar = autoregressive_generate(prompt, CFG, PARAMS, max_gen_len=12,
                                 eos_tokens_id=())
    assert out1 == ar and out2 == ar
    # second run re-walks the same greedy stream the table just learned:
    # drafts now hit and must be accepted
    assert rate2 > 0.0


def test_batched_device_nasd_greedy_equals_ar():
    """Each row of the batched device-NASD under greedy must equal its own
    greedy AR stream (exact-match acceptance emits only target samples),
    including mixed prompt lengths and a shared table."""
    from specdec_tpu.ngram.device_assisted import (
        device_ngram_assisted_generate_batch,
    )

    prompts = [[5, 9, 33, 2, 41, 7], [3, 14, 15, 9, 2, 6, 53, 8],
               [27, 4, 9, 1], [40, 41, 42, 43, 44]]
    outs, rates, table = device_ngram_assisted_generate_batch(
        prompts, CFG, PARAMS, n=3, gamma=3, gen_len=16, eos_tokens_id=(),
        key=jax.random.key(4))
    for p, out, r in zip(prompts, outs, rates):
        ar = autoregressive_generate(p, CFG, PARAMS, max_gen_len=16,
                                     eos_tokens_id=())
        assert out == ar, (p, out, ar)
        assert 0.0 <= r <= 1.0
    assert int(jnp.sum(table.ctx[0] >= 0)) > 0


def test_batched_device_nasd_carryover_accepts():
    """Re-running the same batch on the accumulated table must accept
    (greedy streams were just learned)."""
    from specdec_tpu.ngram.device_assisted import (
        device_ngram_assisted_generate_batch,
    )

    prompts = [[5, 9, 33, 2, 41, 7], [27, 4, 9, 1]]
    _, _, table = device_ngram_assisted_generate_batch(
        prompts, CFG, PARAMS, n=3, gamma=3, gen_len=12, eos_tokens_id=(),
        key=jax.random.key(5))
    outs, rates, _ = device_ngram_assisted_generate_batch(
        prompts, CFG, PARAMS, n=3, table=table, gamma=3, gen_len=12,
        eos_tokens_id=(), key=jax.random.key(6))
    for p, out in zip(prompts, outs):
        ar = autoregressive_generate(p, CFG, PARAMS, max_gen_len=12,
                                     eos_tokens_id=())
        assert out == ar
    assert all(r > 0.0 for r in rates), rates
