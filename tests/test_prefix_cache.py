"""Prefix caching over the paged scheduler (serve/prefix_cache.py): the
native equivalent of vLLM's automatic prefix caching (ref:
engine/vllm_engine.py:52 passes enable_prefix_caching through to vLLM's
engine). Shared prompt pages must be reused without changing any output;
refcounts must pin in-use blocks; refcnt-0 blocks must be reclaimed under
pool pressure."""
import numpy as np
import jax

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.serve.paged_scheduler import PagedContinuousBatcher
from specdec_tpu.serve.prefix_cache import PrefixBlockCache, block_keys

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8)
TARGET = init_params(CFG, jax.random.key(0), scale=0.4)

COMMON = [3, 14, 15, 9, 2, 6, 5, 3, 1, 1, 2, 3, 5, 8, 13, 21]  # two 8-pages


def _batcher(**kw):
    args = dict(num_slots=2, gamma=3, max_prompt_len=32, max_new_tokens=12,
                page_size=8, eos_tokens_id=(), prefix_caching=True)
    args.update(kw)
    return PagedContinuousBatcher(CFG, TARGET, CFG, TARGET, **args)


# ------------------------------------------------------------------- unit
def test_block_keys_chained():
    ps = 4
    a = block_keys([1, 2, 3, 4, 5, 6, 7, 8], ps)
    b = block_keys([9, 9, 9, 9, 5, 6, 7, 8], ps)
    assert len(a) == len(b) == 2
    # same second block CONTENT, different prefix -> different key
    assert a[1] != b[1]
    # partial trailing block is not keyed
    assert len(block_keys([1, 2, 3, 4, 5], ps)) == 1


def test_prefix_block_cache_refcount_and_lru():
    c = PrefixBlockCache()
    assert c.insert(10, 1, 2) and c.insert(20, 3, 4) and not c.insert(10, 9, 9)
    assert c.match_len([10, 20, 30]) == 2
    assert c.pages(10) == (1, 2)
    c.release(10)            # refcnt 0
    c.acquire(20)            # refcnt 2
    assert c.evictable == 1
    t, d = c.reclaim(5)      # only the refcnt-0 block goes
    assert t == [1] and d == [2]
    assert c.match_len([10]) == 0 and c.match_len([20]) == 1
    c.release(20)
    c.release(20)
    # now LRU order decides: insert two refcnt-0 blocks, touch the older one
    c.insert(30, 5, 6)
    c.release(30)
    c.acquire(20)
    c.release(20)            # 20 is now most recently used
    t, _ = c.reclaim(1)
    assert t == [5], "LRU victim should be the least recently touched block"


# ------------------------------------------------------ scheduler behavior
def test_prefix_reuse_outputs_match_standalone():
    """Requests sharing a two-page prefix: later admissions must HIT the
    cache and still produce exactly the standalone greedy output."""
    prompts = [COMMON + [27, 4, 11],
               COMMON + [7, 7],
               COMMON + [30, 29, 28, 26],
               list(reversed(COMMON)) + [4]]     # different prefix: no hit
    cb = _batcher()
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    assert sorted(done) == sorted(ids)
    for rid, p in zip(ids, prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=12,
                                         eos_tokens_id=(),
                                         key=jax.random.key(7))
        assert done[rid].output_ids == expect, f"request {rid} diverged"
    # first admission misses, the two later COMMON-prefixed ones hit 2 pages
    assert cb.prefix_cache.hit_tokens == 2 * 16
    assert len(cb.prefix_cache) > 0


def test_identical_prompt_rehit_capped_at_last_token():
    """An identical repeated prompt must reuse every full page except the
    one holding the final token (the admission still needs its logits)."""
    prompt = COMMON + COMMON  # 32 tokens = 4 pages exactly
    cb = _batcher(num_slots=1)
    r1 = cb.submit(prompt)
    done1 = cb.run()
    r2 = cb.submit(prompt)
    done2 = cb.run()
    assert done1[r1].output_ids == done2[r2].output_ids
    # 4 full pages, cap at (32-1)//8 = 3 blocks reused
    assert cb.prefix_cache.hit_tokens == 3 * 8


def test_blocks_survive_harvest_and_pin_while_referenced():
    cb = _batcher(num_slots=1)
    cb.submit(COMMON + [5, 4])
    cb.run()
    assert cb.prefix_cache.evictable == len(cb.prefix_cache) == 2
    # free list excludes the 2 cached blocks until reclaimed
    total = cb.num_pages - 1  # minus garbage page
    assert len(cb._alloc_t.free) == total - 2


def test_reclaim_under_pool_pressure_outputs_correct():
    """A pool that cannot hold all distinct prompts' blocks must evict
    refcnt-0 blocks instead of failing admission, with outputs intact."""
    rng = np.random.default_rng(3)
    prompts = [[int(t) for t in rng.integers(1, VOCAB, size=16)]
               for _ in range(6)]
    cb = _batcher(num_slots=1, max_prompt_len=16, max_new_tokens=8,
                  pool_tokens=80)
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    assert sorted(done) == sorted(ids)
    assert cb.prefix_cache.evictions > 0, "pool never pressured the cache"
    for rid, p in zip(ids, prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=8,
                                         eos_tokens_id=(),
                                         key=jax.random.key(7))
        assert done[rid].output_ids == expect, f"request {rid} diverged"


def test_prefix_with_multiwindow_sync():
    prompts = [COMMON + [27, 4, 11], COMMON + [7, 7], COMMON + [1]]
    cb = _batcher(windows_per_sync=4, max_new_tokens=16)
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    for rid, p in zip(ids, prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=16,
                                         eos_tokens_id=(),
                                         key=jax.random.key(7))
        assert done[rid].output_ids == expect, f"request {rid} diverged"
    assert cb.prefix_cache.hit_tokens >= 2 * 16


def test_prefix_off_is_unchanged():
    """prefix_caching=False keeps the old one-shape admission (no buckets,
    no cache entries)."""
    cb = _batcher(prefix_caching=False)
    assert cb.prefill_buckets == (cb.max_prompt_len,)
    ids = [cb.submit(COMMON + [27]), cb.submit(COMMON + [4])]
    done = cb.run()
    assert len(cb.prefix_cache) == 0
    for rid in ids:
        assert len(done[rid].output_ids) == 12
