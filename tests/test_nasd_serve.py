"""NASD serving tests: device-table n-gram drafting inside the continuous
batching scheduler. The exact-match acceptance rule makes greedy NASD output
EQUAL greedy AR output for every request regardless of table contents — the
strongest scheduler-level oracle available (same guarantee the one-shot
batch path tests in tests/test_device_ngram.py)."""
import jax
import numpy as np

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.ngram.device_table import init_device_table
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.serve import NasdContinuousBatcher

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2,
                  head_dim=8)
TARGET = init_params(CFG, jax.random.key(0), scale=0.4)

PROMPTS = [
    [3, 14, 15, 9, 2, 6],
    [1, 1, 2, 3, 5, 8, 13, 21],
    [27, 4, 11],
    [9, 9, 9, 1, 2],
    [17, 30, 12, 4, 4, 8, 19],
]


def _expected(p, gen=10):
    return autoregressive_generate(p, CFG, TARGET, max_gen_len=gen,
                                   eos_tokens_id=(), key=jax.random.key(99))


def test_nasd_serving_matches_greedy_ar():
    """Every request == standalone greedy AR, any slot, any admission time."""
    cb = NasdContinuousBatcher(CFG, TARGET, num_slots=2, gamma=3, n=3,
                               capacity=256, max_prompt_len=64,
                               max_new_tokens=10, eos_tokens_id=())
    ids = [cb.submit(p) for p in PROMPTS]
    done = cb.run()
    assert sorted(done.keys()) == sorted(ids)
    for rid, p in zip(ids, PROMPTS):
        assert done[rid].output_ids == _expected(p), f"request {rid} diverged"
        m = done[rid].metrics
        assert m.generated_tokens == 10
        assert m.total_latency > 0
        assert m.ttft >= 0


def test_nasd_serving_fused_windows_match_single():
    """windows_per_sync > 1 must not change any output (fused multi-window
    step == repeated single windows)."""
    outs = {}
    for wps in (1, 4):
        cb = NasdContinuousBatcher(CFG, TARGET, num_slots=2, gamma=3, n=3,
                                   capacity=256, max_prompt_len=64,
                                   max_new_tokens=12, eos_tokens_id=(),
                                   windows_per_sync=wps)
        ids = [cb.submit(p) for p in PROMPTS[:3]]
        done = cb.run()
        outs[wps] = [done[r].output_ids for r in ids]
    assert outs[1] == outs[4]
    for out, p in zip(outs[1], PROMPTS[:3]):
        assert out == _expected(p, 12)


def test_nasd_serving_accumulates_table_across_requests():
    """The shared table persists across admissions: replaying the same
    prompt must reuse learned n-grams (nonzero acceptance on the replay,
    because the first pass recorded the continuation)."""
    p = [5, 9, 3, 5, 9, 3, 5, 9]
    cb = NasdContinuousBatcher(CFG, TARGET, num_slots=1, gamma=4, n=3,
                               capacity=256, max_prompt_len=64,
                               max_new_tokens=16, eos_tokens_id=())
    r1 = cb.submit(p)
    cb.run()
    r2 = cb.submit(p)
    done = cb.run()
    assert done[r1].output_ids == done[r2].output_ids == _expected(p, 16)
    # replay drafts from a table that has seen this exact stream
    assert done[r2].metrics.acceptance_rate > 0.0
    assert done[r2].metrics.acceptance_rate >= done[r1].metrics.acceptance_rate


def test_nasd_serving_carryover_table_injection():
    """A table learned elsewhere (e.g. the one-shot batch path) can back the
    batcher; and the batcher's table keeps learning (size grows)."""
    from specdec_tpu.ngram.device_assisted import (
        device_ngram_assisted_generate,
    )
    p = [2, 7, 2, 7, 2, 7, 2]
    _, _, table = device_ngram_assisted_generate(
        p, CFG, TARGET, n=3, capacity=256, gamma=4, max_gen_len=12,
        eos_tokens_id=(), key=jax.random.key(3))
    cb = NasdContinuousBatcher(CFG, TARGET, num_slots=1, gamma=4, n=3,
                               table=table, max_prompt_len=64,
                               max_new_tokens=12, eos_tokens_id=())
    rid = cb.submit(p)
    done = cb.run()
    assert done[rid].output_ids == _expected(p, 12)
    assert done[rid].metrics.acceptance_rate > 0.0


def test_nasd_serving_eos_frees_slot():
    """A request hitting EOS frees its slot for the queue."""
    # pick an eos token that actually appears in greedy output
    probe = _expected(PROMPTS[0], 10)
    eos = probe[4]
    expect = probe[:probe.index(eos) + 1]
    cb = NasdContinuousBatcher(CFG, TARGET, num_slots=1, gamma=3, n=3,
                               capacity=256, max_prompt_len=64,
                               max_new_tokens=10, eos_tokens_id=(eos,))
    r1 = cb.submit(PROMPTS[0])
    r2 = cb.submit(PROMPTS[1])
    done = cb.run()
    assert done[r1].output_ids == expect
    assert len(done) == 2 and done[r2].output_ids is not None


def test_nasd_serving_streams():
    """stream_generate is batcher-agnostic: over the NASD batcher the
    concatenated yields equal the request's output (== greedy AR)."""
    from specdec_tpu.serve.streaming import stream_generate
    cb = NasdContinuousBatcher(CFG, TARGET, num_slots=1, gamma=3, n=3,
                               capacity=256, max_prompt_len=64,
                               max_new_tokens=10, eos_tokens_id=())
    chunks = list(stream_generate(cb, PROMPTS[0]))
    assert sum(chunks, []) == _expected(PROMPTS[0])
