"""Continuous-batching scheduler tests: correctness of admitted/evicted slot
isolation (outputs must equal standalone generation), queue draining with more
requests than slots, and per-request metrics."""
import numpy as np
import jax

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.serve import ContinuousBatcher

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8)
TARGET = init_params(CFG, jax.random.key(0), scale=0.4)


def test_continuous_batching_matches_standalone():
    """Self-draft greedy: every request's output must equal standalone greedy
    AR regardless of which slot it lands in or when it was admitted."""
    prompts = [
        [3, 14, 15, 9, 2, 6],
        [1, 1, 2, 3, 5, 8, 13, 21],
        [27, 4],
        [9, 9, 9, 1, 2],
        [17, 30, 12, 4, 4, 8, 19],
    ]
    cb = ContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=2, gamma=3,
                           max_prompt_len=64, max_new_tokens=10,
                           eos_tokens_id=())
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    assert sorted(done.keys()) == sorted(ids)
    for rid, p in zip(ids, prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=10,
                                         eos_tokens_id=(),
                                         key=jax.random.key(99))
        assert done[rid].output_ids == expect, f"request {rid} diverged"
        m = done[rid].metrics
        assert m.generated_tokens == 10
        assert m.acceptance_rate == 1.0
        assert m.total_latency > 0
        assert m.ttft >= 0


def test_more_requests_than_slots_single_slot():
    cb = ContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=1, gamma=2,
                           max_prompt_len=64, max_new_tokens=6,
                           eos_tokens_id=())
    ids = [cb.submit([3, 5, 7]), cb.submit([2, 4, 6, 8])]
    done = cb.run()
    assert len(done) == 2
    for rid in ids:
        assert len(done[rid].output_ids) == 6


def test_eos_frees_slot_early():
    free = autoregressive_generate([3, 14, 15, 9], CFG, TARGET, max_gen_len=12,
                                   eos_tokens_id=(), key=jax.random.key(0))
    eos = free[3]
    cb = ContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=1, gamma=3,
                           max_prompt_len=64, max_new_tokens=12,
                           eos_tokens_id=eos)
    rid = cb.submit([3, 14, 15, 9])
    rid2 = cb.submit([1, 1, 2, 3, 5, 8])
    done = cb.run()
    out = done[rid].output_ids
    assert eos in out and out.index(eos) == len(out) - 1
    assert rid2 in done


def test_server_benchmark_open_loop():
    """Rate-paced arrivals into the continuous batcher produce per-request
    metrics with exact token counts."""
    from specdec_tpu.engine.server_benchmark import run_server_benchmark

    cb = ContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=2, gamma=3,
                           max_prompt_len=64, max_new_tokens=8,
                           eos_tokens_id=())
    prompts = [[3, 14, 15], [1, 2, 3, 4], [9, 8, 7], [5, 5, 5, 5, 5]]
    res = run_server_benchmark(cb, prompts, rate=50.0)
    assert res.total_requests == 4
    assert res.total_tokens == 4 * 8
    assert res.overall_throughput > 0
    for b in res.batches:
        assert b.requests[0].ttft >= 0
        assert b.requests[0].generated_tokens == 8


def test_stream_generate_yields_exact_output():
    from specdec_tpu.serve.streaming import stream_generate

    cb = ContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=2, gamma=3,
                           max_prompt_len=64, max_new_tokens=12,
                           eos_tokens_id=())
    prompt = [3, 14, 15, 9, 2, 6]
    chunks = list(stream_generate(cb, prompt))
    streamed = [t for c in chunks for t in c]
    expect = autoregressive_generate(prompt, CFG, TARGET, max_gen_len=12,
                                     eos_tokens_id=(), key=jax.random.key(0))
    assert streamed == expect
    assert len(chunks) >= 2  # tokens arrive incrementally, not all at once


def test_stream_generate_with_eos():
    from specdec_tpu.serve.streaming import stream_generate

    free = autoregressive_generate([3, 14, 15, 9], CFG, TARGET, max_gen_len=12,
                                   eos_tokens_id=(), key=jax.random.key(0))
    eos = free[4]
    cb = ContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=1, gamma=3,
                           max_prompt_len=64, max_new_tokens=12,
                           eos_tokens_id=eos)
    streamed = [t for c in stream_generate(cb, [3, 14, 15, 9]) for t in c]
    assert streamed == free[:free.index(eos) + 1]


def test_windows_per_sync_fused_matches_single():
    """windows_per_sync > 1 (fused multi-window device program with early
    exit) must produce identical outputs to per-window stepping."""
    prompts = [[3, 14, 15, 9], [1, 1, 2, 3, 5], [27, 4]]
    outs = {}
    for wps in (1, 4):
        cb = ContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=2, gamma=3,
                               max_prompt_len=64, max_new_tokens=10,
                               eos_tokens_id=(), windows_per_sync=wps,
                               key=jax.random.key(9))
        ids = [cb.submit(p) for p in prompts]
        done = cb.run()
        outs[wps] = [done[r].output_ids for r in ids]
    assert outs[1] == outs[4]
    for o, p in zip(outs[4], prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=10,
                                         eos_tokens_id=(),
                                         key=jax.random.key(0))
        assert o == expect


def test_ttft_stamped_at_admission_not_window_sync():
    """The first generated token is committed by the admission prefill, so
    the TTFT stamp must land there — with windows_per_sync>1 the next host
    sync can be many windows later (round-1 overstated TTFT)."""
    import time

    from specdec_tpu.serve.scheduler import ContinuousBatcher, Request

    params = init_params(CFG, jax.random.key(0), scale=0.3)
    b = ContinuousBatcher(CFG, params, CFG, params, num_slots=2, gamma=2,
                          max_prompt_len=16, max_new_tokens=8,
                          windows_per_sync=8, eos_tokens_id=())
    req = Request(request_id=0, prompt_ids=[3, 5, 9, 11], max_new_tokens=8,
                  submit_time=time.time())
    b._admit(0, req)
    assert b._slot_first_token[0] is not None
    assert b._slot_first_token[0] >= req.submit_time
