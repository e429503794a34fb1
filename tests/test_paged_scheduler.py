"""Paged continuous batching: outputs must equal the slotted batcher / the
standalone generator; pages must be recycled across requests; admission must
respect pool capacity."""
import numpy as np
import jax

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.serve.paged_scheduler import PagedContinuousBatcher

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8)
TARGET = init_params(CFG, jax.random.key(0), scale=0.4)


import pytest


@pytest.mark.parametrize("drafter_paged", [False, True],
                         ids=["hybrid", "both-paged"])
def test_paged_batcher_matches_standalone(drafter_paged):
    prompts = [
        [3, 14, 15, 9, 2, 6],
        [1, 1, 2, 3, 5, 8, 13, 21],
        [27, 4],
        [9, 9, 9, 1, 2],
    ]
    cb = PagedContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=2,
                                gamma=3, max_prompt_len=32, max_new_tokens=12,
                                page_size=8, eos_tokens_id=(),
                                drafter_paged=drafter_paged)
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    assert sorted(done) == sorted(ids)
    for rid, p in zip(ids, prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=12,
                                         eos_tokens_id=(),
                                         key=jax.random.key(7))
        assert done[rid].output_ids == expect, f"request {rid} diverged"
        assert done[rid].metrics.acceptance_rate == 1.0


@pytest.mark.parametrize("drafter_paged", [False, True],
                         ids=["hybrid", "both-paged"])
def test_pages_recycled_and_capacity_respected(drafter_paged):
    cb = PagedContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=1,
                                gamma=2, max_prompt_len=16, max_new_tokens=8,
                                page_size=8, pool_tokens=64,
                                eos_tokens_id=(),
                                drafter_paged=drafter_paged)
    free0 = len(cb._alloc_t.free)
    free0_d = len(cb._alloc_d.free)
    ids = [cb.submit([3, 5, 7, 9]) for _ in range(4)]
    done = cb.run()
    assert len(done) == 4
    # all pages returned after the queue drains
    assert len(cb._alloc_t.free) == free0
    assert len(cb._alloc_d.free) == free0_d
    for rid in ids:
        assert len(done[rid].output_ids) == 8


def test_preemption_under_pool_pressure():
    """A pool too small to back all slots at max length must PREEMPT (free +
    requeue), not crash; every request still completes and greedy outputs
    still match the standalone oracle (restart-from-prompt regenerates the
    same tokens deterministically)."""
    prompts = [[3, 14, 15, 9, 2, 6], [1, 1, 2, 3, 5, 8],
               [27, 4, 11, 30], [9, 9, 9, 1, 2]]
    # 4 slots x 5 pages each at full length (+1 garbage) > the 12-page pool
    # floor -> guaranteed mid-flight exhaustion once all four admit
    cb = PagedContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=4,
                                gamma=3, max_prompt_len=16, max_new_tokens=12,
                                page_size=8, pool_tokens=56, eos_tokens_id=())
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    assert sorted(done) == sorted(ids)
    assert cb.preemptions > 0, "pool sizing did not exercise preemption"
    for rid, p in zip(ids, prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=12,
                                         eos_tokens_id=(),
                                         key=jax.random.key(7))
        assert done[rid].output_ids == expect, f"request {rid} diverged"
    # all pages home again (hybrid default: drafter pool is a 1-page dummy)
    assert len(cb._alloc_t.free) == cb.num_pages - 1


def test_paged_multiwindow_sync_matches_oracle():
    """windows_per_sync>1 runs several gamma windows per device dispatch;
    page provisioning must cover the whole dispatch horizon. (Regression:
    provisioning one window ahead let later windows scatter K/V into the
    shared garbage page — all outputs diverged.)"""
    prompts = [[3, 14, 15, 9, 2, 6], [1, 1, 2, 3, 5, 8, 13, 21],
               [27, 4], [9, 9, 9, 1, 2]]
    cb = PagedContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=2,
                                gamma=3, max_prompt_len=32, max_new_tokens=24,
                                page_size=8, eos_tokens_id=(),
                                windows_per_sync=4)
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    for rid, p in zip(ids, prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=24,
                                         eos_tokens_id=(),
                                         key=jax.random.key(7))
        assert done[rid].output_ids == expect, f"request {rid} diverged"


def test_table_width_covers_dispatch_horizon():
    """Regression (review finding): max_pages_per_seq sized from S alone
    overflowed _table_row near end-of-generation once _needed_now grew to
    the full dispatch horizon — exact failing config: prompt 32, gen 24,
    gamma 3, page 8, windows_per_sync=8."""
    cb = PagedContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=2,
                                gamma=3, max_prompt_len=32, max_new_tokens=24,
                                page_size=8, windows_per_sync=8,
                                eos_tokens_id=())
    prompt = list(range(1, 33))
    rid = cb.submit(prompt)
    done = cb.run()
    expect = autoregressive_generate(prompt, CFG, TARGET, max_gen_len=24,
                                     eos_tokens_id=(), key=jax.random.key(7))
    assert done[rid].output_ids == expect
