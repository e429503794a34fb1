"""Chunked prefill in the paged batcher (the native meaning of the
reference's VLLM_MAX_NUM_BATCHED_TOKENS passthrough, ref:
engine/vllm_engine.py:48): long prompts prefill one bounded slice per step,
interleaving with other slots' decode windows, with identical outputs."""
import numpy as np
import jax

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.serve.paged_scheduler import PagedContinuousBatcher

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2,
                  head_dim=8)
TARGET = init_params(CFG, jax.random.key(0), scale=0.4)
LONG = [int(t) for t in np.random.default_rng(9).integers(1, VOCAB, size=30)]


def _batcher(**kw):
    args = dict(num_slots=2, gamma=3, max_prompt_len=32, max_new_tokens=10,
                page_size=8, eos_tokens_id=())
    args.update(kw)
    return PagedContinuousBatcher(CFG, TARGET, CFG, TARGET, **args)


def test_chunked_outputs_match_unchunked():
    prompts = [LONG, [3, 14, 15, 9, 2, 6], LONG[:17], [9, 9, 9]]
    plain = _batcher()
    chunked = _batcher(prefill_chunk=8)
    ids_a = [plain.submit(p) for p in prompts]
    ids_b = [chunked.submit(p) for p in prompts]
    done_a, done_b = plain.run(), chunked.run()
    for ra, rb, p in zip(ids_a, ids_b, prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=10,
                                         eos_tokens_id=(),
                                         key=jax.random.key(7))
        assert done_a[ra].output_ids == expect
        assert done_b[rb].output_ids == expect, "chunked prefill diverged"


def test_decode_interleaves_with_long_prefill():
    """While a 30-token prompt prefills at 8 tokens/step, the already-active
    slot must keep generating (its pos advances every step)."""
    cb = _batcher(prefill_chunk=8, max_new_tokens=16)
    r_short = cb.submit([3, 14, 15, 9])
    cb.step()                        # short prompt admits and decodes
    assert cb.slot_req[0] is not None or cb.slot_req[1] is not None
    r_long = cb.submit(LONG)
    pos_before = np.asarray(cb.state.pos).copy()
    cb.step()                        # long prompt: first chunk only
    assert cb._prefilling, "long prompt should still be prefilling"
    pos_after = np.asarray(cb.state.pos)
    short_slot = next(s for s in range(cb.B) if cb.slot_req[s] is not None)
    assert pos_after[short_slot] > pos_before[short_slot], \
        "active slot stalled behind the chunked prefill"
    done = cb.run()
    for rid, p in ((r_short, [3, 14, 15, 9]), (r_long, LONG)):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=16,
                                         eos_tokens_id=(),
                                         key=jax.random.key(7))
        assert done[rid].output_ids == expect


def test_chunked_with_prefix_caching():
    common = LONG[:16]
    prompts = [common + [27, 4, 1, 1, 2, 9, 8, 7, 6, 5, 4, 3],
               common + [7, 7, 30, 29, 28, 27, 26, 25, 24, 23]]
    # one slot: the second request admits only after the first completed
    # and registered its prompt blocks (in-flight blocks are not matchable)
    cb = _batcher(prefill_chunk=8, prefix_caching=True, num_slots=1)
    ids = [cb.submit(p) for p in prompts]
    done = cb.run()
    for rid, p in zip(ids, prompts):
        expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=10,
                                         eos_tokens_id=(),
                                         key=jax.random.key(7))
        assert done[rid].output_ids == expect
    assert cb.prefix_cache.hit_tokens == 16, \
        "second request should start its chunks past the cached prefix"


def test_vllm_compat_routes_chunked(monkeypatch):
    monkeypatch.setenv("TARGET_MODEL", "synthetic:tiny")
    monkeypatch.delenv("DRAFTER_MODEL", raising=False)
    monkeypatch.delenv("VLLM_ENABLE_SPECULATIVE", raising=False)
    monkeypatch.setenv("VLLM_MAX_NUM_BATCHED_TOKENS", "64")
    monkeypatch.setenv("VLLM_ENABLE_PREFIX_CACHING", "false")
    from specdec_tpu.engine.vllm_compat import (
        VLLMEngineManager, create_vllm_config_from_env,
    )
    mgr = VLLMEngineManager(create_vllm_config_from_env())
    mgr.initialize(num_slots=2, max_new_tokens=6)
    assert isinstance(mgr.batcher, PagedContinuousBatcher)
    assert mgr.batcher.prefill_chunk == 64
    outs = mgr.generate_batch(["hello world test", "other prompt"],
                              max_tokens=6)
    assert len(outs) == 2
