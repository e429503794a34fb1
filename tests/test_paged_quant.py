"""INT8 KV in the paged pool (core/paged_cache.py::QuantPagedKVCache):
quantization math must be bit-identical to the slotted QuantKVCache (same
per-(position, head) absmax path), and the paged batcher must produce the
same outputs as the slotted batcher under the same kv_quant config —
including with prefix caching layered on top."""
import numpy as np
import jax
import jax.numpy as jnp

from specdec_tpu.core.cache import init_cache
from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import forward_step, forward_step_paged, init_params
from specdec_tpu.core.paged_cache import (
    QuantPagedKVCache, init_paged_cache, required_pages,
)
from specdec_tpu.serve import ContinuousBatcher
from specdec_tpu.serve.paged_scheduler import PagedContinuousBatcher

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2,
                  head_dim=8, kv_quant="int8")
TARGET = init_params(CFG, jax.random.key(0), scale=0.4)
PAGE = 8


def _seq_table(batch, max_pages):
    """Disjoint sequential page tables (page 0 left as garbage)."""
    return jnp.asarray(
        [[1 + b * max_pages + i for i in range(max_pages)]
         for b in range(batch)], jnp.int32)


def test_paged_int8_matches_slotted_int8():
    B, MAXP = 2, 4
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, VOCAB, size=(B, 11)).astype(np.int32))

    slot = init_cache(CFG, B, MAXP * PAGE)
    paged = init_paged_cache(CFG, B, num_pages=1 + B * MAXP, page_size=PAGE,
                             max_pages_per_seq=MAXP)
    assert isinstance(paged, QuantPagedKVCache)
    paged = jax.tree_util.tree_map(lambda x: x, paged)
    import dataclasses
    paged = dataclasses.replace(paged, page_table=_seq_table(B, MAXP))

    # prefill then a 3-token block (the speculative verify shape)
    ls, slot = forward_step(CFG, TARGET, tokens[:, :8], slot)
    lp, paged = forward_step_paged(CFG, TARGET, tokens[:, :8], paged,
                                   use_kernel=False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               rtol=1e-5, atol=1e-5)
    ls, slot = forward_step(CFG, TARGET, tokens[:, 8:11], slot)
    lp, paged = forward_step_paged(CFG, TARGET, tokens[:, 8:11], paged,
                                   use_kernel=False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               rtol=1e-5, atol=1e-5)
    # stored int8 values identical across layouts at every logical position
    from specdec_tpu.core.paged_cache import gather_pages
    k_paged = gather_pages(paged.k[0], paged.page_table)[:, :11]
    np.testing.assert_array_equal(np.asarray(k_paged),
                                  np.asarray(slot.k[0][:, :11]))


def test_paged_batcher_int8_matches_slotted_batcher():
    prompts = [[3, 14, 15, 9, 2, 6], [1, 1, 2, 3, 5, 8, 13, 21],
               [27, 4], [9, 9, 9, 1, 2]]
    kw = dict(num_slots=2, gamma=3, max_prompt_len=32, max_new_tokens=12,
              eos_tokens_id=())
    slotted = ContinuousBatcher(CFG, TARGET, CFG, TARGET, **kw)
    paged = PagedContinuousBatcher(CFG, TARGET, CFG, TARGET, page_size=PAGE,
                                   **kw)
    ids_s = [slotted.submit(p) for p in prompts]
    ids_p = [paged.submit(p) for p in prompts]
    done_s, done_p = slotted.run(), paged.run()
    for rs, rp in zip(ids_s, ids_p):
        assert done_s[rs].output_ids == done_p[rp].output_ids


def test_prefix_caching_over_int8_pool():
    common = [3, 14, 15, 9, 2, 6, 5, 3, 1, 1, 2, 3, 5, 8, 13, 21]
    prompts = [common + [27, 4], common + [7], common + [30, 29, 28]]
    kw = dict(num_slots=2, gamma=3, max_prompt_len=32, max_new_tokens=10,
              page_size=PAGE, eos_tokens_id=())
    plain = PagedContinuousBatcher(CFG, TARGET, CFG, TARGET, **kw)
    pref = PagedContinuousBatcher(CFG, TARGET, CFG, TARGET,
                                  prefix_caching=True, **kw)
    ids_a = [plain.submit(p) for p in prompts]
    ids_b = [pref.submit(p) for p in prompts]
    done_a, done_b = plain.run(), pref.run()
    for ra, rb in zip(ids_a, ids_b):
        assert done_a[ra].output_ids == done_b[rb].output_ids
    assert pref.prefix_cache.hit_tokens == 2 * 16


def test_quant_paged_kernel_matches_gather_oracle():
    """paged_decode_attention_quant (interpret mode) vs the gathered
    scale-after-dot XLA path — both decode (T=1) and verify (T=3) shapes,
    with mostly-dead pages on one sequence (length-aware clamp)."""
    from jax.experimental.pallas import tpu as pltpu

    from specdec_tpu.core.model import _attention
    from specdec_tpu.core.paged_cache import gather_page_scales, gather_pages
    from specdec_tpu.ops.paged_attention import paged_decode_attention_quant

    B, Hq, Hk, Dh = 2, 4, 2, 8
    NP, MP = 11, 4
    rng = np.random.default_rng(7)
    pool_k = jnp.asarray(
        rng.integers(-127, 128, size=(NP, Hk, PAGE, Dh)).astype(np.int8))
    pool_v = jnp.asarray(
        rng.integers(-127, 128, size=(NP, Hk, PAGE, Dh)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.001, 0.03, size=(NP, Hk, PAGE))
                     .astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.001, 0.03, size=(NP, Hk, PAGE))
                     .astype(np.float32))
    table = jnp.asarray(
        rng.permutation(NP - 1)[:B * MP].reshape(B, MP).astype(np.int32) + 1)
    cfg = tiny_config(num_heads=Hq, num_kv_heads=Hk, head_dim=Dh,
                      hidden_size=Hq * Dh, intermediate_size=Hq * Dh,
                      kv_quant="int8")

    for T, offsets in ((1, [13, 27]), (3, [5, 20]), (3, [0, 2 * PAGE])):
        q = jnp.asarray(rng.normal(size=(B, T, Hq, Dh)).astype(np.float32))
        off = jnp.asarray(offsets, jnp.int32)
        k_all = (gather_pages(pool_k, table), gather_page_scales(ks, table))
        v_all = (gather_pages(pool_v, table), gather_page_scales(vs, table))
        q_pos = off[:, None] + jnp.arange(T)[None, :]
        ref = _attention(cfg, q, k_all, v_all, q_pos, None)
        with pltpu.force_tpu_interpret_mode():
            got = paged_decode_attention_quant(q, pool_k, ks, pool_v, vs,
                                               table, off, Hk)
        np.testing.assert_allclose(
            np.asarray(got.reshape(B, T, Hq * Dh)), np.asarray(ref),
            rtol=3e-5, atol=3e-5)


def test_quant_paged_forward_kernel_matches_gather_path():
    """forward_step_paged with use_kernel=True (interpret mode) must equal
    the gather path logits on an int8 pool — the serving decode/verify
    integration of the quant kernel."""
    from jax.experimental.pallas import tpu as pltpu

    B, MAXP = 2, 4
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(0, VOCAB, size=(B, 9)).astype(np.int32))
    import dataclasses
    mk = lambda: dataclasses.replace(
        init_paged_cache(CFG, B, num_pages=1 + B * MAXP, page_size=PAGE,
                         max_pages_per_seq=MAXP),
        page_table=_seq_table(B, MAXP))
    ref_l, ref_c = forward_step_paged(CFG, TARGET, tokens[:, :6], mk(),
                                      use_kernel=False)
    with pltpu.force_tpu_interpret_mode():
        got_l, got_c = forward_step_paged(CFG, TARGET, tokens[:, :6], mk(),
                                          use_kernel=True)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                               rtol=2e-4, atol=2e-4)
    ref_l, _ = forward_step_paged(CFG, TARGET, tokens[:, 6:9], ref_c)
    with pltpu.force_tpu_interpret_mode():
        got_l, _ = forward_step_paged(CFG, TARGET, tokens[:, 6:9], got_c,
                                      use_kernel=True)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                               rtol=2e-4, atol=2e-4)
