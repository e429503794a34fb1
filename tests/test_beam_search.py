"""Beam search tests: K=1/k=1 degenerates to greedy AR; determinism; EOS/pad
stopping; beam widening never lowers the winning score."""
import jax
import numpy as np
import jax.numpy as jnp

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import forward_full, init_params
from specdec_tpu.sampling.base_decoding import (
    autoregressive_generate, beam_search_generate,
)

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8)
PARAMS = init_params(CFG, jax.random.key(0), scale=0.4)
PROMPT = [3, 14, 15, 9, 2, 6]


def test_beam1_top1_equals_greedy():
    ar = autoregressive_generate(PROMPT, CFG, PARAMS, max_gen_len=15,
                                 eos_tokens_id=(), key=jax.random.key(1))
    beam = beam_search_generate(PROMPT, CFG, PARAMS, max_gen_len=15,
                                num_beams=1, top_k=1, eos_tokens_id=())
    # beam search also stops on pad_token_id (ref :156) — compare up to that
    if 0 in ar:
        ar = ar[:ar.index(0) + 1]
    assert beam == ar


def test_beam_search_deterministic_and_bounded():
    out1 = beam_search_generate(PROMPT, CFG, PARAMS, max_gen_len=12,
                                num_beams=4, top_k=3, eos_tokens_id=())
    out2 = beam_search_generate(PROMPT, CFG, PARAMS, max_gen_len=12,
                                num_beams=4, top_k=3, eos_tokens_id=())
    assert out1 == out2
    assert 1 <= len(out1) <= 12
    assert all(0 <= t < VOCAB for t in out1)


def _score(tokens, prompt, alpha=1.2, min_length=5.0):
    """Recompute the reference score of a finished sequence: (1 + sum logp) /
    length-penalty (ref :106-131)."""
    full = list(prompt) + list(tokens)
    logits = forward_full(CFG, PARAMS, jnp.asarray(full)[None, :])
    logp = jax.nn.log_softmax(logits[0], axis=-1)
    s = 1.0
    for i, t in enumerate(tokens):
        s += float(logp[len(prompt) + i - 1, t])
    lp = ((min_length + len(tokens)) / (min_length + 1.0)) ** alpha
    return s / lp


def test_wider_beam_never_scores_worse():
    n1 = beam_search_generate(PROMPT, CFG, PARAMS, max_gen_len=10,
                              num_beams=1, top_k=1, eos_tokens_id=())
    n4 = beam_search_generate(PROMPT, CFG, PARAMS, max_gen_len=10,
                              num_beams=4, top_k=4, eos_tokens_id=())
    # only comparable when both ran to the cap (same length ⇒ same penalty base)
    if len(n1) == len(n4):
        assert _score(n4, PROMPT) >= _score(n1, PROMPT) - 1e-5


def test_beam_eos_stops():
    free = beam_search_generate(PROMPT, CFG, PARAMS, max_gen_len=12,
                                num_beams=3, top_k=3, eos_tokens_id=())
    eos = free[2]
    out = beam_search_generate(PROMPT, CFG, PARAMS, max_gen_len=12,
                               num_beams=3, top_k=3, eos_tokens_id=eos)
    if eos in out:
        assert out.index(eos) == len(out) - 1
    assert len(out) <= 12
