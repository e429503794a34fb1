"""Tree speculative decoding: greedy-exact oracle (output == greedy AR for
any drafter and topology), topology bookkeeping, EOS truncation, and the
accepted-path cache compaction (verified implicitly: any compaction bug
poisons later windows' prefix attention and breaks the oracle)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.sampling.processors import MultinomialProcessor
from specdec_tpu.sampling.tree_speculative import (
    TreeTopology, tree_speculative_generate,
)

CFG = tiny_config(vocab_size=64, num_layers=2, hidden_size=64,
                  intermediate_size=128, num_heads=4, num_kv_heads=2,
                  head_dim=16)
TARGET = init_params(CFG, jax.random.key(0), scale=0.3)
NOISE = init_params(CFG, jax.random.key(1), scale=0.05)
DRAFTER = jax.tree.map(lambda a, b: a + b, TARGET, NOISE)
PROMPT = [5, 9, 33, 2, 41, 7]


def test_topology_bookkeeping():
    t = TreeTopology((2, 3))
    assert t.num_nodes == 1 + 2 + 6
    assert t.level_sizes == [1, 2, 6]
    # children of node 1 (first level-1 node) are nodes 3, 4, 5
    assert list(t.parent[3:6]) == [1, 1, 1]
    assert list(t.parent[6:9]) == [2, 2, 2]
    anc = np.asarray(t.ancestor)
    assert anc[4, 4] and anc[4, 1] and anc[4, 0]
    assert not anc[4, 2] and not anc[4, 3]
    assert int(t.depths[0]) == 0 and int(t.depths[5]) == 2


@pytest.mark.parametrize("branching", [(2, 2), (3, 2, 2), (1, 1, 1, 1)])
def test_tree_equals_greedy_ar(branching):
    ar = autoregressive_generate(PROMPT, CFG, TARGET, max_gen_len=24,
                                 eos_tokens_id=())
    out, rate = tree_speculative_generate(
        PROMPT, CFG, DRAFTER, CFG, TARGET, branching=branching,
        max_gen_len=24, eos_tokens_id=())
    assert out == ar
    assert 0.0 <= rate <= 1.0


def test_tree_self_draft_accepts_everything():
    ar = autoregressive_generate(PROMPT, CFG, TARGET, max_gen_len=20,
                                 eos_tokens_id=())
    out, rate = tree_speculative_generate(
        PROMPT, CFG, TARGET, CFG, TARGET, branching=(2, 2), max_gen_len=20,
        eos_tokens_id=())
    assert out == ar
    assert rate == 1.0


def test_tree_eos_truncation():
    ar = autoregressive_generate(PROMPT, CFG, TARGET, max_gen_len=24,
                                 eos_tokens_id=())
    eos = ar[5]   # force an EOS mid-stream
    ar_stop = autoregressive_generate(PROMPT, CFG, TARGET, max_gen_len=24,
                                      eos_tokens_id=(int(eos),))
    out, _ = tree_speculative_generate(
        PROMPT, CFG, TARGET, CFG, TARGET, branching=(2, 2), max_gen_len=24,
        eos_tokens_id=(int(eos),))
    assert out == ar_stop


def test_sampled_tree_deterministic_full_length():
    """Multi-draft rejection mode: deterministic per key, full length,
    in-vocab, sane acceptance."""
    proc = MultinomialProcessor(temperature=1.0)
    out1, rate = tree_speculative_generate(
        PROMPT, CFG, DRAFTER, CFG, TARGET, branching=(2, 2),
        logits_processor=proc, max_gen_len=24, eos_tokens_id=(),
        key=jax.random.key(5))
    out2, _ = tree_speculative_generate(
        PROMPT, CFG, DRAFTER, CFG, TARGET, branching=(2, 2),
        logits_processor=proc, max_gen_len=24, eos_tokens_id=(),
        key=jax.random.key(5))
    assert out1 == out2
    assert len(out1) == 24
    assert all(0 <= t < 64 for t in out1)
    assert 0.0 <= rate <= 1.0


def test_sampled_tree_self_draft_accepts_everything():
    """Self-draft: children are IID from q == p, so the FIRST child of every
    node is accepted with probability min(1, p/q) = 1 — the multi-draft
    analog of the chain path's self-draft invariant."""
    proc = MultinomialProcessor(temperature=1.0)
    out, rate = tree_speculative_generate(
        PROMPT, CFG, TARGET, CFG, TARGET, branching=(2, 2, 2),
        logits_processor=proc, max_gen_len=24, eos_tokens_id=(),
        key=jax.random.key(6))
    assert rate == 1.0
    assert len(out) == 24


def test_sampled_tree_output_distribution_preserved():
    """First emitted token through the multi-draft rejection path must be
    distributed as the target's processed distribution (the SpecInfer
    theorem; same TV oracle as the chain path's test_speculative.py)."""
    from specdec_tpu.core.model import forward_full
    from specdec_tpu.sampling.tree_speculative import (
        _topology, _tree_spec_generate,
    )
    from specdec_tpu.sampling.utils import pad_to_bucket

    proc = MultinomialProcessor(temperature=1.0)
    prompt, n = pad_to_bucket(PROMPT, 0)
    topo = _topology((2, 2))

    n_runs = 2500
    keys = jax.random.split(jax.random.key(42), n_runs)

    def one(key):
        packed = _tree_spec_generate(
            CFG, DRAFTER, CFG, TARGET, prompt, jnp.int32(n), topo, 1, (),
            processor=proc, key=key)
        return packed[n]

    tokens = np.asarray(jax.vmap(one)(keys))
    counts = np.bincount(tokens, minlength=64) / n_runs

    logits = forward_full(CFG, TARGET, jnp.asarray(PROMPT)[None, :])
    want = np.asarray(proc(logits[0, -1]))
    tv = 0.5 * np.abs(counts - want).sum()
    assert tv < 0.06, f"TV distance {tv:.4f}"


def test_tree_beats_or_matches_chain_depth():
    """With branching > 1 the tree must accept at least as deeply as the
    width-1 chain of the same depth (the chain is a subtree)."""
    kw = dict(max_gen_len=32, eos_tokens_id=())
    _, chain_rate = tree_speculative_generate(
        PROMPT, CFG, DRAFTER, CFG, TARGET, branching=(1, 1, 1), **kw)
    _, tree_rate = tree_speculative_generate(
        PROMPT, CFG, DRAFTER, CFG, TARGET, branching=(3, 3, 3), **kw)
    assert tree_rate >= chain_rate
