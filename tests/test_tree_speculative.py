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


def test_tree_rejects_sampled_processor():
    with pytest.raises(NotImplementedError):
        tree_speculative_generate(
            PROMPT, CFG, DRAFTER, CFG, TARGET,
            logits_processor=MultinomialProcessor(1.0))


def test_tree_beats_or_matches_chain_depth():
    """With branching > 1 the tree must accept at least as deeply as the
    width-1 chain of the same depth (the chain is a subtree)."""
    kw = dict(max_gen_len=32, eos_tokens_id=())
    _, chain_rate = tree_speculative_generate(
        PROMPT, CFG, DRAFTER, CFG, TARGET, branching=(1, 1, 1), **kw)
    _, tree_rate = tree_speculative_generate(
        PROMPT, CFG, DRAFTER, CFG, TARGET, branching=(3, 3, 3), **kw)
    assert tree_rate >= chain_rate
