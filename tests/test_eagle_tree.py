"""EAGLE tree speculation tests. The greedy-exact construction makes the
output token-identical to greedy AR for ANY drafter quality and topology —
the same oracle as tests/test_tree_speculative.py — which exercises every
moving part at once: catch-up rewrite, level-by-level eagle tree expansion
with ancestor masks, whole-tree verify, path compaction, and the feature
write-back along the accepted chain (a wrong feature would only lower
acceptance, so acceptance-lift is tested separately with a trained head)."""
import numpy as np
import pytest
import jax

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.eagle import init_eagle_params
from specdec_tpu.core.model import init_params
from specdec_tpu.engine.eagle_train import train_eagle
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.sampling.eagle_tree import eagle_tree_generate
from specdec_tpu.sampling.processors import MultinomialProcessor

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=3, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2,
                  head_dim=8)
ECFG = CFG.replace(num_layers=1)

PROMPT = [3, 14, 15, 9, 2, 6]


@pytest.fixture(scope="module")
def models(eagle_models):
    # shared session-scoped fixture (conftest.py): the 200-step training run
    # is paid once across the EAGLE test modules
    _, _, target, eagle, trained = eagle_models
    return target, eagle, trained


@pytest.mark.parametrize("branching", [(2,), (2, 2), (3, 2, 1), (1, 1, 1)])
def test_eagle_tree_greedy_equals_ar(models, branching):
    target, eagle, _ = models
    ar = autoregressive_generate(PROMPT, CFG, target, max_gen_len=24,
                                 eos_tokens_id=(), key=jax.random.key(2))
    out, rate = eagle_tree_generate(PROMPT, ECFG, eagle, CFG, target,
                                    branching=branching, max_gen_len=24,
                                    eos_tokens_id=())
    assert out == ar, f"branching {branching} diverged from greedy AR"
    assert 0.0 <= rate <= 1.0


def test_eagle_tree_trained_head_too(models):
    """AR equality must hold for the trained head as well (different drafts,
    same committed stream), and a deeper trained tree keeps the oracle."""
    target, _, trained = models
    ar = autoregressive_generate(PROMPT, CFG, target, max_gen_len=30,
                                 eos_tokens_id=(), key=jax.random.key(2))
    out, rate = eagle_tree_generate(PROMPT, ECFG, trained, CFG, target,
                                    branching=(2, 2, 2), max_gen_len=30,
                                    eos_tokens_id=())
    assert out == ar
    assert rate > 0.0


def test_eagle_tree_training_lifts_acceptance(models):
    """The trained head's chain-depth acceptance must beat the untrained
    head's — this is what catches a broken feature path (wrong features
    cannot break the output, only the acceptance)."""
    target, eagle0, trained = models
    _, r0 = eagle_tree_generate(PROMPT, ECFG, eagle0, CFG, target,
                                branching=(2, 2), max_gen_len=40,
                                eos_tokens_id=())
    _, r1 = eagle_tree_generate(PROMPT, ECFG, trained, CFG, target,
                                branching=(2, 2), max_gen_len=40,
                                eos_tokens_id=())
    assert r1 > r0, (r1, r0)


def test_eagle_tree_eos_truncation(models):
    target, _, trained = models
    full, _ = eagle_tree_generate(PROMPT, ECFG, trained, CFG, target,
                                  branching=(2, 2), max_gen_len=20,
                                  eos_tokens_id=())
    eos = full[5]
    first = full.index(eos)
    out, _ = eagle_tree_generate(PROMPT, ECFG, trained, CFG, target,
                                 branching=(2, 2), max_gen_len=20,
                                 eos_tokens_id=eos)
    assert out == full[:first + 1]


def test_eagle_tree_sampled_deterministic(models):
    """Multi-draft rejection over eagle-drafted children: deterministic per
    key, full length, sane acceptance."""
    target, _, trained = models
    proc = MultinomialProcessor(temperature=1.0)
    out1, rate = eagle_tree_generate(PROMPT, ECFG, trained, CFG, target,
                                     branching=(2, 2), max_gen_len=20,
                                     logits_processor=proc, eos_tokens_id=(),
                                     key=jax.random.key(5))
    out2, _ = eagle_tree_generate(PROMPT, ECFG, trained, CFG, target,
                                  branching=(2, 2), max_gen_len=20,
                                  logits_processor=proc, eos_tokens_id=(),
                                  key=jax.random.key(5))
    assert out1 == out2
    assert len(out1) == 20
    assert all(0 <= t < VOCAB for t in out1)
    assert 0.0 <= rate <= 1.0


def test_eagle_tree_sampled_distribution_preserved(models):
    """First emitted token through the sampled eagle tree must follow the
    target's processed distribution (SpecInfer theorem; same TV oracle as
    the chain and model-drafter tree paths)."""
    import jax.numpy as jnp
    from specdec_tpu.core.model import forward_full
    from specdec_tpu.sampling.eagle_tree import _eagle_tree_generate
    from specdec_tpu.sampling.tree_speculative import _topology
    from specdec_tpu.sampling.utils import pad_to_bucket

    target, eagle, _ = models
    proc = MultinomialProcessor(temperature=1.0)
    prompt, n = pad_to_bucket(PROMPT, 0)
    topo = _topology((2, 2))

    n_runs = 2500
    keys = jax.random.split(jax.random.key(42), n_runs)

    def one(key):
        packed = _eagle_tree_generate(
            ECFG, eagle, CFG, target, prompt, jnp.int32(n), topo, 1, (),
            processor=proc, key=key)
        return packed[n]

    tokens = np.asarray(jax.vmap(one)(keys))
    counts = np.bincount(tokens, minlength=VOCAB) / n_runs

    logits = forward_full(CFG, target, jnp.asarray(PROMPT)[None, :])
    want = np.asarray(proc(logits[0, -1]))
    tv = 0.5 * np.abs(counts - want).sum()
    assert tv < 0.06, f"TV distance {tv:.4f}"
