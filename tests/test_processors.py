"""Unit tests for the sampling stack vs hand-computed cases and the torch
reference semantics (ref: utils/logits_processor.py:7-103)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from specdec_tpu.sampling import (
    GreedyProcessor, MultinomialProcessor, NucleusProcessor, TopKProcessor,
    TopKNucleusProcessor, build_processor,
)


def _torch_ref_probs(kind, logits_np, temperature=1.0, top_k=3, top_p=0.7):
    """Re-derive expected probs with torch following the reference algorithm."""
    import torch
    import torch.nn.functional as F

    logits = torch.tensor(logits_np).clone()
    if kind in ("topk", "topknucleus"):
        kth = torch.topk(logits, top_k, dim=-1)[0][..., -1, None]
        logits[logits < kth] = -1e20
    if kind in ("nucleus", "topknucleus"):
        sorted_logits, sorted_indices = torch.sort(logits, descending=True)
        cum = torch.cumsum(F.softmax(sorted_logits, dim=-1), dim=-1)
        remove = cum > top_p
        remove[..., 1:] = remove[..., :-1].clone()
        remove[..., 0] = 0
        sorted_logits[remove] = -1e20
        logits = torch.gather(sorted_logits, -1, sorted_indices.argsort(-1))
    return F.softmax(logits / temperature, dim=-1).numpy()


RNG = np.random.default_rng(0)
LOGITS = RNG.normal(size=(4, 11)).astype(np.float32) * 3.0


@pytest.mark.parametrize("kind,proc", [
    ("greedy", GreedyProcessor(temperature=0.7)),
    ("multinomial", MultinomialProcessor(temperature=0.7)),
    ("topk", TopKProcessor(temperature=0.7, top_k=3)),
    ("nucleus", NucleusProcessor(temperature=0.7, top_p=0.7)),
    ("topknucleus", TopKNucleusProcessor(temperature=0.7, top_k=3, top_p=0.7)),
])
def test_probs_match_reference_semantics(kind, proc):
    ours = np.asarray(proc(jnp.asarray(LOGITS)))
    theirs = _torch_ref_probs("greedy" if kind == "multinomial" else kind,
                              LOGITS, temperature=0.7)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_greedy_sample_is_argmax():
    proc = GreedyProcessor()
    probs = proc(jnp.asarray(LOGITS))
    toks = proc.sample(probs, None)
    np.testing.assert_array_equal(np.asarray(toks), LOGITS.argmax(-1))


def test_multinomial_sample_distribution():
    proc = MultinomialProcessor(temperature=1.0)
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1e20]])
    probs = proc(logits)
    keys = jax.random.split(jax.random.key(0), 4000)
    samples = jax.vmap(lambda k: proc.sample(probs, k))(keys)
    counts = np.bincount(np.asarray(samples).ravel(), minlength=4) / 4000
    np.testing.assert_allclose(counts, np.asarray(probs[0]), atol=0.03)
    assert counts[3] == 0


def test_topk_masks_all_but_k():
    proc = TopKProcessor(temperature=1.0, top_k=2)
    probs = np.asarray(proc(jnp.asarray(LOGITS)))
    assert ((probs > 1e-9).sum(-1) == 2).all()


def test_nucleus_keeps_minimal_prefix():
    logits = jnp.asarray([[np.log(0.5), np.log(0.3), np.log(0.15), np.log(0.05)]])
    probs = np.asarray(NucleusProcessor(temperature=1.0, top_p=0.75)(logits))
    # cumsum: 0.5, 0.8 > 0.75 → keep first two (shifted-right rule)
    np.testing.assert_allclose(probs[0], [0.625, 0.375, 0.0, 0.0], atol=1e-5)


def test_build_processor_registry():
    assert isinstance(build_processor("greedy"), GreedyProcessor)
    assert isinstance(build_processor("top_k", top_k=5), TopKProcessor)
    assert isinstance(build_processor("topknucleus"), TopKNucleusProcessor)
    with pytest.raises(ValueError):
        build_processor("nope")


def test_processors_jittable():
    proc = TopKNucleusProcessor(temperature=0.8, top_k=4, top_p=0.9)

    @jax.jit
    def f(logits, key):
        p = proc(logits)
        return proc.sample(p, key)

    out = f(jnp.asarray(LOGITS), jax.random.key(1))
    assert out.shape == (4,)
