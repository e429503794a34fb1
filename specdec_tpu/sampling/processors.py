"""Sampling / logits-processor stack.

Same surface as the reference's processor hierarchy (ref:
utils/logits_processor.py:7-103) — ``__call__(logits) -> probs`` applies
temperature + filtering then softmax; ``sample(probs, key) -> token`` draws —
but as pure jittable functions over ``(logits, key)`` with JAX counter-based
RNG instead of torch global RNG. All ops are static-shape (top-k via
``lax.top_k`` threshold, nucleus via sort/cumsum masks) so they live happily
inside jitted decode loops.

Semantics preserved exactly (these define the speculative acceptance
distribution, SURVEY.md §2.1): filtering masks logits to -inf *before* the
temperature-scaled softmax; acceptance tests compare processed distributions.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_FILTER_VALUE = -1e20  # matches ref utils/logits_processor.py:59


class LogitsProcessor:
    """probs = softmax(process(logits) / temperature)  (ref :13-15)."""

    def __init__(self, temperature: float = 1.0):
        self.temperature = float(temperature)

    def _process(self, logits: jax.Array) -> jax.Array:
        return logits

    def __call__(self, logits: jax.Array) -> jax.Array:
        return jax.nn.softmax(
            self._process(logits.astype(jnp.float32)) / self.temperature, axis=-1)

    def sample(self, probs: jax.Array, key: Optional[jax.Array]) -> jax.Array:
        raise NotImplementedError

    # pytree-friendly identity for jit static args
    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self).__name__, tuple(sorted(self.__dict__.items()))))


class GreedyProcessor(LogitsProcessor):
    """Argmax sampling (ref :26-36). Temperature kept for parity (default 1)."""

    def sample(self, probs: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)


class MultinomialProcessor(LogitsProcessor):
    """Temperature-scaled multinomial sampling (ref :39-49)."""

    def sample(self, probs: jax.Array, key: jax.Array) -> jax.Array:
        logp = jnp.log(jnp.maximum(probs, 1e-38))
        return jax.random.categorical(key, logp, axis=-1).astype(jnp.int32)


class TopKProcessor(MultinomialProcessor):
    """Keep the top-k logits, mask the rest (ref :52-63)."""

    def __init__(self, temperature: float = 1.0, top_k: int = 10):
        super().__init__(temperature)
        self.top_k = int(top_k)

    def _process(self, logits: jax.Array) -> jax.Array:
        kth = jax.lax.top_k(logits, self.top_k)[0][..., -1:]
        return jnp.where(logits < kth, _FILTER_VALUE, logits)


class NucleusProcessor(MultinomialProcessor):
    """Nucleus (top-p): mask the tail of the sorted cumulative distribution
    (ref :66-81 — tail chosen by cumsum of sorted softmax > p, shifted right
    so the first token crossing the boundary is kept)."""

    def __init__(self, temperature: float = 1.0, top_p: float = 0.9):
        super().__init__(temperature)
        self.top_p = float(top_p)

    def _process(self, logits: jax.Array) -> jax.Array:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        # ref :75 — cumulative mass via UN-tempered softmax; temperature is
        # applied only by the base __call__
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        remove_sorted = cum > self.top_p
        # shift right: always keep the top token (ref clones [:-1] → [1:])
        remove_sorted = jnp.concatenate(
            [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
            axis=-1)
        # threshold in logit space: smallest kept sorted logit
        kept_logits = jnp.where(remove_sorted, jnp.inf, sorted_logits)
        threshold = jnp.min(kept_logits, axis=-1, keepdims=True)
        return jnp.where(logits < threshold, _FILTER_VALUE, logits)


class TopKNucleusProcessor(MultinomialProcessor):
    """Top-k filter then nucleus filter over the survivors (ref :84-103)."""

    def __init__(self, temperature: float = 1.0, top_k: int = 10,
                 top_p: float = 0.9):
        super().__init__(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)

    def _process(self, logits: jax.Array) -> jax.Array:
        kth = jax.lax.top_k(logits, self.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, _FILTER_VALUE, logits)
        return NucleusProcessor(self.temperature, self.top_p)._process(logits)


_REGISTRY = {
    "greedy": lambda t, k, p: GreedyProcessor(t),
    "multinomial": lambda t, k, p: MultinomialProcessor(t),
    "topk": lambda t, k, p: TopKProcessor(t, k),
    "nucleus": lambda t, k, p: NucleusProcessor(t, p),
    "topknucleus": lambda t, k, p: TopKNucleusProcessor(t, k, p),
}


def build_processor(name: str, temperature: float = 1.0, top_k: int = 10,
                    top_p: float = 0.9) -> LogitsProcessor:
    """Name-based factory mirroring the reference CLI's processor selection
    (ref: infer.py:654-686)."""
    key = name.lower().replace("_", "").replace("-", "")
    if key not in _REGISTRY:
        raise ValueError(f"unknown processor {name!r}; choose from {sorted(_REGISTRY)}")
    return _REGISTRY[key](temperature, top_k, top_p)


# ---------------------------------------------------------------------------
# logits-space fast paths (used by AR loops where only the SAMPLE is needed;
# the speculative accept/reject path still consumes processed distributions)
# ---------------------------------------------------------------------------

def _sample_from_logits_default(self, logits, key):
    return self.sample(self(logits), key)


def _sample_from_logits_greedy(self, logits, key=None):
    # argmax is invariant under softmax/temperature
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _sample_from_logits_multinomial(self, logits, key):
    # categorical consumes logits directly; temperature folds into a scale
    return jax.random.categorical(
        key, logits.astype(jnp.float32) / self.temperature, axis=-1
    ).astype(jnp.int32)


LogitsProcessor.sample_from_logits = _sample_from_logits_default
GreedyProcessor.sample_from_logits = _sample_from_logits_greedy
MultinomialProcessor.sample_from_logits = _sample_from_logits_multinomial
# TopK/Nucleus/TopKNucleus inherit from MultinomialProcessor but must filter
# first — restore the default (filter -> softmax -> categorical) for them
TopKProcessor.sample_from_logits = _sample_from_logits_default
NucleusProcessor.sample_from_logits = _sample_from_logits_default
TopKNucleusProcessor.sample_from_logits = _sample_from_logits_default
