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

    # --- batched variants (serving call sites) -----------------------------
    # ``samp`` is an optional per-row [B, 3] (temperature, top_k, top_p)
    # array threaded through BatchState by the continuous batchers. The base
    # processors are batch-uniform and ignore it; PerSlotProcessor consumes
    # it so ONE jitted window program serves heterogeneous requests.

    def batched(self, logits: jax.Array, samp=None) -> jax.Array:
        return self(logits)

    def sample_batched(self, probs: jax.Array, keys: jax.Array,
                       samp=None) -> jax.Array:
        return jax.vmap(lambda pi, ki: self.sample(pi, ki))(probs, keys)

    def sample_from_logits_batched(self, logits: jax.Array, keys: jax.Array,
                                   samp=None) -> jax.Array:
        return jax.vmap(lambda li, ki: self.sample_from_logits(li, ki))(
            logits, keys)


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


class PerSlotProcessor(LogitsProcessor):
    """Per-request sampling params for batched serving (vLLM SamplingParams
    semantics; beyond-reference — the reference fixes ONE processor per run,
    ref: infer.py:654-686). Each batch row carries its own
    ``(temperature, top_k, top_p)`` in a traced ``[B, 3]`` float32 array
    (``BatchState.samp``), so a single jitted window program serves
    heterogeneous requests without per-request recompiles.

    Per-row semantics, matching the uniform processors exactly when a row's
    params equal theirs: top-k filter (``top_k <= 0`` disables), then nucleus
    filter over the survivors with the reference's untempered-cumsum quirk
    (``top_p >= 1`` disables; NucleusProcessor above), then temperature
    softmax. ``temperature <= 1e-5`` means greedy/argmax (vLLM convention):
    the tempered softmax underflows to the one-hot argmax distribution, so
    speculative accept/reject stays exact for greedy rows.
    """

    _GREEDY_EPS = 1e-5

    def batched(self, logits: jax.Array, samp: jax.Array) -> jax.Array:
        f = logits.astype(jnp.float32)
        V = f.shape[-1]
        lead = (f.shape[0],) + (1,) * (f.ndim - 1)  # row scalar -> [B,1,..,1]
        temp = samp[:, 0].reshape(lead)
        top_k = samp[:, 1].astype(jnp.int32).reshape(lead)
        top_p = samp[:, 2].reshape(lead)

        # top-k: threshold at each row's k-th largest logit
        use_k = (top_k > 0) & (top_k < V)
        k = jnp.clip(top_k, 1, V)
        sorted_desc = jnp.sort(f, axis=-1)[..., ::-1]
        k_idx = jnp.broadcast_to(k - 1, f.shape[:-1] + (1,))
        kth = jnp.take_along_axis(sorted_desc, k_idx, axis=-1)
        f = jnp.where(use_k & (f < kth), _FILTER_VALUE, f)

        # nucleus over the k-survivors (TopKNucleusProcessor order), with the
        # reference's untempered-cumsum boundary (NucleusProcessor._process)
        use_p = top_p < 1.0
        sorted2 = jnp.sort(f, axis=-1)[..., ::-1]
        sorted_probs = jax.nn.softmax(sorted2, axis=-1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        remove_sorted = cum > top_p
        remove_sorted = jnp.concatenate(
            [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
            axis=-1)
        kept = jnp.where(remove_sorted, jnp.inf, sorted2)
        threshold = jnp.min(kept, axis=-1, keepdims=True)
        f = jnp.where(use_p & (f < threshold), _FILTER_VALUE, f)

        # greedy rows ride the same softmax: max(temp, eps) underflows every
        # non-argmax lane to exactly 0, i.e. the one-hot argmax distribution
        return jax.nn.softmax(f / jnp.maximum(temp, self._GREEDY_EPS),
                              axis=-1)

    def sample_batched(self, probs: jax.Array, keys: jax.Array,
                       samp: jax.Array) -> jax.Array:
        logp = jnp.log(jnp.maximum(probs, 1e-38))
        mult = jax.vmap(
            lambda lp, ki: jax.random.categorical(ki, lp, axis=-1))(logp, keys)
        greedy = jnp.argmax(probs, axis=-1)
        is_greedy = samp[:, 0] <= self._GREEDY_EPS
        sel = is_greedy.reshape((probs.shape[0],) + (1,) * (mult.ndim - 1))
        return jnp.where(sel, greedy, mult).astype(jnp.int32)

    def sample_from_logits_batched(self, logits: jax.Array, keys: jax.Array,
                                   samp: jax.Array) -> jax.Array:
        return self.sample_batched(self.batched(logits, samp), keys, samp)

    # single-sequence entry points are meaningless without a samp row
    def __call__(self, logits):  # pragma: no cover - guard
        raise TypeError("PerSlotProcessor needs per-row params; use "
                        "batched(logits, samp) (serving path only)")

    @staticmethod
    def row(temperature: float = 1.0, top_k: int = 0,
            top_p: float = 1.0) -> "jnp.ndarray":
        """One request's [3] param row. temperature<=1e-5 == greedy."""
        return jnp.asarray([float(temperature), float(top_k), float(top_p)],
                           jnp.float32)


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
