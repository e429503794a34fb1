"""Perplexity / logprob evaluation.

The north-star quality gate is "perplexity within 0.1 of the same-bit-width
reference" (BASELINE.md). This module computes token-level NLL/perplexity with
the same teacher-forcing convention as HF's standard LM evaluation (logits at
position t score token t+1), over batches of sequences with padding masks —
used by tests to gate quantization quality (INT8/NF4 vs dense) and available
to users for checkpoint validation.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_full


@partial(jax.jit, static_argnames=("cfg",))
def _nll_sums(cfg: ModelConfig, params, tokens: jax.Array,
              mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """tokens/mask: [B, T]. Returns (sum of NLL over scored positions,
    number of scored positions). Position t is scored iff both t and t+1
    are valid."""
    logits = forward_full(cfg, params, tokens)            # [B, T, V] f32
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    targets = tokens[:, 1:]
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    score_mask = (mask[:, :-1] * mask[:, 1:]).astype(jnp.float32)
    return -(tok_logp * score_mask).sum(), score_mask.sum()


def perplexity(cfg: ModelConfig, params, sequences: Sequence[Sequence[int]],
               pad_id: int = 0, batch_size: int = 8) -> float:
    """Corpus perplexity = exp(total NLL / total scored tokens)."""
    total_nll = 0.0
    total_tok = 0.0
    seqs = [list(s) for s in sequences]
    for i in range(0, len(seqs), batch_size):
        chunk = seqs[i:i + batch_size]
        T = max(len(s) for s in chunk)
        toks = np.full((len(chunk), T), pad_id, np.int32)
        mask = np.zeros((len(chunk), T), np.int32)
        for j, s in enumerate(chunk):
            toks[j, :len(s)] = s
            mask[j, :len(s)] = 1
        nll, n = _nll_sums(cfg, params, jnp.asarray(toks), jnp.asarray(mask))
        total_nll += float(nll)
        total_tok += float(n)
    return float(np.exp(total_nll / max(total_tok, 1.0)))


def sequence_logprobs(cfg: ModelConfig, params,
                      sequences: Sequence[Sequence[int]],
                      pad_id: int = 0) -> List[float]:
    """Per-sequence total log-probability (teacher-forced)."""
    out = []
    for s in sequences:
        toks = jnp.asarray(np.asarray(s, np.int32)[None, :])
        mask = jnp.ones_like(toks)
        nll, _ = _nll_sums(cfg, params, toks, mask)
        out.append(-float(nll))
    return out
