"""Continuous batching with the EAGLE feature-predictor drafter.

Completes the drafter-family x serving matrix: model drafters
(serve/scheduler.py), device n-gram tables (serve/nasd_scheduler.py), and —
here — EAGLE heads (core/eagle.py) all drive the same host scheduler over
fixed device slots. The window step is engine/eagle_batch.py's fused
``eagle_batch_windows``; admission prefills the target batch-of-one WITH
features (forward_step_features) and installs the feature-buffer row
alongside buffer/caches, because drafting needs the committed positions'
residual-stream features.

The eagle KV cache gets its slot rows ZEROED (not prefilled) at admission:
every window's catch-up rewrite re-derives the drafter state for the last
gamma+1 pairs from the feature buffer (the same property that makes
speculative rollback pure length arithmetic), but rows below the catch-up
start are positionally attended and never rewritten — on slot reuse they
would otherwise leak the previous occupant's drafter K/V.

Reference context: the reference has no EAGLE at all; this is the
beyond-reference drafter family (docs/PARITY.md) made serving-capable.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from specdec_tpu.core.cache import init_cache, install_slot, zero_slot
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_step_features
from specdec_tpu.engine.eagle_batch import EagleBatchState, eagle_batch_windows
from specdec_tpu.engine.metrics import RequestMetrics
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import normalize_eos
from specdec_tpu.serve.scheduler import ContinuousBatcher, Request


@partial(jax.jit, static_argnames=(
    "eagle_cfg", "target_cfg", "processor", "eos_ids"),
         donate_argnames=("state",))
def _admit_eagle_slot(eagle_cfg: ModelConfig, eagle_params,
                      target_cfg: ModelConfig, target_params,
                      state: EagleBatchState, slot: jax.Array,
                      prompt: jax.Array, prompt_len: jax.Array,
                      max_new: jax.Array,
                      processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                      key: jax.Array) -> EagleBatchState:
    """Prefill ``prompt`` (padded [P]) as batch-of-one with features and
    install buffer row, feature row, per-seq counters, and the target KV
    row in ``slot``."""
    P = prompt.shape[0]
    S = state.buf.shape[1]

    t_cache1 = init_cache(target_cfg, 1, S)
    t_logits, t_feats, t_cache1 = forward_step_features(
        target_cfg, target_params, prompt[None, :], t_cache1)

    last = jnp.take_along_axis(t_logits, (prompt_len - 1)[None, None, None],
                               axis=1)[0, 0]
    p0 = processor(last)
    tok0 = processor.sample(p0, key).astype(jnp.int32)

    row = jnp.zeros((S,), jnp.int32)
    row = lax.dynamic_update_slice(row, prompt, (0,))
    row = lax.dynamic_update_index_in_dim(row, tok0, prompt_len, axis=0)
    frow = jnp.zeros((S, state.fbuf.shape[-1]), state.fbuf.dtype)
    frow = lax.dynamic_update_slice(frow, t_feats[0].astype(frow.dtype),
                                    (0, 0))

    max_pos = min(eagle_cfg.max_position_embeddings,
                  target_cfg.max_position_embeddings)
    total = jnp.minimum(max_pos, prompt_len + max_new)
    pos = prompt_len + 1
    eos0 = jnp.zeros((), bool)
    if eos_ids:
        eos0 = jnp.any(tok0 == jnp.asarray(eos_ids, jnp.int32))
    finished = eos0 | (pos >= total)

    def put_row(arr, val):
        return lax.dynamic_update_index_in_dim(arr, val, slot, axis=0)

    return dataclasses.replace(
        state,
        buf=put_row(state.buf, row),
        fbuf=put_row(state.fbuf, frow),
        pos=put_row(state.pos, pos),
        prompt_len=put_row(state.prompt_len, prompt_len),
        total_len=put_row(state.total_len, total),
        finished=put_row(state.finished, finished),
        t_cache=install_slot(state.t_cache, t_cache1, slot, pos - 1),
        # The window catch-up only rewrites the last gamma+1 eagle rows;
        # rows below its start are positionally admitted by attention but
        # never rewritten on slot REUSE — zero them so the new request
        # matches the one-shot engine path (eagle_batch_prefill starts from
        # init_cache) instead of attending the previous occupant's drafter
        # K/V.
        e_cache=zero_slot(state.e_cache, slot, jnp.int32(0)),
        accepted=put_row(state.accepted, jnp.int32(0)),
        speculated=put_row(state.speculated, jnp.int32(0)),
    )


class EagleContinuousBatcher(ContinuousBatcher):
    """Admit/evict requests into fixed device slots; drive fused EAGLE
    windows. Host-side machinery inherited from ContinuousBatcher."""

    def __init__(self, eagle_cfg: ModelConfig, eagle_params,
                 target_cfg: ModelConfig, target_params,
                 num_slots: int = 4, gamma: int = 4,
                 max_prompt_len: int = 256, max_new_tokens: int = 128,
                 logits_processor: Optional[LogitsProcessor] = None,
                 eos_tokens_id=(), pad_token_id: int = 0,
                 skip_sample_adjustment: bool = False,
                 windows_per_sync: int = 1,
                 key: Optional[jax.Array] = None):
        self.eagle_cfg, self.eagle_params = eagle_cfg, eagle_params
        self.target_cfg, self.target_params = target_cfg, target_params
        self.B = num_slots
        self.gamma = gamma
        self.max_prompt_len = max_prompt_len
        self.default_max_new = max_new_tokens
        self.processor = logits_processor or GreedyProcessor()
        self.eos_ids = normalize_eos(eos_tokens_id)
        self.pad_id = pad_token_id
        self.skip_sample_adjustment = bool(skip_sample_adjustment)
        self.windows_per_sync = max(1, int(windows_per_sync))
        self.key = key if key is not None else jax.random.key(0)
        self._key_ctr = 0

        S = max_prompt_len + max_new_tokens + gamma + 2
        self.S = S
        D = target_cfg.hidden_size
        self.state = EagleBatchState(
            buf=jnp.zeros((self.B, S), jnp.int32),
            pos=jnp.ones((self.B,), jnp.int32),
            prompt_len=jnp.ones((self.B,), jnp.int32),
            total_len=jnp.ones((self.B,), jnp.int32),
            finished=jnp.ones((self.B,), bool),
            fbuf=jnp.zeros((self.B, S, D), target_cfg.dtype),
            e_cache=init_cache(eagle_cfg, self.B, S),
            t_cache=init_cache(target_cfg, self.B, S),
            accepted=jnp.zeros((self.B,), jnp.int32),
            speculated=jnp.zeros((self.B,), jnp.int32),
        )
        self._init_host_state()

    def _admit(self, slot: int, req: Request, sync: bool = True):
        P = self.max_prompt_len
        prompt = np.zeros((P,), np.int32)
        n = min(len(req.prompt_ids), P)
        prompt[:n] = req.prompt_ids[:n]
        self.state = _admit_eagle_slot(
            self.eagle_cfg, self.eagle_params, self.target_cfg,
            self.target_params, self.state, jnp.int32(slot),
            jnp.asarray(prompt), jnp.int32(n), jnp.int32(req.max_new_tokens),
            self.processor, self.eos_ids, self._next_key())
        self.slot_req[slot] = req
        req.metrics = RequestMetrics(prompt_tokens=n,
                                     start_time=req.submit_time,
                                     queue_seconds=time.time() - req.submit_time)
        if sync:
            self._stamp_admissions([slot])

    def _window_step(self):
        self.state = eagle_batch_windows(
            self.eagle_cfg, self.eagle_params, self.target_cfg,
            self.target_params, self.state, self.gamma, self.processor,
            self.eos_ids, self.skip_sample_adjustment, self._next_key(),
            self.windows_per_sync)
