"""Continuous batching with the device-resident n-gram drafter (NASD
serving — the round-3 integration of ngram/device_assisted.py into serving
slots).

The model-drafter scheduler (serve/scheduler.py) admits requests into fixed
device slots and drives jitted whole-batch speculative windows. This is the
same host scheduler with the drafter swapped for the SHARED
``DeviceNGramTable`` (ngram/device_table.py): admission additionally seeds
the table from the new prompt, and the window step is the fused
``nasd_spec_windows`` — drafting, verify, exact-match acceptance, and table
updates all inside one device program, zero per-window host syncs.

Reference context: the reference's NASD path is single-sequence only
(ref: ngram_assisted/ngram_assisted.py:11-164) and its serving path (vLLM
wrapper) has no n-gram mode at all — serving NASD is a beyond-reference
capability unlocked by the device table. The table is global across slots
by design (matching ``reset_in_between=False``, ref: benchmark.py NGRAM_*
env surface): every admitted prompt seeds it, and every committed token
updates it, so concurrent requests share learned n-grams exactly like the
sequential harness path accumulating one store over a dataset.

Exact-match acceptance means greedy NASD serving output EQUALS greedy AR
output per request regardless of table contents — the scheduler-level
oracle tests/test_nasd_serve.py holds against the single-sequence AR path.
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

from specdec_tpu.core.cache import init_cache, install_slot
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_step
from specdec_tpu.engine.metrics import RequestMetrics
from specdec_tpu.ngram.device_assisted import NasdState, nasd_spec_windows
from specdec_tpu.ngram.device_table import (
    DeviceNGramTable, init_device_table, table_seed, table_update,
)
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import normalize_eos
from specdec_tpu.serve.scheduler import ContinuousBatcher, Request


@partial(jax.jit, static_argnames=("cfg", "processor", "eos_ids"),
         donate_argnames=("state", "table"))
def _admit_nasd_slot(cfg: ModelConfig, params,
                     state: NasdState, table: DeviceNGramTable,
                     slot: jax.Array, prompt: jax.Array,
                     prompt_len: jax.Array, max_new: jax.Array,
                     processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                     key: jax.Array) -> Tuple[NasdState, DeviceNGramTable]:
    """Prefill ``prompt`` as batch-of-one, install it in ``slot``, and seed
    the shared table from the prompt + the first committed token (the same
    seeding the one-shot batch path does before its loop)."""
    S = state.buf.shape[1]
    n_ctx = table.orders[0] - 1

    cache1 = init_cache(cfg, 1, S)
    logits, cache1 = forward_step(cfg, params, prompt[None, :], cache1)
    last = jnp.take_along_axis(logits, (prompt_len - 1)[None, None, None],
                               axis=1)[0, 0]
    p0 = processor(last)
    tok0 = processor.sample(p0, key).astype(jnp.int32)

    row = jnp.zeros((S,), jnp.int32)
    row = lax.dynamic_update_slice(row, prompt, (0,))
    row = lax.dynamic_update_index_in_dim(row, tok0, prompt_len, axis=0)

    table = table_seed(table, prompt, prompt_len)
    c0 = lax.dynamic_slice(row, (prompt_len - n_ctx,), (n_ctx,))
    table = table_update(table, c0, tok0)

    total = jnp.minimum(cfg.max_position_embeddings, prompt_len + max_new)
    pos = prompt_len + 1
    eos0 = jnp.zeros((), bool)
    if eos_ids:
        eos0 = jnp.any(tok0 == jnp.asarray(eos_ids, jnp.int32))
    finished = eos0 | (pos >= total)

    def put_row(arr, val):
        return lax.dynamic_update_index_in_dim(arr, val, slot, axis=0)

    state = dataclasses.replace(
        state,
        buf=put_row(state.buf, row),
        pos=put_row(state.pos, pos),
        prompt_len=put_row(state.prompt_len, prompt_len),
        total_len=put_row(state.total_len, total),
        finished=put_row(state.finished, finished),
        t_cache=install_slot(state.t_cache, cache1, slot, pos - 1),
        accepted=put_row(state.accepted, jnp.int32(0)),
        speculated=put_row(state.speculated, jnp.int32(0)),
    )
    return state, table


class NasdContinuousBatcher(ContinuousBatcher):
    """Admit/evict requests into fixed device slots; drive fused device-NASD
    windows against one SHARED n-gram table.

    Host-side machinery (queue, slot bookkeeping, TTFT stamping at admission,
    harvest) is inherited from ContinuousBatcher; only state construction,
    admission, and the window step differ.
    """

    def __init__(self, target_cfg: ModelConfig, target_params,
                 num_slots: int = 4, gamma: int = 4,
                 n: int = 3, capacity: int = 1 << 16,
                 filler_top_k: int = 3, stop_if_unknown: bool = False,
                 table: Optional[DeviceNGramTable] = None,
                 max_prompt_len: int = 256, max_new_tokens: int = 128,
                 logits_processor: Optional[LogitsProcessor] = None,
                 eos_tokens_id=(), pad_token_id: int = 0,
                 windows_per_sync: int = 1,
                 key: Optional[jax.Array] = None):
        self.target_cfg, self.target_params = target_cfg, target_params
        self.B = num_slots
        self.gamma = gamma
        self.filler_top_k = max(1, int(filler_top_k))
        self.stop_if_unknown = bool(stop_if_unknown)
        self.max_prompt_len = max_prompt_len
        self.default_max_new = max_new_tokens
        self.processor = logits_processor or GreedyProcessor()
        self.eos_ids = normalize_eos(eos_tokens_id)
        self.pad_id = pad_token_id
        self.windows_per_sync = max(1, int(windows_per_sync))
        self.key = key if key is not None else jax.random.key(0)
        self._key_ctr = 0

        S = max_prompt_len + max_new_tokens + gamma + 2
        self.S = S
        # copy an injected table: admissions/windows DONATE self.table's
        # buffers, which would invalidate the caller's reference (the
        # carryover pattern hands the same learned table to several consumers)
        self.table = (jax.tree.map(jnp.array, table) if table is not None
                      else init_device_table(n, capacity))
        # empty state: all slots finished until admitted; pos=1 keeps the
        # window body's pos-1 reads in-bounds for never-admitted slots
        self.state = NasdState(
            buf=jnp.zeros((self.B, S), jnp.int32),
            pos=jnp.ones((self.B,), jnp.int32),
            prompt_len=jnp.ones((self.B,), jnp.int32),
            total_len=jnp.ones((self.B,), jnp.int32),
            finished=jnp.ones((self.B,), bool),
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
        self.state, self.table = _admit_nasd_slot(
            self.target_cfg, self.target_params, self.state, self.table,
            jnp.int32(slot), jnp.asarray(prompt), jnp.int32(n),
            jnp.int32(req.max_new_tokens), self.processor, self.eos_ids,
            self._next_key())
        self.slot_req[slot] = req
        req.metrics = RequestMetrics(prompt_tokens=n,
                                     start_time=req.submit_time,
                                     queue_seconds=time.time() - req.submit_time)
        if sync:
            self._stamp_admissions([slot])

    def _window_step(self):
        self.state, self.table = nasd_spec_windows(
            self.target_cfg, self.target_params, self.state, self.table,
            self.gamma, self.processor, self.eos_ids, self.filler_top_k,
            self.stop_if_unknown, self._next_key(), self.windows_per_sync)
