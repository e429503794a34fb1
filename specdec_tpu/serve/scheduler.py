"""Continuous batching scheduler for speculative decoding.

The reference only reaches continuous batching through vLLM's opaque C++/CUDA
engine (SURVEY.md §2.7 row "Continuous batching / paged KV"; in-repo batching
is static gamma-window batching). This is the native TPU equivalent: a host
scheduler admitting/evicting requests into a FIXED number of device slots
while a jitted whole-batch speculative window step advances all active slots.

Design:
- Device state is engine.batch_engine.BatchState with B slots. Finished slots
  are masked (their compute is wasted but shapes stay static — the XLA
  contract), and get refilled by admission without touching other slots.
- Admission = one jitted call: prefill the new prompt as a batch-of-one,
  scatter its KV/buffer/counters into the slot. Other slots are untouched, so
  admission cost is one drafter+target prefill, not a batch recompute.
- The drive loop runs ``windows_per_sync`` speculative windows per host
  round-trip to keep dispatch overhead off the critical path.
- Per-request metrics: TTFT (first verified token after admission), e2e
  latency, generated tokens, acceptance rate — same schema as engine.metrics.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from specdec_tpu.core.cache import init_cache, install_slot
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_step
from specdec_tpu.engine.batch_engine import BatchState, batch_spec_window
from specdec_tpu.engine.metrics import RequestMetrics
from specdec_tpu.sampling.processors import GreedyProcessor, LogitsProcessor
from specdec_tpu.sampling.utils import normalize_eos


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_ids: List[int]
    max_new_tokens: int
    submit_time: float = 0.0
    # stamped when a batcher takes the request off its queue (queue-wait
    # accounting; preemption-requeues keep the FIRST dequeue time)
    dequeue_time: float = 0.0
    # per-request sampling params (honored when the batcher was built with
    # per_request_sampling=True; vLLM SamplingParams-style, temperature<=1e-5
    # means greedy). None = engine defaults.
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    # filled at completion
    output_ids: Optional[List[int]] = None
    metrics: Optional[RequestMetrics] = None


@partial(jax.jit, static_argnames=(
    "drafter_cfg", "target_cfg", "processor", "eos_ids"),
         donate_argnames=("state",))
def _admit_slot(drafter_cfg: ModelConfig, drafter_params,
                target_cfg: ModelConfig, target_params,
                state: BatchState, slot: jax.Array,
                prompt: jax.Array, prompt_len: jax.Array,
                max_new: jax.Array,
                processor: LogitsProcessor, eos_ids: Tuple[int, ...],
                key: jax.Array) -> BatchState:
    """Prefill ``prompt`` (padded [P]) as batch-of-one and install it in
    ``slot``: buffer row, per-seq position/limit, both models' KV rows."""
    P = prompt.shape[0]
    S = state.buf.shape[1]

    # batch-of-one prefill on scratch caches sized like the slot row
    t_cache1 = init_cache(target_cfg, 1, S)
    t_logits, t_cache1 = forward_step(target_cfg, target_params,
                                      prompt[None, :], t_cache1)
    d_cache1 = init_cache(drafter_cfg, 1, S)
    _, d_cache1 = forward_step(drafter_cfg, drafter_params, prompt[None, :],
                               d_cache1)

    last = jnp.take_along_axis(t_logits, (prompt_len - 1)[None, None, None],
                               axis=1)[0, 0]
    p0 = processor(last)
    tok0 = processor.sample(p0, key).astype(jnp.int32)

    row = jnp.zeros((S,), jnp.int32)
    row = lax.dynamic_update_slice(row, prompt, (0,))
    row = lax.dynamic_update_index_in_dim(row, tok0, prompt_len, axis=0)

    max_pos = min(target_cfg.max_position_embeddings,
                  drafter_cfg.max_position_embeddings)
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
        pos=put_row(state.pos, pos),
        prompt_len=put_row(state.prompt_len, prompt_len),
        total_len=put_row(state.total_len, total),
        finished=put_row(state.finished, finished),
        t_cache=install_slot(state.t_cache, t_cache1, slot, pos - 1),
        # drafter invariant: covers pos-2 (two-token first draft step)
        d_cache=install_slot(state.d_cache, d_cache1, slot, pos - 2),
        accepted=put_row(state.accepted, jnp.int32(0)),
        speculated=put_row(state.speculated, jnp.int32(0)),
    )


class ContinuousBatcher:
    """Admit/evict requests into fixed device slots; drive spec windows."""

    def __init__(self, drafter_cfg: ModelConfig, drafter_params,
                 target_cfg: ModelConfig, target_params,
                 num_slots: int = 4, gamma: int = 4,
                 max_prompt_len: int = 256, max_new_tokens: int = 128,
                 logits_processor: Optional[LogitsProcessor] = None,
                 eos_tokens_id=(), pad_token_id: int = 0,
                 skip_sample_adjustment: bool = False,
                 windows_per_sync: int = 1,
                 auto_gamma: bool = False,
                 auto_gamma_max: int = 16,
                 auto_gamma_min_drafts: int = 256,
                 gamma_cost_ratio: Optional[float] = None,
                 gamma_window_overhead: float = 0.089,
                 key: Optional[jax.Array] = None):
        self.drafter_cfg, self.drafter_params = drafter_cfg, drafter_params
        self.target_cfg, self.target_params = target_cfg, target_params
        self.B = num_slots
        self.gamma = gamma
        # runtime gamma adaptation: after auto_gamma_min_drafts measured
        # drafts, invert the observed acceptance metric to a per-draft
        # conditional and re-jit the window at the model's best gamma
        # (engine/gamma_tuner.py — the reference leaves gamma to hand-tuning,
        # ref configs/performance_config.sh:28). Each switch costs one
        # compile, so switches are bounded and hysteresis-gated.
        self.auto_gamma = auto_gamma
        self.auto_gamma_max = auto_gamma_max if auto_gamma else gamma
        self.auto_gamma_min_drafts = auto_gamma_min_drafts
        # layer-ratio prior scaled by the measured per-call inflation
        # (round-5 calibration, tools/bench_gamma_calib.py: the 4/22
        # drafter fit to 0.25 of an AR step — per-call overheads don't
        # shrink with layer count, so the raw ratio underestimates)
        self.gamma_cost_ratio = (
            gamma_cost_ratio
            if gamma_cost_ratio is not None
            else 1.37 * drafter_cfg.num_layers / max(1, target_cfg.num_layers))
        # measured fixed per-window overhead in AR-step units (round-5
        # calibration: 0.089; the round-2 constant 0.57 described the
        # pre-rework kernel's much larger fixed window cost)
        self.gamma_window_overhead = gamma_window_overhead
        self._auto_drafts = [0, 0]  # accepted, speculated since last retune
        self._gamma_switches = 0
        self.max_prompt_len = max_prompt_len
        self.default_max_new = max_new_tokens
        self.processor = logits_processor or GreedyProcessor()
        self.eos_ids = normalize_eos(eos_tokens_id)
        self.pad_id = pad_token_id
        self.skip_sample_adjustment = skip_sample_adjustment
        # >1 trades admission latency for fewer host round-trips: that many
        # speculative windows run per device dispatch (early exit inside)
        self.windows_per_sync = max(1, int(windows_per_sync))
        self.key = key if key is not None else jax.random.key(0)
        self._key_ctr = 0

        # slack covers the largest window a retune may reach
        S = max_prompt_len + max_new_tokens + self.auto_gamma_max + 2
        self.S = S
        # empty state: all slots finished until admitted
        self.state = BatchState(
            buf=jnp.zeros((self.B, S), jnp.int32),
            pos=jnp.ones((self.B,), jnp.int32),
            prompt_len=jnp.ones((self.B,), jnp.int32),
            total_len=jnp.ones((self.B,), jnp.int32),
            finished=jnp.ones((self.B,), bool),
            d_cache=init_cache(drafter_cfg, self.B, S),
            t_cache=init_cache(target_cfg, self.B, S),
            accepted=jnp.zeros((self.B,), jnp.int32),
            speculated=jnp.zeros((self.B,), jnp.int32),
        )
        self._init_host_state()

    def _init_host_state(self):
        """Queue/slot bookkeeping shared by every batcher flavor (the NASD
        and EAGLE subclasses build their own device state but reuse this)."""
        # auto-gamma defaults for subclasses whose __init__ doesn't plumb the
        # option (they still share _window_and_harvest, which consults these)
        if not hasattr(self, "auto_gamma"):
            self.auto_gamma = False
            self.auto_gamma_max = getattr(self, "gamma", 4)
            self.auto_gamma_min_drafts = 256
            self.gamma_cost_ratio = 1.0
            self.gamma_window_overhead = 0.57
            self._auto_drafts = [0, 0]
            self._gamma_switches = 0
        self.queue: List[Request] = []
        self.slot_req: List[Optional[Request]] = [None] * self.B
        self._slot_first_token: List[Optional[float]] = [None] * self.B
        self.completed: Dict[int, Request] = {}
        self._next_id = 0
        # host mirror of state.pos, refreshed by every host sync that already
        # materializes it (admission stamp, window harvest). Consumers that
        # need positions between syncs (paged page top-up) read this instead
        # of pulling the device array — a pull is ~35-81 ms on the tunneled
        # backend (CLAUDE.md) and was costing the paged batcher one extra
        # round-trip EVERY step.
        self._host_pos = np.zeros((self.B,), np.int64)

    # ------------------------------------------------------------------ API
    def submit(self, prompt_ids: Sequence[int],
               max_new_tokens: Optional[int] = None) -> int:
        rid = self._next_id
        self._next_id += 1
        req = Request(request_id=rid,
                      prompt_ids=[int(t) for t in prompt_ids][:self.max_prompt_len],
                      max_new_tokens=max_new_tokens or self.default_max_new,
                      submit_time=time.time())
        self.queue.append(req)
        return rid

    def _next_key(self):
        self._key_ctr += 1
        return jax.random.fold_in(self.key, self._key_ctr)

    def _admit(self, slot: int, req: Request, sync: bool = True):
        P = self.max_prompt_len
        prompt = np.zeros((P,), np.int32)
        n = min(len(req.prompt_ids), P)
        prompt[:n] = req.prompt_ids[:n]
        self.state = _admit_slot(
            self.drafter_cfg, self.drafter_params, self.target_cfg,
            self.target_params, self.state, jnp.int32(slot), jnp.asarray(prompt),
            jnp.int32(n), jnp.int32(req.max_new_tokens), self.processor,
            self.eos_ids, self._next_key())
        self.slot_req[slot] = req
        req.metrics = RequestMetrics(prompt_tokens=n,
                                     start_time=req.submit_time,
                                     queue_seconds=time.time() - req.submit_time)
        if sync:
            self._stamp_admissions([slot])

    def _stamp_admissions(self, slots: List[int]):
        """The first generated token is committed by the admission prefill
        itself (tok0 in _admit_slot), so TTFT stamps at admission — one
        whole-array sync makes the stamp honest (with windows_per_sync>1 the
        next host sync can be many windows later; round-1 stamped there and
        overstated TTFT — VERDICT weak #9). Batched: a burst of admissions
        shares ONE sync instead of paying an RPC round-trip each."""
        self._host_pos[:] = np.asarray(self.state.pos)
        now = time.time()
        for slot in slots:
            self._slot_first_token[slot] = now

    def _harvest(self, slot: int, buf, pos, plen, accepted, speculated):
        req = self.slot_req[slot]
        if req is None:
            return
        out = buf[slot, plen[slot]:pos[slot]].tolist()
        req.output_ids = out
        m = req.metrics
        m.generated_tokens = len(out)
        m.total_tokens = m.prompt_tokens + len(out)
        m.end_time = time.time()
        m.total_latency = m.end_time - m.start_time
        ft = self._slot_first_token[slot]
        m.first_token_time = ft or m.end_time
        m.ttft = (ft or m.end_time) - m.start_time
        m.drafts_accepted = int(accepted[slot])
        m.drafts_generated = int(speculated[slot])
        m.acceptance_rate = (m.drafts_accepted / m.drafts_generated
                             if m.drafts_generated > 0 else 0.0)
        if self.auto_gamma:
            self._auto_drafts[0] += m.drafts_accepted
            self._auto_drafts[1] += m.drafts_generated
        self.completed[req.request_id] = req
        self.slot_req[slot] = None

    def _maybe_retune_gamma(self):
        """Re-jit the window at the advisory's best gamma once enough drafts
        are measured. Hysteresis: only switch for a >=5% predicted gain, and
        at most twice per batcher lifetime (a switch = one TPU compile)."""
        acc, spec = self._auto_drafts
        if spec < self.auto_gamma_min_drafts or self._gamma_switches >= 2:
            return
        from specdec_tpu.engine.gamma_tuner import (
            best_gamma, conditional_from_reference_rate, expected_speedup,
        )
        a = conditional_from_reference_rate(acc / spec, self.gamma)
        g, s = best_gamma(a, self.gamma_cost_ratio,
                          self.gamma_window_overhead,
                          max_gamma=self.auto_gamma_max)
        cur = expected_speedup(a, self.gamma, self.gamma_cost_ratio,
                               self.gamma_window_overhead)
        self._auto_drafts = [0, 0]
        if g != self.gamma and s > 1.05 * cur:
            self.gamma = g
            self._gamma_switches += 1

    def step(self):
        """Fill free slots from the queue, then run one spec window."""
        admitted = []
        for slot in range(self.B):
            if self.slot_req[slot] is None and self.queue:
                self._admit(slot, self.queue.pop(0), sync=False)
                admitted.append(slot)
        if admitted:
            self._stamp_admissions(admitted)
        if all(r is None for r in self.slot_req):
            return False
        return self._window_and_harvest()

    def _window_step(self):
        """Advance the device state by windows_per_sync speculative windows
        (the ONLY piece each batcher flavor overrides — NASD/EAGLE subclasses
        swap the window program, the harvest loop below is shared)."""
        if self.windows_per_sync > 1:
            from specdec_tpu.engine.batch_engine import batch_spec_windows
            self.state = batch_spec_windows(
                self.drafter_cfg, self.drafter_params, self.target_cfg,
                self.target_params, self.state, self.gamma, self.processor,
                self.eos_ids, self.skip_sample_adjustment, self._next_key(),
                self.windows_per_sync)
        else:
            self.state = batch_spec_window(
                self.drafter_cfg, self.drafter_params, self.target_cfg,
                self.target_params, self.state, self.gamma, self.processor,
                self.eos_ids, self.skip_sample_adjustment, self._next_key())

    def _window_and_harvest(self):
        self._window_step()

        now = time.time()
        from specdec_tpu.engine.batch_engine import _pack_state, _unpack_state
        buf, pos, plen, accepted, speculated, finished = _unpack_state(
            np.asarray(_pack_state(self.state)))
        self._host_pos[:] = pos
        for slot in range(self.B):
            if self.slot_req[slot] is not None:
                if self._slot_first_token[slot] is None:
                    self._slot_first_token[slot] = now
                if finished[slot]:
                    self._harvest(slot, buf, pos, plen, accepted, speculated)
        if self.auto_gamma:
            self._maybe_retune_gamma()
        return True

    def run(self) -> Dict[int, Request]:
        """Drain queue + active slots; returns completed requests by id."""
        while self.queue or any(r is not None for r in self.slot_req):
            self.step()
        return self.completed
