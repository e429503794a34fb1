"""Continuous-batching serving engines.

``PagedContinuousBatcher`` is the DEFAULT engine (vLLM-parity: the reference
delegates serving to vLLM, whose paged KV is the default —
ref: docs/VLLM_GUIDE.md:175-178): hybrid layout (paged target pool + slotted
drafter), chunked prefill, prefix caching, preemption under pool pressure;
measured 0.92x the slotted batcher's warm throughput on chip (round 3) in
exchange for pool elasticity. ``ContinuousBatcher`` (slotted, per-slot
reserved KV) remains the raw-throughput choice when every sequence may run
to max length anyway.
"""
from specdec_tpu.serve.eagle_scheduler import EagleContinuousBatcher
from specdec_tpu.serve.nasd_scheduler import NasdContinuousBatcher
from specdec_tpu.serve.paged_scheduler import PagedContinuousBatcher
from specdec_tpu.serve.scheduler import ContinuousBatcher, Request

DefaultBatcher = PagedContinuousBatcher
