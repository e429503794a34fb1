"""Streaming generation: yield tokens as speculative windows complete.

The reference's vLLM path streams tokens per request (ref:
engine/vllm_engine.py:196-208 iterates the async generator); the native
equivalent is a synchronous generator over the continuous batcher — each
iteration advances one speculative window (or windows_per_sync fused windows)
and yields the newly committed tokens. TTFT for a streaming consumer is the
first yield; tokens arrive in bursts of (accepted prefix + 1), which is the
inherent cadence of speculative decoding.
"""
from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

from specdec_tpu.serve.scheduler import ContinuousBatcher


def stream_generate(batcher: ContinuousBatcher,
                    prompt_ids: Sequence[int],
                    max_new_tokens: Optional[int] = None) -> Iterator[List[int]]:
    """Submit one request and yield lists of newly committed token ids after
    each engine step until the request finishes. The final yield may be
    truncated at EOS; concatenating all yields gives exactly the request's
    output_ids."""
    import numpy as np

    rid = batcher.submit(prompt_ids, max_new_tokens=max_new_tokens)
    emitted = 0
    # find the request's slot lazily (admission happens inside step())
    while rid not in batcher.completed:
        progressed = batcher.step()
        chunk = _new_tokens(batcher, rid, emitted)
        if chunk:
            emitted += len(chunk)
            yield chunk
        if not progressed and rid not in batcher.completed:
            # queue starved and slot never opened: defensive stop
            break
    req = batcher.completed.get(rid)
    if req is not None and req.output_ids is not None:
        tail = req.output_ids[emitted:]
        if tail:
            yield tail


def _new_tokens(batcher: ContinuousBatcher, rid: int, emitted: int):
    import numpy as np

    req = batcher.completed.get(rid)
    if req is not None:
        return []  # final tail handled by the caller
    for slot, r in enumerate(batcher.slot_req):
        if r is not None and r.request_id == rid:
            pos = int(np.asarray(batcher.state.pos[slot]))
            plen = int(np.asarray(batcher.state.prompt_len[slot]))
            n = pos - plen
            if n > emitted:
                buf = np.asarray(batcher.state.buf[slot, plen + emitted:plen + n])
                return buf.tolist()
            return []
    return []
